/* Differential-conformance driver (our code, reference API): read a
 * dictionary file (one keyword per line) and a text file, stream the text
 * through acm_match, and print every match as "end:index:keyword" — the
 * exact event stream our framework must reproduce.
 */
#include "aho_corasick.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int
main (int argc, char **argv) {
  if (argc < 3)
    return 2;
  ACMachine *machine = acm_create (ACM_CMP_DEFAULT, &(size_t){ sizeof (char) }, 0);
  ACState *state = acm_initiate (machine);

  FILE *dict = fopen (argv[1], "r");
  if (!dict)
    return 2;
  static char line[4096];
  /* Keywords must outlive the machine: keep copies. */
  while (fgets (line, sizeof line, dict)) {
    size_t len = strcspn (line, "\n");
    if (!len)
      continue;
    char *copy = malloc (len);
    memcpy (copy, line, len);
    for (size_t i = 0; i < len; i++)
      acm_insert_letter_of_keyword (&state, &copy[i]);
    acm_insert_end_of_keyword (&state, 0, 0);
  }
  fclose (dict);

  FILE *text = fopen (argv[2], "rb");
  if (!text)
    return 2;
  MatchHolder matcher;
  acm_matcher_init (&matcher);
  const ACState *cst = acm_initiate (machine);
  long pos = 0;
  for (int ch; (ch = fgetc (text)) != EOF; pos++) {
    char c = (char)ch;
    size_t nb = acm_match (&cst, &c);
    for (size_t j = 0; j < nb; j++) {
      acm_get_match (cst, j, &matcher);
      printf ("%ld:%zu:", pos, j);
      for (size_t k = 0; k < matcher.length; k++)
        printf ("%c", *(const char *)matcher.letters[k]);
      printf ("\n");
    }
  }
  fclose (text);
  acm_matcher_release (&matcher);
  acm_release (machine);
  return 0;
}
