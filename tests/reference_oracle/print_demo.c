/* Oracle driver (our code, reference API): build the README demo machine
 * and dump it with acm_print — the golden for utils/dump.py format parity.
 * Also prints nb_keywords and the enumeration order via acm_foreach_keyword.
 */
#include "aho_corasick.h"

#include <stdio.h>

static int
print_char (FILE *f, const void *c) {
  return fprintf (f, "%c", *(const char *)c);
}

static void
print_kw (MatchHolder m) {
  printf ("kw:");
  for (size_t k = 0; k < m.length; k++)
    printf ("%c", *(const char *)m.letters[k]);
  printf ("\n");
}

int
main (void) {
  ACMachine *machine = acm_create (ACM_CMP_DEFAULT, &(size_t){ sizeof (char) }, 0);
  ACState *state = acm_initiate (machine);
  char *words[] = { "he", "she", "his", "hers" };
  for (size_t i = 0; i < sizeof (words) / sizeof (*words); i++) {
    for (char *p = words[i]; *p; p++)
      acm_insert_letter_of_keyword (&state, p);
    acm_insert_end_of_keyword (&state, 0, 0);
  }
  printf ("nb=%zu\n", acm_nb_keywords (machine));
  acm_foreach_keyword (machine, print_kw);
  acm_print (machine, stdout, print_char);
  acm_release (machine);
}
