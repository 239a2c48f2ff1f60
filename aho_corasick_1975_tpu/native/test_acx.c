/* Native-core smoke test: exercised standalone under AddressSanitizer
 * (`make asan-test`) — the equivalent of the reference's commented-out
 * valgrind harness (examples/Makefile:5). Covers create/insert/match/
 * emit/release in both modes, bulk insertion, and teardown with live
 * allocations, so leaks and overruns surface in CI without Python.
 */
#include <assert.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct Machine Machine;
extern Machine *acx_create(int incremental);
extern void acx_release(Machine *);
extern int32_t acx_insert_letter(Machine *, int32_t, int32_t);
extern int32_t acx_insert_end(Machine *, int32_t);
extern void acx_insert_keywords(Machine *, const int32_t *, const int64_t *,
                                int64_t, int32_t *, int8_t *);
extern int64_t acx_match(Machine *, int32_t, int32_t, int32_t *);
extern int64_t acx_match_bulk(Machine *, int32_t *, const int32_t *, int64_t);
extern int32_t acx_get_match_state(Machine *, int32_t, int64_t);
extern int64_t acx_n_states(const Machine *);
extern int64_t acx_nb_sequences(const Machine *);
extern void acx_emit_delta(Machine *, int32_t, int32_t *);
extern void acx_export_arrays(Machine *, int64_t, int32_t *, int32_t *,
                              int32_t *, uint8_t *, int32_t *, int32_t *,
                              int32_t *);

static void
exercise(int incremental) {
  Machine *m = acx_create(incremental);
  /* he=1,2  she=3,1,2  his=1,4,5  hers=1,2,6,5  over letters h=1 e=2 s=3
   * i=4 ... */
  int32_t kws[] = { 1, 2, 3, 1, 2, 1, 4, 3, 1, 2, 6, 3 };
  int64_t offsets[] = { 0, 2, 5, 8, 12 };
  int32_t ends[4];
  int8_t fresh[4];
  acx_insert_keywords(m, kws, offsets, 4, ends, fresh);
  assert(acx_nb_sequences(m) == 4);
  for (int i = 0; i < 4; i++)
    assert(fresh[i] == 1);

  /* stream "she" -> matches she and he at the final symbol */
  int32_t s = 0;
  int64_t nb = 0;
  int32_t text[] = { 3, 1, 2 };
  for (int i = 0; i < 3; i++)
    nb = acx_match(m, s, text[i], &s);
  assert(nb == 2);
  assert(acx_get_match_state(m, s, 0) == ends[1]); /* longest = she */
  assert(acx_get_match_state(m, s, 1) == ends[0]); /* then he */
  assert(acx_get_match_state(m, s, 2) == -1);      /* out of bounds */

  int32_t s2 = 0;
  int64_t total = acx_match_bulk(m, &s2, text, 3);
  assert(total == 2 && s2 == s);

  /* streamed single-letter insertion on top of a bulk-built machine */
  int32_t c = 0;
  c = acx_insert_letter(m, c, 7);
  c = acx_insert_letter(m, c, 7);
  assert(acx_insert_end(m, c) == 1);
  assert(acx_insert_end(m, c) == 0); /* duplicate */

  int64_t S = acx_n_states(m);
  int32_t *delta = malloc((size_t)S * 8 * sizeof(int32_t));
  acx_emit_delta(m, 8, delta);
  assert(delta[0 * 8 + 1] != 0); /* root --h--> some state */
  free(delta);

  int32_t *fail = malloc((size_t)S * sizeof(int32_t));
  uint8_t *is_end = malloc((size_t)S);
  acx_export_arrays(m, S, fail, 0, 0, is_end, 0, 0, 0);
  assert(is_end[ends[0]]);
  free(fail);
  free(is_end);

  acx_release(m);
}

/* Lock-free match vs concurrent insertion (the reference's non-blocking
 * concurrent insert+scan property, README.md:364). Matcher threads stream
 * a fixed text while the main thread registers keywords per-letter and in
 * bulk (large enough to force edge-table rehashes, shadow-array growth,
 * and the deferred rebuild). In Meyer mode every observed count must lie
 * in [before, after]: keywords fully inserted before a pass begins are
 * never missed, and nothing beyond the final dictionary is counted. */
enum { STRESS_TEXT = 200000, STRESS_PASSES = 60 };

typedef struct {
  Machine *m;
  const int32_t *text;
  int64_t before;
  int64_t *observed; /* per-pass counts, checked after join */
} StressArg;

static void *
stress_matcher(void *argp) {
  StressArg *a = (StressArg *)argp;
  for (int p = 0; p < STRESS_PASSES; p++) {
    int32_t s = 0;
    int64_t total = acx_match_bulk(a->m, &s, a->text, STRESS_TEXT);
    a->observed[p] = total;
    if (total < a->before) /* lost a pre-registered keyword: bug */
      return (void *)1;
    /* exercise the lock-free fail-chain walk on the final cursor */
    (void)acx_get_match_state(a->m, s, 0);
  }
  return (void *)0;
}

static void
stress_concurrent(void) {
  enum { NTHREADS = 4, ALPHA = 4, PRE = 200, ONLINE = 800, BULK = 12000 };
  Machine *m = acx_create(1);
  srand(7);
  int32_t *text = malloc(STRESS_TEXT * sizeof(int32_t));
  for (int i = 0; i < STRESS_TEXT; i++)
    text[i] = 1 + rand() % ALPHA;

  int32_t kw[8];
  for (int i = 0; i < PRE; i++) {
    int len = 2 + rand() % 5;
    int32_t s = 0;
    for (int j = 0; j < len; j++) {
      kw[j] = 1 + rand() % ALPHA;
      s = acx_insert_letter(m, s, kw[j]);
    }
    acx_insert_end(m, s);
  }
  int32_t s0 = 0;
  int64_t before = acx_match_bulk(m, &s0, text, STRESS_TEXT);
  assert(before > 0);

  pthread_t tids[NTHREADS];
  StressArg args[NTHREADS];
  int64_t *obs = calloc((size_t)NTHREADS * STRESS_PASSES, sizeof(int64_t));
  for (int t = 0; t < NTHREADS; t++) {
    args[t].m = m;
    args[t].text = text;
    args[t].before = before;
    args[t].observed = obs + (size_t)t * STRESS_PASSES;
    int rc = pthread_create(&tids[t], 0, stress_matcher, &args[t]);
    assert(rc == 0);
  }

  /* concurrent registration: per-letter (Meyer per-edge maintenance) ... */
  for (int i = 0; i < ONLINE; i++) {
    int len = 2 + rand() % 6;
    int32_t s = 0;
    for (int j = 0; j < len; j++)
      s = acx_insert_letter(m, s, 1 + rand() % ALPHA);
    acx_insert_end(m, s);
  }
  /* ... and one bulk batch big enough for the deferred rebuild + rehash */
  int32_t *letters = malloc((size_t)BULK * 5 * sizeof(int32_t));
  int64_t *offsets = malloc(((size_t)BULK + 1) * sizeof(int64_t));
  for (int i = 0; i < BULK * 5; i++)
    letters[i] = 1 + rand() % 26; /* wider alphabet: grows the trie */
  for (int i = 0; i <= BULK; i++)
    offsets[i] = (int64_t)i * 5;
  acx_insert_keywords(m, letters, offsets, BULK, 0, 0);

  for (int t = 0; t < NTHREADS; t++) {
    void *ret;
    pthread_join(tids[t], &ret);
    assert(ret == 0 && "matcher lost a pre-registered keyword");
  }
  int32_t s1 = 0;
  int64_t after = acx_match_bulk(m, &s1, text, STRESS_TEXT);
  assert(after >= before);
  for (int t = 0; t < NTHREADS; t++)
    for (int p = 0; p < STRESS_PASSES; p++) {
      int64_t got = obs[(size_t)t * STRESS_PASSES + p];
      assert(got >= before && got <= after);
    }
  printf("concurrent stress: before=%lld after=%lld (%d passes x %d "
         "threads)\n",
         (long long)before, (long long)after, STRESS_PASSES, NTHREADS);
  free(obs);
  free(letters);
  free(offsets);
  free(text);
  acx_release(m);
}

int
main(void) {
  exercise(1);
  exercise(0);
  stress_concurrent();
  /* bulk path large enough to trigger the deferred rebuild */
  Machine *m = acx_create(1);
  enum { N = 2000, K = 5 };
  int32_t *letters = malloc(N * K * sizeof(int32_t));
  int64_t *offsets = malloc((N + 1) * sizeof(int64_t));
  srand(42);
  for (int i = 0; i < N * K; i++)
    letters[i] = 1 + rand() % 26;
  for (int i = 0; i <= N; i++)
    offsets[i] = (int64_t)i * K;
  acx_insert_keywords(m, letters, offsets, N, 0, 0);
  int32_t s = 0;
  int64_t total = 0;
  for (int i = 0; i < 100000; i++) {
    int32_t letter = 1 + rand() % 26;
    total += acx_match(m, s, letter, &s);
  }
  printf("deferred-bulk machine: %lld states, %lld matches\n",
         (long long)acx_n_states(m), (long long)total);
  free(letters);
  free(offsets);
  acx_release(m);
  printf("acx native tests passed\n");
  return 0;
}
