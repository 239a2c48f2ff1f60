/* Minimal stand-in for the `minimaps` ordered-map library the reference
 * links against (not vendored there; interface reconstructed from the
 * reference's call sites — see SURVEY.md §1-L1). Used ONLY to compile the
 * unmodified reference sources into a conformance oracle; performance is
 * irrelevant here, correctness of the documented semantics is everything.
 *
 * Semantics implemented:
 *  - ordered by the user comparator over keys (get_key(data), or data
 *    itself when get_key is null);
 *  - map_insert_data returns nonzero on success (unique keys);
 *  - map_find_key applies the operator to each element whose key compares
 *    equal, returns the match count; operator returning 0 stops the walk;
 *    *remove = 1 unlinks the visited element;
 *  - map_traverse applies the operator over all elements in key order with
 *    the same stop/remove protocol;
 *  - MAP_GET_ONE stores the element into *(void**)op_arg and stops;
 *    MAP_REMOVE_ALL removes every visited element;
 *    MAP_GENERIC_CMP is memcmp with *(size_t*)cmp_arg bytes.
 */
#ifndef MAP_SHIM_H
#define MAP_SHIM_H

#include <stddef.h>

typedef struct map map;
typedef int (*map_operator) (void *data, void *op_arg, int *remove);
typedef const void *(*map_key_fn) (void *data);
typedef int (*map_cmp_fn) (const void *a, const void *b, const void *arg);

map *map_create (map_key_fn get_key, map_cmp_fn cmp, void *cmp_arg,
                 int unique);
int map_destroy (map *m);
int map_insert_data (map *m, void *data);
size_t map_find_key (map *m, const void *key, map_operator op, void *op_arg,
                     void *r1, void *r2);
size_t map_traverse (map *m, map_operator op, void *op_arg, void *r1,
                     void *r2);

extern const map_operator MAP_GET_ONE;
extern const map_operator MAP_REMOVE_ALL;
extern const map_cmp_fn MAP_GENERIC_CMP;

#endif
