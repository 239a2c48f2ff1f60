/* Sorted singly-linked-list implementation of map.h (see header). */
#include "map.h"

#include <stdlib.h>
#include <string.h>

struct node {
  void *data;
  struct node *next;
};

struct map {
  struct node *head;
  map_key_fn get_key;
  map_cmp_fn cmp;
  void *cmp_arg;
  int unique;
};

static const void *
key_of (const map *m, void *data) {
  return m->get_key ? m->get_key (data) : data;
}

map *
map_create (map_key_fn get_key, map_cmp_fn cmp, void *cmp_arg, int unique) {
  map *m = calloc (1, sizeof (*m));
  if (!m)
    return 0;
  m->get_key = get_key;
  m->cmp = cmp;
  m->cmp_arg = cmp_arg;
  m->unique = unique;
  return m;
}

int
map_destroy (map *m) {
  if (!m)
    return 0;
  struct node *n = m->head;
  while (n) {
    struct node *next = n->next;
    free (n);
    n = next;
  }
  free (m);
  return 1;
}

int
map_insert_data (map *m, void *data) {
  const void *key = key_of (m, data);
  struct node **link = &m->head;
  while (*link) {
    int c = m->cmp (key_of (m, (*link)->data), key, m->cmp_arg);
    if (c > 0)
      break;
    if (c == 0 && m->unique)
      return 0; /* duplicate key */
    link = &(*link)->next;
  }
  struct node *n = malloc (sizeof (*n));
  if (!n)
    return 0;
  n->data = data;
  n->next = *link;
  *link = n;
  return 1;
}

size_t
map_find_key (map *m, const void *key, map_operator op, void *op_arg,
              void *r1, void *r2) {
  (void)r1;
  (void)r2;
  size_t count = 0;
  struct node **link = &m->head;
  while (*link) {
    int c = m->cmp (key_of (m, (*link)->data), key, m->cmp_arg);
    if (c > 0)
      break;
    if (c == 0) {
      count++;
      int rm = 0;
      int cont = op ? op ((*link)->data, op_arg, &rm) : 1;
      if (rm) {
        struct node *dead = *link;
        *link = dead->next;
        free (dead);
      } else
        link = &(*link)->next;
      if (!cont)
        break;
    } else
      link = &(*link)->next;
  }
  return count;
}

size_t
map_traverse (map *m, map_operator op, void *op_arg, void *r1, void *r2) {
  /* The reference's Meyer path can remove elements from the very map being
   * traversed (update_fail_state removes from IF[f(x')], which can alias
   * the IF map under traversal). Snapshot the element list first and
   * re-locate each element before visiting, skipping ones that were
   * removed by an earlier visit — elements inserted during the traversal
   * are not visited. */
  (void)r1;
  (void)r2;
  size_t n = 0;
  for (struct node *it = m->head; it; it = it->next)
    n++;
  if (!n)
    return 0;
  void **snap = malloc (n * sizeof (*snap));
  if (!snap)
    return 0;
  size_t i = 0;
  for (struct node *it = m->head; it; it = it->next)
    snap[i++] = it->data;
  size_t count = 0;
  for (i = 0; i < n; i++) {
    struct node **link = &m->head;
    while (*link && (*link)->data != snap[i])
      link = &(*link)->next;
    if (!*link)
      continue; /* removed by an earlier visit */
    count++;
    int rm = 0;
    int cont = op ? op ((*link)->data, op_arg, &rm) : 1;
    if (rm) {
      struct node *dead = *link;
      *link = dead->next;
      free (dead);
    }
    if (!cont)
      break;
  }
  free (snap);
  return count;
}

static int
op_get_one (void *data, void *op_arg, int *remove) {
  (void)remove;
  *(void **)op_arg = data;
  return 0; /* stop */
}

static int
op_remove_all (void *data, void *op_arg, int *remove) {
  (void)data;
  (void)op_arg;
  *remove = 1;
  return 1; /* continue */
}

static int
cmp_generic (const void *a, const void *b, const void *arg) {
  return memcmp (a, b, *(const size_t *)arg);
}

const map_operator MAP_GET_ONE = op_get_one;
const map_operator MAP_REMOVE_ALL = op_remove_all;
const map_cmp_fn MAP_GENERIC_CMP = cmp_generic;
