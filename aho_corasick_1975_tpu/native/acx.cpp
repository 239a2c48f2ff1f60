// acx: native host-side Aho-Corasick automaton core.
//
// From-scratch C++ implementation of the goto/fail/output construction the
// reference C library implements over generic pointers + ordered maps
// (/root/reference/aho_corasick.c). Differences are deliberate and
// TPU-first (see SURVEY.md §7):
//   * the alphabet is dense int32 letter ids (the Python vocab layer resolves
//     generic signs / comparators once at registration, not per operation);
//   * states are structure-of-arrays indexed by creation-order id (ids match
//     the reference's debug UIDs, c:61);
//   * both construction modes are runtime-selectable, not compile-time:
//     Meyer-1985 incremental fail maintenance (ref c:194-265) and AC75 lazy
//     BFS reconstruction (ref c:365-418);
//   * emission of the dense fail-collapsed transition table for device scans
//     happens here (BFS row-copy), replacing the reference's runtime
//     state_goto fail-chain walk (c:167-192).
//
// Exposed as a flat C ABI consumed via ctypes (core/native.py); no Python.h
// dependency.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int32_t kRoot = 0;
constexpr int32_t kNoState = -1;
// All trie edges live in ONE open-addressing hash table keyed by
// (state, letter) — no per-state containers, no per-edge allocations.
// Profiling showed per-state sorted vectors cost ~1us/char in allocator
// and memmove traffic; the flat hash inserts and finds in O(1) with one
// or two cache misses, which is what a 2.5M-state dictionary build needs.
constexpr uint32_t kLetterBits = 21;  // vocab ids are dense; 2M letters max
constexpr uint64_t kEmptyKey = ~0ULL;

inline uint64_t edge_key(int32_t state, int32_t letter) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(state)) << kLetterBits) |
         static_cast<uint32_t>(letter);
}

inline uint64_t mix64(uint64_t x) {  // splitmix64 finalizer
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

struct EdgeMap {
  // 16-byte key+value slots: one cache line touch per probe (split key/val
  // arrays cost a second miss per lookup — measurable on multi-million-
  // state builds).
  void prefetch(int32_t state, int32_t letter) const;
  struct Slot {
    uint64_t key;
    int32_t val;
    int32_t pad;
  };
  std::vector<Slot> slots;
  size_t count = 0;
  size_t mask = 0;

  EdgeMap() { rehash(1 << 16); }

  void rehash(size_t cap) {
    std::vector<Slot> old = std::move(slots);
    slots.assign(cap, Slot{kEmptyKey, 0, 0});
    mask = cap - 1;
    for (const Slot& s : old) {
      if (s.key == kEmptyKey) continue;
      size_t j = mix64(s.key) & mask;
      while (slots[j].key != kEmptyKey) j = (j + 1) & mask;
      slots[j] = s;
    }
  }

  int32_t find(int32_t state, int32_t letter) const {
    uint64_t k = edge_key(state, letter);
    size_t j = mix64(k) & mask;
    for (;;) {
      const Slot& s = slots[j];
      if (s.key == k) return s.val;
      if (s.key == kEmptyKey) return -1;
      j = (j + 1) & mask;
    }
  }

  void insert(int32_t state, int32_t letter, int32_t child) {
    if ((count + 1) * 10 >= (mask + 1) * 7) rehash((mask + 1) * 2);
    uint64_t k = edge_key(state, letter);
    size_t j = mix64(k) & mask;
    while (slots[j].key != kEmptyKey) j = (j + 1) & mask;
    slots[j] = Slot{k, child, 0};
    ++count;
  }

  void reserve_edges(size_t n) {
    size_t need = 1;
    while (need * 7 < (n + count) * 10) need <<= 1;
    if (need > mask + 1) rehash(need);
  }
};

inline void EdgeMap::prefetch(int32_t state, int32_t letter) const {
  __builtin_prefetch(&slots[mix64(edge_key(state, letter)) & mask]);
}

struct Machine {
  bool incremental;  // true = Meyer 1985, false = AC75 lazy BFS
  EdgeMap edges;
  size_t n_states_ = 0;
  std::vector<int32_t> fail;
  std::vector<int32_t> prev_state;
  std::vector<int32_t> prev_letter;
  std::vector<uint8_t> is_end;
  std::vector<int64_t> nb_outputs;
  std::vector<int32_t> depth;
  std::vector<int64_t> kw_rank;
  // Meyer IF = f^-1 record (ref c:62-64) as intrusive doubly-linked lists:
  // every state is a member of exactly one IF set (its fail state's), so
  // three flat arrays give O(1) add/remove with zero allocation —
  // if_head[s] starts IF[s]; if_next/if_prev link members.
  std::vector<int32_t> if_head;
  std::vector<int32_t> if_next;
  std::vector<int32_t> if_prev;
  int64_t nb_sequences = 0;
  int64_t reconstruct = 0;  // AC75 dirty counter (ref c:70)
  int64_t version = 0;
  int32_t max_letter = 0;
  std::mutex token;  // ref machine->token (c:81)
  // Concurrency model: the reference leaves its match path lock-free
  // (README.md:364), which is safe there only because its trie nodes are
  // individually allocated and pointer-stable. Here the edge hash REHASHES
  // (memory moves), so lock-free readers would crash — matchers therefore
  // take the machine lock too. Uncontended lock cost is ~20ns per call
  // (bulk match amortizes it over the whole stream); the TPU scan path
  // never touches this lock at all (immutable snapshots).

  explicit Machine(bool inc) : incremental(inc) { new_state(); }

  int32_t new_state() {
    int32_t s = static_cast<int32_t>(n_states_++);
    fail.push_back(s == kRoot ? kNoState : kRoot);
    prev_state.push_back(kNoState);
    prev_letter.push_back(0);
    is_end.push_back(0);
    nb_outputs.push_back(0);
    depth.push_back(0);
    kw_rank.push_back(-1);
    if_head.push_back(kNoState);
    if_next.push_back(kNoState);
    if_prev.push_back(kNoState);
    return s;
  }

  void if_add(int32_t target, int32_t member) {
    int32_t h = if_head[target];
    if_next[member] = h;
    if_prev[member] = kNoState;
    if (h != kNoState) if_prev[h] = member;
    if_head[target] = member;
  }

  void if_remove(int32_t target, int32_t member) {
    int32_t p = if_prev[member], nx = if_next[member];
    if (p != kNoState) if_next[p] = nx; else if_head[target] = nx;
    if (nx != kNoState) if_prev[nx] = p;
    if_next[member] = if_prev[member] = kNoState;
  }

  // ref state_goto (c:167-192): root LOOP_0 simulated.
  int32_t goto_existing(int32_t state, int32_t letter) const {
    for (;;) {
      int32_t nxt = edges.find(state, letter);
      if (nxt != kNoState) return nxt;
      if (state == kRoot) return kRoot;
      state = fail[state];
    }
  }

  // ref complete_fail_state (c:194-208)
  void complete_fail_state(int32_t r, int32_t s, int32_t a) {
    fail[s] = (r == kRoot) ? kRoot : goto_existing(fail[r], a);
    nb_outputs[s] += nb_outputs[fail[s]];
  }

  // ref complete_inverse_one_ifs + update_fail_state (c:211-239), iterative.
  void complete_inverse(int32_t n, int32_t nprime, int32_t c,
                        std::vector<int32_t>& stack) {
    // Snapshot members onto the stack before visiting: a visited x' gets
    // unlinked from the very list being expanded when its old fail equals
    // a node under traversal, which live iteration would not survive.
    stack.clear();
    for (int32_t x = if_head[n]; x != kNoState; x = if_next[x])
      stack.push_back(x);
    while (!stack.empty()) {
      int32_t x = stack.back();
      stack.pop_back();
      int32_t xprime = edges.find(x, c);
      if (xprime != kNoState) {
        if_remove(fail[xprime], xprime);
        fail[xprime] = nprime;
        if_add(nprime, xprime);
      } else {
        for (int32_t y = if_head[x]; y != kNoState; y = if_next[y])
          stack.push_back(y);
      }
    }
  }

  int32_t enter_child(int32_t n, int32_t c, std::vector<int32_t>& scratch) {
    int32_t nprime = new_state();
    edges.insert(n, c, nprime);
    prev_state[nprime] = n;
    prev_letter[nprime] = c;
    depth[nprime] = depth[n] + 1;
    max_letter = std::max(max_letter, c);
    if (incremental) {
      complete_fail_state(n, nprime, c);
      if_add(fail[nprime], nprime);
      complete_inverse(n, nprime, c, scratch);
    }
    return nprime;
  }

  int32_t insert_letter(int32_t state, int32_t letter) {
    std::lock_guard<std::mutex> lock(token);
    int32_t nxt = edges.find(state, letter);
    if (nxt != kNoState) return nxt;
    std::vector<int32_t> scratch;
    return enter_child(state, letter, scratch);
  }

  // ref enter_output (c:330-338): Meyer propagates over the IF closure.
  void enter_output(int32_t n, std::vector<int32_t>& stack) {
    if (!incremental) {
      nb_outputs[n] += 1;
      return;
    }
    stack.assign(1, n);
    while (!stack.empty()) {
      int32_t s = stack.back();
      stack.pop_back();
      nb_outputs[s] += 1;
      for (int32_t y = if_head[s]; y != kNoState; y = if_next[y])
        stack.push_back(y);
    }
  }

  // returns 1 if the keyword is new (ref acm_insert_end_of_keyword c:340-363)
  int32_t insert_end(int32_t state) {
    std::lock_guard<std::mutex> lock(token);
    ++version;
    if (is_end[state]) return 0;
    std::vector<int32_t> stack;
    enter_output(state, stack);
    is_end[state] = 1;
    kw_rank[state] = nb_sequences++;
    ++reconstruct;
    return 1;
  }

  // Per-state child ranges reconstructed from prev_state/prev_letter by
  // counting sort (parent-major, letter order within a parent irrelevant
  // to construction; export sorts in Python where comparator order lives).
  // child_list holds state ids; child_start[s]..child_start[s+1] delimit
  // the children of s.
  void build_children(std::vector<int32_t>& child_start,
                      std::vector<int32_t>& child_list) const {
    size_t S = n_states_;
    child_start.assign(S + 1, 0);
    for (size_t s = 1; s < S; ++s) ++child_start[prev_state[s] + 1];
    for (size_t s = 0; s < S; ++s) child_start[s + 1] += child_start[s];
    child_list.assign(S ? S - 1 : 0, 0);
    std::vector<int32_t> cursor(child_start.begin(), child_start.end() - 1);
    for (size_t s = 1; s < S; ++s)
      child_list[cursor[prev_state[s]]++] = static_cast<int32_t>(s);
  }

  // Depth-ascending order (fail[s] is always strictly shallower than s).
  void depth_order(std::vector<int32_t>& order) const {
    size_t S = n_states_;
    int32_t maxd = 0;
    for (size_t s = 0; s < S; ++s) maxd = std::max(maxd, depth[s]);
    std::vector<int32_t> bucket_start(maxd + 2, 0);
    for (size_t s = 0; s < S; ++s) ++bucket_start[depth[s] + 1];
    for (int32_t d = 0; d <= maxd; ++d) bucket_start[d + 1] += bucket_start[d];
    order.assign(S, 0);
    std::vector<int32_t> cursor(bucket_start.begin(), bucket_start.end() - 1);
    for (size_t s = 0; s < S; ++s)
      order[cursor[depth[s]]++] = static_cast<int32_t>(s);
  }

  // Full fail/output reconstruction + Meyer IF-set rebuild — used by the
  // deferred bulk-insert path. Equivalent to incremental maintenance by
  // the Meyer==AC75 equivalence (tests/test_meyer_equivalence.py); the
  // machine lock is held for the whole bulk call, so no intermediate
  // state is observable through the API. Caller must hold the lock.
  void rebuild_all() {
    std::vector<int32_t> order;
    depth_order(order);
    for (int32_t s : order) {
      if (s == kRoot) continue;
      nb_outputs[s] = is_end[s] ? 1 : 0;
      complete_fail_state(prev_state[s], s, prev_letter[s]);
    }
    if (incremental) {
      size_t S = n_states_;
      std::fill(if_head.begin(), if_head.end(), kNoState);
      std::fill(if_next.begin(), if_next.end(), kNoState);
      std::fill(if_prev.begin(), if_prev.end(), kNoState);
      for (size_t s = 1; s < S; ++s)
        if_add(fail[s], static_cast<int32_t>(s));
    }
    reconstruct = 0;
  }

  // ref state_fail_state_construct (c:386-417); BFS == depth order here.
  // Caller must hold the lock.
  void ensure_fail_states_locked() {
    if (incremental || !reconstruct) return;
    std::vector<int32_t> order;
    depth_order(order);
    for (int32_t s : order) {
      if (s == kRoot) continue;
      nb_outputs[s] = is_end[s] ? 1 : 0;  // re-entrant reset (ref c:381)
      complete_fail_state(prev_state[s], s, prev_letter[s]);
    }
    reconstruct = 0;
  }

  void ensure_fail_states() {
    if (incremental || !reconstruct) return;  // double-checked (ref c:389)
    std::lock_guard<std::mutex> lock(token);
    ensure_fail_states_locked();
  }
};

}  // namespace

extern "C" {

Machine* acx_create(int incremental) { return new Machine(incremental != 0); }

void acx_release(Machine* m) { delete m; }

int32_t acx_insert_letter(Machine* m, int32_t state, int32_t letter) {
  return m->insert_letter(state, letter);
}

int32_t acx_insert_end(Machine* m, int32_t state) {
  return m->insert_end(state);
}

// Bulk keyword insertion: letters = concatenated keyword letter ids,
// offsets[i]..offsets[i+1] delimit keyword i. end_states[i] receives the
// end state; new_flags[i] gets 1 if the keyword was new.
void acx_insert_keywords(Machine* m, const int32_t* letters,
                         const int64_t* offsets, int64_t n_keywords,
                         int32_t* end_states, int8_t* new_flags) {
  std::lock_guard<std::mutex> lock(m->token);
  // Large Meyer batches: skip per-edge incremental fail maintenance and
  // rebuild everything once at the end (identical result, far cheaper).
  bool deferred = m->incremental && offsets[n_keywords] > 4096;
  if (deferred) m->incremental = false;
  m->edges.reserve_edges(static_cast<size_t>(offsets[n_keywords]));
  size_t reserve_states = m->n_states_ + offsets[n_keywords];
  m->fail.reserve(reserve_states);
  m->prev_state.reserve(reserve_states);
  m->prev_letter.reserve(reserve_states);
  m->is_end.reserve(reserve_states);
  m->nb_outputs.reserve(reserve_states);
  m->depth.reserve(reserve_states);
  m->kw_rank.reserve(reserve_states);
  m->if_head.reserve(reserve_states);
  m->if_next.reserve(reserve_states);
  m->if_prev.reserve(reserve_states);
  std::vector<int32_t> scratch, stack;
  // Two-phase waves: phase A walks a wave of keywords READ-ONLY through
  // the existing trie with software-pipelined prefetching (keywords are
  // independent, so their probe chains overlap and hide hash-miss
  // latency); phase B completes each keyword IN ORDER — re-probing past
  // the phase-A endpoint first, since an earlier keyword in the same wave
  // may have created a shared prefix — so state ids and ranks are
  // assigned in exactly the sequential order (the determinism contract
  // behind backend parity and reference-dump parity).
  constexpr int64_t kWave = 64;
  int32_t endpoint[kWave];
  int64_t resume[kWave];
  for (int64_t wave = 0; wave < n_keywords; wave += kWave) {
    int64_t wn = std::min(kWave, n_keywords - wave);
    // phase A: interleaved read-only prefix walks
    int64_t pos[kWave];
    bool done[kWave];
    int64_t remaining = wn;
    for (int64_t w = 0; w < wn; ++w) {
      endpoint[w] = kRoot;
      pos[w] = offsets[wave + w];
      done[w] = pos[w] >= offsets[wave + w + 1];
      if (done[w]) --remaining;
      else m->edges.prefetch(kRoot, letters[pos[w]]);
    }
    while (remaining > 0) {
      for (int64_t w = 0; w < wn; ++w) {
        if (done[w]) continue;
        int32_t nxt = m->edges.find(endpoint[w], letters[pos[w]]);
        if (nxt == kNoState) {
          done[w] = true;
          --remaining;
          continue;
        }
        endpoint[w] = nxt;
        if (++pos[w] >= offsets[wave + w + 1]) {
          done[w] = true;
          --remaining;
        } else {
          m->edges.prefetch(endpoint[w], letters[pos[w]]);
        }
      }
    }
    for (int64_t w = 0; w < wn; ++w)
      resume[w] = pos[w];
    // phase B: in-order completion (finds may extend past the phase-A
    // endpoint through nodes created for earlier keywords in this wave)
    for (int64_t w = 0; w < wn; ++w) {
      int64_t i = wave + w;
      int32_t state = endpoint[w];
      for (int64_t j = resume[w]; j < offsets[i + 1]; ++j) {
        int32_t letter = letters[j];
        int32_t nxt = m->edges.find(state, letter);
        state = (nxt != kNoState) ? nxt
                                  : m->enter_child(state, letter, scratch);
      }
      ++m->version;
      int8_t fresh = 0;
      if (state != kRoot && !m->is_end[state]) {
        m->enter_output(state, stack);
        m->is_end[state] = 1;
        m->kw_rank[state] = m->nb_sequences++;
        ++m->reconstruct;
        fresh = 1;
      }
      if (end_states) end_states[i] = state;
      if (new_flags) new_flags[i] = fresh;
    }
  }
  if (deferred) {
    m->incremental = true;
    m->rebuild_all();
  }
}

// Creation-order edge replay (checkpoint restore, utils/checkpoint.py):
// recreates state s as exactly id s from its (parent, letter) backlink —
// the whole trie in ONE FFI call instead of one insert_letter round-trip
// per state. Returns 0 on success, else the id of the first state whose
// recreated id diverged (corrupt checkpoint). Same deferred-rebuild trick
// as acx_insert_keywords: for big Meyer machines the per-edge incremental
// fail maintenance is skipped and fail/IF are rebuilt once at the end
// (identical result by the Meyer==AC75 equivalence); output counts are
// correct because end marking (acx_insert_ends) happens AFTER this call
// and propagates over the rebuilt IF sets.
int64_t acx_restore_machine(Machine* m, const int32_t* prev_state,
                            const int32_t* prev_letter,
                            const uint8_t* is_end, const int32_t* kw_rank,
                            int64_t S) {
  std::lock_guard<std::mutex> lock(m->token);
  bool was_inc = m->incremental;
  m->incremental = false;  // skip per-edge fail/IF maintenance entirely
  m->edges.reserve_edges(static_cast<size_t>(S));
  size_t reserve_states = m->n_states_ + static_cast<size_t>(S);
  m->fail.reserve(reserve_states);
  m->prev_state.reserve(reserve_states);
  m->prev_letter.reserve(reserve_states);
  m->is_end.reserve(reserve_states);
  m->nb_outputs.reserve(reserve_states);
  m->depth.reserve(reserve_states);
  m->kw_rank.reserve(reserve_states);
  m->if_head.reserve(reserve_states);
  m->if_next.reserve(reserve_states);
  m->if_prev.reserve(reserve_states);
  std::vector<int32_t> scratch;
  for (int64_t s = 1; s < S; ++s) {
    int32_t nxt = m->edges.find(prev_state[s], prev_letter[s]);
    if (nxt == kNoState)
      nxt = m->enter_child(prev_state[s], prev_letter[s], scratch);
    if (nxt != s) {
      m->incremental = was_inc;
      if (was_inc) m->rebuild_all();
      return s;
    }
  }
  // Adopt end flags and ranks verbatim (ranks are a 0..n-1 permutation in
  // a valid checkpoint); output counts come from the single rebuild below
  // (nb_outputs[s] = is_end[s] + nb_outputs[fail[s]] in depth order) —
  // not from per-end IF-closure propagation, which dominated the replay
  // at pod-dictionary scale.
  int64_t n_seq = 0;
  for (int64_t s = 0; s < S; ++s) {
    if (!is_end[s]) continue;
    m->is_end[s] = 1;
    m->kw_rank[s] = kw_rank[s];
    ++n_seq;
    ++m->reconstruct;
  }
  m->nb_sequences = n_seq;
  m->incremental = was_inc;
  if (was_inc) m->rebuild_all();  // fail + IF + output counts, one pass
  // AC75 machines leave `reconstruct` dirty: the lazy BFS before the next
  // match recomputes fail/output exactly like a live-built machine.
  return 0;
}

int64_t acx_match(Machine* m, int32_t state, int32_t letter,
                  int32_t* next_state) {
  std::lock_guard<std::mutex> lock(m->token);
  m->ensure_fail_states_locked();
  int32_t nxt = m->goto_existing(state, letter);
  *next_state = nxt;
  return m->nb_outputs[nxt];
}

// Streaming bulk match: advances through n letters, returns total match
// count, leaves the final cursor in *state_io.
int64_t acx_match_bulk(Machine* m, int32_t* state_io, const int32_t* letters,
                       int64_t n) {
  std::lock_guard<std::mutex> lock(m->token);
  m->ensure_fail_states_locked();
  int32_t s = *state_io;
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    s = m->goto_existing(s, letters[i]);
    total += m->nb_outputs[s];
  }
  *state_io = s;
  return total;
}

// ref acm_get_match chain walk (c:457-466); returns the index-th
// end-of-keyword state along the fail chain (kNoState if out of bounds).
int32_t acx_get_match_state(Machine* m, int32_t state, int64_t index) {
  std::lock_guard<std::mutex> lock(m->token);
  if (index >= m->nb_outputs[state]) return kNoState;
  int64_t i = 0;
  for (;;) {
    while (!m->is_end[state]) state = m->fail[state];
    if (i == index) return state;
    state = m->fail[state];
    ++i;
  }
}

int64_t acx_n_states(const Machine* m) {
  return static_cast<int64_t>(m->n_states_);
}
int64_t acx_nb_sequences(const Machine* m) { return m->nb_sequences; }
int64_t acx_version(const Machine* m) { return m->version; }
int64_t acx_reconstruct(const Machine* m) { return m->reconstruct; }
int32_t acx_max_letter(const Machine* m) { return m->max_letter; }
void acx_ensure_fail_states(Machine* m) { m->ensure_fail_states(); }

// Snapshot of per-state arrays (caller allocates n_states elements each;
// any pointer may be null to skip). Call acx_ensure_fail_states first in
// AC75 mode.
// n_limit caps the export to the caller's buffer size (state count can
// grow between sizing the buffers and this call under concurrency).
void acx_export_arrays(Machine* m, int64_t n_limit, int32_t* fail,
                       int32_t* prev_state, int32_t* prev_letter,
                       uint8_t* is_end, int32_t* nb_outputs, int32_t* depth,
                       int32_t* kw_rank) {
  std::lock_guard<std::mutex> lock(m->token);
  size_t S = std::min<size_t>(m->n_states_, static_cast<size_t>(n_limit));
  for (size_t s = 0; s < S; ++s) {
    if (fail) fail[s] = (m->fail[s] == kNoState) ? kRoot : m->fail[s];
    if (prev_state) prev_state[s] = m->prev_state[s];
    if (prev_letter) prev_letter[s] = m->prev_letter[s];
    if (is_end) is_end[s] = m->is_end[s];
    if (nb_outputs) nb_outputs[s] = static_cast<int32_t>(m->nb_outputs[s]);
    if (depth) depth[s] = m->depth[s];
    if (kw_rank) kw_rank[s] = static_cast<int32_t>(m->kw_rank[s]);
  }
}

// Dense fail-collapsed transition table emission (the device upload):
// delta[s*V + a] = goto(s, a) with fail links resolved. BFS row-copy —
// fail[s] is always emitted before s.
void acx_emit_delta(Machine* m, int32_t V, int32_t* delta) {
  std::lock_guard<std::mutex> lock(m->token);
  m->ensure_fail_states_locked();
  std::vector<int32_t> order, child_start, child_list;
  m->depth_order(order);
  m->build_children(child_start, child_list);
  // Rows at equal depth are independent (each copies its fail row, which
  // is strictly shallower), so emit depth level by depth level with the
  // rows of a level split across threads — table emission is memcpy-bound
  // and parallelizes nearly linearly.
  auto emit_row = [&](int32_t s) {
    int32_t* row = delta + static_cast<int64_t>(s) * V;
    if (s == kRoot) {
      std::memset(row, 0, sizeof(int32_t) * V);
    } else {
      const int32_t* frow = delta + static_cast<int64_t>(m->fail[s]) * V;
      std::memcpy(row, frow, sizeof(int32_t) * V);
    }
    for (int32_t e = child_start[s]; e < child_start[s + 1]; ++e) {
      int32_t child = child_list[e];
      if (m->prev_letter[child] < V) row[m->prev_letter[child]] = child;
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  size_t n_threads = hw >= 4 ? hw / 2 : (hw ? hw : 1);
  size_t S = order.size();
  size_t level_start = 0;
  while (level_start < S) {
    int32_t d = m->depth[order[level_start]];
    size_t level_end = level_start;
    while (level_end < S && m->depth[order[level_end]] == d) ++level_end;
    size_t n = level_end - level_start;
    if (n < 4096 || n_threads <= 1) {
      for (size_t i = level_start; i < level_end; ++i) emit_row(order[i]);
    } else {
      size_t per = (n + n_threads - 1) / n_threads;
      std::vector<std::thread> workers;
      for (size_t t = 0; t < n_threads; ++t) {
        size_t lo = level_start + t * per;
        size_t hi = std::min(level_end, lo + per);
        if (lo >= hi) break;
        workers.emplace_back([&, lo, hi] {
          for (size_t i = lo; i < hi; ++i) emit_row(order[i]);
        });
      }
      for (auto& w : workers) w.join();
    }
    level_start = level_end;
  }
}

// Fail-chain emit lists as CSR (the device-side replacement for
// acm_get_match's runtime fail-chain walk, reference c:457-466): for every
// state, the end-of-keyword states along its fail chain, self (longest)
// first. emit_start is the caller-computed exclusive prefix sum of
// nb_outputs (n_limit+1 entries, sized from the SNAPSHOT the caller
// exported earlier); emit_state (emit_start[n_limit] entries) is filled
// here. Depth order guarantees emit_state[fail[s]]'s list is final before
// s copies it — same argument as acx_emit_delta's row copies.
//
// Every write is clamped to the caller's CSR geometry (n_limit states,
// per-state slot widths from emit_start): if the builder advanced between
// the snapshot export and this call — only possible when bypassing the
// Machine-level lock — the output may be stale but never out of bounds.
void acx_emit_csr(Machine* m, int64_t n_limit, const int32_t* emit_start,
                  int32_t* emit_state) {
  std::lock_guard<std::mutex> lock(m->token);
  m->ensure_fail_states_locked();
  std::vector<int32_t> order;
  m->depth_order(order);
  for (int32_t s : order) {
    if (s >= n_limit) continue;
    int64_t slot = emit_start[s + 1] - emit_start[s];
    if (slot <= 0) continue;
    int64_t n = std::min<int64_t>(m->nb_outputs[s], slot);
    int32_t base = emit_start[s];
    int32_t f = (m->fail[s] == kNoState) ? kRoot : m->fail[s];
    int64_t fslot = (f < n_limit) ? emit_start[f + 1] - emit_start[f] : 0;
    int64_t own = m->is_end[s] ? 1 : 0;
    if (own) emit_state[base] = s;
    int64_t n_copy = std::min<int64_t>(n - own, fslot);
    if (n_copy > 0)
      std::memcpy(emit_state + base + own, emit_state + emit_start[f],
                  sizeof(int32_t) * n_copy);
    // Stale-geometry remainder (unreachable under the Machine lock):
    // fill with s so every slot the snapshot's nb_outputs covers holds a
    // valid state id.
    for (int64_t i = own + std::max<int64_t>(n_copy, 0); i < slot; ++i)
      emit_state[base + i] = s;
  }
}

// Trie edge dump in BFS order for Python-side introspection:
// parents/letters/children each sized acx_n_edges().
int64_t acx_n_edges(const Machine* m) {
  return static_cast<int64_t>(m->n_states_) - 1;
}

// n_limit caps the export to the caller's buffer size (see
// acx_export_arrays).
void acx_export_edges(Machine* m, int64_t n_limit, int32_t* parents,
                      int32_t* letters, int32_t* children) {
  std::lock_guard<std::mutex> lock(m->token);
  // Every non-root state has exactly one incoming edge.
  size_t S = std::min<size_t>(m->n_states_,
                              static_cast<size_t>(n_limit) + 1);
  int64_t e = 0;
  for (size_t s = 1; s < S; ++s, ++e) {
    parents[e] = m->prev_state[s];
    letters[e] = m->prev_letter[s];
    children[e] = static_cast<int32_t>(s);
  }
}

// Keyword letters of the state's incoming path, written backwards-then-
// reversed into buf (cap letters max); returns the keyword length.
int64_t acx_keyword_letters(Machine* m, int32_t state, int32_t* buf,
                            int64_t cap) {
  std::lock_guard<std::mutex> lock(m->token);
  int64_t n = 0;
  for (int32_t s = state; s != kRoot && m->prev_state[s] != kNoState;
       s = m->prev_state[s])
    ++n;
  int64_t i = n < cap ? n : cap;
  for (int32_t s = state; i > 0 && m->prev_state[s] != kNoState;
       s = m->prev_state[s])
    buf[--i] = m->prev_letter[s];
  return n;
}

int64_t acx_kw_rank(Machine* m, int32_t state) {
  std::lock_guard<std::mutex> lock(m->token);
  return m->kw_rank[state];
}

void acx_set_version(Machine* m, int64_t v) {
  std::lock_guard<std::mutex> lock(m->token);
  m->version = v;
}

// Largest representable dense letter id (edge_key packs letters in
// kLetterBits bits; callers must reject larger ids).
int32_t acx_max_letter_id(void) { return (1 << kLetterBits) - 1; }

// k-gram composition of a fail-collapsed dense table into the packed
// stepped scan table (ops/multistep.py):
//   out[s, c_1..c_k] = (m_k << count_bits) | sum_i nb[m_i],
//   m_0 = s, m_i = delta[m_{i-1}*V + c_i].
// Standalone (no Machine): operates on the arrays emitted by
// acx_emit_delta/acx_export_arrays. Threaded over contiguous state
// ranges — this is the cold-start analogue of acx_emit_delta's
// threading; the numpy composition stays as fallback and test oracle.
static void compose_rec(const int32_t* delta, const int32_t* nb, int32_t V,
                        int32_t k_left, int32_t m, int32_t cnt,
                        int32_t count_bits, int32_t** out) {
  const int32_t* drow = delta + static_cast<int64_t>(m) * V;
  if (k_left == 1) {
    int32_t* o = *out;
    for (int32_t c = 0; c < V; ++c) {
      int32_t t = drow[c];
      o[c] = (t << count_bits) | (cnt + nb[t]);
    }
    *out += V;
    return;
  }
  for (int32_t c = 0; c < V; ++c) {
    int32_t t = drow[c];
    compose_rec(delta, nb, V, k_left - 1, t, cnt + nb[t], count_bits, out);
  }
}

void acx_compose_pack(const int32_t* delta, const int32_t* nb, int64_t S,
                      int32_t V, int32_t k, int32_t count_bits,
                      int32_t* out) {
  int64_t Vk = 1;
  for (int32_t i = 0; i < k; ++i) Vk *= V;
  unsigned hw = std::thread::hardware_concurrency();
  size_t n_threads = hw >= 4 ? hw / 2 : (hw ? hw : 1);
  if (S < 4096 || n_threads <= 1) {
    int32_t* o = out;
    for (int64_t s = 0; s < S; ++s)
      compose_rec(delta, nb, V, k, static_cast<int32_t>(s), 0, count_bits,
                  &o);
    return;
  }
  size_t per = (static_cast<size_t>(S) + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  for (size_t t = 0; t < n_threads; ++t) {
    size_t lo = t * per;
    size_t hi = std::min<size_t>(lo + per, static_cast<size_t>(S));
    if (lo >= hi) break;
    workers.emplace_back([=] {
      int32_t* o = out + static_cast<int64_t>(lo) * Vk;
      for (size_t s = lo; s < hi; ++s)
        compose_rec(delta, nb, V, k, static_cast<int32_t>(s), 0, count_bits,
                    &o);
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
