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
#include <vector>

namespace {

constexpr int32_t kRoot = 0;
constexpr int32_t kNoState = -1;
// Per-state transition storage switches from a sorted vector to a dense
// direct-addressed row once fanout crosses this threshold (the root of a
// large-alphabet machine is the typical case).
constexpr size_t kDenseFanout = 48;

struct Edges {
  // sorted by letter when sparse; dense row indexed by letter when !sparse
  std::vector<std::pair<int32_t, int32_t>> sparse;
  std::vector<int32_t> dense;  // letter -> state (kNoState = absent)
  bool is_dense = false;
  int32_t count = 0;

  int32_t find(int32_t letter) const {
    if (is_dense) {
      if (letter < 0 || static_cast<size_t>(letter) >= dense.size())
        return kNoState;
      return dense[letter];
    }
    auto it = std::lower_bound(
        sparse.begin(), sparse.end(), letter,
        [](const std::pair<int32_t, int32_t>& e, int32_t l) {
          return e.first < l;
        });
    if (it != sparse.end() && it->first == letter) return it->second;
    return kNoState;
  }

  void insert(int32_t letter, int32_t state) {
    if (!is_dense && sparse.size() >= kDenseFanout) {
      int32_t max_letter = letter;
      for (auto& e : sparse) max_letter = std::max(max_letter, e.first);
      dense.assign(static_cast<size_t>(max_letter) * 2 + 2, kNoState);
      for (auto& e : sparse) dense[e.first] = e.second;
      sparse.clear();
      sparse.shrink_to_fit();
      is_dense = true;
    }
    if (is_dense) {
      if (static_cast<size_t>(letter) >= dense.size())
        dense.resize(static_cast<size_t>(letter) * 2 + 2, kNoState);
      dense[letter] = state;
    } else {
      auto it = std::lower_bound(
          sparse.begin(), sparse.end(), letter,
          [](const std::pair<int32_t, int32_t>& e, int32_t l) {
            return e.first < l;
          });
      sparse.insert(it, {letter, state});
    }
    ++count;
  }

  template <typename Fn>
  void for_each(Fn&& fn) const {  // ascending letter order
    if (is_dense) {
      for (size_t l = 0; l < dense.size(); ++l)
        if (dense[l] != kNoState) fn(static_cast<int32_t>(l), dense[l]);
    } else {
      for (auto& e : sparse) fn(e.first, e.second);
    }
  }
};

struct Machine {
  bool incremental;  // true = Meyer 1985, false = AC75 lazy BFS
  std::vector<Edges> transitions;
  std::vector<int32_t> fail;
  std::vector<int32_t> prev_state;
  std::vector<int32_t> prev_letter;
  std::vector<uint8_t> is_end;
  std::vector<int64_t> nb_outputs;
  std::vector<int32_t> depth;
  std::vector<int64_t> kw_rank;
  // Meyer IF = f^-1 sets; each state lives in exactly one IF (its fail's),
  // tracked by if_pos for O(1) swap-removal (ref update_fail_state c:217).
  std::vector<std::vector<int32_t>> inverse_fail;
  std::vector<int32_t> if_pos;
  int64_t nb_sequences = 0;
  int64_t reconstruct = 0;  // AC75 dirty counter (ref c:70)
  int64_t version = 0;
  int32_t max_letter = 0;
  std::mutex token;  // ref machine->token (c:81)

  explicit Machine(bool inc) : incremental(inc) { new_state(); }

  int32_t new_state() {
    int32_t s = static_cast<int32_t>(transitions.size());
    transitions.emplace_back();
    fail.push_back(s == kRoot ? kNoState : kRoot);
    prev_state.push_back(kNoState);
    prev_letter.push_back(0);
    is_end.push_back(0);
    nb_outputs.push_back(0);
    depth.push_back(0);
    kw_rank.push_back(-1);
    inverse_fail.emplace_back();
    if_pos.push_back(-1);
    return s;
  }

  void if_add(int32_t target, int32_t member) {
    if_pos[member] = static_cast<int32_t>(inverse_fail[target].size());
    inverse_fail[target].push_back(member);
  }

  void if_remove(int32_t target, int32_t member) {
    auto& v = inverse_fail[target];
    int32_t pos = if_pos[member];
    int32_t last = v.back();
    v[pos] = last;
    if_pos[last] = pos;
    v.pop_back();
    if_pos[member] = -1;
  }

  // ref state_goto (c:167-192): root LOOP_0 simulated.
  int32_t goto_existing(int32_t state, int32_t letter) const {
    for (;;) {
      int32_t nxt = transitions[state].find(letter);
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
    stack.assign(inverse_fail[n].begin(), inverse_fail[n].end());
    while (!stack.empty()) {
      int32_t x = stack.back();
      stack.pop_back();
      int32_t xprime = transitions[x].find(c);
      if (xprime != kNoState) {
        if_remove(fail[xprime], xprime);
        fail[xprime] = nprime;
        if_add(nprime, xprime);
      } else {
        stack.insert(stack.end(), inverse_fail[x].begin(),
                     inverse_fail[x].end());
      }
    }
  }

  int32_t enter_child(int32_t n, int32_t c, std::vector<int32_t>& scratch) {
    int32_t nprime = new_state();
    transitions[n].insert(c, nprime);
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
    int32_t nxt = transitions[state].find(letter);
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
      stack.insert(stack.end(), inverse_fail[s].begin(),
                   inverse_fail[s].end());
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

  // ref state_fail_state_construct (c:386-417)
  void ensure_fail_states() {
    if (incremental || !reconstruct) return;
    std::lock_guard<std::mutex> lock(token);
    if (!reconstruct) return;
    std::vector<int32_t> queue;
    queue.reserve(transitions.size());
    queue.push_back(kRoot);
    for (size_t head = 0; head < queue.size(); ++head) {
      int32_t r = queue[head];
      transitions[r].for_each([&](int32_t a, int32_t s) {
        queue.push_back(s);
        nb_outputs[s] = is_end[s] ? 1 : 0;  // re-entrant reset (ref c:381)
        complete_fail_state(r, s, a);
      });
    }
    reconstruct = 0;
  }

  // BFS order over the trie (fail[s] always earlier than s by depth).
  void bfs_order(std::vector<int32_t>& order) const {
    order.clear();
    order.reserve(transitions.size());
    order.push_back(kRoot);
    for (size_t head = 0; head < order.size(); ++head) {
      transitions[order[head]].for_each(
          [&](int32_t, int32_t s) { order.push_back(s); });
    }
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
  std::vector<int32_t> scratch, stack;
  for (int64_t i = 0; i < n_keywords; ++i) {
    int32_t state = kRoot;
    for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      int32_t letter = letters[j];
      int32_t nxt = m->transitions[state].find(letter);
      state = (nxt != kNoState) ? nxt : m->enter_child(state, letter, scratch);
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

int64_t acx_match(Machine* m, int32_t state, int32_t letter,
                  int32_t* next_state) {
  m->ensure_fail_states();
  int32_t nxt = m->goto_existing(state, letter);
  *next_state = nxt;
  return m->nb_outputs[nxt];
}

// Streaming bulk match: advances through n letters, returns total match
// count, leaves the final cursor in *state_io.
int64_t acx_match_bulk(Machine* m, int32_t* state_io, const int32_t* letters,
                       int64_t n) {
  m->ensure_fail_states();
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
  return static_cast<int64_t>(m->transitions.size());
}
int64_t acx_nb_sequences(const Machine* m) { return m->nb_sequences; }
int64_t acx_version(const Machine* m) { return m->version; }
int64_t acx_reconstruct(const Machine* m) { return m->reconstruct; }
int32_t acx_max_letter(const Machine* m) { return m->max_letter; }
void acx_ensure_fail_states(Machine* m) { m->ensure_fail_states(); }

// Snapshot of per-state arrays (caller allocates n_states elements each;
// any pointer may be null to skip). Call acx_ensure_fail_states first in
// AC75 mode.
void acx_export_arrays(Machine* m, int32_t* fail, int32_t* prev_state,
                       int32_t* prev_letter, uint8_t* is_end,
                       int32_t* nb_outputs, int32_t* depth,
                       int32_t* kw_rank) {
  size_t S = m->transitions.size();
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
  m->ensure_fail_states();
  std::vector<int32_t> order;
  m->bfs_order(order);
  for (int32_t s : order) {
    int32_t* row = delta + static_cast<int64_t>(s) * V;
    if (s == kRoot) {
      std::memset(row, 0, sizeof(int32_t) * V);
    } else {
      const int32_t* frow = delta + static_cast<int64_t>(m->fail[s]) * V;
      std::memcpy(row, frow, sizeof(int32_t) * V);
    }
    m->transitions[s].for_each([&](int32_t a, int32_t t) {
      if (a < V) row[a] = t;
    });
  }
}

// Trie edge dump in BFS order for Python-side introspection:
// parents/letters/children each sized acx_n_edges().
int64_t acx_n_edges(const Machine* m) {
  return static_cast<int64_t>(m->transitions.size()) - 1;
}

void acx_export_edges(Machine* m, int32_t* parents, int32_t* letters,
                      int32_t* children) {
  std::vector<int32_t> order;
  m->bfs_order(order);
  int64_t e = 0;
  for (int32_t s : order) {
    m->transitions[s].for_each([&](int32_t a, int32_t t) {
      parents[e] = s;
      letters[e] = a;
      children[e] = t;
      ++e;
    });
  }
}

}  // extern "C"
