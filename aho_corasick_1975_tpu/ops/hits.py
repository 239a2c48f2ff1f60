"""Device-side match-position extraction with a bounded hit buffer.

``DenseScanner.find_matches`` ships every per-position state to the host
(O(T) transfer) before decoding — fine for small scans, wasteful at corpus
scale where matches are sparse. This op keeps the scan on device and
returns only the hits:

1. blocked scan computes states and per-position match counts;
2. positions are mapped from block layout back to stream order in-graph;
3. ``jnp.nonzero(size=max_hits)`` extracts up to ``max_hits`` (static
   bound, jit-compatible) hit positions + their states;
4. the true hit total is returned so callers detect buffer overflow and
   retry with a larger bound (or chunk via StreamSession).

This is the two-phase count+extract design from SURVEY.md §7 ("hard
parts": match-output extraction on device), with the prefix-sum replaced
by XLA's fused nonzero.

Two kernel families:

* ``make_blocked_hits*`` — the 1-char dense-table scan (2 sequential
  gathers per symbol). The original retrieval core; still used when no
  packed stepped table exists (and by the MXU small-automaton engine).
* ``make_stepped_hits*`` — retrieval at COUNT-ENGINE speed (VERDICT r3
  #3): the sequential leg is the packed k-gram scan (ONE gather per k
  symbols, exactly the count kernel's recurrence), emitting per gram a
  single packed word (pre_state << count_bits) | gram_count. Grams whose
  count bits are zero contain no match end (the k-gram count is the sum
  of the k per-position counts); only LIVE grams are refined — their k
  per-position states re-derived through the dense table with
  embarrassingly-parallel gathers (no serial dependency, so they run at
  HBM gather bandwidth, not at the sequential-chain rate that bounds the
  scan). Retrieval's sequential cost thus equals count()'s.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def make_blocked_hits(V: int, halo: int, max_hits: int):
    """Returns hits(dflat, nb_out, ids_tm) ->
    (positions[max_hits], states[max_hits], n_hits).

    ids_tm: [L, B] blocked layout (halo warm-up rows excluded from hits).
    positions are stream-order indices (caller trims >= T padding); unused
    buffer slots hold position -1."""

    @jax.jit
    def hits(dflat, nb_out, ids_tm):
        L, B = ids_tm.shape
        s0 = jnp.zeros((B,), dtype=jnp.int32)

        def step(s, c):
            s2 = dflat[s * V + c]
            return s2, s2

        _, states_tm = lax.scan(step, s0, ids_tm)        # [L, B]
        counts = nb_out[states_tm]
        body = counts[halo:, :]                          # [L-halo, B]
        hit_mask = body > 0
        n_hits = jnp.sum(body, dtype=jnp.int32)          # total match count
        n_hit_pos = jnp.sum(hit_mask, dtype=jnp.int32)   # positions w/ hits
        # stream position of block-layout cell (t, b): b*(L-halo) + t
        (flat_idx,) = jnp.nonzero(hit_mask.T.reshape(-1), size=max_hits,
                                  fill_value=-1)
        valid = flat_idx >= 0
        positions = jnp.where(valid, flat_idx, -1)
        sts = jnp.where(
            valid,
            states_tm[halo:, :].T.reshape(-1)[jnp.maximum(flat_idx, 0)],
            0)
        return positions, sts, n_hits, n_hit_pos

    return hits


@lru_cache(maxsize=None)
def make_blocked_hits_stream(V: int, halo: int, max_hits: int,
                             B: int, L: int):
    """Stream-input variant: ext [halo + B*L] in (device window layout,
    same staging contract as scan_xla.make_blocked_count_stream)."""
    from .scan_xla import window_layout

    inner = make_blocked_hits(V, halo, max_hits)

    @jax.jit
    def hits(dflat, nb_out, ext):
        win = window_layout(ext, B, L, halo)
        return inner(dflat, nb_out, win)

    return hits


@lru_cache(maxsize=None)
def make_blocked_hits_raw(V: int, halo: int, max_hits: int, B: int, L: int):
    """Raw-input variant: device-side encode fused in front
    (scan_xla.raw_window staging contract)."""
    from .scan_xla import raw_window

    inner = make_blocked_hits(V, halo, max_hits)

    @jax.jit
    def hits(dflat, nb_out, lut, ext_raw, head_ids):
        win = raw_window(lut, ext_raw, head_ids, B, L, halo)
        return inner(dflat, nb_out, win)

    return hits


# -- packed k-gram retrieval (count-engine speed) ---------------------------


def _compact(mask, size: int):
    """Ordered indices of True entries, -1-padded to ``size`` — the
    jnp.nonzero(size=..., fill_value=-1) contract via cumsum + scatter,
    measured 1.5x faster than XLA's sort-based nonzero at 33M elements on
    v5e (entries past ``size`` are dropped, exactly like nonzero's
    truncation)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask, pos, size)            # out-of-range -> dropped
    out = jnp.full((size,), -1, jnp.int32)
    return out.at[tgt].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def _stepped_emit_scan(V: int, k: int, Vk: int, count_bits: int,
                       halo_steps: int, packed, win):
    """The sequential leg: the count engine's packed k-gram recurrence,
    emitting one int32 per gram — (pre_state << count_bits) | gram_count.
    The packing invariant state_bits + count_bits <= 31 is the packed
    table's own (ops/multistep.build_stepped). Returns (emit [Lk, B],
    n_hits, n_live)."""
    from .multistep import combine_grams

    mask = (1 << count_bits) - 1
    grams = combine_grams(win, V, k)                 # [Lk, B]
    s0 = grams[0] * 0

    def step(s, g):
        v = packed[s * Vk + g]
        return v >> count_bits, (s << count_bits) | (v & mask)

    _, emit = lax.scan(step, s0, grams)              # [Lk, B]
    body = emit[halo_steps:]
    # n_hits reduces PER COLUMN in int32 (each column is bounded by
    # L*max_nb, the scanner's _guard_acc bound) and the host combines in
    # int64 — two-level reduction, so >2^31 total matches cannot wrap and
    # silently truncate the auto-sized MatchSet (ADVICE r4).
    n_hits = jnp.sum(body & mask, axis=0, dtype=jnp.int32)   # [B]
    n_live = jnp.sum((body & mask) > 0, dtype=jnp.int32)
    return emit, n_hits, n_live


def _hits_extract(V: int, k: int, count_bits: int, halo_steps: int,
                  cap: int, out_size: int, emit, sym_at, dflat, nb_out):
    """Refine the live grams of an emit array into per-position hits.

    ``cap`` bounds the live grams refined (pick a pow2 bucket of the
    actual live count — cost scales with density, not with the user's
    max_hits); ``sym_at(p)`` gathers the symbol at stream position p
    (1-D gathers from the staged ext — measured ~2x the 2-D window
    gather's throughput). Returns (positions[out_size] ascending, -1 pad;
    states[out_size]; n_hit_pos exact when the live count fit cap)."""
    mask_c = (1 << count_bits) - 1
    body = emit[halo_steps:]
    Lkb = body.shape[0]
    L = Lkb * k
    flat = body.T.reshape(-1)                        # stream-order grams
    live = (flat & mask_c) > 0
    gidx = _compact(live, cap)
    valid = gidx >= 0
    safe = jnp.maximum(gidx, 0)
    b = safe // Lkb
    tg = safe % Lkb
    s = flat[safe] >> count_bits                     # pre-gram state
    pos0 = b * L + tg * k
    # k dense-table steps over the live grams only — embarrassingly
    # parallel bulk gathers (no sequential chain).
    states_j, cnt_j = [], []
    for j in range(k):
        s = dflat[s * V + sym_at(pos0 + j)]
        states_j.append(s)
        cnt_j.append(nb_out[s])
    states_ck = jnp.stack(states_j, axis=1)          # [cap, k]
    cnts_ck = jnp.stack(cnt_j, axis=1)
    hit = (cnts_ck > 0) & valid[:, None]
    n_hit_pos = jnp.sum(hit, dtype=jnp.int32)
    fidx = _compact(hit.reshape(-1), out_size)
    fvalid = fidx >= 0
    fsafe = jnp.maximum(fidx, 0)
    pos_ck = pos0[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    positions = jnp.where(fvalid, pos_ck.reshape(-1)[fsafe], -1)
    sts = jnp.where(fvalid, states_ck.reshape(-1)[fsafe], 0)
    return positions, sts, n_hit_pos


def stepped_hits_core(V: int, k: int, Vk: int, count_bits: int,
                      halo_steps: int, max_hits: int,
                      packed, dflat, nb_out, ext, win):
    """Single-pass packed-k-gram bounded-hit extraction (scan + extract in
    one traced body — the shard_map per-device kernel, where a host sync
    between phases would cost a collective round).

    ext: the [halo_steps*k + B*L] contiguous symbol stream the win layout
    was built from (1-D symbol gathers); win: [halo_steps*k + L, B].
    Returns (positions[max_hits] ascending (-1 pad), states[max_hits],
    n_hits [B] per-stream (int64-sum on host), n_hit_pos, n_live). Callers must treat ``n_live > max_hits``
    as overflow (refinement truncated; n_hit_pos is then a lower bound)
    and ``n_hit_pos > max_hits`` as extraction overflow."""
    emit, n_hits, n_live = _stepped_emit_scan(V, k, Vk, count_bits,
                                              halo_steps, packed, win)
    halo_sym = halo_steps * k
    positions, sts, n_hit_pos = _hits_extract(
        V, k, count_bits, halo_steps, max_hits, max_hits, emit,
        lambda p: ext[halo_sym + p], dflat, nb_out)
    return positions, sts, n_hits, n_hit_pos, n_live


@lru_cache(maxsize=None)
def make_stepped_hits_scan(V: int, k: int, Vk: int, count_bits: int,
                           halo_steps: int, B: int, L: int):
    """Phase A (stream input): the packed k-gram scan over ext
    [halo_steps*k + B*L], returning (emit [Lk, B] device-resident,
    n_hits [B] per-stream, n_live). The caller syncs only the tiny
    counters (summing n_hits in int64 on host), picks a pow2 cap bucket
    from n_live, and feeds emit to the extract phase — so extraction
    cost tracks the corpus's actual match density."""
    from .scan_xla import window_layout

    @jax.jit
    def scan(packed, ext):
        win = window_layout(ext, B, L, halo_steps * k)
        return _stepped_emit_scan(V, k, Vk, count_bits, halo_steps,
                                  packed, win)

    return scan


@lru_cache(maxsize=None)
def make_stepped_hits_scan_raw(V: int, k: int, Vk: int, count_bits: int,
                               halo_steps: int, B: int, L: int):
    """Phase A, raw input (device-side encode via the replicated lut,
    scan_xla.raw_window staging contract)."""
    from .scan_xla import raw_window

    @jax.jit
    def scan(packed, lut, ext_raw, head_ids):
        win = raw_window(lut, ext_raw, head_ids, B, L, halo_steps * k)
        return _stepped_emit_scan(V, k, Vk, count_bits, halo_steps,
                                  packed, win)

    return scan


@lru_cache(maxsize=None)
def make_stepped_hits_extract(V: int, k: int, count_bits: int,
                              halo_steps: int, cap: int, out_size: int,
                              B: int, L: int):
    """Phase B (stream input): (dflat, nb_out, ext, emit) ->
    (positions[out_size], states[out_size], n_hit_pos)."""
    halo_sym = halo_steps * k

    @jax.jit
    def extract(dflat, nb_out, ext, emit):
        return _hits_extract(V, k, count_bits, halo_steps, cap, out_size,
                             emit, lambda p: ext[halo_sym + p],
                             dflat, nb_out)

    return extract


@lru_cache(maxsize=None)
def make_stepped_hits_extract_raw(V: int, k: int, count_bits: int,
                                  halo_steps: int, cap: int, out_size: int,
                                  B: int, L: int):
    """Phase B, raw input: symbols gather through the lut from the raw
    ext (body positions only — the head override lives in the warm-up
    rows, already baked into emit's states)."""
    halo_sym = halo_steps * k

    @jax.jit
    def extract(dflat, nb_out, lut, ext_raw, emit):
        return _hits_extract(
            V, k, count_bits, halo_steps, cap, out_size, emit,
            lambda p: lut[ext_raw[halo_sym + p].astype(jnp.int32)],
            dflat, nb_out)

    return extract


def _hits_extract_dense(V: int, k: int, count_bits: int, cb1: int,
                        halo_steps: int, max_hits: int, pk1, emit, syms):
    """Phase B for MATCH-DENSE corpora: refine EVERY position instead of
    compacting live grams first. pk1 is the packed k=1 table
    ((next_state << cb1) | nb) — ONE gather per position instead of
    dflat + nb_out; syms: [L, B] body symbols. A single cumsum +
    iota-scatter compaction lands hit positions in stream order; the
    STATES then come from an output-sized gather back into the flat
    stream (round 5: replacing the second full-size value scatter —
    measured 1.62 -> 1.46 s at the headline density; the iota scatter
    itself floors at the chip's ~120M elem/s scatter wall and no
    formulation measured beats it: in-bounds pad equal, one 2-column
    scatter 6x worse, split kernels equal — BENCHMARKS.md round-5
    retrieval accounting). All costs are input-size-bound (no cap), so
    this variant's time is flat in density, while the compact path
    stays far cheaper at low density (cost ∝ live grams)."""
    m1 = (1 << cb1) - 1
    body = emit[halo_steps:]                         # [Lkb, B]
    Lkb, B = body.shape
    s = body >> count_bits                           # pre-gram states
    parts = []
    for j in range(k):
        v = pk1[s * V + syms[j::k]]
        s = v >> cb1
        # (state << 1) | hit: state_bits + 1 <= 31 because the pk1
        # packing already required state_bits + cb1 <= 31 with cb1 >= 1
        parts.append((s << 1) | ((v & m1) > 0).astype(jnp.int32))
    packed = jnp.stack(parts, axis=1).reshape(Lkb * k, B)
    flat = packed.T.reshape(-1)                      # stream order
    hit = (flat & 1) > 0
    n_hit_pos = jnp.sum(hit, dtype=jnp.int32)
    pos = jnp.cumsum(hit.astype(jnp.int32)) - 1
    tgt = jnp.where(hit, pos, max_hits)              # overflow -> dropped
    iota = jnp.arange(flat.shape[0], dtype=jnp.int32)
    positions = jnp.full((max_hits,), -1,
                         jnp.int32).at[tgt].set(iota, mode="drop")
    states = jnp.where(positions >= 0,
                       flat[jnp.maximum(positions, 0)] >> 1, 0)
    return positions, states, n_hit_pos


@lru_cache(maxsize=None)
def make_stepped_hits_extract_dense(V: int, k: int, count_bits: int,
                                    cb1: int, halo_steps: int,
                                    max_hits: int, B: int, L: int):
    """Dense phase B (stream input): (pk1, ext, emit) ->
    (positions[max_hits], states[max_hits], n_hit_pos)."""
    halo_sym = halo_steps * k

    @jax.jit
    def extract(pk1, ext, emit):
        syms = ext[halo_sym:].reshape(B, L).T        # body symbols [L, B]
        return _hits_extract_dense(V, k, count_bits, cb1, halo_steps,
                                   max_hits, pk1, emit, syms)

    return extract


@lru_cache(maxsize=None)
def make_stepped_hits_extract_dense_raw(V: int, k: int, count_bits: int,
                                        cb1: int, halo_steps: int,
                                        max_hits: int, B: int, L: int):
    """Dense phase B, raw input (encode through the replicated lut)."""
    halo_sym = halo_steps * k

    @jax.jit
    def extract(pk1, lut, ext_raw, emit):
        syms = lut[ext_raw[halo_sym:].astype(jnp.int32)].reshape(B, L).T
        return _hits_extract_dense(V, k, count_bits, cb1, halo_steps,
                                   max_hits, pk1, emit, syms)

    return extract
