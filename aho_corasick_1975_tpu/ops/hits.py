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
