"""Match decoding: per-position states -> (position, keyword) tuples.

The reference retrieves matches by walking the fail chain at scan time
(acm_get_match, aho_corasick.c:450-482: index-th end-of-keyword state along
the chain, index 0 = longest). Here the chain walk was precomputed at table
build into the emit CSR (core/builder.py: emit_start/emit_state, each state's
end-states listed longest-first), so decoding is pure vectorized numpy over
the scan's state outputs — the two-phase count+expand replacing pointer
chasing (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

from ..core.builder import DenseTables


class MatchEvent(NamedTuple):
    """One keyword occurrence.

    end: 0-based index of the last matched symbol in the stream.
    start: 0-based index of the first matched symbol (end - length + 1).
    end_state: automaton end-of-keyword state identifying the keyword.
    index: per-position match index, 0 = longest (reference API order).
    """

    end: int
    start: int
    end_state: int
    index: int


def decode_matches(states: np.ndarray, tables: DenseTables,
                   offset: int = 0) -> List[MatchEvent]:
    """Expand scan states into match events.

    states[t] = automaton state after consuming symbol t (scan output).
    Events are ordered by end position; within a position, longest keyword
    first (acm_get_match index order, ref c:459-466). ``offset`` shifts
    reported positions (shard-local -> absolute stream positions).
    """
    states = np.asarray(states)
    counts = tables.nb_outputs[states]
    (hit_pos,) = np.nonzero(counts)
    if hit_pos.size == 0:
        return []
    hit_counts = counts[hit_pos]
    ends = np.repeat(hit_pos, hit_counts)
    # per-position 0..count-1 index ramp
    idx = np.arange(ends.size) - np.repeat(
        np.cumsum(hit_counts) - hit_counts, hit_counts)
    emit_idx = tables.emit_start[states[ends]] + idx
    end_states = tables.emit_state[emit_idx]
    lengths = tables.depth[end_states]
    return [
        MatchEvent(end=int(e) + offset,
                   start=int(e) + offset - int(l) + 1,
                   end_state=int(s), index=int(i))
        for e, l, s, i in zip(ends, lengths, end_states, idx)
    ]
