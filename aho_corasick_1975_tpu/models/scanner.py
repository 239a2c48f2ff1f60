"""DenseScanner: the device-resident scanning model.

Owns an immutable dense-table snapshot (version-pinned — keywords inserted
into the machine after construction are visible only to a *new* scanner; this
is the TPU consistency model for the reference's insert-during-scan feature,
README.md:352-356) plus the jitted scan kernels over it.

Scan strategy: B parallel streams with halo overlap (ops/blocking.py), each
step a vectorized gather through the fail-collapsed table (ops/scan_xla.py).
H = max_keyword_len - 1 symbols of warm-up per block make block-local states
exact (proof in ops/blocking.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.builder import DenseTables
from ..ops import blocking
from ..ops.decode import MatchEvent, decode_matches
from ..ops.scan_xla import (make_blocked_count, make_blocked_scan,
                            make_sequential_scan)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


class DenseScanner:
    def __init__(self, machine, n_streams: int = 512,
                 halo: Optional[int] = None, tables: Optional[DenseTables] = None):
        self.machine = machine
        self.tables: DenseTables = tables if tables is not None else machine.compile()
        self.n_streams = int(n_streams)
        self.halo = int(halo) if halo is not None else max(
            self.tables.max_depth - 1, 0)
        self.V = self.tables.vocab_size
        self._dflat = jnp.asarray(self.tables.delta.reshape(-1))
        self._nb_out = jnp.asarray(self.tables.nb_outputs)
        self._blocked_scan = make_blocked_scan(self.V)
        self._blocked_count = make_blocked_count(self.V, self.halo)
        self._seq_scan = make_sequential_scan(self.V)

    @property
    def version(self) -> int:
        return self.tables.version

    # -- encoding ----------------------------------------------------------

    def encode(self, signs: Sequence[Any]) -> np.ndarray:
        """Map a stream of signs to dense letter ids (OOV -> 0)."""
        if isinstance(signs, np.ndarray) and signs.dtype == np.int32:
            return signs
        return np.asarray(self.machine.vocab.lookup_many(signs),
                          dtype=np.int32)

    # -- layout ------------------------------------------------------------

    def _layout(self, ids: np.ndarray) -> Tuple[np.ndarray, int, int]:
        T = len(ids)
        B = self.n_streams
        L = _next_pow2(max(-(-T // B), 32))  # pow2 bucket limits recompiles
        blocks_tm, nb = blocking.block_time_major(ids, L, self.halo)
        return blocks_tm, nb, T

    # -- scanning ----------------------------------------------------------

    def scan_states(self, signs) -> np.ndarray:
        """states[t] after consuming symbol t, for the whole stream
        (blocked-parallel on device, exact per-position states)."""
        ids = self.encode(signs)
        if len(ids) == 0:
            return np.zeros(0, dtype=np.int32)
        blocks_tm, _, T = self._layout(ids)
        states_tm = np.asarray(self._blocked_scan(self._dflat,
                                                  jnp.asarray(blocks_tm)))
        return blocking.unblock_states(states_tm, self.halo, T)

    def count(self, signs) -> int:
        """Total number of keyword occurrences in the stream (fused count,
        nothing materialized per position)."""
        ids = self.encode(signs)
        if len(ids) == 0:
            return 0
        blocks_tm, _, _ = self._layout(ids)
        return int(self._blocked_count(self._dflat, self._nb_out,
                                       jnp.asarray(blocks_tm)))

    def find_matches(self, signs, offset: int = 0) -> List[Tuple[MatchEvent, Any]]:
        """All (event, Match) occurrences, ordered by end position; within a
        position, longest first (reference acm_get_match index order)."""
        states = self.scan_states(signs)
        events = decode_matches(states, self.tables, offset=offset)
        return [(ev, self.machine.match_for_state(ev.end_state))
                for ev in events]

    # -- conformance oracle -------------------------------------------------

    def scan_states_sequential(self, signs) -> np.ndarray:
        """Single-stream lax.scan — the literal reference recurrence, used to
        validate the blocked path."""
        ids = self.encode(signs)
        if len(ids) == 0:
            return np.zeros(0, dtype=np.int32)
        _, states = self._seq_scan(self._dflat, jnp.asarray(ids),
                                   jnp.int32(0))
        return np.asarray(states)
