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

import time
from functools import lru_cache, partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.builder import DenseTables
from ..ops import blocking
from ..ops.decode import MatchEvent, decode_matches
from ..ops.multistep import round_cap as _round_cap
from ..ops.scan_xla import (make_blocked_count, make_blocked_scan,
                            make_sequential_scan)


@lru_cache(maxsize=None)
def _make_row_scatter(width: int):
    """Jitted in-place row scatter on a flat table viewed as [cap, width].

    Row-level indices (R of them, not R*width element indices) keep the
    transfer and the device scatter cheap; the table buffer is donated, so
    XLA updates it in place (no 2x table footprint during a refresh)."""

    @partial(jax.jit, donate_argnums=(0,))
    def scatter(table, rows, vals):
        if width == 1:
            return table.at[rows].set(vals)
        return (table.reshape(-1, width).at[rows].set(vals)).reshape(-1)

    return scatter


def _scatter_rows(table, rows: np.ndarray, vals: np.ndarray, width: int):
    """Scatter in fixed-size chunks so each width compiles exactly ONE
    scatter executable per process — a refresh must never wait on XLA (a
    fresh compile costs seconds on TPU, dwarfing the scatter itself).
    Chunks are padded by repeating the last row; duplicate indices with
    identical values are a benign no-op."""
    chunk = max(1024, (1 << 18) // width)
    fn = _make_row_scatter(width)
    for lo in range(0, len(rows), chunk):
        r = rows[lo:lo + chunk]
        v = vals[lo:lo + chunk]
        if len(r) < chunk:
            pad = chunk - len(r)
            r = np.concatenate([r, np.full(pad, r[-1], r.dtype)])
            v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
        table = fn(table, jnp.asarray(r), jnp.asarray(v))
    return table


def encode_signs(machine, signs, V: int) -> np.ndarray:
    """Shared encode for scanners: map signs to dense letter ids.

    An int32 ndarray is accepted as PRE-ENCODED letter ids (the zero-copy
    fast path used by benchmarks and internal re-entry) — validated to be
    within [0, V) so a raw integer-sign array passed by mistake fails
    loudly instead of scanning garbage."""
    if isinstance(signs, np.ndarray) and signs.dtype == np.int32:
        if signs.size and (int(signs.max()) >= V or int(signs.min()) < 0):
            raise ValueError(
                "int32 arrays are treated as pre-encoded letter ids, but "
                f"values fall outside [0, {V}); for integer-sign alphabets "
                "encode via machine.vocab.lookup_many(signs) first")
        return signs
    return np.asarray(machine.vocab.lookup_many(signs), dtype=np.int32)


class DenseScanner:
    def __init__(self, machine, n_streams: "int | str" = "auto",
                 halo: Optional[int] = None,
                 tables: Optional[DenseTables] = None,
                 step_k: "int | str" = "auto",
                 step_budget_bytes: int = 128 * 1024 * 1024):
        self.machine = machine
        self.tables: DenseTables = tables if tables is not None else machine.compile()
        self._ctor = (n_streams, halo, step_k, step_budget_bytes)
        self._halo_auto = halo is None
        # "auto": scale the stream count with the input at layout time
        # (clamped 512..16384 — sweeps show throughput is flat in B beyond
        # a few thousand, and tiny inputs waste padding on huge B).
        self._auto_streams = n_streams == "auto"
        self.n_streams = 512 if self._auto_streams else int(n_streams)
        self.halo = int(halo) if halo is not None else max(
            self.tables.max_depth - 1, 0)
        self.V = self.tables.vocab_size
        # Device tables are capacity-padded (never-read tail rows) so that
        # refresh() can grow the dictionary in place with stable shapes.
        S = self.tables.n_states
        self._cap = _round_cap(S)
        self._delta_host = np.zeros((self._cap, self.V), np.int32)
        self._delta_host[:S] = self.tables.delta
        self._nb_host = np.zeros(self._cap, np.int32)
        self._nb_host[:S] = self.tables.nb_outputs
        self._dflat = jnp.asarray(self._delta_host.reshape(-1))
        self._nb_out = jnp.asarray(self._nb_host)
        self._blocked_scan = make_blocked_scan(self.V)
        self._blocked_count = make_blocked_count(self.V, self.halo)
        self._seq_scan = make_sequential_scan(self.V)
        self.stats: dict = {}
        # k-char stepped count path (ops/multistep.py): one gather per k
        # symbols — the gather-rate lever that dominates TPU throughput.
        from ..ops import multistep as ms
        if step_k == "auto":
            self.step_k = ms.choose_k(self.tables.n_states, self.V,
                                      step_budget_bytes)
        else:
            self.step_k = max(1, int(step_k))
        self._stepped = None
        if self.step_k > 1:
            st = ms.build_stepped(self.tables, self.step_k)
            # the unpacked fallback needs two tables (8 bytes/entry);
            # degrade k until the actual footprint fits the budget
            while (st.packed is None and self.step_k > 1 and
                   self.tables.n_states * (self.V ** st.k) * 8
                   > step_budget_bytes):
                self.step_k -= 1
                st = ms.build_stepped(self.tables, self.step_k) \
                    if self.step_k > 1 else None
                if st is None:
                    break
            if st is None or self.step_k <= 1:
                self.step_k = max(1, self.step_k)
                self._stepped = None
                return
            self._stepped = st
            self._halo_steps = -(-self.halo // st.k)
            self._halo_sym = self._halo_steps * st.k
            if st.packed is not None:
                self._packed_host = np.zeros((self._cap, st.Vk), np.int32)
                self._packed_host[:S] = st.packed.reshape(S, st.Vk)
                st.packed = self._packed_host[:S].reshape(-1)
                self._st_dev = (jnp.asarray(self._packed_host.reshape(-1)),)
                self._stepped_count = ms.make_stepped_count(
                    st.V, st.k, st.Vk, st.count_bits, self._halo_steps)
            else:
                self._dk_host = np.zeros((self._cap, st.Vk), np.int32)
                self._dk_host[:S] = st.delta_k.reshape(S, st.Vk)
                self._ck_host = np.zeros((self._cap, st.Vk), np.int32)
                self._ck_host[:S] = st.cnt_k.reshape(S, st.Vk)
                st.delta_k = self._dk_host[:S].reshape(-1)
                st.cnt_k = self._ck_host[:S].reshape(-1)
                self._st_dev = (jnp.asarray(self._dk_host.reshape(-1)),
                                jnp.asarray(self._ck_host.reshape(-1)))
                self._stepped_count = ms.make_stepped_count_unpacked(
                    st.V, st.k, st.Vk, self._halo_steps)

    @property
    def version(self) -> int:
        return self.tables.version

    # -- incremental snapshot refresh ---------------------------------------

    def refresh(self) -> bool:
        """Bring the pinned snapshot up to the machine's current dictionary
        by updating the device tables in place.

        The reference allows keyword registration *during* scanning
        (README.md:352-356, exercised at generic_test.c:214-232); the TPU
        consistency model pins each scanner to a table snapshot, and
        refresh() is the cheap bridge between snapshots. Meyer-mode
        insertions typically touch a handful of automaton rows, so instead
        of rebuilding and re-uploading the O(S*V^k) stepped table it

        1. re-emits dense tables (host, O(S*V)),
        2. diffs them against the pinned snapshot -> changed-state set D,
        3. recomputes only stepped rows whose <=k-step forward reach
           intersects D (row s depends on delta[s,:] and on delta/nb of its
           1..k-step successors, nothing else — ops/multistep.compose_rows),
        4. scatters those rows into the capacity-padded device tables
           (donated buffers: in-place, no shape change, no XLA recompile).

        Returns True for the in-place path, False when it fell back to a
        full reconstruction (vocabulary growth, packed-count-width
        overflow, or state capacity exceeded). Either way the scanner
        afterwards matches a freshly constructed one exactly
        (tests/test_refresh.py). Open StreamSessions keep feeding: a
        session sees the refreshed dictionary from its next chunk on
        (snapshot analogue of the reference's "new keywords affect
        subsequent symbols only").

        Concurrency: refresh() donates the device buffers it replaces, so
        it must be serialized against scans ON THE SAME SCANNER by the
        caller (one lock around scan/refresh — see examples/serving_demo.py).
        The reference takes the machine mutex for insertion and scans
        lock-free (c:295,433); here insertion is likewise safe anytime,
        and only the snapshot swap needs exclusion.
        """
        t0 = time.perf_counter()
        new = self.machine.compile()
        old = self.tables
        if new.version == old.version:
            return True
        if new.vocab_size != self.V or new.n_states > self._cap:
            return self._full_reload()

        S_old, S_new = old.n_states, new.n_states
        changed = np.zeros(S_new, dtype=bool)
        changed[:S_old] = (
            np.any(old.delta != new.delta[:S_old], axis=1)
            | (old.nb_outputs != new.nb_outputs[:S_old]))
        changed[S_old:] = True
        rows1 = np.flatnonzero(changed).astype(np.int32)
        n_cells = 0

        if len(rows1):
            # Stepped table first: overflow/size checks may still force a
            # full reload, and the in-place updates must be all-or-nothing.
            stepped_update = None
            if self._stepped is not None:
                st = self._stepped
                from ..ops import multistep as ms
                cells, land, cnt = ms.stepped_delta_cells(old, new, st.k)
                n_cells = len(cells)
                # Past ~1/4 of the table the plain rebuild+upload wins over
                # recompute+scatter (measured in bench_refresh.py); below
                # 64k cells either path is trivial, so stay in place.
                if n_cells > max(S_new * st.Vk // 4, 1 << 16):
                    return self._full_reload()
                if st.packed is not None:
                    max_cnt = int(cnt.max()) if cnt.size else 0
                    state_bits = max(1, int(S_new - 1).bit_length())
                    if (max_cnt.bit_length() > st.count_bits
                            or state_bits + st.count_bits > 31):
                        return self._full_reload()
                    vals = ((land.astype(np.int64) << st.count_bits)
                            | cnt).astype(np.int32)
                    stepped_update = ("packed", cells, vals)
                else:
                    stepped_update = ("unpacked", cells, land,
                                      cnt.astype(np.int32))

            # 1-char tables (scan_states / find_matches / fallback count).
            dvals = new.delta[rows1]
            nvals = new.nb_outputs[rows1]
            self._delta_host[rows1] = dvals
            self._nb_host[rows1] = nvals
            self._dflat = _scatter_rows(self._dflat, rows1, dvals, self.V)
            self._nb_out = _scatter_rows(self._nb_out, rows1, nvals, 1)

            if stepped_update is not None:
                st = self._stepped
                if stepped_update[0] == "packed":
                    _, cells, vals = stepped_update
                    self._packed_host.reshape(-1)[cells] = vals
                    st.packed = self._packed_host[:S_new].reshape(-1)
                    self._st_dev = (_scatter_rows(self._st_dev[0], cells,
                                                  vals, 1),)
                else:
                    _, cells, land, c32 = stepped_update
                    self._dk_host.reshape(-1)[cells] = land
                    self._ck_host.reshape(-1)[cells] = c32
                    st.delta_k = self._dk_host[:S_new].reshape(-1)
                    st.cnt_k = self._ck_host[:S_new].reshape(-1)
                    self._st_dev = (
                        _scatter_rows(self._st_dev[0], cells, land, 1),
                        _scatter_rows(self._st_dev[1], cells, c32, 1))

        self.tables = new
        self._refresh_halo()
        self._record("refresh", len(rows1), time.perf_counter() - t0)
        self.stats["refresh_rows"] = int(len(rows1))
        self.stats["refresh_cells"] = int(n_cells)
        return True

    def _refresh_halo(self) -> None:
        """Grow the halo when a new keyword exceeds it (auto-halo mode).

        Rounded up to a multiple of 8 on growth so steady keyword-length
        creep doesn't recompile the count kernel every refresh."""
        need = max(self.tables.max_depth - 1, 0)
        if not self._halo_auto or need <= self.halo:
            return
        self.halo = -(-need // 8) * 8
        self._blocked_count = make_blocked_count(self.V, self.halo)
        if self._stepped is not None:
            from ..ops import multistep as ms
            st = self._stepped
            hs = -(-self.halo // st.k)
            if hs != self._halo_steps:
                self._halo_steps = hs
                self._halo_sym = hs * st.k
                if st.packed is not None:
                    self._stepped_count = ms.make_stepped_count(
                        st.V, st.k, st.Vk, st.count_bits, hs)
                else:
                    self._stepped_count = ms.make_stepped_count_unpacked(
                        st.V, st.k, st.Vk, hs)

    def _full_reload(self) -> bool:
        """Rebuild from scratch in place (same object identity, so open
        sessions and caller references stay valid)."""
        stats = self.stats
        n_streams, halo, step_k, budget = self._ctor
        self.__init__(self.machine, n_streams=n_streams, halo=halo,
                      step_k=step_k, step_budget_bytes=budget)
        self.stats = stats
        return False

    # -- encoding ----------------------------------------------------------

    def encode(self, signs: Sequence[Any]) -> np.ndarray:
        """Map a stream of signs to dense letter ids (OOV -> 0). int32
        arrays pass through as pre-encoded ids (bounds-checked)."""
        return encode_signs(self.machine, signs, self.V)

    # -- layout ------------------------------------------------------------

    def _streams_for(self, T: int) -> int:
        if not self._auto_streams:
            return self.n_streams
        return max(512, min(16384, T // 4096))

    def _layout(self, ids: np.ndarray, head=None) -> Tuple[np.ndarray, int, int]:
        T = len(ids)
        B = self._streams_for(T)
        # Round the per-stream length to a small bucket: bounds padding waste
        # to <128*B symbols while keeping the number of distinct compiled
        # shapes low for steadily-sized inputs.
        L = max(32, -(-(-(-T // B)) // 128) * 128)
        blocks_tm, nb = blocking.block_time_major(ids, L, self.halo, head=head)
        return blocks_tm, nb, T

    # -- scanning ----------------------------------------------------------

    def scan_states(self, signs, head=None) -> np.ndarray:
        """states[t] after consuming symbol t, for the whole stream
        (blocked-parallel on device, exact per-position states)."""
        ids = self.encode(signs)
        if len(ids) == 0:
            return np.zeros(0, dtype=np.int32)
        t0 = time.perf_counter()
        blocks_tm, _, T = self._layout(ids, head=head)
        states_tm = np.asarray(self._blocked_scan(self._dflat,
                                                  jnp.asarray(blocks_tm)))
        out = blocking.unblock_states(states_tm, self.halo, T)
        self._record("scan_states", T, time.perf_counter() - t0)
        return out

    def count(self, signs, head=None) -> int:
        """Total number of keyword occurrences in the stream (fused count,
        nothing materialized per position; k-char stepped when enabled)."""
        ids = self.encode(signs)
        if len(ids) == 0:
            return 0
        t0 = time.perf_counter()
        if self._stepped is not None:
            blocks_tm = self._layout_stepped(ids, head=head)
            per_stream = self._stepped_count(*self._st_dev,
                                             jnp.asarray(blocks_tm))
        else:
            blocks_tm, _, _ = self._layout(ids, head=head)
            per_stream = self._blocked_count(self._dflat, self._nb_out,
                                             jnp.asarray(blocks_tm))
        # int64 grand total on host: per-stream totals are int32-safe but
        # their sum can exceed 2^31 on pod-scale corpora.
        n = int(np.asarray(per_stream).sum(dtype=np.int64))
        self._record("count", len(ids), time.perf_counter() - t0)
        return n

    def _layout_stepped(self, ids: np.ndarray, head=None) -> np.ndarray:
        """Block layout for the k-stepped path: halo and block length both
        multiples of k so gram boundaries align."""
        k = self._stepped.k
        T = len(ids)
        B = self._streams_for(T)
        unit = 128 * k
        L = max(unit, -(-(-(-T // B)) // unit) * unit)
        blocks_tm, _ = blocking.block_time_major(ids, L, self._halo_sym,
                                                 head=head)
        return blocks_tm

    def find_matches(self, signs, offset: int = 0, head=None,
                     max_hits: Optional[int] = None
                     ) -> List[Tuple[MatchEvent, Any]]:
        """All (event, Match) occurrences, ordered by end position; within a
        position, longest first (reference acm_get_match index order).

        ``max_hits``: enable the device-side bounded hit extraction
        (ops/hits.py) — only hit positions travel to the host instead of
        every per-position state; raises if more than ``max_hits`` positions
        match (retry larger or chunk with a StreamSession)."""
        if max_hits is not None:
            return self._find_matches_device(signs, offset, head, max_hits)
        states = self.scan_states(signs, head=head)
        events = decode_matches(states, self.tables, offset=offset)
        return [(ev, self.machine.match_for_state(ev.end_state))
                for ev in events]

    def _find_matches_device(self, signs, offset, head, max_hits):
        from ..ops.hits import make_blocked_hits
        ids = self.encode(signs)
        if len(ids) == 0:
            return []
        t0 = time.perf_counter()
        blocks_tm, _, T = self._layout(ids, head=head)
        L = blocks_tm.shape[0]
        fn = make_blocked_hits(self.V, self.halo, int(max_hits))
        positions, sts, n_hits, n_hit_pos = fn(self._dflat, self._nb_out,
                                               jnp.asarray(blocks_tm))
        n_hit_pos = int(n_hit_pos)
        positions = np.asarray(positions)
        sts = np.asarray(sts)
        keep = (positions >= 0) & (positions < T)
        positions, sts = positions[keep], sts[keep]
        if n_hit_pos > max_hits:
            raise ValueError(
                f"{n_hit_pos} matching positions exceed max_hits={max_hits}; "
                "raise max_hits or chunk the stream with a session")
        # decode sparse hits through the emit CSR (host, O(hits))
        order = np.argsort(positions, kind="stable")
        events: List[Tuple[MatchEvent, Any]] = []
        tb = self.tables
        for p, s in zip(positions[order].tolist(), sts[order].tolist()):
            base = int(tb.emit_start[s])
            n = int(tb.nb_outputs[s])
            for i in range(n):
                end_state = int(tb.emit_state[base + i])
                length = int(tb.depth[end_state])
                ev = MatchEvent(end=p + offset,
                                start=p + offset - length + 1,
                                end_state=end_state, index=i)
                events.append((ev, self.machine.match_for_state(end_state)))
        self._record("find_matches_device", T, time.perf_counter() - t0)
        return events

    def _record(self, op: str, n_symbols: int, seconds: float) -> None:
        self.stats["last_op"] = op
        self.stats["last_symbols"] = n_symbols
        self.stats["last_seconds"] = seconds
        self.stats["last_symbols_per_sec"] = (
            n_symbols / seconds if seconds > 0 else float("inf"))
        self.stats["total_symbols"] = (
            self.stats.get("total_symbols", 0) + n_symbols)

    def session(self) -> "StreamSession":
        """Open a chunked streaming session (exact across chunk edges)."""
        return StreamSession(self)

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


class StreamSession:
    """Chunked streaming scan with exact continuity across chunk edges.

    The reference streams one symbol per acm_match call with an O(1) cursor
    (c:433-448); the TPU equivalent streams a *chunk* per call, carrying the
    last halo symbols of the previous chunk so matches spanning chunk edges
    are found exactly. This is also the scan-resume story (SURVEY.md §5):
    a session checkpoint is (offset, tail ids), both tiny and exact.
    """

    def __init__(self, scanner: DenseScanner):
        self.scanner = scanner
        self.offset = 0
        self.total = 0
        self._tail = np.zeros(0, dtype=np.int32)

    @property
    def _hmax(self) -> int:
        # Read live (not pinned at construction): scanner.refresh() between
        # feeds may grow the halo with the dictionary, and subsequent tails
        # must keep up. A chunk fed right after such a growth carries the
        # shorter previous tail — matches reaching further back than the
        # *previous* snapshot's halo resolve from the root, the documented
        # snapshot semantics for insert-during-scan.
        s = self.scanner
        return max(s.halo, s._halo_sym if s._stepped is not None else 0)

    def _advance(self, ids: np.ndarray) -> np.ndarray:
        head = self._tail
        joined = np.concatenate([self._tail, ids]) if len(self._tail) else ids
        self._tail = joined[-self._hmax:] if self._hmax else joined[:0]
        self.offset += len(ids)
        return head

    def feed_count(self, signs) -> int:
        """Count matches in the next chunk (including matches spanning the
        previous chunk edge, attributed to this chunk)."""
        ids = self.scanner.encode(signs)
        head = self._advance(ids)
        n = self.scanner.count(ids, head=head) if len(ids) else 0
        self.total += n
        return n

    def feed_matches(self, signs):
        """Match events in the next chunk, with absolute stream positions."""
        ids = self.scanner.encode(signs)
        offset = self.offset
        head = self._advance(ids)
        if not len(ids):
            return []
        out = self.scanner.find_matches(ids, offset=offset, head=head)
        self.total += len(out)
        return out

    # -- resume -----------------------------------------------------------

    def checkpoint(self) -> dict:
        return {"offset": self.offset, "tail": self._tail.copy(),
                "total": self.total, "version": self.scanner.version}

    @classmethod
    def restore(cls, scanner: DenseScanner, state: dict) -> "StreamSession":
        if state["version"] != scanner.version:
            raise ValueError("session checkpoint belongs to a different "
                             "table snapshot")
        s = cls(scanner)
        s.offset = int(state["offset"])
        s._tail = np.asarray(state["tail"], np.int32)
        s.total = int(state["total"])
        return s
