"""Failure recovery exercised end-to-end (VERDICT r3 weak #6 / SURVEY §5).

The multi-host failure story is: scans are pure functions of (tables,
stream), so when a worker dies mid-corpus the coordinator restores the
machine from its checkpoint, restores the affected StreamSession from its
(offset, tail, version) checkpoint, and rescans from the interrupted chunk
— landing on results byte-identical to an uninterrupted run. Round 3
shipped the primitives but never drove them through a simulated failure;
these tests do, on both DenseScanner and ShardedScanner, for counts AND
match events, including a crash mid-keyword (the tail carry is what makes
the boundary match survive).
"""

import io
import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.models.scanner import StreamSession
from aho_corasick_1975_tpu.utils import checkpoint as ckpt


def _build_machine(seed=0):
    rng = random.Random(seed)
    m = ac.Machine()
    for i in range(60):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 7))),
                         value=f"v{i}")
    m.insert_keyword("xyzzy")  # planted across the crash boundary below
    return m


def _corpus(seed=1, n=20_000):
    rng = random.Random(seed)
    text = list("".join(rng.choice("abcx ") for _ in range(n)))
    # plant a keyword straddling every chunk edge the tests cut at
    for edge in (4096, 8192, 12288):
        text[edge - 2:edge + 3] = "xyzzy"
    return "".join(text)


def _chunks(text, size=4096):
    return [text[i:i + size] for i in range(0, len(text), size)]


def _run_with_crash(make_scanner, restore_scanner, crash_at=2):
    """Feed chunks; 'crash' after crash_at chunks (drop every live object),
    restore machine + session from checkpoints, rescan the rest. Returns
    (total, events) to compare against an uninterrupted run."""
    m = _build_machine()
    text = _corpus()
    chunks = _chunks(text)

    machine_blob = io.BytesIO()
    ckpt.save_machine(m, machine_blob)

    sc = make_scanner(m)
    sess = sc.session()
    events = []
    for ch in chunks[:crash_at]:
        events += [(ev.end, mt.text()) for ev, mt in sess.feed_matches(ch)]
    sess_state = sess.checkpoint()

    # -- simulated worker death: every live object is dropped -------------
    del sess, sc, m

    # -- recovery on a "new host" -----------------------------------------
    machine_blob.seek(0)
    m2 = ckpt.load_machine(machine_blob)
    sc2 = restore_scanner(m2)
    sess2 = StreamSession.restore(sc2, sess_state)
    assert sess2.offset == sum(len(c) for c in chunks[:crash_at])
    for ch in chunks[crash_at:]:
        events += [(ev.end, mt.text()) for ev, mt in sess2.feed_matches(ch)]
    return sess2.total, events


def _uninterrupted(make_scanner):
    m = _build_machine()
    sc = make_scanner(m)
    text = _corpus()
    total = sc.count(text)
    events = [(ev.end, mt.text()) for ev, mt in sc.find_matches(text)]
    return total, events


def test_dense_scanner_crash_restore_rescan():
    make = lambda m: m.scanner(n_streams=8)
    total, events = _run_with_crash(make, make)
    ref_total, ref_events = _uninterrupted(make)
    assert total == ref_total > 0
    assert events == ref_events  # byte-identical match stream


def test_dense_scanner_crash_restore_counts_only():
    """Counts via feed_count, crash at a chunk edge mid-keyword."""
    m = _build_machine()
    text = _corpus()
    chunks = _chunks(text)
    blob = io.BytesIO()
    ckpt.save_machine(m, blob)
    sc = m.scanner(n_streams=8)
    sess = sc.session()
    for ch in chunks[:3]:
        sess.feed_count(ch)
    state = sess.checkpoint()
    del sess, sc, m
    blob.seek(0)
    m2 = ckpt.load_machine(blob)
    sc2 = m2.scanner(n_streams=8)
    sess2 = StreamSession.restore(sc2, state)
    for ch in chunks[3:]:
        sess2.feed_count(ch)
    assert sess2.total == m2.scanner(n_streams=8).count(text) > 0


def test_rescan_interrupted_chunk_is_idempotent():
    """The recovery protocol rescans the chunk that was in flight when the
    worker died (its count was never committed): restoring from the LAST
    COMMITTED checkpoint and re-feeding the same chunk yields the same
    per-chunk count — scans are stateless given (tables, offset, tail)."""
    m = _build_machine()
    text = _corpus()
    chunks = _chunks(text)
    sc = m.scanner(n_streams=8)
    sess = sc.session()
    sess.feed_count(chunks[0])
    state = sess.checkpoint()
    n1 = sess.feed_count(chunks[1])          # "crashes" before committing
    restored = StreamSession.restore(sc, state)
    n2 = restored.feed_count(chunks[1])      # rescan after restore
    assert n1 == n2 > 0


def test_sharded_scanner_crash_restore_rescan():
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    make = lambda m: ShardedScanner(m, mesh, n_streams_per_device=4)
    total, events = _run_with_crash(make, make)
    ref_total, ref_events = _uninterrupted(make)
    assert total == ref_total > 0
    assert events == ref_events


def test_restore_refuses_mismatched_snapshot():
    """Version pinning is part of the recovery contract: a session
    checkpoint from an older dictionary refuses to resume on a newer
    snapshot (the coordinator must rebuild the session or refresh to the
    pinned version, never silently mix)."""
    m = _build_machine()
    sc = m.scanner(n_streams=4)
    sess = sc.session()
    sess.feed_count("abcabc")
    state = sess.checkpoint()
    m.insert_keyword("newkw")
    sc_new = m.scanner(n_streams=4)
    with pytest.raises(ValueError):
        StreamSession.restore(sc_new, state)
