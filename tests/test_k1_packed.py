"""k=1 PACKED stepped tables (big-automaton count path): when no k>=2
table fits the step budget, auto mode now packs (next_state, count) into
one word per (state, symbol) — ONE gather per symbol instead of
delta + nb_out. Explicit step_k=1 still means dense-only (the documented
way to force the non-stepped core)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


@pytest.fixture
def machine():
    rng = random.Random(0)
    m = ac.Machine()
    for _ in range(800):
        m.insert_keyword("".join(rng.choice("abcdefgh")
                                 for _ in range(rng.randint(2, 8))))
    return m


def _text(seed, n=120_000):
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghij ") for _ in range(n))


def _k1_scanner(machine, **kw):
    # budget too small for k=2 but big enough for the k=1 packed table
    # (which now honors the budget too, ADVICE r3) -> auto resolves to
    # the packed 1-gram table
    sc = machine.scanner(step_budget_bytes=1 << 18, n_streams=32, **kw)
    st = sc._stepped
    assert st is not None and st.k == 1 and st.packed is not None
    return sc


def test_explicit_step_k1_stays_dense(machine):
    assert machine.scanner(step_k=1)._stepped is None


def test_k1_packed_honors_budget(machine):
    """ADVICE r3: the k=1 packed table is an extra cap*V*4 bytes and must
    respect step_budget_bytes like every other k — a budget below the
    dense-table footprint keeps the snapshot dense-only."""
    sc = machine.scanner(step_budget_bytes=1 << 10, n_streams=32)
    assert sc._stepped is None
    # counts still exact through the dense fallback
    text = _text(9, 20_000)
    cur = machine.initiate()
    assert sc.count(text) == machine.match_stream(cur, text)


def test_k1_packed_count_parity(machine):
    text = _text(1)
    sc = _k1_scanner(machine)
    dense = machine.scanner(step_k=1, n_streams=32)
    cur = machine.initiate()
    oracle = machine.match_stream(cur, text)
    assert sc.count(text) == dense.count(text) == oracle


def test_k1_packed_session_and_head(machine):
    text = _text(2, 40_000)
    sc = _k1_scanner(machine)
    sess = sc.session()
    streamed = sum(sess.feed_count(text[i:i + 997])
                   for i in range(0, len(text), 997))
    cur = machine.initiate()
    assert streamed == machine.match_stream(cur, text)


def test_k1_packed_refresh_inplace(machine):
    text = _text(3, 60_000)
    sc = _k1_scanner(machine)
    base = sc.count(text)
    machine.insert_keyword("abcabc")  # existing letters: in-place refresh
    assert sc.refresh() is True
    cur = machine.initiate()
    assert sc.count(text) == machine.match_stream(cur, text) >= base


def test_k1_packed_count_many_and_sparse(machine):
    sc = _k1_scanner(machine, prefilter="on")
    docs = [_text(i, 3000) for i in range(4)] + ["", "abc"]
    got = sc.count_many(docs)
    want = []
    for d in docs:
        cur = machine.initiate()
        want.append(machine.match_stream(cur, d))
    assert np.array_equal(got, np.asarray(want, np.int64))
    sparse_text = "z" * 4000 + "abcabc" + "z" * 4000
    cur = machine.initiate()
    assert sc.count(sparse_text) == machine.match_stream(cur, sparse_text)


def test_k1_packed_sharded(machine):
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    text = _text(4, 80_000)
    sh = ShardedScanner(machine, make_mesh(8), n_streams_per_device=4,
                        step_budget_bytes=1 << 18)
    st = sh._stepped
    assert st is not None and st.k == 1 and st.packed is not None
    cur = machine.initiate()
    assert sh.count(text) == machine.match_stream(cur, text)
