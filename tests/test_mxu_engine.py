"""MXU one-hot digit-matmul engine (ops/scan_mxu.py) — exact parity with
the gather engine on small automata (the formulation is arithmetic, so it
must agree bit-for-bit with the reference recurrence)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def _machine(n_kw=30, seed=3, alphabet="abcd"):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n_kw):
        m.insert_keyword("".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(1, 6))))
    return m, rng


def test_mxu_count_parity():
    m, rng = _machine()
    mxu = m.scanner(n_streams=8, engine="mxu")
    gather = m.scanner(n_streams=8, engine="gather")
    assert mxu._mxu is not None and gather._mxu is None
    for _ in range(3):
        text = "".join(rng.choice("abcdx ") for _ in range(3000))
        assert mxu.count(text) == gather.count(text)
    assert mxu.count("") == 0


def test_mxu_session_and_refresh():
    m, rng = _machine()
    mxu = m.scanner(n_streams=8, engine="mxu")
    text = list("".join(rng.choice("abcd") for _ in range(2000)))
    m.insert_keyword("spanner")
    assert mxu.refresh() in (True, False)
    for edge in (500, 1000):  # keyword across a chunk edge
        for k, ch in enumerate("spanner"):
            text[edge - 3 + k] = ch
    text = "".join(text)
    gather = m.scanner(n_streams=8, engine="gather")
    sess = mxu.session()
    total = sum(sess.feed_count(text[i:i + 500])
                for i in range(0, len(text), 500))
    assert total == gather.count(text) == mxu.count(text)


def test_mxu_rejects_large_automaton():
    rng = random.Random(9)
    m = ac.Machine()
    m.insert_keywords(["".join(rng.choice("abcdefgh") for _ in range(7))
                       for _ in range(2000)])
    assert m.n_states > 512
    with pytest.raises(ValueError, match="too large for the MXU engine"):
        m.scanner(engine="mxu")
    # auto quietly falls back to the gather engine
    sc = m.scanner(engine="auto", n_streams=8)
    assert sc._mxu is None
    assert sc.count("abcdefgh") >= 0


def test_mxu_count_many_parity():
    m, rng = _machine()
    mxu = m.scanner(n_streams=8, engine="mxu")
    gather = m.scanner(n_streams=8, engine="gather")
    docs = ["".join(rng.choice("abcdx ") for _ in range(rng.randint(0, 700)))
            for _ in range(13)]
    np.testing.assert_array_equal(mxu.count_many(docs),
                                  gather.count_many(docs))


def test_mxu_sharded_count_and_count_many_parity():
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    m, rng = _machine()
    mesh = make_mesh()
    mxu = ShardedScanner(m, mesh, n_streams_per_device=8, engine="mxu")
    gather = ShardedScanner(m, mesh, n_streams_per_device=8,
                            engine="gather")
    assert mxu._mxu is not None and gather._mxu is None
    text = "".join(rng.choice("abcdx ") for _ in range(20000))
    assert mxu.count(text) == gather.count(text) \
        == m.scanner(n_streams=8).count(text)
    docs = ["".join(rng.choice("abcdx ") for _ in range(rng.randint(0, 500)))
            for _ in range(11)]
    np.testing.assert_array_equal(mxu.count_many(docs),
                                  gather.count_many(docs))
    # session carry through the MXU sharded kernels (chunk edges exact)
    sess = mxu.session()
    total = sum(sess.feed_count(text[i:i + 3000])
                for i in range(0, len(text), 3000))
    assert total == gather.count(text)


def test_mxu_plane_packing_roundtrip():
    from aho_corasick_1975_tpu.ops.scan_mxu import (DIGIT_BITS, DIGIT_MASK,
                                                    build_planes)
    m, _ = _machine(n_kw=12)
    t = m.compile()
    planes, cbits, n_planes, S_pad = build_planes(t.delta, t.nb_outputs)
    S, V = t.delta.shape
    val = np.zeros((S, V), np.int64)
    for p in range(n_planes):
        val |= planes[:S, p * V:(p + 1) * V].astype(np.int64) \
            << (DIGIT_BITS * p)
    np.testing.assert_array_equal(val >> cbits, t.delta)
    np.testing.assert_array_equal(val & ((1 << cbits) - 1),
                                  t.nb_outputs[t.delta])
    assert (planes >= 0).all() and (planes <= DIGIT_MASK).all()
