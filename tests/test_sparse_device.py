"""Device-resident corpora + the on-device sparse block filter
(VERDICT r2 item 4): count() accepts jax.Array ids (no host staging), and
the filter-then-verify path computes live blocks on device — only a 4-byte
live count syncs to the host."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def _machine(seed=0, n=40, alpha="abcde"):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n):
        m.insert_keyword("".join(rng.choice(alpha)
                                 for _ in range(rng.randint(2, 6))))
    return m


def _sparse_text(seed, islands=9, dead_len=1200, live_len=83):
    rng = random.Random(seed)
    dead = "".join(rng.choice("XYZQ ") for _ in range(dead_len))
    out = []
    for _ in range(islands):
        out.append(dead)
        out.append("".join(rng.choice("abcde") for _ in range(live_len)))
    return "".join(out)


def test_device_resident_count_matches_host():
    m = _machine()
    sc = m.scanner(n_streams=16)
    text = _sparse_text(1)
    ids_dev = jnp.asarray(sc.encode(text))
    assert sc.count(ids_dev) == sc.count(text)


def test_device_filter_sparse_parity_stepped():
    m = _machine(seed=2)
    sc = m.scanner(n_streams=16, prefilter="on", step_k=2)
    dense = m.scanner(n_streams=16)
    text = _sparse_text(3)
    ids_dev = jnp.asarray(sc.encode(text))
    exp = dense.count(text)
    assert sc.count(ids_dev) == exp  # device filter path
    assert sc.stats["sparse_live_frac"] < 0.5
    assert sc.count(text) == exp     # host filter path agrees


def test_device_filter_sparse_parity_dense_table():
    m = _machine(seed=4)
    sc = m.scanner(n_streams=16, prefilter="on", step_k=1)
    assert sc._stepped is None
    text = _sparse_text(5)
    ids_dev = jnp.asarray(sc.encode(text))
    assert sc.count(ids_dev) == m.scanner(step_k=1).count(text)


def test_device_filter_sparse_parity_mxu():
    m = _machine(seed=6, n=6, alpha="ab")
    sc = m.scanner(n_streams=16, prefilter="on", engine="mxu")
    assert sc._mxu is not None
    text = _sparse_text(7).replace("c", "X").replace("d", "Y")
    ids_dev = jnp.asarray(sc.encode(text))
    assert sc.count(ids_dev) == m.scanner(engine="gather").count(text)


def test_device_filter_all_oov_and_auto_decline():
    m = _machine(seed=8)
    sc = m.scanner(n_streams=8, prefilter="on")
    assert sc.count(jnp.asarray(sc.encode("XYZ " * 3000))) == 0
    auto = m.scanner(n_streams=8, prefilter="auto")
    rng = random.Random(9)
    live = "".join(rng.choice("abcde") for _ in range(4000))  # fully live
    ids_dev = jnp.asarray(auto.encode(live))
    assert auto.count(ids_dev) == m.scanner().count(live)


def test_device_array_head_carry():
    m = _machine(seed=10)
    sc = m.scanner(n_streams=8)
    text = _sparse_text(11)
    mid = len(text) // 2 + 3
    a, b = sc.encode(text[:mid]), sc.encode(text[mid:])
    h = sc.halo
    got = sc.count(jnp.asarray(a)) + sc.count(jnp.asarray(b), head=a[-h:])
    assert got == sc.count(text)


def test_device_array_bad_dtype_raises():
    m = _machine(seed=12)
    sc = m.scanner()
    with pytest.raises(ValueError, match="integer letter ids"):
        sc.count(jnp.zeros(100, jnp.float32))


def test_count_many_and_scan_states_unaffected():
    # regression: np arrays are NOT treated as device arrays
    m = _machine(seed=13)
    sc = m.scanner()
    ids = np.asarray(sc.encode("abcde " * 50), np.int32)
    assert sc.count(ids) == sc.count("abcde " * 50)
