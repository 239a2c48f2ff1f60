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


# -- round 5: device-resident sparse RETRIEVAL (VERDICT r4 #3) -------------


def _events(ms):
    return [(int(e), int(s)) for e, s in zip(ms.ends, ms.starts)]


def test_device_resident_sparse_find_matches_parity():
    m = _machine(seed=20)
    sc = m.scanner(n_streams=8, prefilter="on")
    text = _sparse_text(21)
    ids_dev = jnp.asarray(sc.encode(text))
    expect = m.scanner(n_streams=8).find_matches(text)
    got = sc.find_matches(ids_dev)                 # auto, device filter
    assert sc.stats["last_op"] == "find_matches_sparse"
    assert _events(got) == _events(expect)
    # bounded path agrees and raises on a too-small bound
    got_b = sc.find_matches(ids_dev, max_hits=1 << 14)
    assert _events(got_b) == _events(expect)
    if len(expect) > 4:
        with pytest.raises(ValueError, match="max_hits"):
            sc.find_matches(ids_dev, max_hits=2)


def test_device_resident_sparse_find_matches_empty_and_auto_gate():
    m = _machine(seed=22)
    sc = m.scanner(n_streams=8, prefilter="on")
    dead = jnp.asarray(sc.encode("XYZ " * 2000))
    out = sc.find_matches(dead)
    assert len(out) == 0 and hasattr(out, "ends")
    # fully-live corpus under "auto" declines to the dense fast path
    auto = m.scanner(n_streams=8, prefilter="auto")
    import random as _r
    rng = _r.Random(23)
    live = "".join(rng.choice("abcde") for _ in range(4000))
    ids_dev = jnp.asarray(auto.encode(live))
    expect = m.scanner(n_streams=8).find_matches(live)
    assert _events(auto.find_matches(ids_dev)) == _events(expect)


def test_mesh_device_resident_sparse_find_matches_parity():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aho_corasick_1975_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    m = _machine(seed=24)
    mesh = make_mesh()
    sc = ShardedScanner(m, mesh, n_streams_per_device=4, prefilter="on")
    text = _sparse_text(25)
    # pad to a mesh x block multiple so every shard is block-aligned
    unit = 8 * 128
    ids = np.asarray(sc.encode(text), np.int32)
    pad = -(-len(ids) // unit) * unit - len(ids)
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])
    placed = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
    expect = m.scanner(n_streams=8).find_matches(text)
    got = sc.find_matches(placed)                  # auto per-shard sizing
    assert sc.stats["sparse_live_frac"] < 0.5
    assert _events(got) == _events(expect)
    got_b = sc.find_matches(placed, max_hits_per_shard=1 << 14)
    assert _events(got_b) == _events(expect)


def test_mesh_device_resident_sparse_session_head():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aho_corasick_1975_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    m = _machine(seed=26)
    mesh = make_mesh()
    sc = ShardedScanner(m, mesh, n_streams_per_device=4, prefilter="on")
    text = _sparse_text(27)
    unit = 8 * 128
    T = len(text) // (2 * unit) * unit  # both halves block-aligned
    a_txt, b_txt = text[:T], text[T:2 * T]
    ids_a = np.asarray(sc.encode(a_txt), np.int32)
    ids_b = np.asarray(sc.encode(b_txt), np.int32)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    expect = m.scanner(n_streams=8).find_matches(a_txt + b_txt)
    got_a = sc.find_matches(jax.device_put(ids_a, sh))
    h = max(sc.halo, sc._halo_sym)
    got_b = sc.find_matches(jax.device_put(ids_b, sh), offset=T,
                            head=ids_a[-h:] if h else None)
    assert _events(got_a) + _events(got_b) == _events(expect)


def test_mesh_device_resident_sparse_count_parity():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aho_corasick_1975_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    m = _machine(seed=30)
    mesh = make_mesh()
    sc = ShardedScanner(m, mesh, n_streams_per_device=4, prefilter="on")
    text = _sparse_text(31)
    unit = 8 * 128
    ids = np.asarray(sc.encode(text), np.int32)
    pad = -(-len(ids) // unit) * unit - len(ids)
    ids = np.concatenate([ids, np.zeros(pad, np.int32)])
    placed = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
    want = m.scanner(n_streams=8).count(text)
    assert sc.count(placed) == want
    assert sc.stats["sparse_live_frac"] < 0.5
    # head carry through the device sparse path
    head = np.asarray(sc.encode("ab"), np.int32)
    assert sc.count(placed, head=head) == \
        m.scanner(n_streams=8).count(text, head=head)
    # all-dead resident corpus short-circuits to zero
    dead = jax.device_put(np.zeros(unit * 2, np.int32),
                          NamedSharding(mesh, P(DATA_AXIS)))
    assert sc.count(dead) == 0
