"""Multi-chip tests on a fake 8-device CPU mesh (conftest rig).

Validates the distributed layer the reference never had (SURVEY.md §2c):
data-parallel corpus sharding with replicated tables, ppermute halo handoff
at shard edges, psum-reduced counts — against the single-chip scanner and
brute force.
"""

import random

import jax
import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.parallel.mesh import make_mesh
from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_count_matches_single_chip(mesh8):
    rng = random.Random(42)
    m = ac.Machine()
    for _ in range(50):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 6))))
    text = "".join(rng.choice("abcx") for _ in range(4096))
    single = m.scanner(n_streams=16)
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=8)
    assert sharded.count(text) == single.count(text)
    np.testing.assert_array_equal(sharded.scan_states(text),
                                  single.scan_states(text))


def test_sharded_device_resident_count(mesh8):
    """jax.Array input: pre-placed mesh corpora scan without per-call
    placement (the multi-process device_put costs ~0.5 s/128 MB — the
    serving path pins the corpus once). Parity incl. session head."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aho_corasick_1975_tpu.parallel.mesh import DATA_AXIS
    rng = random.Random(7)
    m = ac.Machine()
    for _ in range(40):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 5))))
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    text = "".join(rng.choice("abcx") for _ in range(8192))
    ids = np.asarray(m.vocab.lookup_many(text), np.int32)
    placed = jax.device_put(ids, NamedSharding(mesh8, P(DATA_AXIS)))
    expected = sharded.count(text)
    assert sharded.count(placed) == expected
    # head carry works on the device path too
    head = np.asarray(m.vocab.lookup_many("ab"), np.int32)
    assert sharded.count(placed, head=head) == sharded.count(text,
                                                             head=head)
    # unsharded device arrays still work (resharded by the kernel)
    assert sharded.count(jnp.asarray(ids)) == expected
    # misaligned length refuses loudly
    with pytest.raises(ValueError, match="divisible"):
        sharded.count(jnp.asarray(ids[:8191]))
    with pytest.raises(ValueError, match="integer"):
        sharded.count(jnp.asarray(ids.astype(np.float32)))
    # retrieval + per-position states on the device path
    np.testing.assert_array_equal(sharded.scan_states(placed),
                                  sharded.scan_states(text))
    want = [(ev.end, mt.text()) for ev, mt in sharded.find_matches(text)]
    got = [(ev.end, mt.text()) for ev, mt in sharded.find_matches(placed)]
    got_b = [(ev.end, mt.text())
             for ev, mt in sharded.find_matches(placed,
                                                max_hits_per_shard=2048)]
    assert got == got_b == want
    # empty device arrays: empty results, not a divisibility error
    empty = jnp.zeros(0, jnp.int32)
    assert sharded.count(empty) == 0
    assert len(sharded.scan_states(empty)) == 0
    assert len(sharded.find_matches(empty, max_hits_per_shard=8)) == 0


def test_match_spanning_shard_boundary(mesh8):
    """A keyword laid exactly across every shard edge must still match:
    the ppermute halo re-derives the boundary state."""
    m = ac.Machine()
    m.insert_keyword("spanner")
    T = 8 * 64
    text = ["."] * T
    hits = 0
    for edge in range(64, T, 64):          # every shard boundary
        start = edge - 3                   # "spa" | "nner" across the edge
        if start >= 0 and start + 7 <= T:
            for k, ch in enumerate("spanner"):
                text[start + k] = ch
            hits += 1
    text = "".join(text)
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    assert sharded.count(text) == hits
    # positions too: decode from sharded states
    from aho_corasick_1975_tpu.ops.decode import decode_matches
    events = decode_matches(sharded.scan_states(text), sharded.tables)
    starts = sorted(ev.start for ev in events)
    assert starts == sorted(e - 3 for e in range(64, T, 64))


def test_uneven_length_padding(mesh8):
    """T not divisible by the mesh size: OOV padding must be inert."""
    m = ac.Machine()
    m.insert_keyword("ab")
    text = "ab" * 501 + "a"          # T = 1003, not divisible by 8
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    assert sharded.count(text) == 501


def test_empty_and_tiny_streams(mesh8):
    m = ac.Machine()
    m.insert_keyword("xy")
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=2)
    assert sharded.count("") == 0
    assert sharded.count("xy") == 1     # T=2 < n_dev: pure padding shards


def test_sharded_allgather_hit_extraction(mesh8):
    """Bounded per-shard hit buffers combined via all_gather must equal the
    full-states decode, including cross-shard boundary matches."""
    m = ac.Machine()
    m.insert_keyword("edge")
    m.insert_keyword("dg")
    T = 8 * 64
    text = ["."] * T
    for b in range(32, T, 64):          # some spanning shard boundaries
        for k, ch in enumerate("edge"):
            if b + k < T:
                text[b + k] = ch
    text = "".join(text)
    sc = ShardedScanner(m, mesh8, n_streams_per_device=4)
    full = [(ev, match.text()) for ev, match in sc.find_matches(text)]
    fast = [(ev, match.text())
            for ev, match in sc.find_matches(text, max_hits_per_shard=16)]
    assert fast == full and len(full) > 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="over max_hits_per_shard"):
        sc.find_matches(text, max_hits_per_shard=1)


def test_sharded_refresh_matches_fresh(mesh8):
    """Mesh-wide refresh parity: in-place cell scatter on the replicated
    tables equals a freshly constructed ShardedScanner."""
    rng = random.Random(7)
    m = ac.Machine()
    for _ in range(40):
        m.insert_keyword("".join(rng.choice("abcd")
                                 for _ in range(rng.randint(1, 6))))
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=8, step_k=2)
    text = "".join(rng.choice("abcd ") for _ in range(4096))
    base = sharded.count(text)
    for _ in range(10):
        m.insert_keyword("".join(rng.choice("abcd")
                                 for _ in range(rng.randint(1, 6))))
    in_place = sharded.refresh()
    fresh = ShardedScanner(m, mesh8, n_streams_per_device=8, step_k=2)
    assert sharded.count(text) == fresh.count(text) >= base
    np.testing.assert_array_equal(sharded.scan_states(text),
                                  fresh.scan_states(text))
    single = m.scanner(n_streams=16, step_k=2)
    assert sharded.count(text) == single.count(text)
    assert sharded.version == m.version
    assert isinstance(in_place, bool)


def test_sharded_refresh_halo_growth(mesh8):
    """A refreshed-in long keyword spanning shard edges is still exact."""
    m = ac.Machine()
    m.insert_keyword("spanner")
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    long_kw = "spannerspannerspanner"       # depth 21 > old halo 6
    m.insert_keyword(long_kw)
    sharded.refresh()
    assert sharded.halo >= len(long_kw) - 1
    T = 8 * 64
    text = ["."] * T
    start = 64 * 3 - 10                     # span a shard edge
    for k, ch in enumerate(long_kw):
        text[start + k] = ch
    text = "".join(text)
    # 'spanner' occurs 3x inside long_kw, plus the long keyword itself
    assert sharded.count(text) == 4
    single = m.scanner(n_streams=16)
    assert sharded.count(text) == single.count(text)


def test_sharded_count_beyond_int32(mesh8):
    """Two-level reduction: a mesh-wide total past 2^31 must come back
    exact (int32 per-stream accumulators on device, int64 combine on host).
    Round 1 psum'd in int32 and saturated at 2^31 per call."""
    import jax.numpy as jnp

    from aho_corasick_1975_tpu.parallel.sharded_scan import make_sharded_count

    m = ac.Machine()
    m.insert_keyword("a")
    tables = m.compile()
    dflat = jnp.asarray(tables.delta.reshape(-1))
    # synthetic per-state output counts: every 'a' position "emits" 2^22
    nb_out = jnp.asarray(np.array([0, 1 << 22], np.int32))
    V = tables.vocab_size
    fn = make_sharded_count(mesh8, V, halo=0)
    ids = np.ones(1024, np.int32)  # 1024 positions x 2^22 = 2^32 matches
    from jax.sharding import NamedSharding, PartitionSpec as P
    placed = jax.device_put(jnp.asarray(ids),
                            NamedSharding(mesh8, P("data")))
    per_stream = np.asarray(fn(dflat, nb_out, placed))
    total = int(per_stream.sum(dtype=np.int64))
    assert total == 1024 * (1 << 22) == 2 ** 32
    assert total > 2 ** 31  # the round-1 cap
    assert per_stream.shape[0] == 8  # gathered per-device rows


def test_sharded_session_chunked_count(mesh8):
    """Chunked mesh-wide streaming: a keyword split across a CHUNK edge
    (not just a shard edge) must be counted exactly once — the carry rides
    into shard 0's halo via the replicated head argument."""
    rng = random.Random(11)
    m = ac.Machine()
    for _ in range(30):
        m.insert_keyword("".join(rng.choice("ab")
                                 for _ in range(rng.randint(1, 5))))
    m.insert_keyword("spanner")
    text = "".join(rng.choice("ab x") for _ in range(3000))
    # plant 'spanner' exactly across each chunk boundary
    chunk = 700
    text = list(text)
    for edge in (chunk, 2 * chunk, 3 * chunk):
        for k, ch in enumerate("spanner"):
            text[edge - 3 + k] = ch
    text = "".join(text)
    single = m.scanner(n_streams=8)
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    assert sharded.count(text) == single.count(text)
    sess = sharded.session()
    total = sum(sess.feed_count(text[i:i + chunk])
                for i in range(0, len(text), chunk))
    assert total == single.count(text)
    assert sess.total == total


def test_sharded_session_matches_and_checkpoint(mesh8):
    """feed_matches parity with the single-chip session, plus checkpoint/
    restore mid-stream (the scan-resume story, SURVEY.md §5)."""
    from aho_corasick_1975_tpu.models.scanner import StreamSession
    m = ac.Machine()
    for kw in ["he", "she", "hers", "edge"]:
        m.insert_keyword(kw)
    text = "ushers edge he xx edge hers " * 40
    chunks = [text[i:i + 230] for i in range(0, len(text), 230)]
    single = m.scanner(n_streams=8)
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    s1, s2 = single.session(), sharded.session()
    ev1, ev2 = [], []
    for i, c in enumerate(chunks):
        ev1.extend((e.end, e.start, mt.text()) for e, mt in s1.feed_matches(c))
        if i == len(chunks) // 2:  # checkpoint/restore mid-stream
            s2 = StreamSession.restore(sharded, s2.checkpoint())
        ev2.extend((e.end, e.start, mt.text()) for e, mt in s2.feed_matches(c))
    assert ev1 == ev2 and len(ev1) > 0


def test_sharded_count_many_parity(mesh8):
    rng = random.Random(5)
    m = ac.Machine()
    for _ in range(25):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 4))))
    docs = ["".join(rng.choice("abcx") for _ in range(rng.randint(0, 300)))
            for _ in range(23)]
    single = m.scanner(n_streams=8)
    sharded = ShardedScanner(m, mesh8, n_streams_per_device=4)
    np.testing.assert_array_equal(sharded.count_many(docs),
                                  single.count_many(docs))
    expected = [single.count(d) for d in docs]
    np.testing.assert_array_equal(sharded.count_many(docs), expected)
    assert sharded.count_many([]).shape == (0,)
