"""Packed k-gram bounded-hit retrieval (VERDICT r3 #3: retrieval at
count-engine speed). The sequential leg of find_matches(max_hits=...) is
now the same one-gather-per-k-symbols packed scan the count engine runs;
only live grams (count bits != 0) get per-position refinement. Parity bar:
byte-identical MatchSets vs the full-decode path (itself oracle-verified
against the sequential reference recurrence), including session carries,
raw device-encode inputs, k=1 packed tables, and the sharded sibling.
"""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def _events(ms):
    return [(ev.end, ev.start, mt.text(), mt.rank) for ev, mt in ms]


def _full_decode(sc, signs, offset=0, head=None):
    """Independent oracle: per-position states + CSR decode (the
    pre-round-4 default path — find_matches now routes to the fast
    kernels by default, so the oracle must be constructed explicitly)."""
    from aho_corasick_1975_tpu.models.results import MatchSet
    from aho_corasick_1975_tpu.ops.decode import decode_matches_arrays
    states = sc.scan_states(signs, head=head)
    ends, end_states, idx = decode_matches_arrays(states, sc.tables,
                                                  offset)
    return MatchSet(sc.machine, sc.tables, ends, end_states, idx)


def _machine(seed=0, n=60, alpha="abc"):
    rng = random.Random(seed)
    m = ac.Machine()
    for i in range(n):
        m.insert_keyword("".join(rng.choice(alpha)
                                 for _ in range(rng.randint(1, 6))),
                         value=i)
    return m


def _text(seed, n=30_000, alpha="abcx "):
    rng = random.Random(seed)
    return "".join(rng.choice(alpha) for _ in range(n))


@pytest.fixture
def sc_k2():
    m = _machine()
    sc = m.scanner(n_streams=8, step_k=2)
    st = sc._stepped
    assert st is not None and st.k == 2 and st.packed is not None
    return sc


def test_stepped_hits_parity_vs_full_decode(sc_k2):
    text = _text(1)
    full = _full_decode(sc_k2, text)
    fast = sc_k2.find_matches(text, max_hits=1 << 14)
    assert len(fast) == len(full) > 0
    assert _events(fast) == _events(full)


def test_stepped_hits_is_really_the_stepped_kernel(sc_k2, monkeypatch):
    """The dense bounded-hits factories must NOT be touched when the
    packed table exists (guards against a silent fallback)."""
    from aho_corasick_1975_tpu.ops import hits as hits_mod

    def boom(*a, **kw):
        raise AssertionError("dense hits kernel used on the stepped path")

    monkeypatch.setattr(hits_mod, "make_blocked_hits_stream", boom)
    monkeypatch.setattr(hits_mod, "make_blocked_hits_raw", boom)
    text = _text(2, 5000)
    full = _full_decode(sc_k2, text)
    fast = sc_k2.find_matches(text, max_hits=4096)
    assert _events(fast) == _events(full)


def test_stepped_hits_raw_bytes_path():
    m = ac.Machine()
    for w in [b"he", b"she", b"his", b"hers", b"xyzzyx"]:
        m.insert_keyword(w)
    sc = m.scanner(n_streams=8, step_k=2)
    assert sc._stepped is not None and sc._stepped.packed is not None
    rng = random.Random(3)
    text = "".join(rng.choice("hersxyz ") for _ in range(40_000)).encode()
    assert sc._raw_stream(text) is not None
    full = _full_decode(sc, text)
    fast = sc.find_matches(text, max_hits=1 << 14)
    assert _events(fast) == _events(full) != []


def test_stepped_hits_session_head_carry(sc_k2):
    """Matches spanning a chunk edge keep exact absolute positions."""
    text = _text(4, 9_000)
    whole = _events(_full_decode(sc_k2, text))
    sess = sc_k2.session()
    got = []
    pos, rng = 0, random.Random(5)
    while pos < len(text):
        n = rng.choice([7, 100, 1000])
        chunk = text[pos:pos + n]
        offset = sess.offset
        head = sess._advance(chunk)
        if chunk:
            got += _events(sc_k2.find_matches(chunk, offset=offset,
                                              head=head, max_hits=1 << 13))
        pos += n
    assert got == whole


def test_default_find_matches_is_auto_fast(sc_k2, monkeypatch):
    """find_matches() with NO max_hits now auto-sizes its buffers from
    the scan phase's live count (round 4): same result as the full
    decode, with the full-decode kernel never touched."""
    text = _text(16, 20_000)
    full = _events(_full_decode(sc_k2, text))

    def boom(*a, **kw):
        raise AssertionError("full decode used on the auto fast path")
    monkeypatch.setattr(sc_k2, "scan_states", boom)
    assert _events(sc_k2.find_matches(text)) == full
    # dense-match corpus: auto sizing still cannot overflow
    m = ac.Machine()
    m.insert_keyword("a")
    sc = m.scanner(n_streams=4, step_k=2)
    got = sc.find_matches("a" * 5000)
    assert len(got) == 5000


def test_stepped_hits_overflow_raises(sc_k2):
    text = "abcabc" * 2000
    n = len(sc_k2.find_matches(text))
    with pytest.raises(ValueError, match="max_hits"):
        sc_k2.find_matches(text, max_hits=max(8, n // 4))


def test_both_extract_variants_parity(monkeypatch):
    """The density-adaptive phase B has two implementations; both must be
    byte-identical to full decode. A machine with a 1-char keyword over
    an all-'a' corpus makes EVERY position a hit (dense variant
    guaranteed: n_live == n_grams); forcing _pk1 to None on the same
    corpus exercises the compacting variant at the same density."""
    m = ac.Machine()
    for w in ["a", "aba", "bb"]:
        m.insert_keyword(w)
    sc = m.scanner(n_streams=8, step_k=2)
    assert sc._stepped is not None and sc._stepped.packed is not None
    text = "a" * 10_000 + "bbb" + "ab" * 500
    full = _events(_full_decode(sc, text))
    assert len(full) > 10_000
    dense = _events(sc.find_matches(text, max_hits=1 << 15))
    assert dense == full
    # same corpus through the compacting variant
    monkeypatch.setattr(type(sc), "_pk1", lambda self: None)
    compact = _events(sc.find_matches(text, max_hits=1 << 15))
    assert compact == full


def test_sparse_density_uses_compact_variant(sc_k2):
    """Low-density corpus: one match in 12k symbols (compact variant by
    the n_live*8 > n_grams threshold)."""
    text = "x" * 11_000 + "abc" + "x" * 1000
    full = _events(_full_decode(sc_k2, text))
    fast = _events(sc_k2.find_matches(text, max_hits=64))
    assert fast == full


def test_k1_packed_hits_parity():
    """Big-automaton path: the k=1 packed table also powers retrieval."""
    m = _machine(7, n=600, alpha="abcdefgh")
    sc = m.scanner(step_budget_bytes=1 << 17, n_streams=16)
    st = sc._stepped
    assert st is not None and st.k == 1 and st.packed is not None
    text = _text(8, 25_000, "abcdefghij ")
    full = _full_decode(sc, text)
    fast = sc.find_matches(text, max_hits=1 << 16)
    assert _events(fast) == _events(full) != []


def test_device_resident_find_matches(sc_k2):
    """jax.Array corpora retrieve without host staging (serving parity
    with count()'s device path), on both the stepped and full-decode
    legs."""
    import jax.numpy as jnp
    text = _text(30, 9_000)
    ids = sc_k2.encode(text)
    dev = jnp.asarray(ids)
    full_host = _events(_full_decode(sc_k2, text))
    assert _events(sc_k2.find_matches(dev)) == full_host
    assert _events(sc_k2.find_matches(dev, max_hits=1 << 13)) == full_host
    with pytest.raises(ValueError, match="integer"):
        sc_k2.find_matches(jnp.asarray(ids.astype("float32")),
                           max_hits=64)


def test_session_feed_matches_bounded(sc_k2):
    """StreamSession.feed_matches(max_hits=...) routes chunks through the
    bounded-hits fast path with exact absolute positions."""
    text = _text(31, 8_000)
    whole = _events(_full_decode(sc_k2, text))
    sess = sc_k2.session()
    got = []
    for i in range(0, len(text), 1000):
        got += _events(sess.feed_matches(text[i:i + 1000],
                                         max_hits=1 << 13))
    assert got == whole


def test_mxu_engine_keeps_dense_hits_and_agrees():
    m = ac.Machine()
    for w in ["ab", "ba", "aab"]:
        m.insert_keyword(w)
    sc = m.scanner(engine="mxu", n_streams=4)
    assert sc._mxu is not None
    text = _text(9, 8_000, "ab ")
    full = _full_decode(sc, text)
    fast = sc.find_matches(text, max_hits=1 << 12)
    assert _events(fast) == _events(full) != []


def test_sharded_stepped_hits_parity():
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    m = _machine(10)
    sh = ShardedScanner(m, make_mesh(8), n_streams_per_device=4, step_k=2)
    assert sh._stepped is not None and sh._stepped.packed is not None
    text = list(_text(11, 20_000))
    m.insert_keyword("spanner")
    sh2 = ShardedScanner(m, make_mesh(8), n_streams_per_device=4, step_k=2)
    for edge in (2500, 5000, 10_000):  # plant across shard boundaries
        text[edge - 3:edge + 4] = "spanner"
    text = "".join(text)
    full = sh2.find_matches(text)
    fast = sh2.find_matches(text, max_hits_per_shard=1 << 13)
    assert _events(fast) == _events(full) != []
    single = m.scanner(n_streams=8).find_matches(text)
    assert _events(fast) == _events(single)


def test_sharded_default_find_matches_auto(monkeypatch):
    """Mesh default (no max_hits_per_shard): auto-sized via a fast count
    pass — full decode never touched when the packed table exists."""
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    m = _machine(14)
    sh = ShardedScanner(m, make_mesh(8), n_streams_per_device=4, step_k=2)
    text = _text(15, 12_000)
    single = m.scanner(n_streams=8)
    want = _events(_full_decode(single, text))

    assert _events(sh.find_matches("")) == []

    def boom(*a, **kw):
        raise AssertionError("full decode used on the mesh auto path")
    monkeypatch.setattr(sh, "scan_states", boom)
    assert _events(sh.find_matches(text)) == want


def test_sharded_stepped_hits_overflow_raises():
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    m = _machine(12)
    sh = ShardedScanner(m, make_mesh(8), n_streams_per_device=4, step_k=2)
    text = "abcabc" * 4000
    with pytest.raises(ValueError, match="max_hits_per_shard"):
        sh.find_matches(text, max_hits_per_shard=8)
