"""Round-5 retrieval defaults (VERDICT r4 #1/#2): the no-arg
find_matches on prefilter scanners routes through the sparse/elided
bounded path (never the full per-position decode), and mesh auto
retrieval makes exactly ONE pass over the corpus."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.models.results import MatchSet
from aho_corasick_1975_tpu.parallel.mesh import make_mesh
from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

WORDS = ["he", "she", "his", "hers", "usher"]


def _machine():
    m = ac.Machine()
    for w in WORDS:
        m.insert_keyword(w)
    return m


def _sparse_corpus(T=40_000, seed=3):
    """Mostly-OOV corpus with a few keyword islands (the prefilter's
    home turf)."""
    rng = random.Random(seed)
    buf = ["."] * T
    for _ in range(25):
        p = rng.randrange(0, T - 10)
        w = rng.choice(WORDS)
        buf[p:p + len(w)] = w
    return "".join(buf)


def _oracle(m, text):
    cur = m.initiate()
    out = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch)):   # index 0 = longest first
            mt = m.get_match(cur, j)
            out.append((i, mt.length))
    return out


def _events(ms):
    return [(int(e), int(l))
            for e, l in zip(ms.ends, ms.ends - ms.starts + 1)]


@pytest.mark.parametrize("prefilter", ["on", "auto"])
def test_prefilter_noarg_find_matches_takes_sparse_path(prefilter):
    m = _machine()
    text = _sparse_corpus()
    sc = ac.DenseScanner(m, prefilter=prefilter)
    ms = sc.find_matches(text)
    # the r4 bug: this routed to scan_states full decode
    assert sc.stats["last_op"] == "find_matches_sparse"
    assert isinstance(ms, MatchSet)
    assert _events(ms) == _oracle(m, text)
    # and it agrees with the explicit bounded path
    ms2 = sc.find_matches(text, max_hits=4096)
    assert _events(ms2) == _events(ms)


def test_prefilter_noarg_dense_corpus_falls_to_fast_dense_path():
    """A match-dense corpus under prefilter='auto' must take the packed
    stepped auto path, not the full decode."""
    m = _machine()
    text = "ushers his hers " * 2000
    sc = ac.DenseScanner(m, prefilter="auto")
    ms = sc.find_matches(text)
    assert sc.stats["last_op"] in ("find_matches_device",
                                  "find_matches_sparse")
    assert _events(ms) == _oracle(m, text)


def test_prefilter_noarg_session_heads_parity():
    """Chunked session with the sparse default: matches spanning chunk
    edges must resolve via the head carry, byte-identical to the
    uninterrupted scan."""
    m = _machine()
    text = _sparse_corpus(20_000, seed=7)
    sc = ac.DenseScanner(m, prefilter="on")
    whole = _events(sc.find_matches(text))
    sess = sc.session()
    got = []
    step = 3001  # odd chunk size, cuts keywords
    for i in range(0, len(text), step):
        out = sess.feed_matches(text[i:i + step])
        got.extend(_events(out))
    assert got == whole == _oracle(m, text)


def test_mesh_prefilter_noarg_takes_sparse_path():
    m = _machine()
    text = _sparse_corpus()
    sc = ShardedScanner(m, make_mesh(), prefilter="on")
    ms = sc.find_matches(text)
    assert "sparse_live_frac" in sc.stats
    assert _events(ms) == _oracle(m, text)


def test_mesh_auto_retrieval_is_single_pass(monkeypatch):
    """The r4 auto path ran a full count() to size buffers; round 5 must
    not touch count() at all."""
    m = _machine()
    text = "ushers his hers " * 4000 + _sparse_corpus(10_000)
    sc = ShardedScanner(m, make_mesh())
    expect = _oracle(m, text)

    def boom(*a, **k):                                 # pragma: no cover
        raise AssertionError("auto retrieval ran a count() pass")

    monkeypatch.setattr(sc, "count", boom)
    monkeypatch.setattr(sc, "_count_locked", boom)
    ms = sc.find_matches(text)
    assert _events(ms) == expect


def test_mesh_auto_retrieval_parity_with_bounded():
    m = _machine()
    text = "ushers his hers " * 1500
    sc = ShardedScanner(m, make_mesh())
    a = sc.find_matches(text)
    b = sc.find_matches(text, max_hits_per_shard=1 << 15)
    assert _events(a) == _events(b) == _oracle(m, text)


def test_mesh_auto_sizes_per_shard_not_global(monkeypatch):
    """ADVICE r4 medium: per-shard buffers must NOT be sized from the
    global total. Capture the out_size the extract factory receives and
    check it is below the global match count on a corpus whose matches
    concentrate per shard at well under the total."""
    from aho_corasick_1975_tpu.parallel import sharded_scan as ss

    m = _machine()
    # moderately dense everywhere: every shard carries ~total/n_dev
    # matches, below the extreme-density decode fallback threshold
    text = ("hers" + "." * 16) * 5_000
    sc = ShardedScanner(m, make_mesh())
    total = sc.count(text)
    seen = {}
    orig = ss.make_sharded_stepped_hits_extract.__wrapped__

    def spy(mesh, V, k, count_bits, halo_steps, cap, out_size, *a, **kw):
        seen["out_size"] = out_size
        return orig(mesh, V, k, count_bits, halo_steps, cap, out_size,
                    *a, **kw)

    monkeypatch.setattr(ss, "make_sharded_stepped_hits_extract", spy)
    ms = sc.find_matches(text)
    assert len(ms) == total
    assert seen["out_size"] < total  # per-shard bucket, not pow2(total)


def test_mesh_auto_extreme_density_falls_back_lean(monkeypatch):
    """Every position matches: past the footprint floor the auto path
    must route to the full decode instead of allocating replicated hit
    buffers larger than what it replaces (ADVICE r4) — exactly once the
    floor is crossed, and exact either way."""
    from aho_corasick_1975_tpu.parallel import sharded_scan as ss

    m = ac.Machine()
    m.insert_keyword("a")
    sc = ShardedScanner(m, make_mesh())
    text = "a" * 4096
    # below the floor: fast path, exact
    ms = sc.find_matches(text)
    assert len(ms) == 4096 and list(ms.ends[:3]) == [0, 1, 2]
    # shrink the floor so this density now counts as "at scale"
    monkeypatch.setattr(ss, "_AUTO_DECODE_FLOOR_BYTES", 1024)
    called = {}
    orig = sc.scan_states

    def spy(*a, **kw):
        called["decode"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(sc, "scan_states", spy)
    ms2 = sc.find_matches(text)
    assert called.get("decode") and len(ms2) == 4096
