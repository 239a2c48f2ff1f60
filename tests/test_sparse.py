"""Filter-then-verify sparse count (ops/sparse.py) — exactness against the
dense kernels and the brute-force oracle on low-density corpora, across all
three cores (dense gather, packed k-gram, MXU) and the session carry."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def _brute_count(text, keywords):
    return sum(sum(1 for i in range(len(text) - len(k) + 1)
                   if text[i:i + len(k)] == k) for k in keywords)


def _sparse_text(rng, n, keywords, density=0.01, filler="0123456789+-*/"):
    """Mostly-OOV text with keyword letters (and full keywords) sprinkled."""
    chars = [rng.choice(filler) for _ in range(n)]
    i = 0
    while i < n - 10:
        if rng.random() < density:
            kw = rng.choice(keywords)
            if rng.random() < 0.5:  # full keyword
                chars[i:i + len(kw)] = list(kw)
                i += len(kw)
            else:  # stray keyword letters (live but matchless noise)
                chars[i] = rng.choice(kw)
                i += 1
        i += rng.randint(1, 200)
    return "".join(chars)


KEYWORDS = ["needle", "haystack", "nee", "ack", "stacks", "ey", "needles"]


@pytest.mark.parametrize("mode", ["on", "auto"])
def test_sparse_count_matches_dense_and_oracle(mode):
    rng = random.Random(11)
    m = ac.Machine()
    for kw in KEYWORDS:
        m.insert_keyword(kw)
    dense = m.scanner(n_streams=8, engine="gather")
    sp = m.scanner(n_streams=8, engine="gather", prefilter=mode)
    for n in (100, 5000, 60000):
        text = _sparse_text(rng, n, KEYWORDS)
        want = _brute_count(text, KEYWORDS)
        assert sp.count(text) == dense.count(text) == want
    assert "sparse_live_frac" in sp.stats


def test_sparse_elision_path_exact_and_engaged():
    """Host-side dead-block elision (round-4 stretch): very sparse
    corpora upload only the compacted live windows; counts must stay
    exact incl. session head carry and matches spanning block edges."""
    m = ac.Machine()
    for kw in KEYWORDS:
        m.insert_keyword(kw)
    sp = m.scanner(n_streams=8, engine="gather", prefilter="on")
    text = list("x" * 50_000)
    for pos in (127, 3000, 8191, 30_000):  # incl. block-edge straddles
        text[pos:pos + 6] = "needle"
    text = "".join(text)
    want = _brute_count(text, KEYWORDS)
    assert sp.count(text) == want
    assert "sparse_elided_upload_bytes" in sp.stats
    assert sp.stats["sparse_elided_upload_bytes"] < len(text) * 4 // 2
    # head carry: a keyword split across a chunk edge
    sess = sp.session()
    got = sess.feed_count(text[:8193]) + sess.feed_count(text[8193:])
    assert got == want
    # stepped core variant too
    sp2 = m.scanner(n_streams=8, prefilter="on")
    if sp2._stepped is not None:
        assert sp2.count(text) == want


def test_sparse_raw_elision_bytes_and_head():
    """Raw-input elision: the filter runs over raw bytes BEFORE encode;
    counts exact incl. chunk-edge keywords via the session head carry."""
    m = ac.Machine()
    for kw in KEYWORDS:
        m.insert_keyword(kw.encode())
    sp = m.scanner(n_streams=8, prefilter="on")
    body = bytearray(b"\x00" * 60_000)
    for pos in (500, 8190, 40_000):
        body[pos:pos + 6] = b"needle"
    data = bytes(body)
    cur = m.initiate()
    want = m.match_stream(cur, data)
    assert sp.count(data) == want > 0
    assert "sparse_elided_upload_bytes" in sp.stats
    # session: split mid-keyword at a chunk edge
    sess = sp.session()
    assert sess.feed_count(data[:8193]) + sess.feed_count(data[8193:]) \
        == want
    # str input (utf-8 byte raw path) stays exact too
    m2 = ac.Machine()
    m2.insert_keyword("héé")
    sp2 = m2.scanner(n_streams=8, prefilter="on")
    text = " " * 30_000 + "héé" + " " * 5000
    cur2 = m2.initiate()
    assert sp2.count(text) == m2.match_stream(cur2, text) == 1


def test_sparse_auto_dense_raw_skips_refilter(monkeypatch):
    """prefilter='auto' on a match-DENSE raw corpus: the raw filter's
    'dense' verdict routes straight to the dense raw engines — the
    id-path filter must NOT run again (review r4)."""
    from aho_corasick_1975_tpu.ops import sparse as sparse_mod
    m = ac.Machine()
    for kw in KEYWORDS:
        m.insert_keyword(kw.encode())
    sp = m.scanner(n_streams=8, prefilter="auto")
    data = ("needle" * 3000).encode()  # every block live

    def boom(*a, **kw):
        raise AssertionError("id-path live_blocks re-ran after the raw "
                             "filter already measured density")
    monkeypatch.setattr(sparse_mod, "live_blocks", boom)
    cur = m.initiate()
    assert sp.count(data) == m.match_stream(cur, data) > 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sparse_raw_elision_differential_fuzz(seed):
    """Randomized densities/modes/chunkings of the raw elision path vs
    the host streaming oracle (the newest code gets the widest fuzz)."""
    rng = random.Random(100 + seed)
    m = ac.Machine()
    kws = [kw.encode() for kw in KEYWORDS] + [b"\x00z\x00"]  # NUL letter
    for kw in kws[:5 + seed]:
        m.insert_keyword(kw)
    density = [0.0005, 0.005, 0.05, 0.4][seed]
    n = 40_000 + 7000 * seed
    body = bytearray(b"\x01" * n)  # 0x01 appears in no keyword -> dead
    plants = max(1, int(n * density / 8))
    for _ in range(plants):
        kw = kws[rng.randrange(len(kws[:5 + seed]))]
        p = rng.randrange(0, n - 16)
        body[p:p + len(kw)] = kw
    data = bytes(body)
    cur = m.initiate()
    want = m.match_stream(cur, data)
    for mode in ("on", "auto"):
        sp = m.scanner(n_streams=8, prefilter=mode)
        assert sp.count(data) == want, (seed, mode)
        # ragged session feeds (chunk edges mid-keyword)
        sess = sp.session()
        total, pos = 0, 0
        while pos < n:
            step = rng.choice([13, 257, 5000])
            total += sess.feed_count(data[pos:pos + step])
            pos += step
        assert total == want, (seed, mode)


def test_sparse_raw_elision_sharded_parity():
    """Mesh sibling of the raw elision path: the windows upload sharded
    (no halo collective — each window is self-contained)."""
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    m = ac.Machine()
    for kw in KEYWORDS:
        m.insert_keyword(kw.encode())
    sh = ShardedScanner(m, make_mesh(8), n_streams_per_device=4,
                        prefilter="on")
    body = bytearray(b"\x00" * 60_000)
    for pos in (500, 8190, 29_999, 55_000):
        body[pos:pos + 6] = b"needle"
    data = bytes(body)
    cur = m.initiate()
    want = m.match_stream(cur, data)
    assert sh.count(data) == want > 0
    assert "sparse_elided_upload_bytes" in sh.stats
    # session head carry across a mid-keyword chunk edge
    sess = sh.session()
    assert sess.feed_count(data[:8193]) + sess.feed_count(data[8193:]) \
        == want


def test_sparse_dense_corpus_exact_and_auto_fallback():
    rng = random.Random(5)
    m = ac.Machine()
    for kw in ["ab", "bc", "abc", "ca"]:
        m.insert_keyword(kw)
    text = "".join(rng.choice("abc") for _ in range(30000))  # 100% live
    want = m.scanner(n_streams=8).count(text)
    on = m.scanner(n_streams=8, prefilter="on")
    assert on.count(text) == want          # "on" stays exact when dense
    assert on.stats["sparse_live_frac"] == 1.0
    auto = m.scanner(n_streams=8, prefilter="auto")
    assert auto.count(text) == want        # falls through to dense kernels


def test_sparse_all_oov_short_circuits():
    m = ac.Machine()
    m.insert_keyword("xyz")
    sp = m.scanner(prefilter="on")
    assert sp.count("0123456789" * 500) == 0
    assert sp.stats["sparse_live_frac"] == 0.0


def test_sparse_match_spanning_block_edge():
    m = ac.Machine()
    m.insert_keyword("needle")
    sp = m.scanner(prefilter="on", engine="gather")
    for edge in (128, 256, 131072):  # keyword straddles an L_blk boundary
        text = list("." * (edge + 64))
        text[edge - 3:edge + 3] = "needle"
        text = "".join(text)
        assert sp.count(text) == 1, edge


def test_sparse_stepped_and_mxu_cores():
    rng = random.Random(23)
    # MXU-small machine: sparse+mxu compose
    m = ac.Machine()
    for kw in ["nee", "dle", "ndl"]:
        m.insert_keyword(kw)
    text = _sparse_text(rng, 40000, ["nee", "dle", "ndl"])
    want = _brute_count(text, ["nee", "dle", "ndl"])
    mxu = m.scanner(engine="mxu", prefilter="on")
    assert mxu._mxu is not None
    assert mxu.count(text) == want
    # force the packed stepped core (gather engine, larger machine)
    big = ac.Machine()
    big.insert_keywords(["".join(rng.choice("nedl") for _ in range(6))
                         for _ in range(300)] + ["needle"])
    sc = big.scanner(engine="gather", prefilter="on")
    assert sc._stepped is not None and sc._stepped.packed is not None
    dense = big.scanner(engine="gather")
    text2 = _sparse_text(rng, 50000, ["needle", "nedd", "ledde"])
    assert sc.count(text2) == dense.count(text2)


def test_sparse_session_carry_across_chunks():
    m = ac.Machine()
    m.insert_keyword("needle")
    sp = m.scanner(prefilter="on")
    text = list("." * 4000)
    text[1998:2004] = "needle"  # spans the chunk edge at 2000
    text = "".join(text)
    sess = sp.session()
    total = sess.feed_count(text[:2000]) + sess.feed_count(text[2000:])
    assert total == 1


def test_sparse_rejects_bad_mode():
    m = ac.Machine()
    m.insert_keyword("a")
    with pytest.raises(ValueError, match="prefilter"):
        m.scanner(prefilter="yes")
