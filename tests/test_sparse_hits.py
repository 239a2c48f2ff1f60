"""Filter-then-extract match retrieval (ops/sparse.make_sparse_hits):
the sparse prefilter applied to find_matches(max_hits=...), not just
count(). Conformance bar: byte-identical MatchSet vs the dense full-decode
path (which is itself diffed against the compiled reference's event
stream in test_reference_oracle)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def _sparse_corpus(rng, n=1500, p=0.08):
    parts = []
    for _ in range(n):
        parts.append("z" * rng.randint(40, 180))
        if rng.random() < p:
            parts.append(rng.choice(["needle", "pin", "hay", "haypin",
                                     "pinhay", "nee"]))
    return "".join(parts)


@pytest.fixture
def machine():
    m = ac.Machine()
    for w in ["needle", "pin", "hay", "nee", "inha"]:
        m.insert_keyword(w)
    return m


def test_sparse_hits_match_dense_decode(machine):
    rng = random.Random(0)
    text = _sparse_corpus(rng)
    dense = machine.scanner().find_matches(text)
    sp = machine.scanner(prefilter="on")
    got = sp.find_matches(text, max_hits=8192)
    assert sp.stats["last_op"] == "find_matches_sparse"
    assert np.array_equal(got.ends, dense.ends)
    assert np.array_equal(got.end_states, dense.end_states)
    assert np.array_equal(got.indices, dense.indices)
    # event-order contract: per end position, index 0 = longest
    for (ev, mt), (ev2, mt2) in zip(list(got)[:50], list(dense)[:50]):
        assert (ev.start, ev.end, mt.text()) == (ev2.start, ev2.end,
                                                 mt2.text())


def test_sparse_hits_head_carry(machine):
    """A keyword split across the head/stream boundary must still hit."""
    sp = machine.scanner(prefilter="on")
    dense = machine.scanner()
    head = machine.vocab.lookup_many("need")
    text = "le" + "z" * 700 + "pin"
    got = sp.find_matches(text, head=head, max_hits=64)
    want = dense.find_matches(text, head=head)
    assert len(want.ends) > 0
    assert np.array_equal(got.ends, want.ends)
    assert np.array_equal(got.end_states, want.end_states)


def test_sparse_hits_block_straddle(machine):
    """Keywords placed exactly across every L_blk=128 boundary."""
    piece = "z" * 125 + "needle"  # 'needle' straddles the 128-symbol edge
    text = piece * 40
    sp = machine.scanner(prefilter="on")
    got = sp.find_matches(text, max_hits=1024)
    want = machine.scanner().find_matches(text)
    assert np.array_equal(got.ends, want.ends)
    assert np.array_equal(got.end_states, want.end_states)


def test_elided_hits_engaged_and_exact(machine):
    """Round 4: a very sparse raw corpus routes retrieval through the
    host-elided windows (only live windows upload) — byte-identical to
    the full decode, stats record the elided wire bytes."""
    sp = machine.scanner(prefilter="on")
    text = "z" * 40_000 + "needle" + "z" * 20_000 + "pinhay" + "z" * 5000
    dense = machine.scanner().find_matches(text)
    got = sp.find_matches(text, max_hits=256)
    assert np.array_equal(got.ends, dense.ends)
    assert np.array_equal(got.end_states, dense.end_states)
    assert "sparse_elided_upload_bytes" in sp.stats
    assert sp.stats["sparse_elided_upload_bytes"] < len(text) * 4 // 4
    # bytes corpus through a byte machine
    mb = ac.Machine()
    for w in [b"needle", b"pin"]:
        mb.insert_keyword(w)
    spb = mb.scanner(prefilter="on")
    data = b"\x00" * 30_000 + b"needle" + b"\x00" * 9000 + b"pin"
    got_b = spb.find_matches(data, max_hits=64)
    ref = mb.scanner().find_matches(data)
    assert np.array_equal(got_b.ends, ref.ends)
    # session head carry across a chunk edge mid-keyword
    sess = spb.session()
    e1 = [(ev.end, mt.text()) for ev, mt in
          sess.feed_matches(data[:30_003], max_hits=64)]
    e2 = [(ev.end, mt.text()) for ev, mt in
          sess.feed_matches(data[30_003:], max_hits=64)]
    assert e1 + e2 == [(ev.end, mt.text()) for ev, mt in ref]
    # overflow still raises through the elided kernel
    with pytest.raises(ValueError, match="max_hits"):
        spb.find_matches(data, max_hits=1)


def test_sparse_hits_all_oov(machine):
    got = machine.scanner(prefilter="on").find_matches("z" * 5000,
                                                       max_hits=8)
    assert len(got.ends) == 0


def test_sparse_hits_overflow_raises(machine):
    rng = random.Random(1)
    text = _sparse_corpus(rng)
    sp = machine.scanner(prefilter="on")
    with pytest.raises(ValueError, match="max_hits"):
        sp.find_matches(text, max_hits=2)


def test_sparse_hits_auto_falls_back_when_dense(machine):
    """auto mode on a dense corpus: the prefilter declines and the regular
    bounded-hits kernel answers (same results)."""
    text = "needlepinhay" * 500
    sp = machine.scanner(prefilter="auto")
    got = sp.find_matches(text, max_hits=1 << 14)
    want = machine.scanner().find_matches(text)
    assert sp.stats["last_op"] == "find_matches_device"
    assert np.array_equal(got.ends, want.ends)
    assert np.array_equal(got.end_states, want.end_states)


def test_sparse_hits_offset(machine):
    sp = machine.scanner(prefilter="on")
    text = "z" * 300 + "pin" + "z" * 300
    got = sp.find_matches(text, offset=1000, max_hits=8)
    assert list(got.ends) == [1000 + 300 + 2]


# -- mesh parity (8-device CPU mesh from conftest) --------------------------


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_elided_hits_parity(machine, mesh8):
    """Mesh elided retrieval: very sparse raw corpus, windows sharded,
    absolute positions via the sharded block indices."""
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    sh = ShardedScanner(machine, mesh8, n_streams_per_device=4,
                        prefilter="on")
    text = "z" * 30_000 + "needle" + "z" * 20_000 + "pinhay" + "z" * 3000
    ref = machine.scanner().find_matches(text)
    got = sh.find_matches(text, max_hits_per_shard=64)
    assert np.array_equal(got.ends, ref.ends)
    assert np.array_equal(got.end_states, ref.end_states)
    assert "sparse_elided_upload_bytes" in sh.stats
    # session carry across a mid-keyword chunk edge
    sess = sh.session()
    e = [(ev.end, mt.text()) for ev, mt in
         sess.feed_matches(text[:30_003], max_hits=64)]
    e += [(ev.end, mt.text()) for ev, mt in
          sess.feed_matches(text[30_003:], max_hits=64)]
    assert e == [(ev.end, mt.text()) for ev, mt in ref]
    with pytest.raises(ValueError, match="max_hits_per_shard"):
        sh.find_matches(text, max_hits_per_shard=1)


def test_mesh_sparse_hits_parity(machine, mesh8):
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    rng = random.Random(7)
    text = _sparse_corpus(rng, n=500)
    sh = ShardedScanner(machine, mesh8, prefilter="on")
    got = sh.find_matches(text, max_hits_per_shard=4096)
    want = machine.scanner().find_matches(text)
    assert len(want.ends) > 0
    assert np.array_equal(got.ends, want.ends)
    assert np.array_equal(got.end_states, want.end_states)
    assert np.array_equal(got.indices, want.indices)


def test_mesh_sparse_hits_shard_boundary(machine, mesh8):
    """Keywords planted across every shard edge must survive the sparse
    path's ppermute halo handoff."""
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    n_dev = 8
    L_blk = 128
    shard = "z" * (4 * L_blk)
    text = list(shard * n_dev)
    for d in range(1, n_dev):
        pos = d * len(shard) - 3  # 'needle' straddles the shard edge
        text[pos:pos + 6] = "needle"
    text = "".join(text)
    sh = ShardedScanner(machine, mesh8, prefilter="on")
    got = sh.find_matches(text, max_hits_per_shard=64)
    want = machine.scanner().find_matches(text)
    assert len(want.ends) == 2 * (n_dev - 1)  # 'needle' + suffix 'nee'? no:
    # 'needle' contains 'nee' at its start, ending inside — both count
    assert np.array_equal(got.ends, want.ends)
    assert np.array_equal(got.end_states, want.end_states)


def test_mesh_sparse_hits_overflow(machine, mesh8):
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    rng = random.Random(8)
    text = _sparse_corpus(rng, n=400)
    sh = ShardedScanner(machine, mesh8, prefilter="on")
    with pytest.raises(ValueError, match="max_hits_per_shard"):
        sh.find_matches(text, max_hits_per_shard=1)
