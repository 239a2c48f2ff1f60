"""Batched multi-document scoring (DenseScanner.count_many).

Each document must be scanned independently from the root (no state leaks
between documents, no halo warm-up), padding must contribute zero, and the
per-document counts must equal the host streaming oracle — the per-symbol
acm_match totals of the reference (c:433-448) run separately per document.
"""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


def build_machine(seed=0, n_kw=40, alphabet="abcd"):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n_kw):
        m.insert_keyword("".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(1, 5))))
    return m, rng


def oracle_counts(m, docs):
    out = []
    for d in docs:
        cur = m.initiate()
        out.append(sum(m.match(cur, ch) for ch in d))
    return np.asarray(out, np.int64)


@pytest.mark.parametrize("step_k", [1, 2, 3])
def test_count_many_equals_per_doc_oracle(step_k):
    m, rng = build_machine()
    docs = ["".join(rng.choice("abcdz") for _ in range(rng.randint(0, 700)))
            for _ in range(23)]
    docs[3] = ""                      # empty document
    docs[7] = "zzzzz"                 # OOV-only document
    sc = m.scanner(n_streams=4, step_k=step_k)
    got = sc.count_many(docs)
    want = oracle_counts(m, docs)
    assert got.dtype == np.int64
    np.testing.assert_array_equal(got, want)


def test_count_many_no_state_leak_between_documents():
    """A keyword split across two adjacent documents must NOT match."""
    m = ac.Machine()
    m.insert_keyword("abab")
    docs = ["xxab", "abxx"]           # concatenation contains "abab"
    got = m.scanner(n_streams=4).count_many(docs)
    np.testing.assert_array_equal(got, [0, 0])


def test_count_many_padding_emits_nothing():
    """Documents whose lengths hit the bucket edge exactly, and ones far
    below it, agree with the oracle (pad id 0 resets to root silently)."""
    m, _ = build_machine(seed=1)
    sc = m.scanner(n_streams=4)
    k = sc.step_k
    L = 128 * max(k, 1)
    docs = ["ab" * (L // 2), "a", "abcd" * 3]
    np.testing.assert_array_equal(sc.count_many(docs), oracle_counts(m, docs))


def test_count_many_empty_batch_and_singleton():
    m, _ = build_machine(seed=2)
    sc = m.scanner(n_streams=4)
    assert sc.count_many([]).shape == (0,)
    np.testing.assert_array_equal(sc.count_many(["abcd"]),
                                  oracle_counts(m, ["abcd"]))


def test_count_many_matches_single_stream_count():
    """Batch totals equal summed scanner.count over the same documents."""
    m, rng = build_machine(seed=3)
    docs = ["".join(rng.choice("abcd ") for _ in range(rng.randint(1, 300)))
            for _ in range(9)]
    sc = m.scanner(n_streams=4)
    got = sc.count_many(docs)
    assert int(got.sum()) == sum(sc.count(d) for d in docs)


# -- round 5: raw batch staging + device-resident batches (VERDICT r4 #6) --


def test_count_many_raw_byte_batch_parity():
    """Byte documents stage RAW (1 byte/symbol, in-kernel LUT encode) and
    agree with the host oracle, ragged lengths included."""
    rng = random.Random(5)
    m = ac.ByteMachine()
    for _ in range(30):
        m.insert_keyword(bytes(rng.choice(b"abcd")
                               for _ in range(rng.randint(1, 5))))
    docs = [bytes(rng.choice(b"abcdz") for _ in range(rng.randint(0, 900)))
            for _ in range(17)]
    docs[2] = b""
    sc = m.scanner(n_streams=4)
    got = sc.count_many(docs)
    np.testing.assert_array_equal(got, oracle_counts(m, docs))
    assert sc.stats["last_op"] == "count_many_raw"


def test_count_many_raw_utf8_str_batch_on_byte_machine():
    m = ac.ByteMachine()
    m.insert_keyword("héllo")
    m.insert_keyword("wörld")
    docs = ["say héllo", "wörld wörld!", "", "plain ascii", "héllowörld"]
    sc = m.scanner(n_streams=4)
    got = sc.count_many(docs)
    want = np.asarray([1, 2, 0, 0, 2], np.int64)
    np.testing.assert_array_equal(got, want)
    assert sc.stats["last_op"] == "count_many_raw"


def test_count_many_mixed_kind_batch_falls_back_to_host_encode():
    """A batch mixing LUT kinds (str -> codepoint LUT, bytes -> byte
    LUT) must take the host-encode path, with per-doc semantics equal to
    scanning each document alone."""
    m, rng = build_machine(seed=6)
    docs = ["abcd", b"abcd"]
    sc = m.scanner(n_streams=4)
    got = sc.count_many(docs)
    assert sc.stats["last_op"] == "count_many"  # NOT count_many_raw
    np.testing.assert_array_equal(got, [sc.count(d) for d in docs])
    # while a str-only batch on the same scanner stages raw
    sc.count_many(["abcd", "dcba"])
    assert sc.stats["last_op"] == "count_many_raw"
    # a non-raw-able doc (tuple of ints) forces the host-encode path
    m2 = ac.Machine()
    m2.insert_keyword((1, 2))
    sc2 = m2.scanner(n_streams=4)
    got = sc2.count_many([(1, 2, 1, 2), (9, 9), ()])
    np.testing.assert_array_equal(got, np.asarray([2, 0, 0], np.int64))
    assert sc2.stats["last_op"] == "count_many"


@pytest.mark.parametrize("step_k", [1, 2])
def test_count_many_device_resident_batch(step_k):
    import jax.numpy as jnp

    m, rng = build_machine(seed=7)
    docs = ["".join(rng.choice("abcdz") for _ in range(rng.randint(1, 300)))
            for _ in range(11)]
    sc = m.scanner(n_streams=4, step_k=step_k)
    want = oracle_counts(m, docs)
    L = 512  # multiple of any step_k used here
    tm = np.zeros((L, len(docs)), np.int32)
    for j, d in enumerate(docs):
        ids = sc.encode(d)
        tm[:len(ids), j] = ids
    got = sc.count_many(jnp.asarray(tm))
    np.testing.assert_array_equal(got, want)
    assert sc.stats["last_op"] == "count_many_device"
    # misaligned L still exact through the dense-table fallback
    tm2 = np.zeros((L + 1, len(docs)), np.int32)
    for j, d in enumerate(docs):
        ids = sc.encode(d)
        tm2[:len(ids), j] = ids
    np.testing.assert_array_equal(sc.count_many(jnp.asarray(tm2)), want)
    with pytest.raises(ValueError, match="integer"):
        sc.count_many(jnp.zeros((8, 8), jnp.float32))
    with pytest.raises(ValueError, match=r"\[L, B\]"):
        sc.count_many(jnp.zeros(8, jnp.int32))


def test_count_many_mesh_raw_and_device_batch():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aho_corasick_1975_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    rng = random.Random(8)
    m = ac.ByteMachine()
    for _ in range(25):
        m.insert_keyword(bytes(rng.choice(b"abc")
                               for _ in range(rng.randint(1, 4))))
    docs = [bytes(rng.choice(b"abcz") for _ in range(rng.randint(0, 600)))
            for _ in range(19)]
    mesh = make_mesh()
    sc = ShardedScanner(m, mesh, n_streams_per_device=4)
    want = oracle_counts(m, docs)
    np.testing.assert_array_equal(sc.count_many(docs), want)  # raw staging
    # pre-placed device batch, B a mesh multiple
    L, B = 768, 24
    tm = np.zeros((L, B), np.int32)
    for j, d in enumerate(docs):
        ids = sc.encode(d)
        tm[:len(ids), j] = ids
    placed = jax.device_put(
        tm, NamedSharding(mesh, P(None, DATA_AXIS)))
    got = sc.count_many(placed)
    np.testing.assert_array_equal(got[:len(docs)], want)
    np.testing.assert_array_equal(got[len(docs):], 0)
    with pytest.raises(ValueError, match="divisible"):
        sc.count_many(jnp.zeros((L, 23), jnp.int32))


@pytest.mark.parametrize("step_k", [1, 2, 3])
def test_count_many_document_splitting_parity(step_k):
    """c > 1 block splitting (round 5): few LONG documents with a wide
    scanner must split into halo-warmed blocks and stay exact, including
    keywords straddling every internal block edge."""
    m, rng = build_machine(seed=11, alphabet="ab")
    docs = ["".join(rng.choice("abz") for _ in range(9000 + i * 1000))
            for i in range(3)]
    sc = m.scanner(n_streams=512, step_k=step_k)
    c, Lp = sc._split_for(16 * 128 * max(step_k, 1), 8, 128 * max(step_k, 1))
    assert c > 1  # the split actually engages at this geometry
    np.testing.assert_array_equal(sc.count_many(docs), oracle_counts(m, docs))


def test_count_many_split_straddles_block_edges():
    """Plant one keyword across every Lp boundary explicitly."""
    m = ac.Machine()
    m.insert_keyword("abcabc")
    sc = m.scanner(n_streams=1024, step_k=1)
    L_doc = 6000
    doc = ["z"] * L_doc
    # place keywords at every multiple of 128 minus 3 (straddles any
    # 128-multiple block boundary the splitter can pick)
    ends = 0
    for p in range(125, L_doc - 6, 128):
        doc[p:p + 6] = "abcabc"
        ends += 1
    docs = [("".join(doc)), "abcabc", ""]
    got = sc.count_many(docs)
    np.testing.assert_array_equal(got, [ends, 1, 0])


def test_count_many_mesh_document_splitting_parity():
    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    m, rng = build_machine(seed=12)
    docs = ["".join(rng.choice("abcdz") for _ in range(7000))
            for _ in range(5)]
    sc = ShardedScanner(m, make_mesh(), n_streams_per_device=256)
    c, _ = sc._split_for(8192, 1, 128)
    assert c > 1
    np.testing.assert_array_equal(sc.count_many(docs),
                                  oracle_counts(m, docs))


def test_count_many_device_misaligned_L_on_unpacked_engine(monkeypatch):
    """Review r5: a device-resident [L, B] batch with L not a k-multiple
    on the UNPACKED stepped engine must take the dense-table fallback,
    not crash in combine_grams."""
    import jax.numpy as jnp

    from aho_corasick_1975_tpu.models import snapshot as snap_mod
    from aho_corasick_1975_tpu.ops import multistep as ms

    orig = ms.build_stepped

    def unpacked(tables, k, cap_rows=None):
        st = orig(tables, k)
        if st.packed is not None:
            cb = st.count_bits
            st.delta_k = (st.packed >> cb).astype(np.int32)
            st.cnt_k = (st.packed & ((1 << cb) - 1)).astype(np.int32)
            st.packed = None
            st.cap_packed = None
            st.count_bits = 0
        return st

    monkeypatch.setattr(ms, "build_stepped", unpacked)
    m, rng = build_machine(seed=9)
    sc = m.scanner(n_streams=4, step_k=2)
    assert sc._stepped is not None and sc._stepped.packed is None
    docs = ["".join(rng.choice("abcdz") for _ in range(200))
            for _ in range(5)]
    want = oracle_counts(m, docs)
    L = 513  # NOT a multiple of k=2
    tm = np.zeros((L, len(docs)), np.int32)
    for j, d in enumerate(docs):
        ids = sc.encode(d)
        tm[:len(ids), j] = ids
    np.testing.assert_array_equal(sc.count_many(jnp.asarray(tm)), want)


def test_checkpoint_per_value_mode_bumps_format_version():
    """Review r5: per-value checkpoints write format v3 so round-4
    readers fail loudly instead of silently loading pickle blobs."""
    import io
    import threading

    from aho_corasick_1975_tpu.utils import checkpoint as ckpt

    m = ac.Machine()
    m.insert_keyword("he", value=threading.Lock())
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    z = np.load(buf, allow_pickle=False)
    assert int(z["format_version"]) == ckpt.PER_VALUE_FORMAT_VERSION
    # fully-picklable machines keep v2 (old readers stay compatible)
    m2 = ac.Machine()
    m2.insert_keyword("he", value=1)
    buf2 = io.BytesIO()
    ckpt.save_machine(m2, buf2)
    buf2.seek(0)
    assert int(np.load(buf2)["format_version"]) == ckpt.FORMAT_VERSION
