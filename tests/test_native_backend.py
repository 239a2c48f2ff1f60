"""Native (C++) backend vs pure-Python backend: bit-exact parity.

The C++ core (native/acx.cpp, bound in core/native.py) must produce the
identical automaton — same state ids (creation order), same fail links,
output counts, dense tables and streaming behaviour — as the Python
reference backend, in both Meyer-85 and AC75 modes.
"""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.core.builder import Builder

try:
    from aho_corasick_1975_tpu.core.native import NativeBuilder, load_library
    load_library()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")

TABLE_FIELDS = ("delta", "fail", "nb_outputs", "emit_start", "emit_state",
                "depth", "is_end", "kw_rank", "prev_state", "prev_letter")


def rand_keywords(seed, n=150, alphabet="abcd", maxlen=8):
    rng = random.Random(seed)
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, maxlen)))
            for _ in range(n)]


@pytest.mark.parametrize("incremental", [True, False],
                         ids=["meyer85", "ac75"])
@pytest.mark.parametrize("seed", [0, 1])
def test_table_parity(incremental, seed):
    kws = rand_keywords(seed)
    nb, pb = NativeBuilder(incremental), Builder(incremental)
    vocab = {}

    def ids(w):
        return [vocab.setdefault(ch, len(vocab) + 1) for ch in w]

    for w in kws:
        s1 = s2 = 0
        for letter in ids(w):
            s1 = nb.insert_letter(s1, letter)
            s2 = pb.insert_letter(s2, letter)
            assert s1 == s2
        assert nb.insert_end(s1) == pb.insert_end(s2)
    t1 = nb.emit_tables(len(vocab) + 1)
    t2 = pb.emit_tables(len(vocab) + 1)
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)

    rng = random.Random(seed + 99)
    text_ids = [vocab.get(c, 0) for c in
                (rng.choice("abcdxy") for _ in range(3000))]
    s1 = s2 = 0
    for letter in text_ids:
        r1, r2 = nb.match(s1, letter), pb.match(s2, letter)
        assert r1 == r2
        s1, s2 = r1[0], r2[0]
    # bulk streaming equals per-symbol streaming
    sb, total = nb.match_bulk(0, np.asarray(text_ids, np.int32))
    s2 = 0
    expect = 0
    for letter in text_ids:
        s2, n = pb.match(s2, letter)
        expect += n
    assert sb == s2 and total == expect


def test_bulk_insert_matches_streaming_insert():
    kws = rand_keywords(7, n=300)
    vocab = {}

    def ids(w):
        return [vocab.setdefault(ch, len(vocab) + 1) for ch in w]

    all_ids = [ids(w) for w in kws]
    flat = np.asarray([i for w in all_ids for i in w], np.int32)
    offsets = np.zeros(len(kws) + 1, np.int64)
    np.cumsum([len(w) for w in all_ids], out=offsets[1:])

    b1 = NativeBuilder(True)
    ends, fresh = b1.insert_keywords_bulk(flat, offsets)

    b2 = NativeBuilder(True)
    ends2, fresh2 = [], []
    for w in all_ids:
        s = 0
        for letter in w:
            s = b2.insert_letter(s, letter)
        fresh2.append(b2.insert_end(s))
        ends2.append(s)
    assert list(ends) == ends2
    assert list(fresh) == fresh2
    t1, t2 = b1.emit_tables(), b2.emit_tables()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)


def test_machine_backend_explicit():
    """backend='native' end to end through the public Machine API."""
    m = ac.Machine(backend="native")
    for kw in ["he", "she", "his", "hers"]:
        m.insert_keyword(kw)
    text = "To ushers: he found his pencil, but she could not find hers."
    cur = m.initiate()
    out = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch), 0, -1):
            mt = m.get_match(cur, j - 1)
            out.append(f" {i + 2 - mt.length}:{mt.text()}")
    assert "".join(out) == \
        " 6:he 5:she 6:hers 12:he 21:his 38:he 37:she 56:he 56:hers"
    assert m.scanner(n_streams=4).count(text) == 9
    assert [k.text() for k in m.keywords()] == ["he", "hers", "his", "she"]


def test_letter_id_bound_rejected():
    """letter ids beyond the native 21-bit packing limit must fail loudly
    (review finding: silent edge-key aliasing caused an infinite hang)."""
    b = NativeBuilder(True)
    with pytest.raises(ValueError, match="exceeds the native core's limit"):
        b.insert_letter(0, 1 << 21)
    with pytest.raises(ValueError):
        b.insert_keywords_bulk(np.asarray([1 << 21], np.int32),
                               np.asarray([0, 1], np.int64))
    # the Python backend handles the same ids fine
    from aho_corasick_1975_tpu.core.builder import Builder
    pb = Builder(True)
    s = pb.insert_letter(0, 1 << 21)
    assert pb.insert_end(s)


@pytest.mark.parametrize("incremental", [True, False],
                         ids=["meyer85", "ac75"])
def test_interleaved_operation_fuzz(incremental):
    """Random interleaving of every backend operation — streamed letters,
    end marks, single/bulk inserts, matches, table emission — must keep the
    native and Python backends in lockstep at every step."""
    rng = random.Random(31337)
    nb, pb = NativeBuilder(incremental), Builder(incremental)
    cursor_n = cursor_p = 0
    match_n = match_p = 0
    vocab_max = 6
    for step in range(2500):
        op = rng.random()
        if op < 0.35:                      # stream a letter
            letter = rng.randint(1, vocab_max)
            cursor_n = nb.insert_letter(cursor_n, letter)
            cursor_p = pb.insert_letter(cursor_p, letter)
            assert cursor_n == cursor_p
        elif op < 0.45 and cursor_n != 0:  # end the keyword
            assert nb.insert_end(cursor_n) == pb.insert_end(cursor_p)
            cursor_n = cursor_p = 0
        elif op < 0.55:                    # bulk insert a few keywords
            kws = [[rng.randint(1, vocab_max)
                    for _ in range(rng.randint(1, 5))]
                   for _ in range(rng.randint(1, 4))]
            flat = np.asarray([x for kw in kws for x in kw], np.int32)
            offs = np.zeros(len(kws) + 1, np.int64)
            np.cumsum([len(kw) for kw in kws], out=offs[1:])
            ends_n, fresh_n = nb.insert_keywords_bulk(flat, offs)
            for kw, en, fn_ in zip(kws, ends_n.tolist(), fresh_n.tolist()):
                s = 0
                for x in kw:
                    s = pb.insert_letter(s, x)
                assert s == en
                assert pb.insert_end(s) == fn_
        elif op < 0.9:                     # match a symbol
            letter = rng.randint(0, vocab_max + 1)  # incl. OOV & unseen
            rn = nb.match(match_n, letter)
            rp = pb.match(match_p, letter)
            assert rn == rp
            match_n, match_p = rn[0], rp[0]
            if rn[1]:
                idx = rng.randrange(rn[1])
                en = nb.get_match_state(match_n, idx)
                ep = pb.get_match_state(match_p, idx)
                assert en == ep
                assert nb.keyword_letters(en) == pb.keyword_letters(ep)
                assert nb.kw_rank_of(en) == pb.kw_rank_of(ep)
        elif nb.nb_sequences:              # emit and compare tables
            t1 = nb.emit_tables()
            t2 = pb.emit_tables()
            for f in TABLE_FIELDS:
                np.testing.assert_array_equal(getattr(t1, f),
                                              getattr(t2, f), f)
    assert nb.n_states == pb.n_states
    assert nb.nb_sequences == pb.nb_sequences
