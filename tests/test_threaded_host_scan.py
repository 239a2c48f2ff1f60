"""Threaded host-side scanning (native core): the halo-blocked single
stream (acx_match_stream_threaded — the host mirror of the device
kernel's sequence parallelism, exact by ops/blocking.py's suffix-property
argument) and the per-document batch (acx_match_bulk_many)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac


@pytest.fixture
def machine():
    rng = random.Random(0)
    m = ac.Machine()
    for _ in range(300):
        m.insert_keyword("".join(rng.choice("abcd")
                                 for _ in range(rng.randint(2, 9))))
    return m


def test_threaded_stream_equals_bulk(machine):
    rng = random.Random(1)
    text = "".join(rng.choice("abcd") for _ in range(500_000))
    ids = machine.vocab.lookup_many(text)
    s_ref, total_ref = machine._b.match_bulk(0, ids)
    for nt in (2, 3, 5):
        s, total = machine._b.match_stream_threaded(0, ids, nt)
        assert (s, total) == (s_ref, total_ref)


def test_threaded_stream_chunk_boundary_exact(machine):
    """Matches that span every chunk boundary: a long keyword planted at
    each n/nt split point must still be counted exactly once."""
    kw = "abcdabcda"
    machine.insert_keyword(kw)
    nt = 4
    n = 400_000
    text = list("d" * n)
    chunk = n // nt
    for t in range(1, nt):
        pos = t * chunk - len(kw) // 2  # straddles the split
        text[pos:pos + len(kw)] = kw
    text = "".join(text)
    ids = machine.vocab.lookup_many(text)
    s_ref, total_ref = machine._b.match_bulk(0, ids)
    s, total = machine._b.match_stream_threaded(0, ids, nt)
    assert (s, total) == (s_ref, total_ref)


def test_threaded_stream_cursor_carry(machine):
    """The first chunk continues from the caller's cursor state."""
    rng = random.Random(2)
    text = "".join(rng.choice("abcd") for _ in range(300_000))
    ids = machine.vocab.lookup_many(text)
    cur = machine.initiate()
    machine.match_stream(cur, "abcdab")  # advance to a deep state
    s_ref, total_ref = machine._b.match_bulk(cur.state, ids)
    s, total = machine._b.match_stream_threaded(cur.state, ids, 3)
    assert (s, total) == (s_ref, total_ref)


def test_match_stream_parallel_flag(machine):
    rng = random.Random(3)
    text = "".join(rng.choice("abcd") for _ in range(200_000))
    c1, c2 = machine.initiate(), machine.initiate()
    t1 = machine.match_stream(c1, text)
    t2 = machine.match_stream(c2, text, parallel=True)
    assert t1 == t2 and c1.state == c2.state


def test_match_stream_many(machine):
    rng = random.Random(4)
    docs = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 3000)))
            for _ in range(200)]
    got = machine.match_stream_many(docs)
    want = []
    for d in docs:
        cur = machine.initiate()
        want.append(machine.match_stream(cur, d))
    assert np.array_equal(got, np.asarray(want, np.int64))
    assert machine.match_stream_many([]).shape == (0,)


def test_match_stream_many_python_backend():
    m = ac.Machine(backend="python")
    for w in ["he", "she", "hers"]:
        m.insert_keyword(w)
    got = m.match_stream_many(["ushers", "he", "", "shehe"])
    assert list(got) == [3, 1, 0, 3]  # shehe: she+he at 'e', he at end
