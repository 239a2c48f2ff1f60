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
