"""Reference Test-3 replay (generic_test.c:250-278), scaled for CI: random
fixed-length keywords inserted in increments, with a random scan and global
match count after each increment — exercising Meyer incrementality across
snapshots, bulk insertion, and host-vs-device count agreement at each step.
"""

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


@pytest.mark.parametrize("incremental", [True, False],
                         ids=["meyer85", "ac75"])
def test_incremental_rounds_host_vs_device(incremental):
    rng = np.random.default_rng(0)
    m = ac.Machine(incremental=incremental)
    n_rounds, n_kw, kw_len, text_len = 4, 800, 7, 20000
    for round_ in range(n_rounds):
        kws = ["".join(ALPHABET[j] for j in rng.integers(0, 26, kw_len))
               for _ in range(n_kw)]
        m.insert_keywords(kws)
        text = "".join(ALPHABET[j] for j in rng.integers(0, 26, text_len))
        # host streaming count (native bulk when available)
        b = m._b
        ids = np.asarray(m.vocab.lookup_many(text), np.int32)
        if hasattr(b, "match_bulk"):
            _, host_total = b.match_bulk(0, ids)
        else:
            s, host_total = 0, 0
            for letter in ids.tolist():
                s, n = b.match(s, int(letter))
                host_total += n
        dev_total = m.scanner(n_streams=32).count(text)
        assert dev_total == host_total


def test_bulk_insert_duplicate_value_protocol():
    m = ac.Machine()
    prevs = m.insert_keywords(["ab", "cd", "ab"], values=[1, 2, 3])
    assert prevs == [None, None, 1]
    by_kw = {k.text(): k.value for k in m.keywords()}
    assert by_kw == {"ab": 1, "cd": 2}
    assert m.nb_keywords() == 2


def test_match_stream_equals_per_sign():
    import random
    rng = random.Random(4)
    m = ac.Machine()
    for _ in range(50):
        m.insert_keyword("".join(rng.choice("ab")
                                 for _ in range(rng.randint(1, 5))))
    text = "".join(rng.choice("abx") for _ in range(3000))
    c1, c2 = m.initiate(), m.initiate()
    per_sign = sum(m.match(c1, ch) for ch in text)
    # chunked streaming, ragged chunks
    total = 0
    pos = 0
    while pos < len(text):
        n = rng.choice([1, 7, 100])
        total += m.match_stream(c2, text[pos:pos + n])
        pos += n
    assert total == per_sign and c1.state == c2.state
    # cursor remains usable for get_match after a chunk ending in a match
    c3 = m.initiate()
    m.match_stream(c3, text)
    assert c3.state == c1.state
