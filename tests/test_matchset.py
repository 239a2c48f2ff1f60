"""Columnar MatchSet semantics: list compatibility with the round-2 API,
columnar arrays, lazy Match caching (VERDICT r2 item 2)."""

import numpy as np

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.models.results import MatchSet

TEXT = "To ushers: he found his pencil, but she could not find hers."


def _machine():
    m = ac.Machine()
    for kw, v in [("he", 1), ("she", 2), ("his", 3), ("hers", 4)]:
        m.insert_keyword(kw, value=v)
    return m


def test_matchset_list_compatibility():
    m = _machine()
    ms = m.scanner().find_matches(TEXT)
    assert isinstance(ms, MatchSet)
    assert len(ms) == 9
    # iteration yields (MatchEvent, Match) like the round-2 list
    rendered = "".join(f" {ev.start + 1}:{mt.text()}" for ev, mt in ms)
    assert rendered == (" 5:she 6:he 6:hers 12:he 21:his 37:she 38:he"
                        " 56:he 56:hers")
    # indexing, negative indexing, slicing
    ev0, mt0 = ms[0]
    assert (ev0.start, mt0.text()) == (4, "she")
    assert ms[-1][1].text() == "hers"
    assert [mt.text() for _, mt in ms[:2]] == ["she", "he"]
    # empty result compares equal to []
    assert m.scanner().find_matches("xyz") == []
    assert list(m.scanner().find_matches("xyz")) == []


def test_matchset_columnar_arrays():
    m = _machine()
    ms = m.scanner().find_matches(TEXT)
    assert ms.ends.dtype == np.int64 and ms.ends.shape == (9,)
    assert np.array_equal(ms.starts, ms.ends - ms.lengths + 1)
    # within an end position, index 0 = longest (ref acm_get_match order)
    same_end = ms.ends == ms.ends[0]  # "she" and "he" both end at 6
    assert list(ms.indices[same_end]) == [0, 1]
    assert ms.lengths[same_end][0] >= ms.lengths[same_end][1]
    # ranks identify keywords (insertion order)
    texts = {int(r): mt.text() for (_, mt), r in zip(ms, ms.ranks)}
    assert texts == {0: "he", 1: "she", 2: "his", 3: "hers"}
    # values per event via the cached Match
    assert ms.values() == [2, 1, 4, 1, 3, 2, 1, 1, 4]
    # one Match object per distinct keyword (cache, not per event)
    assert len(ms.matches()) == 4
    assert len(ms._match_cache) == 4


def test_matchset_offset_and_device_hits_agree():
    m = _machine()
    sc = m.scanner()
    full = sc.find_matches(TEXT, offset=1000)
    bounded = sc.find_matches(TEXT, offset=1000, max_hits=32)
    assert full == bounded
    assert int(full.ends[0]) == 1000 + 6


def test_matchset_sharded():
    import jax

    import pytest

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    m = _machine()
    sc = ShardedScanner(m, make_mesh(4), n_streams_per_device=4)
    single = m.scanner().find_matches(TEXT)
    assert sc.find_matches(TEXT) == single
    assert sc.find_matches(TEXT, max_hits_per_shard=32) == single


def test_matchset_extraction_is_vectorized_at_scale():
    # ~36k matches decode through arrays, not a per-event Python loop;
    # this asserts correctness at volume (the perf claim is benchmarked on
    # TPU in benchmarks/bench_matches.py).
    m = _machine()
    text = TEXT * 4000
    ms = m.scanner().find_matches(text)
    assert len(ms) == 9 * 4000
    cur = m.initiate()
    assert sum(m.match(cur, ch) for ch in TEXT) * 4000 == len(ms)
    # spot-check a mid-stream event against absolute positions
    k = len(ms) // 2
    ev, mt = ms[k]
    probe = text[ev.start:ev.end + 1]
    assert probe == mt.text()
