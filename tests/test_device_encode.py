"""Device-side encode (raw path): the vocab LUT gather rides inside the
scan jit; bytes upload as uint8, str as int32 codepoints (VERDICT r2
item 1). Every case is checked against the host-encode path and the
sequential oracle, including the exactness fallbacks."""

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac

TEXT = ("To ushers: he found his pencil, but she could not find hers. "
        "she sells seashells by the seashore; his hush went unheard. ") * 30


def _str_machine():
    m = ac.Machine()
    for kw in ["he", "she", "his", "hers", "ushers", "sells", "hush"]:
        m.insert_keyword(kw)
    return m


def _oracle(m, signs):
    cur = m.initiate()
    return sum(m.match(cur, s) for s in signs)


def test_str_raw_path_matches_host_and_oracle():
    m = _str_machine()
    sc = m.scanner(n_streams=32)
    host = m.scanner(n_streams=32, device_encode=False)
    assert sc._raw_stream(TEXT) is not None  # really the raw path
    exp = _oracle(m, TEXT)
    assert sc.count(TEXT) == exp == host.count(TEXT)
    assert np.array_equal(sc.scan_states(TEXT), host.scan_states(TEXT))
    assert sc.find_matches(TEXT) == host.find_matches(TEXT)
    assert (sc.find_matches(TEXT, max_hits=4096)
            == host.find_matches(TEXT, max_hits=4096))


def test_bytes_raw_path_bytemachine():
    m = ac.ByteMachine()
    for kw in [b"he", b"she", b"his", b"hers", b"hush"]:
        m.insert_keyword(kw)
    sc = m.scanner(n_streams=16)
    data = TEXT.encode()
    assert sc._raw_stream(data) is not None
    host = m.scanner(n_streams=16, device_encode=False)
    assert sc.count(data) == host.count(data)
    # str input routes through UTF-8 bytes on the raw path too
    assert sc.count(TEXT) == host.count(TEXT)
    # uint8 ndarray input
    assert sc.count(np.frombuffer(data, np.uint8)) == host.count(data)


def test_bytes_raw_path_generic_machine_with_byte_keywords():
    m = ac.Machine()
    for kw in [b"he", b"she", b"hers"]:
        m.insert_keyword(kw)  # iterating bytes yields ints: int-key vocab
    sc = m.scanner(n_streams=16)
    data = TEXT.encode()
    assert sc._raw_stream(data) is not None
    assert sc.count(data) == _oracle(m, data)


def test_nul_byte_in_keyword_falls_back():
    m = ac.ByteMachine()
    m.insert_keyword(b"a\x00b")
    m.insert_keyword(b"ab")
    sc = m.scanner(n_streams=8)
    data = b"xa\x00bx ab a\x00b"
    # byte 0 participates in a keyword: raw-0 padding would not be inert,
    # so the raw path must decline and the host path must stay exact
    assert sc._raw_stream(data) is None
    assert sc.count(data) == _oracle(m, np.frombuffer(data, np.uint8))


def test_casefold_keyfn_eager_lut_and_fallback():
    m = ac.UnicodeMachine(casefold=True)
    for kw in ["he", "she", "hers"]:
        m.insert_keyword(kw)
    sc = m.scanner(n_streams=8)
    text = "He said SHE heard HERS loud"
    assert sc._raw_stream(text) is not None  # ASCII < eager bound
    host = m.scanner(n_streams=8, device_encode=False)
    assert sc.count(text) == host.count(text) == 6  # he x4, she, hers
    # KELVIN SIGN (0x212A) casefolds to "k" and sits beyond the eager
    # bound: the raw path declines, host path handles it
    m2 = ac.UnicodeMachine(casefold=True)
    m2.insert_keyword("kg")
    sc2 = m2.scanner(n_streams=8)
    weird = "Kg and kg"
    assert sc2._raw_stream(weird) is None
    assert sc2.count(weird) == 2


def test_identity_lut_clamp_beyond_bound_is_exact():
    m = _str_machine()
    sc = m.scanner(n_streams=8)
    text = "he \U0001F600 she �hers"  # codepoints beyond any keyword
    assert sc._raw_stream(text) is not None  # identity clamps exactly
    assert sc.count(text) == _oracle(m, text)


def test_post_snapshot_letters_are_oov_for_pinned_scanner():
    m = _str_machine()
    sc = m.scanner(n_streams=8)
    before = sc.count(TEXT)
    m.insert_keyword("zebra!")  # new letters: ids >= pinned V
    # the pinned snapshot must treat the new letters as OOV on every path
    assert sc.count(TEXT + " zebra! ") == before
    assert sc.count((TEXT + " zebra! ")) == before
    host = m.scanner(tables=sc.tables, device_encode=False, n_streams=8)
    assert host.count(TEXT + " zebra! ") == before
    sc.refresh()
    assert sc.count(TEXT + " zebra! ") == before + 1


def test_sessions_ride_the_raw_path():
    m = _str_machine()
    sc = m.scanner(n_streams=8)
    exp = _oracle(m, TEXT)
    sess = sc.session()
    got = sum(sess.feed_count(TEXT[i:i + 13])
              for i in range(0, len(TEXT), 13))
    assert got == exp
    # feed_matches with absolute positions across raw chunks
    sess2 = sc.session()
    evs = []
    for i in range(0, len(TEXT), 17):
        evs.extend(sess2.feed_matches(TEXT[i:i + 17]))
    full = sc.find_matches(TEXT)
    assert [(e.end, e.start) for e, _ in evs] \
        == [(e.end, e.start) for e, _ in full]


def test_raw_path_engines_agree():
    m = _str_machine()
    exp = _oracle(m, TEXT)
    for engine in ("gather", "hybrid"):
        sc = m.scanner(n_streams=16, engine=engine)
        assert sc.count(TEXT) == exp, engine
    small = ac.Machine()
    for kw in ["ab", "ba"]:
        small.insert_keyword(kw)
    sc = small.scanner(n_streams=16, engine="mxu")
    t = "abba " * 100
    assert sc.count(t) == _oracle(small, t)


def test_empty_and_tiny_inputs():
    m = _str_machine()
    sc = m.scanner()
    assert sc.count("") == 0
    assert sc.count(b"") == 0
    assert sc.count("h") == 0
    assert sc.count("he") == 1
    assert len(sc.scan_states("")) == 0
