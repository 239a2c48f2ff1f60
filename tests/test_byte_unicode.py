"""Byte-alphabet and Unicode model families (BASELINE configs 3 & 4)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.models.bytes_machine import (ByteMachine,
                                                        UnicodeMachine)


def test_byte_machine_binary_patterns():
    m = ByteMachine()
    m.insert_keyword(b"\x00\xff\x00")
    m.insert_keyword(b"\xff\x00")
    data = b"\x01\x00\xff\x00\xff\x00\x02"
    sc = m.scanner(n_streams=4)
    # occurrences: \x00\xff\x00 at 1..3 and 3..5; \xff\x00 at 2..3 and 4..5
    assert sc.count(np.frombuffer(data, np.uint8)) == 4
    events = sc.find_matches(np.frombuffer(data, np.uint8))
    got = {(ev.start, m.match_bytes(match)) for ev, match in events}
    assert got == {(1, b"\x00\xff\x00"), (3, b"\x00\xff\x00"),
                   (2, b"\xff\x00"), (4, b"\xff\x00")}


def test_byte_machine_utf8_multilingual():
    words = ["héros", "übung", "日本語", "мир", "naïve", "东京"]
    m = ByteMachine()
    for w in words:
        m.insert_keyword(w.encode("utf-8"), value=w)
    text = "Le héros parle 日本語 et dit мир; übung macht den Meister. 东京!"
    sc = m.scanner(n_streams=4)
    events = sc.find_matches(text)
    found = {match.value for _, match in events}
    assert found == {"héros", "日本語", "мир", "übung", "东京"}
    # byte positions map back into the utf-8 encoding of the text
    enc = text.encode("utf-8")
    for ev, match in events:
        kw = match.value.encode("utf-8")
        assert enc[ev.start:ev.end + 1] == kw


def test_unicode_machine_casefold():
    m = UnicodeMachine(casefold=True)
    m.insert_keyword("Straße")
    sc = m.scanner(n_streams=2)
    assert sc.count("STRASSE") == 0        # casefold('ß')='ss' is 2 chars;
    #                                        codepoint machine matches 1:1
    assert sc.count("straße es STRAßE") == 2
    cur = m.initiate()
    for ch in "straße":
        n = m.match(cur, ch)
    assert n == 1
    assert m.get_match(cur, 0).text() == "Straße"  # representative kept


def test_unicode_machine_plain_codepoints():
    m = UnicodeMachine()
    for w in ["αβγ", "βγδ"]:
        m.insert_keyword(w)
    sc = m.scanner(n_streams=2)
    assert sc.count("ξαβγδξ") == 2
    got = {(ev.start, match.text()) for ev, match in sc.find_matches("ξαβγδξ")}
    assert got == {(1, "αβγ"), (2, "βγδ")}


def test_byte_machine_scales_vocab_free():
    """50k-ish distinct codepoints via bytes: table width stays 257."""
    rng = random.Random(0)
    m = ByteMachine()
    words = []
    for i in range(300):
        w = "".join(chr(0x4E00 + rng.randrange(20000))
                    for _ in range(rng.randint(1, 4)))
        words.append(w)
        m.insert_keyword(w.encode("utf-8"))
    t = m.compile()
    assert t.vocab_size == 257
    text = "".join(rng.choice(words) if rng.random() < 0.2
                   else chr(0x4E00 + rng.randrange(20000))
                   for _ in range(500))
    sc = m.scanner(n_streams=8)
    # oracle via host streaming on byte ids
    ids = m.vocab.lookup_many(text.encode("utf-8"))
    cur = m.initiate()
    expected = 0
    b = m._b
    s = 0
    for i in ids.tolist():
        s, n = b.match(s, int(i))
        expected += n
    assert sc.count(text.encode("utf-8")) == expected
    assert expected > 0
