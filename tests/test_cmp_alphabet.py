"""Comparator-only alphabets (VERDICT r2 missing #5): the reference needs
only a total order over opaque signs (cmp/cmp_arg, aho_corasick.h:33-38) —
no hashability. ``Machine(cmp_fn=...)`` restores that exact contract via a
sorted-list vocabulary."""

import functools

import pytest

import aho_corasick_1975_tpu as ac


class Opaque:
    """A sign with a total order and NO hash (like a C struct compared by
    memcmp) — unusable with the default dict vocabulary."""

    __hash__ = None

    def __init__(self, v):
        self.v = v

    def __repr__(self):
        return f"O({self.v})"


def opaque_cmp(a, b):
    return (a.v > b.v) - (a.v < b.v)


def _kw(s):
    return [Opaque(c) for c in s]


def test_unhashable_signs_rejected_without_cmp():
    m = ac.Machine()
    with pytest.raises(TypeError):
        m.insert_keyword(_kw("he"))


def test_opaque_cmp_alphabet_end_to_end():
    m = ac.Machine(cmp_fn=opaque_cmp)
    for kw in ["he", "she", "his", "hers"]:
        m.insert_keyword(_kw(kw))
    text = _kw("To ushers: he found his pencil, but she could not find hers.")
    # host streaming path
    cur = m.initiate()
    line = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch), 0, -1):
            mt = m.get_match(cur, j - 1)
            line.append(
                f" {i + 2 - mt.length}:{''.join(o.v for o in mt.letters)}")
    assert "".join(line) == \
        " 6:he 5:she 6:hers 12:he 21:his 38:he 37:she 56:he 56:hers"
    # device scan path (generic per-sign encode)
    sc = m.scanner(n_streams=4)
    assert sc.count(text) == 9
    # duplicate letter: distinct Opaque objects comparing equal are ONE
    # letter; first-seen representative is kept (ref c:305-307)
    a1, a2 = Opaque("a"), Opaque("a")
    assert m.vocab.register(a1) == m.vocab.register(a2)
    assert m.vocab.sign(m.vocab.register(a2)) is a1


def test_cmp_enumeration_order_is_comparator_order():
    # reverse alphabetical comparator: enumeration must follow it
    m = ac.Machine(cmp_fn=lambda a, b: (a < b) - (a > b))
    for kw in ["ab", "ba", "aa", "bb"]:
        m.insert_keyword(kw)
    got = [mt.text() for mt in m.keywords()]
    assert got == ["bb", "ba", "ab", "aa"]


def test_cmp_case_insensitive_matches_keyfn_equivalent():
    # alphacmp-style case-insensitive comparator (generic_test.c:48-54)
    def ci_cmp(a, b):
        a, b = a.lower(), b.lower()
        return (a > b) - (a < b)

    mc = ac.Machine(cmp_fn=ci_cmp)
    mk = ac.Machine(key_fn=str.lower)
    for kw in ["He", "SHE", "hers"]:
        mc.insert_keyword(kw)
        mk.insert_keyword(kw)
    text = "he SHE Hers xxHERSxx"
    assert mc.scanner().count(text) == mk.scanner().count(text) == 7
    cur_c, cur_k = mc.initiate(), mk.initiate()
    for ch in text:
        assert mc.match(cur_c, ch) == mk.match(cur_k, ch)


def test_cmp_arg_via_partial():
    # the reference's cmp_arg is a closure parameter here (functools.partial)
    def cmp_mod(a, b, mod):
        return (a % mod > b % mod) - (a % mod < b % mod)

    m = ac.Machine(cmp_fn=functools.partial(cmp_mod, mod=10))
    m.insert_keyword([1, 2, 3])
    sc = m.scanner()
    assert sc.count([11, 13, 12, 99]) == 0
    assert sc.count([11, 12, 13]) == 1  # 11%10==1, 12%10==2, 13%10==3
