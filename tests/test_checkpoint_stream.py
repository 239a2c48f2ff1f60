"""Checkpoint/resume and chunked streaming sessions (SURVEY.md §5 —
capabilities the reference lacks entirely)."""

import io
import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.utils import checkpoint as ckpt


def build(seed=0, n=80):
    rng = random.Random(seed)
    m = ac.Machine()
    for i in range(n):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 6))),
                         value=f"v{i}")
    return m


TABLE_FIELDS = ("delta", "fail", "nb_outputs", "emit_start", "emit_state",
                "depth", "is_end", "kw_rank", "prev_state", "prev_letter")


def test_machine_roundtrip_and_continued_insertion():
    m = build()
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)
    assert m2.nb_keywords() == m.nb_keywords()
    # values survive
    assert sorted(k.value for k in m2.keywords()) == \
        sorted(k.value for k in m.keywords())
    # insertion continues after resume (Meyer state was rebuilt)
    m.insert_keyword("zzz")
    m2.insert_keyword("zzz")
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)


def test_tables_roundtrip():
    m = build(3)
    t = m.compile()
    buf = io.BytesIO()
    ckpt.save_tables(t, buf)
    buf.seek(0)
    t2 = ckpt.load_tables(buf)
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t, f), getattr(t2, f), f)
    assert t2.version == t.version and t2.n_keywords == t.n_keywords


def test_stream_session_exact_across_chunks():
    rng = random.Random(11)
    m = build(11)
    text = "".join(rng.choice("abcx") for _ in range(5000))
    sc = m.scanner(n_streams=8)
    whole_count = sc.count(text)
    whole_events = [(ev.end, match.text())
                    for ev, match in sc.find_matches(text)]

    # ragged chunk sizes, including tiny ones smaller than the halo
    sess = sc.session()
    total = 0
    events = []
    pos = 0
    while pos < len(text):
        n = rng.choice([1, 2, 7, 100, 333])
        chunk = text[pos:pos + n]
        events += [(ev.end, match.text())
                   for ev, match in sess.feed_matches(chunk)]
        pos += n
    assert events == whole_events

    sess2 = sc.session()
    pos = 0
    while pos < len(text):
        n = rng.choice([3, 50, 1000])
        total += sess2.feed_count(text[pos:pos + n])
        pos += n
    assert total == whole_count == sess2.total


def test_stream_session_checkpoint_restore():
    m = build(5)
    sc = m.scanner(n_streams=4)
    text = "abcabcabc" * 300
    mid = len(text) // 2 + 1
    sess = sc.session()
    c1 = sess.feed_count(text[:mid])
    state = sess.checkpoint()
    # resume in a "new process"
    from aho_corasick_1975_tpu.models.scanner import StreamSession
    restored = StreamSession.restore(sc, state)
    c2 = restored.feed_count(text[mid:])
    assert c1 + c2 == sc.count(text)

    # version pinning: a session from an old snapshot refuses a new scanner
    m.insert_keyword("qqq")
    sc_new = m.scanner(n_streams=4)
    with pytest.raises(ValueError):
        StreamSession.restore(sc_new, state)


def test_scanner_stats_recorded():
    m = build(1)
    sc = m.scanner(n_streams=4)
    sc.count("abcabc" * 100)
    assert sc.stats["last_op"] == "count"
    assert sc.stats["last_symbols"] == 600
    assert sc.stats["last_symbols_per_sec"] > 0


def test_phase_timer():
    import time as _time
    from aho_corasick_1975_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase("build"):
        _time.sleep(0.01)
    with t.phase("build"):
        pass
    with t.phase("scan"):
        pass
    rep = t.report()
    assert rep["build"]["calls"] == 2 and rep["build"]["seconds"] >= 0.01
    assert rep["scan"]["calls"] == 1


def test_checkpoint_restores_version_counter():
    """Duplicate insertions bump the version; reload must restore it so
    StreamSession checkpoints stay valid (review finding)."""
    m = ac.Machine()
    m.insert_keyword("ab")
    m.insert_keyword("ab")            # duplicate: version 2, keywords 1
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    assert m2.version == m.version
    sess_state = m.scanner(n_streams=2).session().checkpoint()
    from aho_corasick_1975_tpu.models.scanner import StreamSession
    StreamSession.restore(m2.scanner(n_streams=2), sess_state)  # no raise


def test_bulk_restore_at_scale_identical_machine():
    """Native bulk edge replay (round-3): a 20k-keyword machine restores
    through ONE replay_edges + ONE insert_ends FFI call with identical
    state ids, tables, ranks, and continued-insertion behavior."""
    rng = random.Random(42)
    m = ac.Machine()
    kws = {"".join(rng.choice("abcdefghij") for _ in range(rng.randint(3, 9)))
           for _ in range(20000)}
    m.insert_keywords(sorted(kws, key=lambda w: rng.random()))
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    import time
    t0 = time.perf_counter()
    m2 = ckpt.load_machine(buf)
    restore_s = time.perf_counter() - t0
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)
    assert m2.nb_keywords() == m.nb_keywords()
    # restore is bulk, not per-state FFI: generous bound that the per-state
    # path (~100k+ python/ctypes round-trips) would blow through
    from aho_corasick_1975_tpu.core.native import NativeBuilder
    if isinstance(m2._b, NativeBuilder):
        assert restore_s < 10.0, restore_s
    # continued insertion diverges nowhere
    m.insert_keyword("zzz9")
    m2.insert_keyword("zzz9")
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)


# -- checkpoint totality over the model family (VERDICT r3 #2) -------------


class _Opaque:
    """Unhashable sign with a total order (module-level: picklable)."""

    __hash__ = None

    def __init__(self, v):
        self.v = v


def _opaque_cmp(a, b):
    return (a.v > b.v) - (a.v < b.v)


def _str_cmp(a, b):
    return (a > b) - (a < b)


def _opaque_kw(s):
    return [_Opaque(c) for c in s]


def test_byte_machine_roundtrip():
    from aho_corasick_1975_tpu.models.bytes_machine import ByteMachine
    m = ByteMachine()
    for w in [b"he", b"she", "héé", b"hers"]:
        m.insert_keyword(w, value=w)
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    assert isinstance(m2, ByteMachine)
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)
    text = "ushers héé hers"
    assert m2.scanner(n_streams=4).count(text) == \
        m.scanner(n_streams=4).count(text) > 0
    # fully mutable after restore
    m.insert_keyword(b"zz")
    m2.insert_keyword(b"zz")
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)


def test_cmp_machine_roundtrip_unhashable_keys():
    m = ac.Machine(cmp_fn=_opaque_cmp)
    for kw in ["he", "she", "his", "hers"]:
        m.insert_keyword(_opaque_kw(kw), value=kw)
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    assert m2.vocab.cmp_fn is _opaque_cmp  # restored INTO cmp mode
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)
    # comparator equivalence classes survive: a DIFFERENT Opaque object
    # comparing equal to a known letter still encodes to the same id
    text = _opaque_kw("ushers")
    assert m2.scanner(n_streams=2).count(text) == 3
    assert sorted(k.value for k in m2.keywords()) == \
        sorted(k.value for k in m.keywords())
    # continued insertion in cmp mode
    m.insert_keyword(_opaque_kw("is"))
    m2.insert_keyword(_opaque_kw("is"))
    t1, t2 = m.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)


def test_cmp_checkpoint_refuses_silent_degrade():
    """A comparator checkpoint whose cmp_fn was a lambda must demand the
    comparator at load — never silently fall back to hash equivalence."""
    m = ac.Machine(cmp_fn=lambda a, b: (a.v > b.v) - (a.v < b.v))
    m.insert_keyword(_opaque_kw("he"))
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    with pytest.raises(ValueError, match="cmp_fn"):
        ckpt.load_machine(buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf, cmp_fn=_opaque_cmp)  # explicit: fine
    assert m2.scanner(n_streams=2).count(_opaque_kw("he")) == 1


def test_cmp_checkpoint_refuses_unpicklable_key_fn():
    """cmp-mode checkpoints demand the key_fn back when it was an
    unpicklable lambda — silently substituting identity would change
    letter equivalence classes (review r4)."""
    m = ac.Machine(key_fn=lambda o: o.v.lower(), cmp_fn=_str_cmp)
    m.insert_keyword(_opaque_kw("He"))
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    with pytest.raises(ValueError, match="key_fn"):
        ckpt.load_machine(buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf, key_fn=lambda o: o.v.lower())
    assert m2.scanner(n_streams=2).count(_opaque_kw("HE")) == 1


def test_unicode_machine_casefold_roundtrip():
    """UnicodeMachine(casefold=True) uses a module-level key function, so
    its checkpoints restore without re-supplying key_fn."""
    from aho_corasick_1975_tpu.models.bytes_machine import UnicodeMachine
    m = UnicodeMachine(casefold=True)
    m.insert_keyword("Straße")
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    assert m2.scanner(n_streams=2).count("STRASSE here straße") == \
        m.scanner(n_streams=2).count("STRASSE here straße") > 0


def test_lambda_key_fn_requires_explicit_restore():
    m = ac.Machine(key_fn=lambda ch: ch.lower())
    m.insert_keyword("He")
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)   # must not crash on the unpicklable lambda
    buf.seek(0)
    with pytest.raises(ValueError, match="key_fn"):
        ckpt.load_machine(buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf, key_fn=str.lower)
    assert m2.scanner(n_streams=2).count("SHE") == 1


def test_bulk_restore_ac75_mode():
    m = build(7)
    # AC75 (non-incremental) machines replay through the same bulk path
    buf = io.BytesIO()
    m_ac = ac.Machine(incremental=False)
    for kw in [k.text() for k in m.keywords()]:
        m_ac.insert_keyword(kw)
    ckpt.save_machine(m_ac, buf)
    buf.seek(0)
    m2 = ckpt.load_machine(buf)
    assert not m2.incremental
    t1, t2 = m_ac.compile(), m2.compile()
    for f in TABLE_FIELDS:
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f), f)
