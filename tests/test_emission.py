"""Dense-table emission fast paths: compile() version cache, native CSR
emission, and capacity-buffer adoption by DeviceSnapshot (zero-copy
handoff of the emitted delta / packed tables)."""

import random

import numpy as np

import aho_corasick_1975_tpu as ac


def _machine(n=200, backend="auto", seed=2):
    rng = random.Random(seed)
    m = ac.Machine(backend=backend)
    m.insert_keywords(["".join(rng.choice("abcdef") for _ in range(6))
                       for _ in range(n)])
    return m


def test_compile_version_cache():
    m = _machine()
    t1 = m.compile()
    assert m.compile() is t1            # no change -> same snapshot object
    m.insert_keyword("zzz")
    t2 = m.compile()
    assert t2 is not t1 and t2.version != t1.version
    assert m.compile() is t2


def test_native_csr_matches_python_backend():
    kws = ["he", "she", "his", "hers", "hishe", "s"]
    mn = ac.Machine(backend="native")
    mp = ac.Machine(backend="python")
    for kw in kws:
        mn.insert_keyword(kw)
        mp.insert_keyword(kw)
    tn, tp = mn.compile(), mp.compile()
    np.testing.assert_array_equal(tn.emit_start, tp.emit_start)
    np.testing.assert_array_equal(tn.emit_state, tp.emit_state)
    np.testing.assert_array_equal(tn.delta, tp.delta)


def test_cap_delta_claimed_once():
    m = _machine()
    t = m.compile()
    if t.cap_delta is None:  # python backend offers no capacity buffer
        return
    buf = t.claim_cap_delta()
    assert buf is not None and buf.base is None
    assert t.delta.base is buf          # delta stays a view of the buffer
    assert t.claim_cap_delta() is None  # single claimant


def test_two_scanners_one_machine_refresh_isolation():
    """Both scanners build from the SAME cached snapshot (one adopts the
    capacity buffer, the other copies); refreshes must stay independent
    and exact."""
    rng = random.Random(7)
    m = _machine(100)
    s1 = m.scanner(n_streams=8)
    s2 = m.scanner(n_streams=8)
    text = "".join(rng.choice("abcdefx") for _ in range(20000))
    base = s1.count(text)
    assert s2.count(text) == base
    m.insert_keyword("needle")
    hay = text + "needle" + text
    s1.refresh()
    s2.refresh()
    want = s1.count(hay)
    assert s2.count(hay) == want
    # a third scanner built fresh agrees
    assert m.scanner(n_streams=8).count(hay) == want


def test_snapshot_adopts_buffers_without_copy():
    m = _machine(300)
    sc = m.scanner(n_streams=8)
    snap = sc._snap
    t = snap.tables
    if snap._delta_adopted:
        # host mirror IS the emitted capacity buffer (no copy)
        assert t.delta.base is snap.delta_host.base or \
            t.delta.base is snap.delta_host
    st = snap.stepped
    if st is not None and st.packed is not None and \
            st.cap_packed is not None:
        assert st.packed.base is snap._pk_host.base or \
            st.packed.base is snap._pk_host
