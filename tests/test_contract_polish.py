"""Round-5 contract polish regressions (VERDICT r4 weak #4/#5/#6 and
ADVICE r4): empty-chunk MatchSet parity, unpicklable-value checkpoints,
the mesh dispatch lock, and the gated native debug hook."""

import io
import os
import threading

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.models.results import MatchSet
from aho_corasick_1975_tpu.utils import checkpoint as ckpt


def _machine(words=("he", "she", "his", "hers")):
    m = ac.Machine()
    for w in words:
        m.insert_keyword(w)
    return m


# -- feed_matches("") type parity (VERDICT r4 weak #4) ---------------------


def test_feed_matches_empty_chunk_returns_matchset_single_chip():
    s = ac.DenseScanner(_machine())
    sess = s.session()
    out = sess.feed_matches("")
    assert isinstance(out, MatchSet)
    assert len(out) == 0
    assert out.ends.shape == (0,)           # .ends must exist (the r4 bug)
    assert out.starts.shape == (0,)
    # and the session still continues exactly afterwards
    assert len(sess.feed_matches("ushers")) == 3


def test_feed_matches_empty_chunk_returns_matchset_mesh():
    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    s = ShardedScanner(_machine(), make_mesh())
    sess = s.session()
    out = sess.feed_matches("")
    assert isinstance(out, MatchSet)
    assert out.ends.shape == (0,)
    assert len(sess.feed_matches("ushers")) == 3


# -- unpicklable user values survive save (VERDICT r4 weak #5) -------------


def test_save_machine_with_unpicklable_value_round_trips():
    m = ac.Machine()
    m.insert_keyword("he", value="fine")
    m.insert_keyword("she", value=threading.Lock())  # unpicklable value
    m.insert_keyword("hers", value={"nested": 7})
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)              # r4: raw PicklingError here
    buf.seek(0)
    with pytest.warns(UserWarning, match="not picklable"):
        m2 = ckpt.load_machine(buf)
    vals = {"".join(k.letters): k.value for k in m2.keywords()}
    assert vals["he"] == "fine"
    assert vals["hers"] == {"nested": 7}
    assert vals["she"] is ckpt.VALUE_NOT_SAVED
    assert "not saved" in repr(ckpt.VALUE_NOT_SAVED)
    # the automaton itself is intact
    s = ac.DenseScanner(m2)
    assert s.count("ushers") == 3


def test_save_machine_picklable_values_keep_dict_fast_path():
    m = _machine()
    buf = io.BytesIO()
    ckpt.save_machine(m, buf)
    buf.seek(0)
    z = np.load(buf, allow_pickle=False)
    assert z["values_mode"].tobytes().decode() == "dict"


# -- mesh dispatch lock (VERDICT r4 weak #6) -------------------------------


def test_sharded_refresh_and_recalibrate_serialize_against_scans():
    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner

    m = _machine()
    s = ShardedScanner(m, make_mesh())
    corpus = "ushers his hers " * 200
    baseline = s.count(corpus)
    errors = []
    stop = threading.Event()

    def scan_loop():
        try:
            while not stop.is_set():
                n = s.count(corpus)
                # under the lock a scan sees one consistent snapshot:
                # either the old dictionary's total or a larger one
                # (inserts only add matches on this corpus)
                assert n >= baseline
        except Exception as e:                     # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=scan_loop) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for w in ("she", "ushers", "rs"):
            m.insert_keyword(w)
            s.refresh()
            s.recalibrate()
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors
    assert s.count(corpus) > baseline


# -- gated native debug hook (ADVICE r4) -----------------------------------


def test_native_debug_hook_is_inert_without_opt_in():
    pytest.importorskip("aho_corasick_1975_tpu.core.native")
    from aho_corasick_1975_tpu.core.native import NativeBuilder

    m = ac.Machine(backend="native")
    m.insert_keyword("abc")
    b = m._b
    assert isinstance(b, NativeBuilder)
    end = b.fail.shape[0] - 1
    before = int(b.nb_outputs[end])
    saved = os.environ.pop("ACX_TESTING", None)  # real unsetenv on POSIX
    try:
        b._lib.acx_debug_set_counts(b._h, end, 2 ** 30, 2 ** 30)
        b._snap_version = -1
        assert int(b.nb_outputs[end]) == before
    finally:
        if saved is not None:
            os.environ["ACX_TESTING"] = saved
    # with the opt-in restored the hook works again (the rest of the
    # suite depends on it)
    b._lib.acx_debug_set_counts(b._h, end, 5, 0)
    b._snap_version = -1
    assert int(b.nb_outputs[end]) == 5
