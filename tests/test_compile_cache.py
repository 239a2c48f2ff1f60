"""Persistent compile-cache wiring (round 5, utils/compile_cache.py).
The 19-33x cold-process measurement lives in
benchmarks/bench_compile_cache.py (TPU); here: policy parsing, the
opt-out, and that scanner construction tolerates every setting."""

import numpy as np

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.utils import compile_cache as cc


def test_enabled_parsing(monkeypatch):
    for v, want in [("off", False), ("0", False), ("no", False),
                    ("FALSE", False), ("", True), ("on", True),
                    ("/tmp/somewhere", True)]:
        monkeypatch.setenv("ACX_COMPILE_CACHE", v)
        assert cc._enabled() is want, v


def test_cache_dir_resolution(monkeypatch):
    monkeypatch.setenv("ACX_COMPILE_CACHE", "/tmp/acx-cache-test")
    assert cc._cache_dir() == "/tmp/acx-cache-test"
    monkeypatch.setenv("ACX_COMPILE_CACHE", "on")
    assert cc._cache_dir().endswith("aho_corasick_1975_tpu/xla")


def test_enable_is_idempotent_and_off_respects_env(monkeypatch, tmp_path):
    # the suite runs with ACX_COMPILE_CACHE=off (conftest): the latch is
    # already set by earlier scanner constructions and must return None
    assert cc.enable_compile_cache() is None
    # a fresh latch with the env opt-out also disables
    monkeypatch.setattr(cc, "_done", False)
    monkeypatch.setenv("ACX_COMPILE_CACHE", "off")
    assert cc.enable_compile_cache() is None
    # construction still works under the opt-out
    m = ac.Machine()
    m.insert_keyword("he")
    assert m.scanner(n_streams=4).count("hehe") == 2


def test_enable_with_explicit_path(monkeypatch, tmp_path):
    """With a fresh latch and a writable dir the cache engages; jax
    accepts the directory config on the CPU backend too."""
    import jax

    monkeypatch.setattr(cc, "_done", False)
    monkeypatch.setenv("ACX_COMPILE_CACHE", str(tmp_path / "xla"))
    got = cc.enable_compile_cache()
    assert got == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    # restore the suite's hermetic setting for later tests
    monkeypatch.setattr(cc, "_done", False)
    monkeypatch.setenv("ACX_COMPILE_CACHE", "off")
    jax.config.update("jax_compilation_cache_dir", None)
    cc.enable_compile_cache()


def test_unwritable_cache_dir_degrades_to_disabled(monkeypatch):
    """Review r5: scanner construction must not fail because the cache
    directory cannot be created (read-only $HOME)."""
    monkeypatch.setattr(cc, "_done", False)
    monkeypatch.setattr(cc, "_active", None)
    monkeypatch.setenv("ACX_COMPILE_CACHE", "/proc/acx-cannot-exist/x")
    assert cc.enable_compile_cache() is None
    m = ac.Machine()
    m.insert_keyword("he")
    assert m.scanner(n_streams=4).count("hehe") == 2
    # repeat calls report the real outcome (None), not a phantom dir
    assert cc.enable_compile_cache() is None
    monkeypatch.setattr(cc, "_done", False)
    monkeypatch.setenv("ACX_COMPILE_CACHE", "off")
    cc.enable_compile_cache()
