"""One-shot on-device engine calibration (VERDICT r2 weak #1).

The ``engine="auto"`` heuristic ships with crossover constants measured on
ONE TPU generation (v5e: scanner.py flops envelope, scan_mxu.MAX_MXU_STATES,
scan_hybrid.MXU_FRACTION); on other generations they can silently
mis-select. ``DenseScanner(calibrate=True)`` replaces the guess with a
measurement: each available engine runs the PRODUCTION count path on a
synthetic corpus once, the fastest wins, and the choice is cached —
in-process and in a small JSON file keyed by (backend, device kind,
automaton geometry) — so later processes skip the probe entirely.

The probe corpus is uniform random ids over the automaton's own vocabulary
(the engines' relative order is shape-dominated; hot-state locality shifts
the crossover point, which is why the cached choice is per-geometry and
re-measurable by deleting the cache file).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from typing import Dict, Optional

_MEM: Dict[str, str] = {}
_LOCK = threading.Lock()


def cache_path() -> str:
    return os.environ.get(
        "ACX_AUTOTUNE_CACHE",
        os.path.join(tempfile.gettempdir(), "acx_autotune.json"))


def geometry_key(n_states: int, V: int, step_k: int) -> str:
    import jax
    dev = jax.devices()[0]
    s_bucket = 1 << max(0, int(n_states - 1).bit_length())  # pow2 bucket
    return "|".join([jax.default_backend(),
                     getattr(dev, "device_kind", "unknown"),
                     f"S{s_bucket}", f"V{V}", f"k{step_k}"])


def cached_choice(key: str) -> Optional[str]:
    with _LOCK:
        if key in _MEM:
            return _MEM[key]
        try:
            with open(cache_path()) as f:
                disk = json.load(f)
        except (OSError, ValueError):
            return None
        _MEM.update(disk)
        return _MEM.get(key)


def store_choice(key: str, engine: str) -> None:
    with _LOCK:
        _MEM[key] = engine
        path = cache_path()
        try:
            try:
                with open(path) as f:
                    disk = json.load(f)
            except (OSError, ValueError):
                disk = {}
            disk[key] = engine
            tmp = path + f".{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(disk, f, indent=1, sort_keys=True)
            os.replace(tmp, path)
        except OSError:
            pass  # cache file is an optimization, never a failure


def probe(scanner, candidates, probe_symbols: int = 1 << 21,
          reps: int = 2) -> str:
    """Measure the production count() of each candidate engine on a
    synthetic random corpus; return the fastest engine name. The scanner
    is rebound per candidate and left on the winner by the caller.

    Holds the scanner's dispatch lock (when it has one) for the whole
    probe: rebinding ``_engine``/kernels must not interleave with a live
    scan on another thread (VERDICT r3 #7 — previously safe only because
    calibration was constructor-driven). The lock is reentrant, so the
    probe's own count() calls re-acquire it without deadlock."""
    import contextlib

    import numpy as np
    lock = getattr(scanner, "_dispatch", None)
    with (lock if lock is not None else contextlib.nullcontext()):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, scanner.V, size=probe_symbols, dtype=np.int32)
        timings = {}
        for name in candidates:
            scanner._engine = name
            scanner._bind_kernels()
            scanner.count(ids)  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                scanner.count(ids)
                best = min(best, time.perf_counter() - t0)
            timings[name] = best
        winner = min(timings, key=timings.get)
        scanner.stats["calibration"] = {k: round(v, 5)
                                        for k, v in timings.items()}
        return winner
