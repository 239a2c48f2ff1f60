"""Experiment: in-scan dynamic-gather rate vs table size and dtype.

Mirrors the production stepped-count loop (ops/multistep.py) with random
tables, to answer: (a) does int16 storage raise the gather rate, (b) does
it rescue k=3-scale tables. Synchronous timing per CLAUDE.md.

Run: timeout 560 python benchmarks/exp_gather_dtype.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_count(E: int, dtype, count_bits: int):
    mask = (1 << count_bits) - 1

    @jax.jit
    def count(packed, grams):
        s0 = grams[0] * 0
        zero = grams[0] * 0

        def step(carry, g):
            s, tot = carry
            v = packed[s + g].astype(jnp.int32)
            s2 = v >> count_bits
            return (s2, tot + (v & mask)), None

        (_, tot), _ = lax.scan(step, (s0, zero), grams)
        return tot

    return count


def bench(E: int, dtype, steps: int = 512, B: int = 16384, reps: int = 3):
    rng = np.random.default_rng(0)
    count_bits = 4
    nbits = 15 if dtype == np.int16 else 27
    # next-state values keep indices in range after +g
    maxs = min(E - 64, (1 << (nbits - count_bits)) - 1)
    packed = ((rng.integers(0, maxs, E).astype(np.int64) << count_bits)
              | rng.integers(0, 3, E)).astype(dtype)
    grams = rng.integers(0, 64, (steps, B)).astype(np.int32)
    dp = jax.device_put(packed)
    dg = jax.device_put(grams)
    fn = make_count(E, dtype, count_bits)
    r = int(np.asarray(fn(dp, dg)).sum())  # warm-up
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r2 = int(np.asarray(fn(dp, dg)).sum())
        times.append(time.perf_counter() - t0)
    assert r2 == r
    dt = min(times)
    rate = steps * B / dt
    print(f"E={E:>12,}  dtype={np.dtype(dtype).name:5s}  "
          f"{rate/1e6:8.1f} M gathers/s   ({1e9/rate:5.2f} ns/gather)",
          flush=True)
    return rate


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for E in (107_000, 3_000_000, 84_000_000):
        for dt in (np.int32, np.int16):
            bench(E, dt)
