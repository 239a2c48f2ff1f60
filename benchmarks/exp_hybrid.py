"""Hybrid gather+MXU scan experiment.

Premise: the k=2 packed-gather scan is bound by the dynamic-gather issue
rate (~8.2 ns/gather, BENCHMARKS.md) — a memory/issue limit — while the
MXU digit-matmul scan is bound by matmul+VPU throughput. Different
hardware units: if XLA can dual-issue the two inside ONE scan body
(half the stream columns scanned by gather, half by matmuls), the
combined rate could approach the SUM of the standalone rates instead of
their max. This experiment measures exactly that on a headline-sized
automaton (S≈3.8k, V=28).

Output: one JSON line per (B_gather, B_mxu) split with standalone and
hybrid rates. Negative result stays committed either way (VERDICT r1
methodology).
"""

import json
import sys
import time
from functools import lru_cache
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from aho_corasick_1975_tpu.ops.scan_mxu import DIGIT_BITS, build_planes

V = 28
S = 3821
K = 2                     # gather path: k=2 packed grams
L = 8192                  # symbols per stream column
CB_G = 4                  # packed count bits (gather)


def timed(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


@lru_cache(maxsize=None)
def make_gather_count(B):
    Vk = V * V

    @jax.jit
    def count(packed2, grams):           # grams [L//K, B]
        s0 = grams[0] * 0
        zero = grams[0] * 0

        def step(carry, g):
            s, tot = carry
            e = packed2[s * Vk + g]
            return (e >> CB_G, tot + (e & ((1 << CB_G) - 1))), None

        (_, tot), _ = lax.scan(step, (s0, zero), grams)
        return tot

    return count


def mxu_steps(planes, S_pad, n_planes, cb, sm, tot, syms):
    """k sequential MXU lookups (syms: [k, B])."""
    eyeS = jnp.arange(S_pad, dtype=jnp.int32)
    eyeV = jnp.arange(V, dtype=jnp.int32)
    mask = (1 << cb) - 1
    for j in range(syms.shape[0]):
        onehot = (sm[:, None] == eyeS[None, :]).astype(jnp.int8)
        R = lax.dot_general(onehot, planes, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        oc = (syms[j][:, None] == eyeV[None, :]).astype(jnp.int32)
        e = tot * 0
        for p in range(n_planes):
            e = e + (jnp.sum(R[:, p * V:(p + 1) * V] * oc, axis=1)
                     << (DIGIT_BITS * p))
        tot = tot + (e & mask)
        sm = e >> cb
    return sm, tot


@lru_cache(maxsize=None)
def make_mxu_count(B, S_pad, n_planes, cb):
    @jax.jit
    def count(planes, syms):             # syms [L, B]
        Lk = syms.shape[0] // K
        xs = syms.reshape(Lk, K, B)
        s0 = syms[0] * 0
        zero = syms[0] * 0

        def step(carry, sy):
            sm, tot = carry
            sm, tot = mxu_steps(planes, S_pad, n_planes, cb, sm, tot, sy)
            return (sm, tot), None

        (_, tot), _ = lax.scan(step, (s0, zero), xs)
        return tot

    return count


@lru_cache(maxsize=None)
def make_hybrid_count(B1, B2, S_pad, n_planes, cb):
    Vk = V * V

    @jax.jit
    def count(packed2, planes, grams, syms):  # [Lk,B1], [L,B2]
        Lk = grams.shape[0]
        xs = (grams, syms.reshape(Lk, K, B2))
        s0g = grams[0] * 0
        s0m = syms[0] * 0

        def step(carry, x):
            sg, totg, sm, totm = carry
            g, sy = x
            e = packed2[sg * Vk + g]
            sm, totm = mxu_steps(planes, S_pad, n_planes, cb, sm, totm, sy)
            return (e >> CB_G, totg + (e & ((1 << CB_G) - 1)),
                    sm, totm), None

        (sfin, _) = lax.scan(step, (s0g, s0g * 0, s0m, s0m * 0), xs)
        return sfin[1], sfin[3]

    return count


def main():
    rng = np.random.default_rng(0)
    # synthetic automaton tables with matching semantics is unnecessary —
    # rate depends on shapes, not values; correctness of each formulation
    # is covered by tests/test_mxu_engine.py + test_multistep.py.
    delta = rng.integers(0, S, (S, V)).astype(np.int32)
    nb = (rng.random(S) < 0.02).astype(np.int32)
    planes_np, cb, n_planes, S_pad = build_planes_any(delta, nb)
    planes = jnp.asarray(planes_np)
    packed2_np = ((rng.integers(0, S, S * V * V, dtype=np.int64) << CB_G)
                  | rng.integers(0, 3, S * V * V, dtype=np.int64)
                  ).astype(np.int32)
    packed2 = jnp.asarray(packed2_np)

    for B1, B2 in ((4096, 0), (0, 1024), (4096, 1024), (4096, 2048),
                   (8192, 1024), (4096, 512)):
        out = {"B_gather": B1, "B_mxu": B2, "S": S, "L": L}
        if B1 and not B2:
            grams = jnp.asarray(
                rng.integers(0, V * V, (L // K, B1), dtype=np.int32))
            fn = make_gather_count(B1)
            dt = timed(lambda: int(np.asarray(fn(packed2, grams))
                                   .sum(dtype=np.int64)))
            n = L * B1
        elif B2 and not B1:
            syms = jnp.asarray(rng.integers(0, V, (L, B2), dtype=np.int32))
            fn = make_mxu_count(B2, S_pad, n_planes, cb)
            dt = timed(lambda: int(np.asarray(fn(planes, syms))
                                   .sum(dtype=np.int64)))
            n = L * B2
        else:
            grams = jnp.asarray(
                rng.integers(0, V * V, (L // K, B1), dtype=np.int32))
            syms = jnp.asarray(rng.integers(0, V, (L, B2), dtype=np.int32))
            fn = make_hybrid_count(B1, B2, S_pad, n_planes, cb)

            def run():
                a, b = fn(packed2, planes, grams, syms)
                return (int(np.asarray(a).sum(dtype=np.int64))
                        + int(np.asarray(b).sum(dtype=np.int64)))

            dt = timed(run)
            n = L * (B1 + B2)
        out.update(seconds=round(dt, 4),
                   msym_per_s=round(n / dt / 1e6, 1))
        print(json.dumps(out), flush=True)


def build_planes_any(delta, nb):
    """build_planes without the small-automaton gate (we want S≈3.8k)."""
    from aho_corasick_1975_tpu.ops import scan_mxu
    old = scan_mxu.MAX_MXU_STATES
    scan_mxu.MAX_MXU_STATES = 1 << 20
    try:
        return build_planes(delta, nb)
    finally:
        scan_mxu.MAX_MXU_STATES = old


if __name__ == "__main__":
    main()
