"""Round-2 kernel formulation experiments (VERDICT r1 #2).

Attacks the in-scan gather plateau (~8.2 ns/gather at k=2, BENCHMARKS.md)
with formulations not tried in round 1:

  exp1  bounds-check elimination: gather with mode=promise_in_bounds
        (the production kernels use the default clamping gather)
  exp1b lax.scan unroll sweep on the k=2 packed count kernel
  exp2  MXU one-hot digit-matmul scan (the "permutation matrix" path the
        round-1 verdict suggested for small-S automata): exact int8
        matmuls, 7-bit digit planes, fp32/int32 accumulation
  exp3  Pallas kernel with the packed table VMEM-resident: expected to be
        rejected by Mosaic for multi-vreg tables (round-1 finding); this
        records the exact error on this toolchain, and validates the
        single-vreg (<=1024-entry) case that IS supported

Run on the real TPU: python benchmarks/exp_round2_kernels.py [expname]
Synchronous timing (int() materialization) per BENCHMARKS.md methodology.
"""

from __future__ import annotations

import sys
import time

import numpy as np

S = 4096          # states (headline bench has 3,821)
V = 28            # vocab (headline bench has 28)
L, B = 4096, 8192  # 33.5M symbols per launch


def timed(fn, reps=3):
    fn()  # warm-up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def make_inputs(rng, k=2):
    import jax.numpy as jnp
    Vk = V ** k
    # packed (state, count): state in high bits, 2 count bits
    packed = (rng.integers(0, S, size=S * Vk, dtype=np.int64) << 2) | \
        rng.integers(0, 4, size=S * Vk, dtype=np.int64)
    packed = jnp.asarray(packed.astype(np.int32))
    grams = jnp.asarray(rng.integers(0, Vk, size=(L, B), dtype=np.int32))
    return packed, grams


def exp1():
    """promise_in_bounds vs default clamping gather, k=2 shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    packed, grams = make_inputs(rng)
    Vk = V * V

    def make(mode):
        @jax.jit
        def count(packed, grams):
            s0 = grams[0] * 0
            zero = grams[0] * 0

            def step(carry, g):
                s, tot = carry
                idx = s * Vk + g
                if mode is None:
                    e = packed[idx]
                else:
                    e = packed.at[idx].get(mode=mode)
                return (e >> 2, tot + (e & 3)), None

            (_, tot), _ = lax.scan(step, (s0, zero), grams)
            return tot

        return count

    n = L * B
    for mode in (None, "promise_in_bounds", "fill"):
        fn = make(mode)
        dt = timed(lambda: int(np.asarray(fn(packed, grams)).sum(dtype=np.int64)))
        print(f"exp1 mode={mode!s:>20}: {dt:.4f}s  "
              f"{n / dt / 1e6:.1f} M gathers/s  {dt / n * 1e9:.2f} ns/gather")


def exp1b():
    """lax.scan unroll sweep on the same kernel."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    packed, grams = make_inputs(rng)
    Vk = V * V

    def make(unroll):
        @jax.jit
        def count(packed, grams):
            s0 = grams[0] * 0
            zero = grams[0] * 0

            def step(carry, g):
                s, tot = carry
                e = packed.at[s * Vk + g].get(mode="promise_in_bounds")
                return (e >> 2, tot + (e & 3)), None

            (_, tot), _ = lax.scan(step, (s0, zero), grams, unroll=unroll)
            return tot

        return count

    n = L * B
    for unroll in (1, 2, 4, 8):
        fn = make(unroll)
        dt = timed(lambda: int(np.asarray(fn(packed, grams)).sum(dtype=np.int64)))
        print(f"exp1b unroll={unroll}: {dt:.4f}s  "
              f"{n / dt / 1e6:.1f} M gathers/s")


def exp2():
    """MXU one-hot digit-matmul scan, k=1, exact.

    next_packed[b] = sum_s onehot[b,s] * table[s, c_b]; realized as
    R = onehot_int8 @ digit_planes [S, 3*V] (int32 accum), then per-row
    column select via a V-wide one-hot multiply-reduce on the VPU.
    Digits are 7-bit so every intermediate is exact in int8xint8->int32.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    for s_dim in (128, 512, 2048, 4096):
        packed_np = ((rng.integers(0, s_dim, size=(s_dim, V), dtype=np.int64)
                      << 2) |
                     rng.integers(0, 4, size=(s_dim, V), dtype=np.int64)
                     ).astype(np.int32)
        d0 = (packed_np & 127).astype(np.int8)
        d1 = ((packed_np >> 7) & 127).astype(np.int8)
        d2 = ((packed_np >> 14) & 127).astype(np.int8)
        planes = jnp.asarray(np.concatenate([d0, d1, d2], axis=1))  # [S,3V]
        flat = jnp.asarray(packed_np.reshape(-1))
        ids = jnp.asarray(rng.integers(0, V, size=(L, B), dtype=np.int32))

        @jax.jit
        def mxu_count(planes, ids):
            s0 = ids[0] * 0
            zero = ids[0] * 0
            eyeS = jnp.arange(s_dim, dtype=jnp.int32)
            eyeV = jnp.arange(V, dtype=jnp.int32)

            def step(carry, c):
                s, tot = carry
                onehot = (s[:, None] == eyeS[None, :]).astype(jnp.int8)
                R = lax.dot_general(
                    onehot, planes, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)        # [B, 3V]
                oc = (c[:, None] == eyeV[None, :]).astype(jnp.int32)
                lo = jnp.sum(R[:, :V] * oc, axis=1)
                mid = jnp.sum(R[:, V:2 * V] * oc, axis=1)
                hi = jnp.sum(R[:, 2 * V:] * oc, axis=1)
                e = lo + (mid << 7) + (hi << 14)
                return (e >> 2, tot + (e & 3)), None

            (_, tot), _ = lax.scan(step, (s0, zero), ids)
            return tot

        @jax.jit
        def gather_count(flat, ids):
            s0 = ids[0] * 0
            zero = ids[0] * 0

            def step(carry, c):
                s, tot = carry
                e = flat.at[s * V + c].get(mode="promise_in_bounds")
                return (e >> 2, tot + (e & 3)), None

            (_, tot), _ = lax.scan(step, (s0, zero), ids)
            return tot

        n = L * B
        r1 = int(np.asarray(mxu_count(planes, ids)).sum(dtype=np.int64))
        r2 = int(np.asarray(gather_count(flat, ids)).sum(dtype=np.int64))
        assert r1 == r2, (r1, r2)
        dt_m = timed(lambda: int(np.asarray(mxu_count(planes, ids))
                                 .sum(dtype=np.int64)))
        dt_g = timed(lambda: int(np.asarray(gather_count(flat, ids))
                                 .sum(dtype=np.int64)))
        print(f"exp2 S={s_dim:5d}: mxu {n/dt_m/1e6:8.1f} M sym/s   "
              f"gather {n/dt_g/1e6:8.1f} M sym/s   "
              f"mxu/gather = {dt_g/dt_m:.2f}x")


def exp2b():
    """Crossover placement: MXU k=1 vs the PRODUCTION k=2 packed gather at
    small S — decides the auto-select threshold for the MXU engine."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    Vk = V * V
    for s_dim in (128, 256, 512, 1024):
        # k=2 packed table (small: 128*784*4 = 392 KB at S=128)
        packed_np = ((rng.integers(0, s_dim, size=s_dim * Vk, dtype=np.int64)
                      << 2) |
                     rng.integers(0, 4, size=s_dim * Vk, dtype=np.int64)
                     ).astype(np.int32)
        packed2 = jnp.asarray(packed_np)
        grams = jnp.asarray(rng.integers(0, Vk, size=(L // 2, B),
                                         dtype=np.int32))

        @jax.jit
        def gather2_count(packed2, grams):
            s0 = grams[0] * 0
            zero = grams[0] * 0

            def step(carry, g):
                s, tot = carry
                e = packed2.at[s * Vk + g].get(mode="promise_in_bounds")
                return (e >> 2, tot + (e & 3)), None

            (_, tot), _ = lax.scan(step, (s0, zero), grams)
            return tot

        n = L * B  # symbols: L/2 grams x 2 symbols each
        dt = timed(lambda: int(np.asarray(gather2_count(packed2, grams))
                               .sum(dtype=np.int64)))
        print(f"exp2b S={s_dim:5d}: k=2 gather "
              f"({s_dim*Vk*4/1024:.0f} KB table) "
              f"{n/dt/1e6:8.1f} M sym/s")


def exp3():
    """Pallas: packed table VMEM-resident, vector gather in-kernel."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def make_kernel(n_entries, Vk):
        def kernel(table_ref, grams_ref, out_ref):
            Lk = grams_ref.shape[0]
            Bk = grams_ref.shape[1]
            table = table_ref[:]

            def body(t, carry):
                s, tot = carry
                g = grams_ref[t, :]
                e = jnp.take(table, s * Vk + g, axis=0)
                return e >> 2, tot + (e & 3)

            s0 = jnp.zeros((Bk,), jnp.int32)
            s, tot = lax.fori_loop(0, Lk, body, (s0, s0))
            out_ref[:] = tot

        return kernel

    for s_dim, k in ((16, 1), (S, 2)):   # single-vreg toy, then real size
        Vk = V ** k
        n_entries = s_dim * Vk
        packed_np = ((rng.integers(0, s_dim, size=n_entries, dtype=np.int64)
                      << 2) |
                     rng.integers(0, 4, size=n_entries, dtype=np.int64)
                     ).astype(np.int32)
        table = jnp.asarray(packed_np)
        grams = jnp.asarray(rng.integers(0, Vk, size=(L, B), dtype=np.int32))
        fn = pl.pallas_call(
            make_kernel(n_entries, Vk),
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        try:
            r = int(np.asarray(jax.jit(fn)(table, grams)).sum(dtype=np.int64))
            dt = timed(lambda: int(np.asarray(jax.jit(fn)(table, grams))
                                   .sum(dtype=np.int64)))
            n = L * B
            print(f"exp3 S={s_dim} k={k} ({n_entries*4/1024:.0f} KB table): "
                  f"OK {n/dt/1e6:.1f} M sym/s (sum={r})")
        except Exception as e:
            lines = str(e).splitlines() or [repr(e)]
            print(f"exp3 S={s_dim} k={k} ({n_entries*4/1024:.0f} KB table): "
                  f"REJECTED: {type(e).__name__}: {lines[0][:200]}")


def exp3b():
    """Pallas VMEM gather, 2D form: Mosaic's rejection message for 1D says
    'Only 2D gather is supported' — probe whether table.reshape(-1, 128)
    indexed with (row, lane) vectors compiles, and at what rate."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    for s_dim, k in ((4096, 2),):
        Vk = V ** k
        n_entries = s_dim * Vk
        rows = -(-n_entries // 128)
        packed_np = ((rng.integers(0, s_dim, size=rows * 128, dtype=np.int64)
                      << 2) |
                     rng.integers(0, 4, size=rows * 128, dtype=np.int64)
                     ).astype(np.int32).reshape(rows, 128)
        table = jnp.asarray(packed_np)
        grams = jnp.asarray(rng.integers(0, Vk, size=(L, B), dtype=np.int32))

        def kernel(table_ref, grams_ref, out_ref):
            Lk = grams_ref.shape[0]
            table = table_ref[:]

            def body(t, carry):
                s, tot = carry
                idx = s * Vk + grams_ref[t, :]
                e = table[idx // 128, idx % 128]
                return e >> 2, tot + (e & 3)

            s0 = jnp.zeros((grams_ref.shape[1],), jnp.int32)
            s, tot = lax.fori_loop(0, Lk, body, (s0, s0))
            out_ref[:] = tot

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        try:
            jfn = jax.jit(fn)
            r = int(np.asarray(jfn(table, grams)).sum(dtype=np.int64))
            dt = timed(lambda: int(np.asarray(jfn(table, grams))
                                   .sum(dtype=np.int64)))
            n = L * B
            print(f"exp3b S={s_dim} k={k} ({rows*128*4/1e6:.0f} MB table): "
                  f"OK {n/dt/1e6:.1f} M sym/s ({n/k/dt/1e6:.1f} M gathers/s,"
                  f" sum={r})")
        except Exception as e:
            lines = str(e).splitlines() or [repr(e)]
            print(f"exp3b S={s_dim} k={k}: REJECTED: "
                  f"{type(e).__name__}: {lines[0][:300]}")
            # Mosaic's _gather_lowering_rule asserts
            # indices.shape == operand.shape + (1,): "2D gather" means a
            # same-shape dynamic shuffle only — a large lookup table can
            # NOT be vector-gathered in a Pallas kernel on this toolchain.


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name in ("exp1", "exp1b", "exp2", "exp2b", "exp3", "exp3b"):
        if which in ("all", name):
            globals()[name]()
