"""Experimental Pallas fused scan kernel (status: interpret-validated).

The fused gather-transition-count step as a single Pallas kernel: table and
block matrix in VMEM, state vector carried across a fori_loop, per-step
vector gather + masked count accumulation, grid over stream tiles.

WHY THIS IS NOT THE PRODUCTION PATH ON TPU v5e (measured, BENCHMARKS.md):
Mosaic's vector gather requires all sources in ONE vreg along the gather
dimension ("Multiple source vregs along gather dimension"), i.e. tables of
at most a few hundred entries — real automata have 1e3..1e6 states. The XLA
scan path lowers the same gathers through the general (slow, ~0.1 G elem/s)
path, and a Pallas kernel cannot beat it without hardware vector-gather.
The k-gram packed tables (ops/multistep.py) attack the problem at the
algorithm level instead.

The kernel below is correct under `interpret=True` (tested on CPU in CI)
and is the ready-made fused implementation for TPU generations / Mosaic
versions that lift the gather restriction.

Round-4 re-probe (jax 0.9.0, v5 lite): a 1-D table gather inside a
pallas_call still fails to lower ("Only 2D gather is supported") — the
restriction and this module's parked status remain current.

Round-2 re-examination (benchmarks/exp_round2_kernels.py exp3/exp3b,
BENCHMARKS.md "Round-2 kernel formulations"): the current toolchain rejects
the 1-D form with "Only 2D gather is supported", and its "2D gather" is a
same-shape dynamic shuffle (`_gather_lowering_rule` asserts
indices.shape == operand.shape + (1,)) — not a table lookup. Both VMEM
formulations are measured dead ends on this generation; the MXU digit-
matmul engine (ops/scan_mxu.py) is the formulation that DID pan out for
small automata.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas is optional at import time
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


@lru_cache(maxsize=None)
def make_pallas_blocked_count(V: int, halo: int, interpret: bool = False):
    """Returns count(dflat, nb_out, ids_tm) -> total matches, as one fused
    Pallas kernel. ids_tm: int32 [L, B]."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")

    def kernel(dflat_ref, nb_out_ref, ids_ref, out_ref):
        table = dflat_ref[:]
        nb_out = nb_out_ref[:]
        L, B = ids_ref.shape
        s0 = jnp.zeros((B,), jnp.int32)
        tot0 = jnp.zeros((B,), jnp.int32)

        def body(t, carry):
            s, tot = carry
            c = ids_ref[t, :]
            s2 = jnp.take(table, s * V + c, axis=0)
            cnt = jnp.where(t >= halo, jnp.take(nb_out, s2, axis=0), 0)
            return s2, tot + cnt

        s, tot = lax.fori_loop(0, L, body, (s0, tot0))
        out_ref[0, 0] = jnp.sum(tot)

    @jax.jit
    def count(dflat, nb_out, ids_tm):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )(dflat, nb_out, ids_tm)[0, 0]

    return count
