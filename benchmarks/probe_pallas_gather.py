"""One-command Mosaic gather probe (round 5, VERDICT r4 #10).

The production fused Pallas kernel (ops/scan_pallas.py) is parked on a
measured Mosaic restriction: a table gather inside a pallas_call only
lowers when the whole table fits one vreg along the gather dimension —
1-D gathers fail with "Only 2D gather is supported", and Mosaic's "2D
gather" is a same-shape dynamic shuffle, not a table lookup. Run this
after every jax upgrade; if either probe ever PASSES on a real automaton
-sized table, promote the interpret-validated kernel.

Appends one line per run to results_pallas_probe.jsonl:
  {"jax": "...", "jaxlib": "...", "probe_1d": "...", "probe_2d": "...",
   "verdict": "blocked" | "LIFTED"}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _try(fn):
    try:
        fn()
        return "ok"
    except Exception as e:   # noqa: BLE001 — record the lowering error
        msg = (str(e) or repr(e)).strip().replace("\n", " ")
        return msg[:160] or type(e).__name__


def probe_1d():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    table = jnp.arange(1 << 16, dtype=jnp.int32)    # automaton-sized

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = t_ref[...][i_ref[...]]

    idx = jnp.zeros((8, 128), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(
            table, idx)
    out.block_until_ready()


def probe_2d():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    table = jnp.zeros((512, 128), jnp.int32)        # multi-vreg rows

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    idx = jnp.zeros((8, 128), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(
            table, idx)
    out.block_until_ready()


def main() -> None:
    import jax
    import jaxlib

    r1 = _try(probe_1d)
    r2 = _try(probe_2d)
    rec = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "probe_1d_table_gather": r1,
        "probe_2d_table_gather": r2,
        "verdict": "LIFTED — promote ops/scan_pallas.py"
                   if r1 == "ok" or r2 == "ok" else "blocked",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_pallas_probe.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
