"""Experimental Pallas fused scan kernel — interpret-mode validation.

On TPU v5e Mosaic cannot compile multi-vreg gathers (documented in
ops/scan_pallas.py and BENCHMARKS.md); the kernel is validated against the
XLA path in interpreter mode so it is ready when the restriction lifts.
"""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac

pallas = pytest.importorskip("jax.experimental.pallas")

from aho_corasick_1975_tpu.ops.scan_pallas import (HAVE_PALLAS,
                                                   make_pallas_blocked_count)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_count_matches_xla_interpret():
    import jax.numpy as jnp

    rng = random.Random(0)
    m = ac.Machine()
    for _ in range(30):
        m.insert_keyword("".join(rng.choice("abc")
                                 for _ in range(rng.randint(1, 5))))
    sc = m.scanner(n_streams=8, step_k=1)
    text = "".join(rng.choice("abcx") for _ in range(2000))
    expected = sc.count(text)

    ids = sc.encode(text)
    blocks, _, _ = sc._layout(ids)
    f = make_pallas_blocked_count(sc.V, sc.halo, interpret=True)
    got = int(f(sc._dflat, sc._nb_out, jnp.asarray(blocks)))
    assert got == expected
