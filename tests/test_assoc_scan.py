"""Associative-scan (function-composition) formulation vs the sequential
recurrence — SURVEY.md §5 sequence-parallel option (a)."""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.ops.scan_assoc import make_assoc_scan


@pytest.mark.parametrize("seed", [0, 1])
def test_assoc_scan_equals_sequential(seed):
    import jax.numpy as jnp

    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(25):
        m.insert_keyword("".join(rng.choice("ab")
                                 for _ in range(rng.randint(1, 5))))
    tables = m.compile()
    text = "".join(rng.choice("abx") for _ in range(700))
    sc = m.scanner(n_streams=4)
    expected = sc.scan_states_sequential(text)
    ids = sc.encode(text)
    got = np.asarray(make_assoc_scan(tables.vocab_size)(
        jnp.asarray(tables.delta), jnp.asarray(ids)))
    np.testing.assert_array_equal(got, expected)
