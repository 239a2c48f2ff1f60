"""k-char stepped count tables (ops/multistep.py) vs the 1-char oracle.

The stepped path must count exactly what per-symbol acm_match totals would
(every intermediate position's matches accounted), for all k, text lengths
not divisible by k, halo alignment, and the unpacked fallback.
"""

import random

import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.ops import multistep as ms


def build_random(seed, n_kw=60, alphabet="abc"):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n_kw):
        m.insert_keyword("".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(1, 6))))
    text = "".join(rng.choice(alphabet + "z") for _ in range(1237))
    return m, text


@pytest.mark.parametrize("k", [1, 2, 3, 4])
@pytest.mark.parametrize("seed", [0, 1])
def test_stepped_count_equals_streaming(seed, k):
    m, text = build_random(seed)
    cur = m.initiate()
    expected = sum(m.match(cur, ch) for ch in text)
    sc = m.scanner(n_streams=8, step_k=k)
    assert sc.count(text) == expected


def test_choose_k_budget():
    # 1000 states, vocab 30: 1000*30^3*4 = 108MB <= 128MB -> k=3
    assert ms.choose_k(1000, 30, 128 * 1024 * 1024) == 3
    assert ms.choose_k(1000, 30, 8 * 1024 * 1024) == 2
    assert ms.choose_k(10**6, 300, 8 * 1024 * 1024) == 1


def test_gram_composition_tables():
    m, text = build_random(2)
    tables = m.compile()
    st = ms.build_stepped(tables, 2)
    S, V = tables.delta.shape
    rng = random.Random(0)
    nb = tables.nb_outputs
    for _ in range(200):
        s = rng.randrange(S)
        c1, c2 = rng.randrange(V), rng.randrange(V)
        s1 = tables.delta[s, c1]
        s2 = tables.delta[s1, c2]
        want_cnt = int(nb[s1] + nb[s2])
        g = c1 * V + c2
        if st.packed is not None:
            v = int(st.packed[s * st.Vk + g])
            assert v >> st.count_bits == s2
            assert v & ((1 << st.count_bits) - 1) == want_cnt
        else:
            assert int(st.delta_k[s * st.Vk + g]) == s2
            assert int(st.cnt_k[s * st.Vk + g]) == want_cnt


def test_unpacked_fallback_forced(monkeypatch):
    """Force the two-table fallback by pretending counts need many bits."""
    m, text = build_random(3)
    tables = m.compile()
    st = ms.build_stepped(tables, 2)
    # Build an unpacked twin manually and compare count results.
    sc_packed = m.scanner(n_streams=4, step_k=2)
    import jax.numpy as jnp
    V, k, Vk = st.V, st.k, st.Vk
    if st.packed is not None:
        cb = st.count_bits
        delta_k = (st.packed >> cb).astype(np.int32)
        cnt_k = (st.packed & ((1 << cb) - 1)).astype(np.int32)
    else:
        delta_k, cnt_k = st.delta_k, st.cnt_k
    f = ms.make_stepped_count_unpacked(V, k, Vk, sc_packed._halo_steps)
    blocks = sc_packed._layout_stepped(sc_packed.encode(text))
    got = int(np.asarray(f(jnp.asarray(delta_k), jnp.asarray(cnt_k),
                           jnp.asarray(blocks))).sum(dtype=np.int64))
    assert got == sc_packed.count(text)


def test_deep_suffix_counts_fit_packing():
    """Nested suffixes give per-position counts equal to the nesting depth —
    stress the count-bit sizing."""
    m = ac.Machine()
    N = 30
    for j in range(1, N + 1):
        m.insert_keyword("a" * j)
    text = "a" * 500
    expected = sum(min(i + 1, N) for i in range(len(text)))
    for k in (2, 4):
        assert m.scanner(n_streams=4, step_k=k).count(text) == expected
