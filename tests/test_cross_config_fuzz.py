"""Cross-config differential fuzz: every scanner configuration against
the sequential host oracle on the same random dictionaries/corpora —
counts, full event streams, and bounded retrieval (round-4 wrap-up; a
24-seed x 7-config run of the same sweep was committed clean)."""

import random

import pytest

import aho_corasick_1975_tpu as ac

CONFIGS = [{}, {"step_k": 2}, {"step_k": 1}, {"prefilter": "on"},
           {"prefilter": "auto"}, {"step_budget_bytes": 1 << 17}]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_all_configs_match_sequential_oracle(seed):
    rng = random.Random(9000 + seed)
    alpha = ["ab", "abc", "abcdef"][seed % 3]
    m = ac.Machine(incremental=(seed % 2 == 0))
    for _ in range(rng.randint(5, 100)):
        m.insert_keyword("".join(rng.choice(alpha)
                                 for _ in range(rng.randint(1, 8))))
    text = "".join(rng.choice(alpha + "xy ")
                   for _ in range(rng.randint(500, 12_000)))
    cur = m.initiate()
    want_count = m.match_stream(cur, text)
    cur = m.initiate()
    want_events = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch)):
            want_events.append((i, j, m.get_match(cur, j).text()))
    import jax.numpy as jnp
    import numpy as np
    for kwargs in CONFIGS:
        sc = m.scanner(n_streams=rng.choice([3, 8]), **kwargs)
        assert sc.count(text) == want_count, kwargs
        got = [(ev.end, ev.index, mt.text())
               for ev, mt in sc.find_matches(text)]
        assert got == want_events, kwargs
        got_b = [(ev.end, ev.index, mt.text())
                 for ev, mt in sc.find_matches(text, max_hits=1 << 15)]
        assert got_b == want_events, kwargs
        # device-resident corpus dimension (round 5): the same oracle
        # through the jax.Array input paths (device filter when sparse)
        ids_dev = jnp.asarray(np.asarray(sc.encode(text), np.int32))
        assert sc.count(ids_dev) == want_count, kwargs
        got_d = [(ev.end, ev.index, mt.text())
                 for ev, mt in sc.find_matches(ids_dev)]
        assert got_d == want_events, kwargs
