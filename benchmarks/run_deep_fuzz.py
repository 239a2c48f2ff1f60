"""Deep differential fuzz runner (round-5 wrap-up): the committed suite
keeps a 6-seed version (tests/test_cross_config_fuzz.py); this runs the
same sweep at N seeds (default 24) on the CPU backend and prints a
one-line verdict. Run before judging; results go to
results_deep_fuzz.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "") and None
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import numpy as np  # noqa: E402

import aho_corasick_1975_tpu as ac  # noqa: E402

CONFIGS = [{}, {"step_k": 2}, {"step_k": 1}, {"prefilter": "on"},
           {"prefilter": "auto"}, {"step_budget_bytes": 1 << 17}]
N_SEEDS = int(os.environ.get("FUZZ_SEEDS", "24"))


def one_seed(seed: int) -> int:
    import jax.numpy as jnp
    rng = random.Random(77_000 + seed)
    alpha = ["ab", "abc", "abcdef"][seed % 3]
    m = ac.Machine(incremental=(seed % 2 == 0))
    for _ in range(rng.randint(5, 120)):
        m.insert_keyword("".join(rng.choice(alpha)
                                 for _ in range(rng.randint(1, 8))))
    text = "".join(rng.choice(alpha + "xy ")
                   for _ in range(rng.randint(500, 16_000)))
    cur = m.initiate()
    want_count = m.match_stream(cur, text)
    cur = m.initiate()
    want_events = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch)):
            want_events.append((i, j, m.get_match(cur, j).text()))
    checks = 0
    for kwargs in CONFIGS:
        sc = m.scanner(n_streams=rng.choice([3, 8]), **kwargs)
        assert sc.count(text) == want_count, (seed, kwargs)
        got = [(ev.end, ev.index, mt.text())
               for ev, mt in sc.find_matches(text)]
        assert got == want_events, (seed, kwargs)
        got_b = [(ev.end, ev.index, mt.text())
                 for ev, mt in sc.find_matches(text, max_hits=1 << 15)]
        assert got_b == want_events, (seed, kwargs)
        ids_dev = jnp.asarray(np.asarray(sc.encode(text), np.int32))
        assert sc.count(ids_dev) == want_count, (seed, kwargs)
        got_d = [(ev.end, ev.index, mt.text())
                 for ev, mt in sc.find_matches(ids_dev)]
        assert got_d == want_events, (seed, kwargs)
        # ragged session sweep (heads through every path)
        sess = sc.session()
        step = rng.randint(7, 997)
        total = sum(sess.feed_count(text[i:i + step])
                    for i in range(0, len(text), step))
        assert total == want_count, (seed, kwargs, step)
        checks += 6
    return checks


def main() -> None:
    t0 = time.perf_counter()
    total = 0
    for s in range(N_SEEDS):
        total += one_seed(s)
        print(f"  seed {s} ok", file=sys.stderr, flush=True)
    out = {"metric": "deep_fuzz", "seeds": N_SEEDS,
           "configs": len(CONFIGS), "checks": total, "result": "clean",
           "wall_seconds": round(time.perf_counter() - t0, 1)}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results_deep_fuzz.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
