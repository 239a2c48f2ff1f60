"""Experiment: real headline workload at step_k=3 (335 MB packed table),
stream-count sweep. Mirrors bench.py exactly otherwise.

Run: timeout 560 python benchmarks/exp_k3_real.py [k] [streams...]
"""

from __future__ import annotations

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CORPUS = "/root/reference/examples/mrs_dalloway.txt"
TARGET_BYTES = 64 * 1024 * 1024


def main() -> None:
    import jax
    import jax.numpy as jnp

    import aho_corasick_1975_tpu as ac

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    streams = [int(s) for s in sys.argv[2:]] or [8192, 16384, 32768]

    raw = open(REFERENCE_CORPUS, "r", errors="replace").read()
    norm = re.sub(r"[^a-z]", " ", raw.lower())
    freq: dict[str, int] = {}
    for w in norm.split():
        freq[w] = freq.get(w, 0) + 1
    words = sorted(freq, key=lambda w: (-freq[w], w))[:1000]

    machine = ac.Machine()
    for w in words:
        machine.insert_keyword(" " + w + " ")

    reps = max(1, TARGET_BYTES // len(norm))
    text = (norm + " ") * reps
    lut = np.zeros(256, np.int32)
    for b in range(32, 127):
        lut[b] = machine.vocab.lookup(chr(b))
    ids = lut[np.frombuffer(text.encode("latin-1"), np.uint8)]
    nbytes = len(text)

    for B in streams:
        t0 = time.perf_counter()
        scanner = machine.scanner(n_streams=B, step_k=k,
                                  step_budget_bytes=1 << 30)
        build_s = time.perf_counter() - t0
        assert scanner.step_k == k, scanner.step_k
        dev_blocks = jnp.asarray(scanner._layout_stepped(ids))
        tabs = scanner._st_dev
        count_fn = scanner._stepped_count

        def run_once():
            return int(np.asarray(count_fn(*tabs, dev_blocks))
                       .sum(dtype=np.int64))

        total = run_once()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = run_once()
            times.append(time.perf_counter() - t0)
        assert r == total
        dt = min(times)
        print(f"k={k} B={B:>6}  {nbytes/dt/1e6:7.1f} MB/s  "
              f"(pass {dt:.4f}s, matches {total}, table build {build_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
