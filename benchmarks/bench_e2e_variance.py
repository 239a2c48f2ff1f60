"""Settle the e2e-above-the-floor claim with variance data (VERDICT r4
weak #3 / next #4).

Round 3 committed pipelined-raw e2e 48-50 MB/s and claimed it beat the
sequentially-measured device_put floor; the round-4 driver capture showed
43.3 vs 55.3 MB/s. This rig's remote-tunnel transfer rate swings 33-60
MB/s run to run, so single samples cannot adjudicate. This script:

1. runs the pipelined raw e2e count and the device_put floor
   INTERLEAVED, N times each (both legs ride the same tunnel weather);
2. sweeps the pipeline chunk size (the one depth knob,
   DenseScanner._pipeline_chunk) to check whether a different depth
   recovers overlap;
3. writes mean/min/max per leg to results_e2e_variance.json.

Headline config (bench.py): mrs_dalloway x ~64 MB, 1000-keyword
dictionary, raw byte path. Run ALONE on the TPU (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CORPUS = "/root/reference/examples/mrs_dalloway.txt"
N = int(os.environ.get("E2E_N", "10"))
SWEEP = [2 << 20, 4 << 20, 8 << 20, 16 << 20]


def build():
    import aho_corasick_1975_tpu as ac
    with open(REFERENCE_CORPUS, "r", errors="replace") as f:
        raw = f.read()
    norm = re.sub(r"[^a-z]", " ", raw.lower())
    freq: dict[str, int] = {}
    for w in norm.split():
        freq[w] = freq.get(w, 0) + 1
    words = sorted(freq, key=lambda w: (-freq[w], w))[:1000]
    m = ac.Machine()
    for w in words:
        m.insert_keyword(b" " + w.encode() + b" ")
    reps = max(1, (64 * 1024 * 1024) // len(norm))
    text = ((norm + " ") * reps).encode()
    return m, text


def main() -> None:
    import jax.numpy as jnp

    m, text = build()
    sc = m.scanner(n_streams=16384)
    raw = np.frombuffer(text, np.uint8)
    nb = len(text)

    # warm both legs (compile + first transfer)
    total = sc.count(text)
    assert sc.count(text) == total
    up = jnp.asarray(raw)
    _ = int(up[-1])

    e2e, floor = [], []
    for i in range(N):
        t0 = time.perf_counter()
        assert sc.count(text) == total
        e2e.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        up = jnp.asarray(raw)
        _ = int(up[-1])   # synchronous materialization (CLAUDE.md)
        floor.append(time.perf_counter() - t0)
        print(f"  pass {i}: e2e {nb/e2e[-1]/1e6:.1f} MB/s, "
              f"floor {nb/floor[-1]/1e6:.1f} MB/s", file=sys.stderr)

    def stats(ts):
        rates = [nb / t / 1e6 for t in ts]
        return {"mean_mb_s": round(statistics.mean(rates), 1),
                "min_mb_s": round(min(rates), 1),
                "max_mb_s": round(max(rates), 1),
                "n": len(rates)}

    sweep = {}
    saved = sc._pipeline_chunk
    for C in SWEEP:
        sc._pipeline_chunk = C
        assert sc.count(text) == total      # compile this geometry
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sc.count(text)
            ts.append(time.perf_counter() - t0)
        sweep[str(C >> 20) + "M"] = stats(ts)
        print(f"  chunk {C >> 20}M: {sweep[str(C >> 20) + 'M']}",
              file=sys.stderr)
    sc._pipeline_chunk = saved

    out = {
        "metric": "e2e_vs_upload_floor_variance",
        "corpus_bytes": nb,
        "interleaved_passes": N,
        "e2e_pipelined_raw": stats(e2e),
        "device_put_floor": stats(floor),
        "chunk_sweep_e2e": sweep,
        "verdict_e2e_minus_floor_mean_mb_s": round(
            statistics.mean([nb / t / 1e6 for t in e2e])
            - statistics.mean([nb / t / 1e6 for t in floor]), 1),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_e2e_variance.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
