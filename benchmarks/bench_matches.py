"""Match materialization throughput (VERDICT r2 item 2).

Measures extracting ALL occurrences of the headline corpus (mrs_dalloway
tiled to 64 MB, 1000 most frequent words => ~9.6M matches) as a columnar
MatchSet, via both retrieval paths:

* full decode: scan_states -> vectorized CSR expansion (every per-position
  state travels to the host);
* bounded-hits: device-side hit extraction (only hit positions travel),
  then the same CSR expansion.

Reference anchor: acm_get_match streams one match per call at C speed
(/root/reference/aho_corasick.c:450-482); the round-2 per-event Python loop
took minutes at this scale. Prints one JSON line per path.
"""

from __future__ import annotations

import json
import re
import time

import numpy as np


def main() -> None:
    import aho_corasick_1975_tpu as ac
    import bench as hb  # repo-root bench helpers (corpus loader)

    raw = hb.load_corpus()
    norm = re.sub(r"[^a-z]", " ", raw.lower())
    freq: dict[str, int] = {}
    for w in norm.split():
        freq[w] = freq.get(w, 0) + 1
    words = sorted(freq, key=lambda w: (-freq[w], w))[:hb.N_KEYWORDS]

    m = ac.Machine()
    for w in words:
        m.insert_keyword(" " + w + " ")
    sc = m.scanner(n_streams=hb.N_STREAMS)
    reps = max(1, hb.TARGET_BYTES // len(norm))
    text = (norm + " ") * reps
    ids = np.asarray(m.vocab.lookup_many(text), np.int32)

    results = {}
    # Full-decode path (per-position states to host + columnar expand).
    ms = sc.find_matches(ids)  # warm-up/compile
    t0 = time.perf_counter()
    ms = sc.find_matches(ids)
    _ = ms.starts  # force the derived columns too
    dt_full = time.perf_counter() - t0
    results["full_decode"] = dt_full
    n = len(ms)

    # Bounded-hits path: hit positions only. ~9.6M hits over 16k-symbol
    # pow2 buckets -> max_hits sized from the true count + slack.
    max_hits = 1 << int(np.ceil(np.log2(n + 1)))
    ms2 = sc.find_matches(ids, max_hits=max_hits)
    t0 = time.perf_counter()
    ms2 = sc.find_matches(ids, max_hits=max_hits)
    _ = ms2.starts
    dt_dev = time.perf_counter() - t0
    results["bounded_hits"] = dt_dev
    assert len(ms2) == n

    # Lazy materialization probe: first 1k tuples only.
    t0 = time.perf_counter()
    _ = ms[:1000]
    dt_head = time.perf_counter() - t0

    print(json.dumps({
        "metric": "match_extraction_seconds",
        "value": round(min(dt_full, dt_dev), 3),
        "unit": "s for all matches (columnar)",
        "vs_baseline": None,
        "detail": {
            "matches": n,
            "corpus_bytes": len(text),
            "full_decode_s": round(dt_full, 3),
            "bounded_hits_s": round(dt_dev, 3),
            "first_1k_tuples_s": round(dt_head, 4),
            "matches_per_sec": round(n / min(dt_full, dt_dev), 1),
        },
    }))


if __name__ == "__main__":
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
