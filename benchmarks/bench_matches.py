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
    # count() reference: the VERDICT r3 #3 bar is bounded-hits retrieval
    # within ~1.5x of the count engine's wall time on this config.
    sc.count(ids)
    dt_count = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sc.count(ids)
        dt_count = min(dt_count, time.perf_counter() - t0)

    # Explicit full-decode path (per-position states to host + columnar
    # expand — the pre-round-4 default; find_matches now auto-routes to
    # the fast kernels, so the oracle path is built explicitly here).
    from aho_corasick_1975_tpu.models.results import MatchSet
    from aho_corasick_1975_tpu.ops.decode import decode_matches_arrays

    def full_decode():
        states = sc.scan_states(ids)
        e, s, i = decode_matches_arrays(states, sc.tables, 0)
        return MatchSet(m, sc.tables, e, s, i)

    ms = full_decode()  # warm-up/compile
    t0 = time.perf_counter()
    ms = full_decode()
    _ = ms.starts  # force the derived columns too
    dt_full = time.perf_counter() - t0
    results["full_decode"] = dt_full
    n = len(ms)

    # Default find_matches (round 4: AUTO fast path, buffers sized from
    # the live count — no max_hits parameter).
    ms_auto = sc.find_matches(ids)
    assert len(ms_auto) == n
    dt_auto = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ms_auto = sc.find_matches(ids)
        _ = ms_auto.starts
        dt_auto = min(dt_auto, time.perf_counter() - t0)
    results["auto_default"] = dt_auto

    # Bounded-hits path: hit positions only. ~9.6M hits over 16k-symbol
    # pow2 buckets -> max_hits sized from the true count + slack. Runs the
    # packed k-gram hits kernel (ops/hits.make_stepped_hits_stream) when
    # the scanner has a packed table — the round-4 fast retrieval core.
    max_hits = 1 << int(np.ceil(np.log2(n + 1)))
    ms2 = sc.find_matches(ids, max_hits=max_hits)
    dt_dev = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ms2 = sc.find_matches(ids, max_hits=max_hits)
        _ = ms2.starts
        dt_dev = min(dt_dev, time.perf_counter() - t0)
    results["bounded_hits"] = dt_dev
    assert len(ms2) == n

    # Lazy materialization probe: first 1k tuples only.
    t0 = time.perf_counter()
    _ = ms[:1000]
    dt_head = time.perf_counter() - t0

    # Kernel-only legs (corpus pre-staged in HBM): separates the chip's
    # scan/extract cost from this rig's remote-tunnel transfers, which
    # dominate the wall numbers above (the 9.6M-match result download
    # alone is ~134 MB). Methodology: synchronous materialization per rep.
    kernel = {}
    st = sc._stepped
    if st is not None and st.packed is not None and sc._mxu is None:
        import jax.numpy as jnp

        from aho_corasick_1975_tpu.ops import multistep as msops
        from aho_corasick_1975_tpu.ops.hits import (
            make_stepped_hits_extract_dense, make_stepped_hits_scan)
        ext_host, B, L, T = sc._stream_ext(ids, None, sc._halo_sym,
                                           128 * st.k)
        ext = jnp.asarray(np.asarray(ext_host))
        _ = int(ext[-1])
        cfn = msops.make_stepped_count_stream(
            st.V, st.k, st.Vk, st.count_bits, sc._halo_steps, B, L)
        def _t(f, reps=3):
            f()
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                f()
                best = min(best, time.perf_counter() - t0)
            return best
        kernel["count_s"] = round(_t(lambda: int(np.asarray(
            cfn(sc._st_dev[0], ext)).sum(dtype=np.int64))), 3)
        sfn = make_stepped_hits_scan(st.V, st.k, st.Vk, st.count_bits,
                                     sc._halo_steps, B, L)
        emit, _nh, nl = sfn(sc._st_dev[0], ext)
        n_live = int(nl)
        kernel["hits_scan_s"] = round(_t(
            lambda: int(sfn(sc._st_dev[0], ext)[2])), 3)
        pk1 = sc._pk1()
        if pk1 is not None:
            efn = make_stepped_hits_extract_dense(
                st.V, st.k, st.count_bits, pk1[1], sc._halo_steps,
                max_hits, B, L)
            kernel["hits_extract_s"] = round(_t(
                lambda: int(efn(pk1[0], ext, emit)[2])), 3)
        kernel["n_live_grams"] = n_live

    print(json.dumps({
        "metric": "match_extraction_seconds",
        "value": round(min(dt_full, dt_auto, dt_dev), 3),
        "unit": "s for all matches (columnar)",
        "vs_baseline": None,
        "detail": {
            "matches": n,
            "corpus_bytes": len(text),
            "full_decode_s": round(dt_full, 3),
            "auto_default_s": round(dt_auto, 3),
            "bounded_hits_s": round(dt_dev, 3),
            "count_s": round(dt_count, 3),
            "bounded_hits_vs_count": round(dt_dev / dt_count, 2),
            "hits_kernel": ("stepped" if sc._stepped is not None
                            and sc._stepped.packed is not None
                            and sc._mxu is None else "dense"),
            "first_1k_tuples_s": round(dt_head, 4),
            "matches_per_sec": round(n / min(dt_full, dt_auto, dt_dev), 1),
            "kernel_only": kernel,
        },
    }))


if __name__ == "__main__":
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
