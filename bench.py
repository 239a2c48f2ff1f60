"""Headline benchmark: scan throughput, bytes/sec/chip.

Config follows BASELINE.json's metric: mrs_dalloway.txt (the reference's
conformance corpus, loaded read-only from the mounted reference; synthetic
fallback if absent) with a 1000-keyword dictionary built from its own most
frequent words, scanned on one chip via the blocked dense-table kernel.

vs_baseline compares against the reference's published scan rate (~3.1 MB/s:
376,617 chars in 0.12 s, reference README.md:367).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "bytes/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import re
import time

import numpy as np

REFERENCE_CORPUS = "/root/reference/examples/mrs_dalloway.txt"
BASELINE_BYTES_PER_SEC = 376_617 / 0.12  # reference README.md:367
N_KEYWORDS = 1000
TARGET_BYTES = 64 * 1024 * 1024
N_STREAMS = 16384
REPS = 5


def load_corpus() -> str:
    try:
        with open(REFERENCE_CORPUS, "r", errors="replace") as f:
            return f.read()
    except OSError:
        rng = np.random.default_rng(0)
        words = ["".join(rng.choice(list("abcdefghij"), size=rng.integers(2, 9)))
                 for _ in range(2000)]
        return " ".join(rng.choice(words) for _ in range(60000))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import aho_corasick_1975_tpu as ac

    raw = load_corpus()
    # Normalize like the reference's Test 2 (generic_test.c:192-195):
    # case-fold, non-alpha -> space.
    norm = re.sub(r"[^a-z]", " ", raw.lower())

    # Dictionary: the corpus's 1000 most frequent words.
    freq: dict[str, int] = {}
    for w in norm.split():
        freq[w] = freq.get(w, 0) + 1
    words = sorted(freq, key=lambda w: (-freq[w], w))[:N_KEYWORDS]

    machine = ac.Machine()
    for w in words:
        # byte keywords with word-boundary sentinels — the reference's
        # alphabet is C chars (= bytes, examples/test.c:4), and the raw
        # end-to-end path uploads 1 byte/symbol
        machine.insert_keyword(b" " + w.encode() + b" ")
    scanner = machine.scanner(n_streams=N_STREAMS)

    # Tile the corpus up to the target size; encode via the library's
    # vectorized byte path (256-entry LUT inside Vocab.lookup_many).
    reps = max(1, TARGET_BYTES // len(norm))
    text = ((norm + " ") * reps).encode()
    ids = machine.vocab.lookup_many(text)  # warm the byte LUT
    t_enc = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ids = machine.vocab.lookup_many(text)
        t_enc = min(t_enc, time.perf_counter() - t0)

    # Pre-upload: the metric is device scan throughput with tables and
    # corpus resident in HBM (the reference's analogue scans from RAM,
    # README.md:367). The window layout runs on device (production path).
    from aho_corasick_1975_tpu.ops import multistep as ms
    from aho_corasick_1975_tpu.ops.scan_xla import make_blocked_count_stream

    st = scanner._stepped
    if scanner._hybrid is not None and st is not None \
            and st.packed is not None:
        # the scanner auto-selected the hybrid gather+MXU engine
        from aho_corasick_1975_tpu.ops import scan_hybrid
        planes, cbm, n_planes, S_pad = scanner._hybrid
        k = st.k
        ext, B, L, _ = scanner._stream_ext(ids, None, scanner._halo_sym,
                                           128 * k)
        B2 = scan_hybrid.mxu_cols(B, S_pad)
        tabs = (scanner._st_dev[0], planes)
        count_fn = scan_hybrid.make_hybrid_count_stream(
            st.V, st.k, st.Vk, st.count_bits, scanner._halo_steps,
            S_pad, n_planes, cbm, B - B2, B2, L)
    elif st is not None and st.packed is not None:
        k = st.k
        ext, B, L, _ = scanner._stream_ext(ids, None, scanner._halo_sym,
                                           128 * k)
        tabs = scanner._st_dev
        count_fn = ms.make_stepped_count_stream(
            st.V, st.k, st.Vk, st.count_bits, scanner._halo_steps, B, L)
    else:
        k = 1
        ext, B, L, _ = scanner._stream_ext(ids, None, scanner.halo, 128)
        tabs = (scanner._dflat, scanner._nb_out)
        count_fn = make_blocked_count_stream(scanner.V, scanner.halo, B, L)

    import numpy as _np

    def run_once():
        return int(_np.asarray(count_fn(*tabs, ext))
                   .sum(dtype=_np.int64))

    # Warm-up (compile + first run).
    total = run_once()

    # Synchronous timing: async dispatch + block_until_ready is unreliable
    # through this TPU tunnel; int() forces real completion per rep.
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    assert r == total

    # End-to-end: raw bytes in, count out, via the PRODUCTION
    # scanner.count path — the vocab encode runs INSIDE the scan jit
    # (device-side LUT gather) and the host work is one memcpy of the raw
    # uint8 input, so both staging and the host->device transfer are
    # 1 byte/symbol (4x less than the id path). Reference anchor: the
    # zero-encode streaming loop, aho_corasick.c:433-448.
    assert scanner._raw_stream(text) is not None  # really the raw path
    def run_end_to_end():
        return scanner.count(text)

    assert run_end_to_end() == total  # warm-up + check
    e2e_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_end_to_end()
        e2e_times.append(time.perf_counter() - t0)
    e2e_dt = min(e2e_times)

    # Raw-upload reference: device_put of the same raw bytes, synchronously
    # materialized ONE transfer at a time. The pipelined e2e path overlaps
    # chunk transfers with compute, so it can exceed this sequential
    # number — it is a same-methodology reference point, not a bound.
    raw = np.frombuffer(text, np.uint8)
    up = jnp.asarray(raw)
    _ = int(up[-1])
    up_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        up = jnp.asarray(raw)
        _ = int(up[-1])
        up_times.append(time.perf_counter() - t0)
    up_dt = min(up_times)

    nbytes = len(text)
    value = nbytes / dt
    print(json.dumps({
        "metric": "scan_throughput_mrs_dalloway_1000kw",
        "value": round(value, 1),
        "unit": "bytes/sec/chip",
        "vs_baseline": round(value / BASELINE_BYTES_PER_SEC, 2),
        "detail": {
            "corpus_bytes": nbytes,
            "n_keywords": machine.nb_keywords(),
            "n_states": machine.n_states,
            "matches": total,
            "device": str(jax.devices()[0]),
            "seconds_per_pass": round(dt, 4),
            "step_k": k,
            "engine": ("hybrid" if scanner._hybrid is not None else
                       "mxu" if scanner._mxu is not None else "gather"),
            "end_to_end_bytes_per_sec": round(nbytes / e2e_dt, 1),
            "e2e_input": "raw bytes (uint8 upload, encode on device)",
            "upload_only_bytes_per_sec": round(nbytes / up_dt, 1),
            "host_encode_bytes_per_sec": round(nbytes / t_enc, 1),
            # The raw path uploads 1 byte/symbol and folds the vocab
            # encode into the scan jit; host_encode_* is the fallback
            # host LUT pass (not on the raw path). The remaining e2e gap
            # vs the device rate is this rig's remote-tunnel transfer.
            "e2e_note": "host->device transfer rides a remote tunnel here",
        },
    }))


if __name__ == "__main__":
    main()
