"""Host-side parallel matching: lock-free scans + threads, no device.

The reference advertises concurrent insert + scan on one machine
(README.md:364) — its match loop takes no lock. This framework restores
that property in the native core (published-shadow readers,
native/acx.cpp) and then builds on it, because lock-free matchers can
fan out across cores with zero coordination:

* ``match_stream(cur, text, parallel=True)`` — ONE long stream split
  into halo-blocked chunks, each warmed up from the root over the
  longest-keyword tail before it (the host mirror of the device
  kernel's sequence parallelism; exact by the suffix property of AC
  states, ops/blocking.py). Near-linear with cores.
* ``match_stream_many(docs)`` — a document batch fanned across threads,
  contiguous ranges balanced by symbol mass.
* All of it safe WHILE another thread registers keywords: matchers
  never block, and every keyword fully registered before a call begins
  is counted (the monotonicity contract; stress-tested under ASan and
  TSan, `make -C aho_corasick_1975_tpu/native tsan-test`).

Run: python examples/host_parallel_demo.py
"""

from __future__ import annotations

import random
import sys
import threading
import time

sys.path.insert(0, ".")

import aho_corasick_1975_tpu as ac


def main() -> None:
    rng = random.Random(0)
    m = ac.Machine()
    for _ in range(500):
        m.insert_keyword("".join(rng.choice("abcdef")
                                 for _ in range(rng.randint(3, 8))))

    text = "".join(rng.choice("abcdefg ") for _ in range(4_000_000))

    # 1. one stream, all cores
    cur = m.initiate()
    t0 = time.perf_counter()
    serial = m.match_stream(cur, text, parallel=False)
    dt_serial = time.perf_counter() - t0
    cur = m.initiate()
    t0 = time.perf_counter()
    parallel = m.match_stream(cur, text, parallel=True)
    dt_parallel = time.perf_counter() - t0
    assert serial == parallel
    print(f"single stream : {serial} matches | "
          f"serial {len(text) / dt_serial / 1e6:.0f} MB/s -> "
          f"threaded {len(text) / dt_parallel / 1e6:.0f} MB/s")

    # 2. document batch, threaded fan-out
    docs = [text[i:i + 20_000] for i in range(0, 1_000_000, 20_000)]
    t0 = time.perf_counter()
    totals = m.match_stream_many(docs)
    dt = time.perf_counter() - t0
    print(f"batch scoring : {len(docs)} docs, {int(totals.sum())} matches "
          f"in {dt * 1e3:.1f} ms")

    # 3. scans never block behind registration (lock-free matchers)
    seen = []

    def scan_loop():
        for _ in range(20):
            c = m.initiate()
            seen.append(m.match_stream(c, text[:200_000]))

    t = threading.Thread(target=scan_loop)
    t.start()
    for _ in range(200):  # concurrent online registration
        m.insert_keyword("".join(rng.choice("abcdef")
                                 for _ in range(rng.randint(3, 8))))
    t.join()
    c = m.initiate()
    after = m.match_stream(c, text[:200_000])
    # pre-registered keywords are never missed; nothing beyond the final
    # dictionary is ever counted
    assert all(seen[0] <= n <= after for n in seen)
    print(f"concurrent    : 20 scans during 200 online inserts, counts "
          f"{min(seen)}..{max(seen)} (monotone, never blocked)")


if __name__ == "__main__":
    main()
