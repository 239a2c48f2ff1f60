"""Tracing / profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is harness-level clock() timing
(generic_test.c:61,182,...). Here:

* ``phase_timer`` — structured wall-clock phases (build / compile / upload /
  scan / decode) accumulated into a dict, the per-phase breakdown the
  BASELINE methodology asks for;
* ``device_trace`` — a jax.profiler trace context for TensorBoard-level
  XLA/TPU traces around any scan call;
* honest timing note: through a remote TPU tunnel, ``block_until_ready``
  on concurrently dispatched calls can return early — always time a
  synchronous materialization (``int(...)``/``np.asarray``), which is what
  scanner.stats records.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class PhaseTimer:
    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> Dict[str, dict]:
        return {k: {"seconds": round(v, 6), "calls": self.calls[k]}
                for k, v in sorted(self.seconds.items())}


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
