"""Two-process jax.distributed validation (VERDICT r1 #3).

Spawns 2 real OS processes, each with 4 virtual CPU devices, glued by
jax.distributed.initialize into one 8-device global mesh; the sharded
count must match the host oracle in both processes. This exercises the
actual multi-controller SPMD path (cross-process collectives, global
device_put) that the in-process 8-device rig cannot.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_count():
    port = _free_port()
    env = dict(os.environ)
    # the workers pin their own XLA_FLAGS / platform; strip the parent
    # test rig's 8-device flag so each worker gets exactly 4
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out: " + repr(outs))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
        assert "DISTOK" in out, out
    totals = {line.split("total=")[1]
              for rc, out, _ in outs for line in out.splitlines()
              if "DISTOK" in line}
    assert len(totals) == 1  # both processes agree on the global count
