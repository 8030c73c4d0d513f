"""Multi-host distributed runtime: 2 JAX processes (gloo DCN
collectives on the CPU backend) tracking over a 2-D (ch x tb) global
mesh must reproduce the sequential engine's values.

The reference is single-process (SURVEY.md §2.4); this pins the DCN
surface of the build — jax.distributed.initialize, process-spanning
meshes, owner-computes shard feeding, allgathered stitching."""

import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_tracking_parity():
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "multihost parity OK" in out, out[-1000:]
