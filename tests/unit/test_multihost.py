"""REAL multi-process launch-path test: two coordinated JAX processes, four
virtual CPU devices each, one global 8-device mesh, one sharded solve.

This is the CPU-mesh stand-in VERDICT.md asked for (next-round #3): it
exercises jax.distributed.initialize, cross-process mesh construction,
the no-global-array data path, and cross-process collectives. On a TPU
slice the identical entry points (parallel/multihost.py) apply — BASELINE
config 5 is blocked only by hardware.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).resolve().parent.parent / "multihost_worker.py"
REPO = WORKER.parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_solve():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-3000:]
    assert "MULTIHOST_HALO_OK" in outs[0], outs[0][-3000:]
