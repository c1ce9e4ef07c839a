"""Two-process jax.distributed CPU test for parallel/multihost.py.

Spawns a real 2-process coordination-service job (each process with 2
virtual CPU devices) so host_batch_to_global and line_totals are
exercised across an actual process boundary — their single-process
fallbacks bypass the code paths that matter (VERDICT r1 #9).
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_line_helpers():
    port = _free_port()
    env = dict(os.environ)
    # workers set their own JAX platform/device-count env before importing
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(WORKER.parent.parent))
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER {pid} OK" in out, out
