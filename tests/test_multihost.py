"""2-process multihost CPU smoke (VERDICT r2 item 6): the framework's DCN
story — ``parallel.batch.initialize_multihost`` + cross-process collective
+ data-parallel sharded odometry — executed for real across two OS
processes coordinating over localhost."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_smoke():
    worker = Path(__file__).parent / "multihost_worker.py"
    addr = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "odometry OK" in out, out
