"""Real 2-process multi-host path: jax.distributed cluster on CPU devices,
global ('cam','block') mesh spanning both processes, cross-process
collective K-best solve, and the production engine SPMD — the virtual
stand-in for BASELINE.json's "2 hosts" protocol (the reference is
single-process, SURVEY.md §5, so this subsystem is new here)."""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "multihost_sim.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    port = _free_port()
    report_path = tmp_path / "scaling_report.json"
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=ROOT + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = []
    for pid in range(2):
        cmd = [sys.executable, SCRIPT,
               "--coordinator", f"localhost:{port}",
               "--num-processes", "2", "--process-id", str(pid)]
        if pid == 0:
            cmd += ["--out", str(report_path)]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    deadline = time.time() + 600
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=max(10, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost_sim processes timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"process failed:\n{out}\n{err[-3000:]}"
        assert "ok mesh=" in out

    report = json.loads(report_path.read_text())
    assert report["processes"] == 2
    assert report["devices"] == 8
    assert report["mesh"] == {"cam": 4, "block": 2}
    assert report["engine_track_results"] > 0
    assert report["solver_best_score"] > 0
    assert 0.0 < report["scaling_efficiency"]
