"""True multi-process jax.distributed exercise (VERDICT r3 item 5).

Launches 2 coordinator-connected CPU processes (4 virtual devices each),
builds the global (replica=2, data=4) mesh across them, and runs the
distributed rLap plus one psum'd GRACE gradient step whose "replica"-axis
collectives cross the process boundary — the wiring that rides DCN on a
real multi-host pod (BASELINE configs[4] "across N >= 2 hosts").
"""

import os
import socket
import subprocess
import sys

def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tools", "dist_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # workers pin their own platform/device count; scrub the test
    # session's settings so they don't leak through
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
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
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"
        assert f"DIST_WORKER_OK pid={pid}" in out, out[-3000:]
    # both processes computed the SAME replicated loss (SPMD agreement)
    losses = {o.split("loss=")[1].split()[0] for o in outs}
    assert len(losses) == 1, losses
