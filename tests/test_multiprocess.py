"""True multi-process jax.distributed test (VERDICT r03 item 4).

Everything else in the suite exercises the mesh code in ONE process with 8
virtual devices; this test spawns 2 real OS processes (4 virtual CPU devices
each), brings the cluster up via parallel.initialize_multihost, feeds each
process's half of the beam axis through parallel.host_local_scans_to_global,
and runs hector_sharded steps whose collectives (beam psums, halo ppermutes)
cross the process boundary over Gloo.  Each worker checks pose agreement with
the dense single-process pipeline and bitwise tile contents on its own shards
(tests/_multiproc_worker.py).
"""
import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multiproc_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_hector_sharded():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    # the worker sets its own XLA_FLAGS/JAX_PLATFORMS; drop any inherited
    # single-process forcing so 4-devices-per-process takes effect
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port)],
            cwd=_REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
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
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out, out[-4000:]
