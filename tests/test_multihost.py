"""Multi-process jax.distributed execution (VERDICT r2 #3).

SURVEY §2.8's multi-host plan is validated for real here: two OS processes,
each with 2 virtual CPU devices, initialize through
``parallel.mesh.initialize_multihost`` with a localhost coordinator, build
one global 2×2 mesh, and run the sharded segmentation step whose halo
exchanges / psums cross the process boundary.  This upgrades multi-host
from "compile-checked" to "executed".
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_sharded_step():
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(tests_dir)
    worker = os.path.join(tests_dir, "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update(
        # clean CPU jax in the children: the axon sitecustomize only
        # registers the TPU relay backend when POOL_IPS is non-empty
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.pathsep.join(
            [repo_root, tests_dir, env.get("PYTHONPATH", "")]
        ),
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_pcis",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=tests_dir,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST-PASS-{pid}" in out, out
