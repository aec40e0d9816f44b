"""Real multi-process execution (VERDICT r1 item 7): two OS processes join via
jax.distributed.initialize (Gloo collectives on CPU), form one 8-device global
mesh (4 per process), and run the sequence-parallel pose-graph solve across
the process boundary.  Each process asserts the distributed result equals its
local single-device solve and prints MULTIHOST_OK; phase 2 runs the
owner-aligned sequence-parallel FULL BA across the boundary (all_to_all
reshard + routed exchange + psum reductions, MULTIHOST_BA_OK); phase 3 runs
the elastic solve where the peer's devices disappear between chunks and the
survivor continues locally (MULTIHOST_ELASTIC_OK).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_seq_pose_graph():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "diasss_tpu.parallel.multihost_check",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(r),
                "--local-devices", "4",
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
        for marker in ("MULTIHOST_OK", "MULTIHOST_BA_OK", "MULTIHOST_ELASTIC_OK"):
            assert marker in out, f"rank {r} missing {marker}:\n{out[-3000:]}"
