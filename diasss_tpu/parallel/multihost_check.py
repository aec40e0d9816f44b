"""Multi-host (multi-process) execution smoke check.

The reference is one CPU process; multi-host execution is new capability
(SURVEY §2 collectives row).  This module is both the shipping cluster smoke
tool and the test target that proves :func:`.distributed.initialize` is a real
execution path, not a wrapper:

    # on each host (or twice on one machine for the CPU Gloo check):
    python -m diasss_tpu.parallel.multihost_check \
        --coordinator HOST:PORT --num-processes N --process-id R

Every process builds the IDENTICAL synthetic pose-graph problem, solves it
twice — single-device locally, and sequence-parallel over the GLOBAL mesh
(pose chain block-partitioned across all processes' devices, halo exchange and
LC psums riding the cross-process collective backend: Gloo on CPU, ICI/DCN on
TPU) — gathers the distributed result to every host, and asserts the two
solutions agree.  Prints ``MULTIHOST_OK`` on success.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("multihost_check")
    parser.add_argument("--coordinator", required=True, help="coordinator host:port")
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--local-devices", type=int, default=0,
                        help="force this many virtual CPU devices per process "
                             "(0 = use the platform's real devices)")
    parser.add_argument("--pings", type=int, default=96)
    args = parser.parse_args(argv)

    if args.local_devices:
        # overwrite any inherited forced count (e.g. the test suite's 8)
        flags = [
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={args.local_devices}")
        os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    if args.local_devices:
        jax.config.update("jax_platforms", "cpu")

    from .distributed import global_mesh, heartbeat, initialize

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    import jax.numpy as jnp

    from ..config import PoseGraphConfig
    from ..geometry import se3
    from ..solvers.pose_graph import build_chain_graph, solve_pose_graph
    from .seq import seq_pose_graph_solve

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{n_local} local / {n_global} global devices", flush=True)

    mesh = global_mesh()
    beat = heartbeat(mesh)
    assert beat == n_global, f"heartbeat saw {beat} of {n_global} devices"

    # identical problem on every process (deterministic seed)
    P = args.pings
    rng = np.random.default_rng(7)
    gt = np.zeros((P, 6), np.float32)
    gt[:, 3] = np.arange(P) * 0.5
    dr = gt.copy()
    dr[:, 3] += np.cumsum(rng.normal(0, 0.03, P)).astype(np.float32)
    dr[:, 4] += np.cumsum(rng.normal(0, 0.03, P)).astype(np.float32)
    dr[0] = gt[0]
    gt_poses = se3.from_rodrigues_xyz(jnp.asarray(gt))
    li = np.asarray([2, P // 3], np.int32)
    lj = np.asarray([P - 3, 2 * P // 3], np.int32)
    lc_meas = se3.between(gt_poses[jnp.asarray(li)], gt_poses[jnp.asarray(lj)])
    cfg = PoseGraphConfig()
    graph = build_chain_graph(
        [dr], lc_i=li, lc_j=lj, lc_meas=lc_meas,
        lc_sigmas=np.full((2, 6), 0.05, np.float32),
        lc_valid=np.ones(2, bool), cfg=cfg, noise_key=None,
    )

    # reference: single-device local solve (identical on every process)
    poses_local, info_local = solve_pose_graph(graph, cfg)
    t_local = np.asarray(poses_local.t)

    # distributed: pose chain block-partitioned over the GLOBAL mesh
    poses_dist, info_dist = seq_pose_graph_solve(mesh, graph, cfg)

    from jax.experimental import multihost_utils

    # tiled gather of the (global, sharded) result to host numpy on every process
    t_dist = np.asarray(multihost_utils.process_allgather(poses_dist.t, tiled=True))
    t_dist = t_dist.reshape(t_local.shape)

    err = float(np.abs(t_dist - t_local).max())
    e_l, e_d = float(info_local.error), float(info_dist.error)
    print(f"process {jax.process_index()}: max|Δt|={err:.2e} "
          f"error local/dist={e_l:.6f}/{e_d:.6f}", flush=True)
    assert err < 1e-3, err
    assert abs(e_l - e_d) < 1e-3 * max(1.0, e_l), (e_l, e_d)
    print("MULTIHOST_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
