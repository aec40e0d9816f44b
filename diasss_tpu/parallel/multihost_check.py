"""Multi-host (multi-process) execution smoke check.

The reference is one CPU process; multi-host execution is new capability
(SURVEY §2 collectives row).  This module is both the shipping cluster smoke
tool and the test target that proves :func:`.distributed.initialize` is a real
execution path, not a wrapper:

    # on each host (or twice on one machine for the CPU Gloo check):
    python -m diasss_tpu.parallel.multihost_check \
        --coordinator HOST:PORT --num-processes N --process-id R

Every process builds IDENTICAL synthetic problems and runs three phases over
the GLOBAL mesh (collectives riding the cross-process backend: Gloo on CPU,
ICI/DCN on TPU), each asserting agreement with the local single-device solve:

1. ``MULTIHOST_OK`` — sequence-parallel pose-graph solve (halo exchange + LC
   psums cross the process boundary);
2. ``MULTIHOST_BA_OK`` — sequence-parallel full BA: the owner-align
   ``reshard_rows`` all_to_all, the routed target-pose exchanges, and the
   psum reductions all cross the process boundary;
3. ``MULTIHOST_ELASTIC_OK`` — elastic recovery across the boundary: the solve
   starts on the global mesh, then "the other process's devices disappear"
   between chunks (injected probe, same mechanism the heartbeat watchdog
   drives on a real dead peer) and each survivor CONTINUES on its local
   devices from carried state, landing on the uninterrupted optimum.
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

    # --- phase 2: sequence-parallel FULL BA across the process boundary ---
    from ..config import FullBAConfig, KeypointNoiseConfig
    from ..solvers.full_ba import BAProblem, solve_full_ba
    from .seq import seq_full_ba_solve

    Kba = 2 * n_global
    kp_i = rng.integers(1, P // 2, Kba).astype(np.int32)
    kp_j = rng.integers(P // 2, P - 1, Kba).astype(np.int32)
    sr = np.float32(np.sqrt(12.0**2 + 12.0**2))
    lm0 = np.stack(
        [dr[kp_i, 3] + 6.0, dr[kp_i, 4] + 6.0, np.full(Kba, -12.0)], axis=1
    ).astype(np.float32)
    ba_prob = BAProblem(
        poses0=graph.poses0, odo_meas=graph.odo_meas, odo_sigmas=graph.odo_sigmas,
        kp_i=jnp.asarray(kp_i), kp_j=jnp.asarray(kp_j),
        kp_sr_s=jnp.full((Kba,), sr), kp_sr_t=jnp.full((Kba,), sr),
        kp_valid=jnp.ones(Kba, bool),
        lm0=jnp.asarray(lm0), lm_prior=jnp.asarray(lm0),
        lm_prior_sigmas=jnp.asarray([50.0, 50.0, 1.5], jnp.float32),
    )
    ba_cfg = FullBAConfig(max_iters=8)
    kp_cfg = KeypointNoiseConfig()
    poses_ba_l, lms_l, info_ba_l = solve_full_ba(ba_prob, ba_cfg, kp_cfg)
    poses_ba_d, lms_d, info_ba_d = seq_full_ba_solve(mesh, ba_prob, ba_cfg, kp_cfg)
    t_ba = np.asarray(
        multihost_utils.process_allgather(poses_ba_d.t, tiled=True)
    ).reshape(np.asarray(poses_ba_l.t).shape)
    err_ba = float(np.abs(t_ba - np.asarray(poses_ba_l.t)).max())
    err_lm = float(np.abs(np.asarray(lms_d) - np.asarray(lms_l)).max())
    e_l, e_d = float(info_ba_l.error), float(info_ba_d.error)
    print(f"process {jax.process_index()}: BA max|Δt|={err_ba:.2e} "
          f"max|Δlm|={err_lm:.2e} error local/dist={e_l:.6f}/{e_d:.6f}",
          flush=True)
    assert err_ba < 5e-3, err_ba
    assert err_lm < 5e-2, err_lm
    assert abs(e_l - e_d) < 1e-2 * max(1.0, e_l), (e_l, e_d)
    print("MULTIHOST_BA_OK", flush=True)

    # --- phase 3: elastic recovery across the process boundary ---
    from .recovery import elastic_seq_pose_graph_solve

    local_devs = jax.local_devices()

    def probe(chunk_idx: int, devices: list) -> list:
        # chunk 0 runs on the full global mesh; from chunk 1 the peer
        # process's devices "disappear" and each survivor continues locally
        return list(devices) if chunk_idx == 0 else list(local_devs)

    poses_el, info_el, events = elastic_seq_pose_graph_solve(
        graph, cfg, chunk=3, probe=probe
    )
    t_el = np.asarray(poses_el.t).reshape(t_local.shape)
    err_el = float(np.abs(t_el - t_local).max())
    print(f"process {jax.process_index()}: elastic max|Δt|={err_el:.2e} "
          f"events={events}", flush=True)
    assert events and events[0][1] == n_global and events[0][2] == n_local, events
    assert err_el < 1e-3, err_el
    print("MULTIHOST_ELASTIC_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
