"""Multi-chip scaling-efficiency measurement (BASELINE.md: >=80% target).

Measures the sharded loop-closure batch solve and the sharded pose-graph solve
at mesh sizes 1..8.  On this machine the mesh is 8 virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — it validates the sharding
mechanism and measures parallel efficiency of the partitioned computation; on a
real slice the same code rides ICI.

CAVEAT (printed at runtime too): virtual CPU devices share the machine's
physical cores — the XLA CPU backend already multithreads a single device across
them, so "efficiency" here saturates quickly and is NOT a statement about real
multi-chip scaling.  The measurement validates that the sharded program
compiles, runs, and partitions correctly; real efficiency numbers require a
multi-chip slice.

Usage: python scripts/scaling_bench.py [--pings N] [--lc K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

parser = argparse.ArgumentParser()
parser.add_argument("--pings", type=int, default=512)
parser.add_argument("--lc", type=int, default=1024)
parser.add_argument("--seq-poses", type=int, default=131072,
                    help="pose count for the sequence-parallel long-mission point "
                         "(0 disables); 131072 ~ a 26-line x 5k-ping mission")
parser.add_argument("--skip-lc-sweep", action="store_true")
args = parser.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig
from diasss_tpu.geometry import sonar
from diasss_tpu.parallel.shard import make_mesh, sharded_lc_solve

n_pings, n_bins = args.pings, 64
half = n_bins // 2
rng = np.random.default_rng(0)
gras = np.linspace(5.0, 40.0, half).astype(np.float32)
dr_s = np.zeros((n_pings, 6), np.float32)
dr_s[:, 3] = np.arange(n_pings) * 0.35
dr_t = dr_s.copy()
dr_t[:, 4] += 30.0
dr_t[:, 2] = np.pi
alts = np.full((n_pings,), 12.0, np.float32)
geo_s = sonar.geo_image(jnp.asarray(dr_s[:, 3:5]), jnp.asarray(dr_s[:, 2]), jnp.asarray(gras), n_bins)
geo_t = sonar.geo_image(jnp.asarray(dr_t[:, 3:5]), jnp.asarray(dr_t[:, 2]), jnp.asarray(gras), n_bins)

K = args.lc
sr = float(np.sqrt(12.0**2 + 20.0**2))
pairs = np.zeros((K, 7), np.float32)
pairs[:, 0] = rng.integers(1, n_pings - 1, K)
pairs[:, 1] = rng.integers(half + 25, n_bins - 2, K)
pairs[:, 2] = sr
pairs[:, 3] = rng.integers(1, n_pings - 1, K)
pairs[:, 4] = rng.integers(half + 25, n_bins - 2, K)
pairs[:, 5] = sr
valid = np.ones(K, bool)

print("NOTE: virtual CPU mesh — devices share physical cores; this validates the")
print("sharded program, it does not measure real multi-chip scaling (see docstring).")

# --------------------------------------------------------------------------
# Long-mission sequence-parallel point (VERDICT r1 item 2's done criterion):
# a pose count that chokes the replicated-chain solver runs under the SP
# solver with O(P/n)+halo per-device pose memory.  Iterations are capped —
# this measures the partitioned LM/PCG machinery's throughput, not
# convergence (equivalence with the single-device fixed point is
# tests/test_seq_parallel.py's job).
# --------------------------------------------------------------------------
if args.seq_poses:
    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.geometry import se3
    from diasss_tpu.parallel.seq import seq_pose_graph_solve
    from diasss_tpu.solvers.pose_graph import PoseGraph

    Pn = args.seq_poses
    step = np.zeros((Pn - 1, 6), np.float32)  # (r,p,y,x,y,z) rows
    step[:, 3] = 0.35
    step[:, 2] = rng.normal(0, 0.002, Pn - 1)
    t = np.zeros((Pn, 6), np.float32)
    t[1:, 3] = np.cumsum(step[:, 3])
    Lc = max(8, Pn // 4096)
    lc_i = rng.integers(1, Pn // 2, Lc).astype(np.int32)
    lc_j = (lc_i + Pn // 3).astype(np.int32)
    lc_rows = np.zeros((Lc, 6), np.float32)
    lc_rows[:, 3:6] = t[lc_j, 3:6] - t[lc_i, 3:6]
    graph = PoseGraph(
        poses0=se3.from_rodrigues_xyz(jnp.asarray(t)),
        odo_meas=se3.from_rodrigues_xyz(jnp.asarray(step)),
        odo_sigmas=jnp.full((6,), 0.05, jnp.float32),
        lc_i=jnp.asarray(lc_i), lc_j=jnp.asarray(lc_j),
        lc_meas=se3.from_rodrigues_xyz(jnp.asarray(lc_rows)),
        lc_sigmas=jnp.full((Lc, 6), 0.05, jnp.float32),
        lc_valid=jnp.ones((Lc,), bool),
    )
    mesh = make_mesh(8)
    cfg = PoseGraphConfig(max_gn_iters=3, cg_max_iters=25)
    poses, info = seq_pose_graph_solve(mesh, graph, cfg)
    jax.block_until_ready(poses.t)  # compile + first run
    t0 = time.perf_counter()
    poses, info = seq_pose_graph_solve(mesh, graph, cfg)
    jax.block_until_ready(poses.t)
    dt = time.perf_counter() - t0
    per_dev = Pn // 8
    print(
        f"SP long-mission: {Pn:,} poses on 8 devices ({per_dev:,}/device), "
        f"{Lc} LCs, {int(info.iterations)} LM iters ({int(info.cg_iters_total)} CG): "
        f"{dt:.1f} s  ({Pn / dt:,.0f} poses/s per solve)"
    )

    # distributed EXACT direct step (SPIKE chain factorization, zero CG) at
    # the same point — the r4 replacement for the SP PCG burn (VERDICT r3
    # item 2); A/B'd against the PCG row above
    import dataclasses as _dc

    cfg_d = _dc.replace(cfg, preconditioner="direct")
    poses_d, info_d = seq_pose_graph_solve(mesh, graph, cfg_d)
    jax.block_until_ready(poses_d.t)
    t0 = time.perf_counter()
    poses_d, info_d = seq_pose_graph_solve(mesh, graph, cfg_d)
    jax.block_until_ready(poses_d.t)
    dt_d = time.perf_counter() - t0
    print(
        f"SP long-mission DIRECT (SPIKE): {int(info_d.iterations)} LM iters, zero CG: "
        f"{dt_d:.1f} s  ({Pn / dt_d:,.0f} poses/s per solve; PCG row above {dt:.1f} s)"
    )

    # Full-BA long-mission point (VERDICT r2 item 2's done criterion): the
    # owner-aligned SP full BA at a pose count beyond one device's replicated
    # chain, correspondences sharded + routed (no O(P) collective anywhere).
    from diasss_tpu.config import FullBAConfig
    from diasss_tpu.parallel.seq import seq_full_ba_solve
    from diasss_tpu.solvers.full_ba import BAProblem

    Pb = min(Pn, 32768)  # BA carries per-factor Jacobian batches; 32k poses
    Kba = max(64, Pb // 16)
    kp_i = rng.integers(1, Pb // 2, Kba).astype(np.int32)
    kp_j = rng.integers(Pb // 2, Pb - 1, Kba).astype(np.int32)
    srb = np.float32(np.sqrt(12.0**2 + 12.0**2))
    lm0 = np.stack(
        [t[kp_i, 3] + 6.0, t[kp_i, 4] + 6.0, np.full(Kba, -12.0)], axis=1
    ).astype(np.float32)
    ba_prob = BAProblem(
        poses0=se3.from_rodrigues_xyz(jnp.asarray(t[:Pb])),
        odo_meas=se3.from_rodrigues_xyz(jnp.asarray(step[: Pb - 1])),
        odo_sigmas=jnp.full((6,), 0.05, jnp.float32),
        kp_i=jnp.asarray(kp_i), kp_j=jnp.asarray(kp_j),
        kp_sr_s=jnp.full((Kba,), srb), kp_sr_t=jnp.full((Kba,), srb),
        kp_valid=jnp.ones(Kba, bool),
        lm0=jnp.asarray(lm0), lm_prior=jnp.asarray(lm0),
        lm_prior_sigmas=jnp.asarray([50.0, 50.0, 1.5], jnp.float32),
    )
    ba_cfg = FullBAConfig(max_iters=3, cg_max_iters=25)
    ba_out = seq_full_ba_solve(mesh, ba_prob, ba_cfg, KeypointNoiseConfig())
    jax.block_until_ready(ba_out[0].t)
    t0 = time.perf_counter()
    ba_out = seq_full_ba_solve(mesh, ba_prob, ba_cfg, KeypointNoiseConfig())
    jax.block_until_ready(ba_out[0].t)
    dt = time.perf_counter() - t0
    print(
        f"SP full-BA long-mission: {Pb:,} poses + {Kba:,} landmarks on 8 "
        f"devices (owner-aligned, routed exchange), "
        f"{int(ba_out[2].iterations)} LM iters ({int(ba_out[2].cg_iters_total)} CG): "
        f"{dt:.1f} s  ({Pb / dt:,.0f} poses/s per solve)"
    )

if args.seq_poses:
    # --- DP-sharded whole-survey matching long-mission point ---
    from diasss_tpu.config import MatcherConfig
    from diasss_tpu.features.detector import DetectedFeatures
    from diasss_tpu.matching.robust import robust_matching_stacked

    rngm = np.random.default_rng(5)
    F, Km, Dm = 12, 512, 128
    n_pings_m, n_bins_m = 400, 64
    gras_m = np.linspace(5.0, 20.0, n_bins_m // 2).astype(np.float32)
    geo_list_m, feats_m = [], []
    for f in range(F):
        dr = np.zeros((n_pings_m, 6), np.float32)
        dr[:, 3] = np.arange(n_pings_m) * 0.12
        dr[:, 4] = 3.0 * f
        geo_list_m.append(sonar.geo_image(
            jnp.asarray(dr[:, 3:5]), jnp.asarray(dr[:, 2]),
            jnp.asarray(gras_m), n_bins_m,
        ))
        feats_m.append(DetectedFeatures(
            xy=jnp.asarray(rngm.uniform(5, 350, (Km, 2)), jnp.float32),
            response=jnp.zeros(Km, jnp.float32),
            angle=jnp.zeros(Km, jnp.float32),
            size=jnp.full((Km,), 31.0, jnp.float32),
            level=jnp.zeros(Km, jnp.int32),
            desc=jnp.asarray(rngm.normal(0, 60, (Km, Dm)), jnp.float32),
            valid=jnp.ones(Km, bool),
        ))
    pair_ids_m = [(i, i + 1) for i in range(F - 1)] + [(i, i + 2) for i in range(F - 2)]
    cfg_m = MatcherConfig(ratio_test=0.9, geo_radius=12.0)
    img_ids_m = list(range(F))
    rows_m = [n_pings_m] * F

    for label, mm in (("1 device ", None), ("8 devices", make_mesh(8))):
        robust_matching_stacked(pair_ids_m, img_ids_m, feats_m, geo_list_m,
                                rows_m, cfg_m, mesh=mm)  # compile
        t0 = time.perf_counter()
        out_m = robust_matching_stacked(pair_ids_m, img_ids_m, feats_m,
                                        geo_list_m, rows_m, cfg_m, mesh=mm)
        dt = time.perf_counter() - t0
        print(f"DP-sharded stacked matching ({label}): {len(pair_ids_m)} pairs "
              f"x {Km} kps: {dt:.2f} s  ({len(pair_ids_m)/dt:,.1f} pairs/s)")

results = {}
lc_sweep = [] if args.skip_lc_sweep else [1, 2, 4, 8]
for n_dev in lc_sweep:
    mesh = make_mesh(n_dev)
    cfg = LoopClosureConfig(max_lm_iters=20)

    def run():
        r = sharded_lc_solve(
            mesh,
            jnp.asarray(pairs), jnp.asarray(valid),
            jnp.asarray(dr_s), jnp.asarray(dr_t), geo_s, geo_t,
            jnp.asarray(alts), jnp.asarray(alts), jnp.asarray(gras),
            n_bins=n_bins, kp_cfg=KeypointNoiseConfig(), cfg=cfg,
        )
        jax.block_until_ready(r.quality)
        return r

    run()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    results[n_dev] = K / dt
    base = results[1]
    eff = results[n_dev] / (base * n_dev) * 100
    print(f"devices={n_dev}: {results[n_dev]:,.0f} LC solves/s  "
          f"speedup {results[n_dev]/base:.2f}x  efficiency {eff:.0f}%")
