"""End-to-end demo: synthetic survey -> full SLAM -> metrics.

The runtime surface for verifying pipeline changes (see .claude/skills/verify).

Usage: python scripts/demo_e2e.py [--lines N] [--pings N] [--tpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--lines", type=int, default=4)
parser.add_argument("--pings", type=int, default=400)
parser.add_argument("--bins", type=int, default=512)
parser.add_argument("--landmarks", type=int, default=50)
parser.add_argument("--tpu", action="store_true", help="run on the real TPU (default: CPU)")
parser.add_argument("--detected", action="store_true",
                    help="use the detected-correspondence path (USE_ANNO=0) instead of annotations")
parser.add_argument("--auto", action="store_true",
                    help="fully-automatic profile (dense world-correlation matching + "
                         "full BA + drift-compensated re-matching; zero annotations)")
parser.add_argument("--estimator", default="two_stage", choices=["two_stage", "full_ba"],
                    help="two_stage = reference-parity; full_ba = joint BA (beyond-reference)")
parser.add_argument("--ties", type=int, default=0, help="number of crossing tie lines")
parser.add_argument("--mesh", type=int, default=None,
                    help="run the global solves + stacked matching over an "
                         "n-device mesh (set XLA_FLAGS device count on CPU)")
args = parser.parse_args()

import jax

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

from diasss_tpu.config import DetectorConfig, MatcherConfig, PipelineConfig, PoseGraphConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey

print(f"devices: {jax.devices()}")
t0 = time.perf_counter()
survey = make_survey(
    n_lines=args.lines, n_pings=args.pings, n_bins=args.bins, n_landmarks=args.landmarks,
    n_tie_lines=args.ties,
)
print(f"synthetic survey: {args.lines} lines x {args.pings} pings x {args.bins} bins "
      f"({time.perf_counter()-t0:.2f}s)")
for l in survey.lines:
    print(f"  line {l.img_id}: {len(l.annos)} annotation rows")

t0 = time.perf_counter()
frames = [
    build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
    for l in survey.lines
]
print(f"keyframes built ({time.perf_counter()-t0:.2f}s)")

import dataclasses

if args.auto:
    from diasss_tpu.config import automatic_config

    cfg = automatic_config()
else:
    cfg = PipelineConfig(estimator=args.estimator)
if args.ties and not args.auto:
    cfg = dataclasses.replace(cfg, min_overlap=0.1)
if args.detected and not args.auto:
    cfg = dataclasses.replace(
        cfg,
        detector=DetectorConfig(n_features=800, desc_size_scale=8.0 / 31.0),
        matcher=MatcherConfig(ratio_excl_radius=2.0, ratio_test=0.6, sift_dist_bound=450.0,
                              cross_check=True, scc_mode="xy"),
        pose_graph=PoseGraphConfig(use_anno=False),
    )
if args.mesh:
    cfg = dataclasses.replace(cfg, mesh_devices=args.mesh)
t0 = time.perf_counter()
result = run_slam(frames, cfg, gt_rows_list=[l.gt_poses for l in survey.lines])
print(f"SLAM solved ({time.perf_counter()-t0:.2f}s)")

print(f"\npairs gated in: {result.pair_ids}")
print(f"loop closures accepted: {result.n_lc_accepted}")
print(f"graph error: {result.solve_error0:.3e} -> {result.solve_error:.3e}")
print(f"ATE DR  = {result.ate_dr:.3f} m")
print(f"ATE EST = {result.ate_est:.3f} m")
for key, e1 in result.eval1.items():
    print(
        f"pair {key}: Metric Statics {e1.improved_pct:.1f}% of {e1.n_pairs} | "
        f"avg norm DR/EST {e1.avg_norm_dr:.3f}/{e1.avg_norm_est:.3f}"
    )
for key, e2 in result.eval2.items():
    print(
        f"pair {key}: range improved {e2.range_improved_pct:.1f}% "
        f"({e2.avg_range_dr:.3f}->{e2.avg_range_est:.3f}) | "
        f"plane improved {e2.plane_improved_pct:.1f}% "
        f"({e2.avg_plane_dr:.4f}->{e2.avg_plane_est:.4f})"
    )
print(f"timings: { {k: round(v, 2) for k, v in result.timings.items()} }")

if result.n_lc_accepted == 0 and cfg.estimator == "two_stage":
    # With zero accepted loop closures the two-stage estimate IS dead
    # reckoning (the quality gate, optimizer.cpp:234, rejected everything —
    # e.g. the image-space SIFT profile on speckle, see README); the honest
    # check is "no regression", not a strict-inequality coin flip at the
    # fourth decimal.
    ok = result.ate_est is not None and result.ate_est <= result.ate_dr + 1e-2
    print("\nRESULT: "
          + ("PASS — no loop closures accepted (estimate = dead reckoning, "
             "no regression); use --auto for the working automatic profile"
             if ok else "FAIL — estimate regressed below dead reckoning"))
else:
    ok = result.ate_est is not None and result.ate_est < result.ate_dr
    print(f"\nRESULT: {'PASS — SLAM beats dead reckoning' if ok else 'FAIL — no improvement'}")
sys.exit(0 if ok else 1)
