"""Long-mission stress benchmark (BASELINE.json config 4).

A 10x-scale synthetic survey (default 50 lines x 600 pings = 30k poses) driven
through the full annotation pipeline on one chip.  Validates static-shape
scaling of the stacked LC solver and the factor-wise pose-graph LM at
long-context size, and reports pings/sec at scale.

Usage: python scripts/stress_bench.py [--lines N] [--pings N] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

parser = argparse.ArgumentParser()
parser.add_argument("--lines", type=int, default=50)
parser.add_argument("--pings", type=int, default=600)
parser.add_argument("--bins", type=int, default=512)
parser.add_argument("--landmarks", type=int, default=600)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey

t0 = time.perf_counter()
survey = make_survey(
    n_lines=args.lines, n_pings=args.pings, n_bins=args.bins, n_landmarks=args.landmarks
)
total = args.lines * args.pings
print(f"survey: {args.lines} lines x {args.pings} pings = {total} poses "
      f"({time.perf_counter()-t0:.1f}s to generate)")

def one():
    t0 = time.perf_counter()
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    r = run_slam(frames, PipelineConfig(), gt_rows_list=[l.gt_poses for l in survey.lines],
                 run_eval2=False)
    return time.perf_counter() - t0, r

dt, r = one()
print(f"pass 1 (compile): {dt:.1f}s")
dt, r = one()
print(f"pass 2: {dt:.2f}s -> {total/dt:,.0f} pings/s at {total} poses")
print(f"pairs {len(r.pair_ids)}, LC accepted {r.n_lc_accepted}")
print(f"ATE DR/EST: {r.ate_dr:.3f} / {r.ate_est:.3f} m")
print("timings:", {k: round(v, 2) for k, v in r.timings.items()})
