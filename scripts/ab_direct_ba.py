"""A/B the full-BA solver paths on the crossing-line survey (TPU):
dense_seg PCG vs the exact direct Woodbury step of the Schur-reduced system
(VERDICT r3 item 1).

The measured point is PERF.md's flagship full-BA config: 5 main + 2 tie
lines x 600 pings = 4200 poses, 266 landmarks (round-3 solve: 2.96 s PCG).
Prints solve wall (steady-state, best of 3), LM/CG iteration counts, fixed
point, and ATE for both paths.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


def one(cfg, frames):
    run_slam(frames, cfg, run_eval2=False)  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        result = run_slam(frames, cfg, run_eval2=False)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, result)
    return best


def main():
    survey = make_survey(n_lines=5, n_pings=600, n_bins=512, n_landmarks=300,
                         n_tie_lines=2)
    total_pings = sum(len(l.dr_poses) for l in survey.lines)
    frames = build_keyframes_batch(
        [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
         for l in survey.lines],
        host_preprocess=True,
    )
    gt = [l.gt_poses for l in survey.lines]
    print(f"{total_pings} poses, {len(frames)} lines")
    for kind in ("dense_seg", "direct"):
        cfg = PipelineConfig(
            min_overlap=0.1,
            estimator="full_ba",
        )
        cfg = dataclasses.replace(
            cfg, full_ba=dataclasses.replace(cfg.full_ba, preconditioner=kind)
        )
        t0 = time.perf_counter()
        dt, result = one(cfg, frames)
        compile_s = time.perf_counter() - t0 - 3 * dt
        # re-run with gt for ATE (same compiled programs)
        _, result = one(dataclasses.replace(cfg), frames)
        r2 = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
        print(
            f"{kind}: wall {dt:.3f}s  pings/s {total_pings/dt:.1f}  "
            f"solve_stage {result.timings.get('full_ba', float('nan')):.3f}s  "
            f"err {result.solve_error:.4g}  ate_dr {r2.ate_dr:.3f}  "
            f"ate_est {r2.ate_est:.3f}  (compile ~{compile_s:.0f}s)"
        )
        print(f"  timings {result.timings}")


if __name__ == "__main__":
    main()
