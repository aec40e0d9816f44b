"""A/B the pose-graph solver paths on the bench survey (TPU): dense_seg PCG
vs the exact direct Woodbury chain solver (VERDICT r2 item 1).

Prints wall, ATE, and stage timings for both paths on the exact bench config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diasss_tpu.config import PipelineConfig, PoseGraphConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey
import dataclasses


def one(cfg, frames, total_pings):
    run_slam(frames, cfg, run_eval2=False)  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        result = run_slam(frames, cfg, run_eval2=False)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, result)
    dt, result = best
    return dt, result


def main():
    survey = make_survey(n_lines=5, n_pings=600, n_bins=512, n_landmarks=60)
    total_pings = sum(len(l.dr_poses) for l in survey.lines)
    frames = build_keyframes_batch(
        [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
         for l in survey.lines]
    )
    for kind in ("dense_seg", "direct"):
        cfg = PipelineConfig()
        cfg = dataclasses.replace(
            cfg, pose_graph=dataclasses.replace(cfg.pose_graph, preconditioner=kind)
        )
        dt, result = one(cfg, frames, total_pings)
        print(f"{kind}: wall {dt:.3f}s  pings/s {total_pings/dt:.1f}  "
              f"ate_dr {result.ate_dr}  ate_est {result.ate_est}")
        print(f"  timings {result.timings}")


if __name__ == "__main__":
    main()
