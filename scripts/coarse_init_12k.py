"""Prove-or-delete measurement for coarse_init_stride (VERDICT r3 item 3).

The 12k-pose bench survey exits on max_gn_iters, not convergence (PERF.md
round-3 table: ATE 17.46/15.55/13.43 at 8/15/30 iters, still falling).  The
coarse-to-fine init targets exactly this tail: solve every stride-th pose
first (~1/stride cost), start the fine LM closer to the optimum.

Measures ATE + pose_graph stage wall at iters x stride combinations on the
real TPU.  Decision rule: coarse init wins if some (iters < 30, stride > 1)
cell reaches the 30-iter ATE at materially less wall, or if stride > 1 at 30
iters lands at materially better ATE for ~equal wall.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)  # tunnel acquisition probe
    survey = make_survey(n_lines=20, n_pings=600, n_bins=512, n_landmarks=60)
    frames = build_keyframes_batch(
        [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
         for l in survey.lines],
        host_preprocess=True,
    )
    print("frames built", flush=True)
    gt = [l.gt_poses for l in survey.lines]

    for stride, iters in ((0, 30), (8, 15), (8, 30), (16, 30), (0, 15)):
        if True:
            print(f"compiling stride={stride} iters={iters} ...",
                  flush=True)
            cfg = PipelineConfig()
            cfg = dataclasses.replace(
                cfg,
                pose_graph=dataclasses.replace(
                    cfg.pose_graph, max_gn_iters=iters, coarse_init_stride=stride
                ),
            )
            run_slam(frames, cfg, run_eval2=False)  # compile
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                r = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
                dt = time.perf_counter() - t0
                if best is None or dt < best[0]:
                    best = (dt, r)
            dt, r = best
            print(
                f"stride {stride:2d}  iters {iters:2d}: ate_dr {r.ate_dr:.2f}  "
                f"ate_est {r.ate_est:.3f}  pose_graph {r.timings['pose_graph']:.3f}s  "
                f"wall {dt:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
