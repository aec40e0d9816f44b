"""TPU smoke + timing of the fully-automatic profile (dense matching + full BA).

Run on the real chip (no platform override).  Prints per-stage steady-state
timings and the ATE improvement; used to record PERF numbers for the dense
world-correlation path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    print("devices:", jax.devices(), flush=True)

    from diasss_tpu.config import automatic_config
    from diasss_tpu.frame import build_keyframe
    from diasss_tpu.pipeline import run_slam
    from diasss_tpu.synthetic import make_survey

    survey = make_survey(
        n_lines=3, n_pings=1000, n_bins=512, n_landmarks=300,
        n_tie_lines=1, seed=3, drift_xy=0.008,
    )
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    gt = [l.gt_poses for l in survey.lines]
    cfg = automatic_config(drift_budget=8.0)

    for it in range(2):
        t0 = time.time()
        res = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
        wall = time.time() - t0
        print(
            f"pass {it}: wall={wall:.1f}s n_in_ba={res.n_lc_accepted} "
            f"ATE {res.ate_dr:.2f}->{res.ate_est:.2f}",
            flush=True,
        )
        print("  timings:", {k: round(v, 2) for k, v in res.timings.items()}, flush=True)


if __name__ == "__main__":
    main()
