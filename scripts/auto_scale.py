"""The 20-line automatic mission (VERDICT r4 item 2's 'Done' scenario): a
large ZERO-annotation survey whose dense-match yield pushes the full-BA
correspondence count past the direct Woodbury guard — the run must cross
into the PCG fallback WITHOUT a cliff, with the resolved solver kind
visible in the counters.

Run on TPU.  Results belong in PERF.md round 5.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()
from diasss_tpu.config import automatic_config
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


def main(n_lines=18, n_ties=2, n_pings=400):
    survey = make_survey(n_lines=n_lines, n_pings=n_pings, n_bins=512,
                         n_landmarks=1200, n_tie_lines=n_ties,
                         drift_xy=0.004, seed=3)
    total = sum(len(l.dr_poses) for l in survey.lines)
    gt = [l.gt_poses for l in survey.lines]
    cfg = automatic_config()

    def one():
        t0 = time.perf_counter()
        frames = build_keyframes_batch(
            [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges,
              l.annos) for l in survey.lines], host_preprocess=True)
        r = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
        return time.perf_counter() - t0, r

    one()  # warmup/compile
    w, r = one()
    counters = {k: v for k, v in r.timings.items() if not isinstance(v, float)}
    times = {k: round(v, 2) for k, v in r.timings.items() if isinstance(v, float)}
    print(f"{n_lines}+{n_ties} lines, {total} pings: wall {w:.2f} s "
          f"({total / w:.0f} pings/s)  ate {r.ate_dr:.3f} -> {r.ate_est:.3f}")
    print("counters:", counters)
    print("times:", times)
    print("accepted correspondences:", r.n_lc_accepted)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
