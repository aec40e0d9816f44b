"""One long-lived TPU session for the remaining round-4 measurements.

The axon tunnel serves one client at a time and a new client can wait tens
of minutes for the session handover, so every remaining TPU measurement
rides this single process:

1. bench.py main() — validates the extended bench (full_ba + auto entries,
   wall-summing profile) end-to-end on the real chip;
2. the 12k convergence tail: plain solve at max_gn_iters = 60 and 90 (does
   the accuracy keep converting past 30, and at what wall?);
3. ring_crossover part 1: single-chip stacked/per-pair matcher scaling at
   K = 2k/4k/8k.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()

import jax

print(f"devices: {jax.devices()}", flush=True)

# ---- 1. bench validation ----
print("=== bench.py main ===", flush=True)
import bench

t0 = time.perf_counter()
bench.main()
print(f"bench total {time.perf_counter() - t0:.0f}s", flush=True)

# ---- 2. 12k convergence tail ----
print("=== 12k convergence tail ===", flush=True)
from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey

survey = make_survey(n_lines=20, n_pings=600, n_bins=512, n_landmarks=60)
frames = build_keyframes_batch(
    [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
     for l in survey.lines],
    host_preprocess=True,
)
gt = [l.gt_poses for l in survey.lines]
for iters in (60, 90):
    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, pose_graph=dataclasses.replace(cfg.pose_graph, max_gn_iters=iters)
    )
    run_slam(frames, cfg, run_eval2=False)  # compile
    t0 = time.perf_counter()
    r = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
    dt = time.perf_counter() - t0
    print(f"iters {iters}: ate_est {r.ate_est:.3f}  pose_graph "
          f"{r.timings['pose_graph']:.3f}s  wall {dt:.2f}s  capped {r.solve_capped}",
          flush=True)

# ---- 3. single-chip matcher scaling (ring part 1) ----
print("=== matcher scaling (single chip) ===", flush=True)
import importlib

rc = importlib.import_module("ring_crossover") if False else None
import subprocess  # noqa: F401  (not used — run inline instead)

sys.argv = ["ring_crossover"]
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ring_crossover.py")).read(), {"__name__": "__main__"})
print("ALL DONE", flush=True)
