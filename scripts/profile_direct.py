"""Profile the direct solver vs dense_seg on the exact bench pose-graph problem."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import numpy as np

from diasss_tpu.config import PipelineConfig, PoseGraphConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.synthetic import make_survey


def main():
    # reconstruct the bench pose graph by running the pipeline up to the solve
    survey = make_survey(n_lines=5, n_pings=600, n_bins=512, n_landmarks=60)
    frames = build_keyframes_batch(
        [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
         for l in survey.lines]
    )
    import diasss_tpu.pipeline as pl
    from diasss_tpu.solvers.pose_graph import solve_pose_graph

    captured = {}
    orig = solve_pose_graph

    def capture(graph, cfg, *a, **k):
        captured["graph"] = graph
        captured["cfg"] = cfg
        return orig(graph, cfg, *a, **k)

    pl.solve_pose_graph = capture
    try:
        pl.run_slam(frames, PipelineConfig(), run_eval2=False)
    finally:
        pl.solve_pose_graph = orig

    g = captured["graph"]
    cfg = captured["cfg"]
    P = g.poses0.t.shape[0]
    L = g.lc_i.shape[0]
    nvalid = int(np.asarray(g.lc_valid).sum())
    print(f"P={P} L={L} (valid {nvalid}) max_gn_iters={cfg.max_gn_iters}")

    for kind in ("dense_seg", "direct"):
        c = dataclasses.replace(cfg, preconditioner=kind)
        poses, info = orig(g, c)  # compile
        jax.block_until_ready(poses.t)
        t0 = time.perf_counter()
        poses, info = orig(g, c)
        err = float(info.error)  # forces sync through the tunnel
        dt = time.perf_counter() - t0
        print(f"{kind}: {dt*1000:.1f} ms  LM iters={int(info.iterations)} "
              f"cg={int(info.cg_iters_total)} err0={float(info.error0):.4g} "
              f"err={err:.4g}")


if __name__ == "__main__":
    main()
