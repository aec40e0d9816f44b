"""A/B matmul precision in the full-BA solver on TPU (round-3 follow-up to the
_direct_lm_step finding: XLA's HIGHEST lowering of tiny-dim batched einsums
defeats vectorization)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def build_problem():
    from diasss_tpu.config import FullBAConfig, PipelineConfig
    from diasss_tpu.frame import build_keyframe
    from diasss_tpu.pairs import get_kps_pairs
    from diasss_tpu.pipeline import _overlap_pairs
    from diasss_tpu.solvers.full_ba import build_ba_problem
    from diasss_tpu.synthetic import make_survey

    survey = make_survey(n_lines=5, n_pings=600, n_bins=512, n_landmarks=60,
                         n_tie_lines=2, seed=1)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    pair_ids = _overlap_pairs(frames, 0.1)
    kps = {
        k: get_kps_pairs(
            frames[k[0]].annos, frames[k[1]].img_id,
            np.asarray(frames[k[0]].altitudes), np.asarray(frames[k[0]].ground_ranges),
            np.asarray(frames[k[1]].altitudes), np.asarray(frames[k[1]].ground_ranges),
            use_anno=True,
        )
        for k in pair_ids
    }
    ba = FullBAConfig()
    prob = build_ba_problem(frames, kps, pair_ids, ba, PipelineConfig().pose_graph, None)
    gt = np.concatenate([l.gt_poses for l in survey.lines])
    return prob, ba, gt


def main():
    from diasss_tpu.config import KeypointNoiseConfig
    from diasss_tpu.evaluate import trajectory_ate
    import diasss_tpu.solvers.full_ba as fba

    prob, ba, gt = build_problem()
    kp_cfg = KeypointNoiseConfig()
    print(f"P={prob.poses0.t.shape[0]} K={prob.kp_i.shape[0]} "
          f"(valid {int(np.asarray(prob.kp_valid).sum())})")

    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        fba._HI = getattr(jax.lax.Precision, prec)
        solve = fba.solve_full_ba.__wrapped__  # bypass jit cache across patches
        jitted = jax.jit(solve, static_argnames=("cfg", "kp_cfg"))
        poses, lms, info = jitted(prob, ba, kp_cfg)
        jax.block_until_ready(poses.t)
        t0 = time.perf_counter()
        poses, lms, info = jitted(prob, ba, kp_cfg)
        err = float(info.error)
        dt = time.perf_counter() - t0
        ate = trajectory_ate(poses, gt)
        print(f"{prec}: {dt*1000:.0f} ms  LM={int(info.iterations)} "
              f"cg={int(info.cg_iters_total)} err={err:.5g} ATE={ate:.3f}")
    fba._HI = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
