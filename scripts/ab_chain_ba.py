"""A/B the full-BA linear-solve kinds across correspondence scale (VERDICT r4
item 2): direct Woodbury vs EXACT-chain PCG ("chain") vs segmented PCG
("dense_seg") at K ~ 1k / 4k / 16k on a crossing synthetic survey.

Run on TPU (leave the platform unforced).  Results belong in PERF.md; the
"auto" policy in FullBAConfig.preconditioner cites this table.
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig, PipelineConfig
from diasss_tpu.frame import build_keyframes_batch
from diasss_tpu.pairs import get_kps_pairs
from diasss_tpu.pipeline import _assemble_pairs, _overlap_pairs
from diasss_tpu.solvers.full_ba import build_ba_problem, solve_full_ba
from diasss_tpu.synthetic import make_survey


def build_problem(n_landmarks, n_pings=600, seed=0):
    survey = make_survey(n_lines=5, n_pings=n_pings, n_bins=512,
                         n_landmarks=n_landmarks, n_tie_lines=2,
                         drift_xy=0.004, seed=seed)
    frames = build_keyframes_batch(
        [(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
         for l in survey.lines], host_preprocess=True)
    cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1, estimator="full_ba")
    pair_ids = _overlap_pairs(frames, cfg.min_overlap)
    kps_pairs, _ = _assemble_pairs(frames, None, pair_ids, cfg, use_anno=True)
    prob = build_ba_problem(frames, kps_pairs, pair_ids, cfg.full_ba,
                            cfg.pose_graph, None)
    return prob, cfg


def run(prob, kind, kp_cfg, n=3):
    cfg = FullBAConfig(preconditioner=kind)
    jcall = lambda: solve_full_ba(prob, cfg, kp_cfg)
    poses, lms, info = jcall()
    err = float(jax.device_get(info.error))  # warms + syncs
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        poses, lms, info = jcall()
        fetched = jax.device_get((info.error, info.iterations, info.cg_iters_total))
        ts.append(time.perf_counter() - t0)
    err, iters, cg = float(fetched[0]), int(fetched[1]), int(fetched[2])
    return min(ts), err, iters, cg


def main():
    kp_cfg = KeypointNoiseConfig()
    for n_lm in (int(a) for a in (sys.argv[1:] or ["700", "2500", "9000"])):
        prob, cfg = build_problem(n_lm)
        P = int(prob.poses0.t.shape[0])
        K = int(prob.kp_i.shape[0])
        Kv = int(np.asarray(prob.kp_valid).sum())
        print(f"--- P={P} K_pad={K} (valid {Kv}) ---", flush=True)
        kinds = ["chain", "dense_seg"]
        # direct where its buffers fit (mem guard from resolve_ba_solver_kind)
        if P * 6 * (3 * K + 1) * 4 * 3 < 4e9:
            kinds.insert(0, "direct")
        for kind in kinds:
            try:
                t, err, iters, cg = run(prob, kind, kp_cfg)
                print(f"  {kind:9s}: {t:7.3f} s  err {err:.6g}  LM {iters}  CG {cg}",
                      flush=True)
            except Exception as e:
                print(f"  {kind:9s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
