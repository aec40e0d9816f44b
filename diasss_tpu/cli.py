"""Command-line driver — the ``test_demo`` equivalent.

Same five folder flags as the reference binary (/root/reference/src/diasss2.cpp:34-41):

    python -m diasss_tpu.cli --image DIR --pose DIR --altitude DIR \\
        --groundrange DIR --annotation DIR [--out DIR] [--cpu]

plus ``--gt DIR`` (optional ground-truth folder, enables true ATE reporting) and
``--metrics FILE`` (structured JSON metrics dump — SURVEY §5 observability row).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("diasss_tpu", description="TPU-native SSS SLAM")
    parser.add_argument("--image", required=True, help="folder of sss image XML files")
    parser.add_argument("--pose", required=True, help="folder of auv pose XML files")
    parser.add_argument("--altitude", required=True, help="folder of altitude txt files")
    parser.add_argument("--groundrange", required=True, help="folder of ground range txt files")
    parser.add_argument("--annotation", required=True, help="folder of annotation XML files")
    parser.add_argument("--gt", default=None, help="optional folder of ground-truth pose txt files")
    parser.add_argument("--out", default=None, help="output dir for trajectory dumps")
    parser.add_argument("--metrics", default=None, help="write metrics JSON here")
    parser.add_argument("--cpu", action="store_true", help="force the CPU platform")
    parser.add_argument("--no-eval2", action="store_true", help="skip triangulated-consistency eval")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the solve into DIR")
    parser.add_argument("--estimator", default="two_stage", choices=["two_stage", "full_ba"],
                        help="two_stage = reference-parity; full_ba = joint Schur BA")
    parser.add_argument("--detected", action="store_true",
                        help="detect+match features instead of using annotations (USE_ANNO=0)")
    parser.add_argument("--descriptor", default="sift", choices=["sift", "orb", "geo_patch"],
                        help="descriptor family for --detected (orb = binary/Hamming; "
                             "geo_patch = world-aligned NCC)")
    parser.add_argument("--auto", action="store_true",
                        help="fully-automatic profile: dense world-correlation matching + "
                             "joint full BA + drift-compensated re-matching (zero annotations; "
                             "the annotation folder is still read for evaluation)")
    parser.add_argument("--drift-budget", type=float, default=4.0,
                        help="--auto: largest credible DR drift between overlapping lines (m)")
    parser.add_argument("--min-overlap", type=float, default=None,
                        help="override the pair-gate IoU threshold (reference: 0.4)")
    parser.add_argument("--online", action="store_true",
                        help="stream survey lines one at a time through the incremental "
                             "interface (iSAM2-equivalent: an estimate after every frame)")
    parser.add_argument("--window", type=int, default=None, metavar="W",
                        help="--online: fixed-lag window of W frames — per-frame solve "
                             "cost stays O(window) on unbounded streams")
    parser.add_argument("--mosaic", default=None, metavar="FILE.png",
                        help="write a drift-corrected world mosaic rendered from the "
                             "ESTIMATED poses (batch mode only)")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="run global solves + stacked matching over an N-device "
                             "mesh (sequence-parallel solvers, DP-sharded matchers)")
    parser.add_argument("--no-host-preprocess", action="store_true",
                        help="normalize/mask on device from the raw raster instead of "
                             "on host (host preprocessing uploads 3.6x fewer bytes and "
                             "mirrors the reference's CPU placement, frame.cpp:57-124)")
    parser.add_argument("--no-marginals", action="store_true",
                        help="skip exact per-pose marginal covariances (full_ba + "
                             "--metrics enables them by default; the reference's "
                             "GTSAM Marginals analogue, optimizer.cpp:956)")
    parser.add_argument("--no-compile-cache", action="store_true",
                        help="disable the persistent XLA compilation cache "
                             "(default: ~/.cache/diasss_tpu/xla or $DIASSS_TPU_CACHE)")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        # first pipeline compile is minutes per shape (PERF.md "Known costs");
        # the persistent cache pays it once per machine, not once per process
        from .cache import enable_compile_cache

        enable_compile_cache()

    import numpy as np

    import dataclasses

    from .config import PipelineConfig
    from .pipeline import run_slam

    if args.auto:
        from .config import automatic_config

        pipe_cfg = automatic_config(drift_budget=args.drift_budget)
    else:
        pipe_cfg = PipelineConfig(estimator=args.estimator)
    if args.min_overlap is not None:
        pipe_cfg = dataclasses.replace(pipe_cfg, min_overlap=args.min_overlap)
    if ((args.metrics or args.out) and not args.no_marginals
            and not args.online):
        # both estimators report exact pose marginals whenever a metrics/dump
        # artifact is requested (VERDICT r4: wired, not test-only)
        if pipe_cfg.estimator == "full_ba":
            pipe_cfg = dataclasses.replace(
                pipe_cfg,
                full_ba=dataclasses.replace(pipe_cfg.full_ba, marginals=True),
            )
        else:
            pipe_cfg = dataclasses.replace(
                pipe_cfg,
                pose_graph=dataclasses.replace(
                    pipe_cfg.pose_graph, marginals=True
                ),
            )
    if args.mesh:
        pipe_cfg = dataclasses.replace(pipe_cfg, mesh_devices=args.mesh)
    if args.detected and not args.auto:
        from .config import DetectorConfig, MatcherConfig, PoseGraphConfig

        if args.descriptor == "orb":
            mcfg = MatcherConfig(desc_metric="hamming", ratio_excl_radius=2.0, ratio_test=0.8,
                                 cross_check=True, scc_mode="xy")
        elif args.descriptor == "geo_patch":
            mcfg = MatcherConfig(desc_metric="ncc", cross_check=True, scc_mode="xy")
        else:
            mcfg = MatcherConfig(ratio_excl_radius=2.0, ratio_test=0.6, sift_dist_bound=450.0,
                                 cross_check=True, scc_mode="xy")
        pipe_cfg = dataclasses.replace(
            pipe_cfg,
            detector=DetectorConfig(descriptor=args.descriptor, desc_size_scale=8.0 / 31.0),
            matcher=mcfg,
            pose_graph=PoseGraphConfig(use_anno=False),
        )

    # pipelined load: line k+1's XML/txt parse overlaps line k's on-device
    # preprocessing + detection (PP — parallel/prefetch.py; the reference's
    # stage chain is strictly serial, diasss2.cpp:76-101)
    from .parallel.prefetch import load_keyframes_pipelined

    t0 = time.perf_counter()
    use_anno = pipe_cfg.pose_graph.use_anno
    # --online: OnlineSlam.add_frame runs detection itself (one frame at a
    # time, interleaved with solves), so load-time detection would be done
    # twice and discarded — skip it there (ADVICE r2)
    frames, feats, load_timings = load_keyframes_pipelined(
        args.image, args.pose, args.altitude, args.groundrange, args.annotation,
        detector_cfg=None if (use_anno or args.online) else pipe_cfg.detector,
        host_preprocess=not args.no_host_preprocess,
        # annotation-driven batch runs never read imagery in device programs;
        # keep it host-side and skip the upload (frame.host_imagery)
        host_imagery=(not args.no_host_preprocess) and use_anno
        and not args.online,
    )
    wall = time.perf_counter() - t0
    print(
        f"loaded {len(frames)} survey lines pipelined: wall {wall:.2f}s, "
        f"host parse {load_timings['load_host_parse']:.2f}s"
        + ("" if use_anno else " (detection dispatched inline)")
    )
    for f in frames:
        print(f"  image size: {f.raw.shape[0]} {f.raw.shape[1]}")

    gt_rows = None
    if args.gt:
        import os

        gt_rows = [np.loadtxt(os.path.join(args.gt, f)) for f in sorted(os.listdir(args.gt))]

    if args.online:
        from .online import OnlineSlam

        slam = OnlineSlam(pipe_cfg, window_frames=args.window)
        for k, f in enumerate(frames):
            t1 = time.perf_counter()
            poses = slam.add_frame(f)
            print(
                f"frame {k} ({f.img_id}): estimate over {poses.t.shape[0]} pings, "
                f"{slam.state.n_lc} loop closures in the solve "
                f"({time.perf_counter()-t1:.2f}s)"
            )
        if gt_rows is not None:
            from .evaluate import trajectory_ate
            from .geometry import se3 as _se3
            import jax.numpy as jnp

            gt_all = np.concatenate(gt_rows)
            dr_all = np.concatenate([np.asarray(f.dr_poses) for f in frames])
            ate_dr = trajectory_ate(
                _se3.from_rodrigues_xyz(jnp.asarray(dr_all, jnp.float32)), gt_all
            )
            print(f"ATE DR/EST: {ate_dr:.3f} / {trajectory_ate(poses, gt_all):.3f} m")
        if args.out:
            import os

            from .trajectory import save_poses_rpy

            os.makedirs(args.out, exist_ok=True)
            for k in range(len(frames)):
                save_poses_rpy(
                    os.path.join(args.out, f"online_est_poses_{frames[k].img_id}.txt"),
                    slam.frame_poses(k),
                )
            print(f"online trajectories written to {args.out}")
        return 0

    t0 = time.perf_counter()
    if args.trace:
        with jax.profiler.trace(args.trace):
            result = run_slam(
                frames,
                pipe_cfg,
                gt_rows_list=gt_rows,
                out_dir=args.out,
                run_eval2=not args.no_eval2,
                feats=feats,
            )
        print(f"profiler trace written to {args.trace}")
    else:
        result = run_slam(
            frames,
            pipe_cfg,
            gt_rows_list=gt_rows,
            out_dir=args.out,
            run_eval2=not args.no_eval2,
            feats=feats,
        )
    result.timings.update(load_timings)
    print(f"SLAM solved ({time.perf_counter()-t0:.2f}s)")

    if args.mosaic:
        from .mosaic import build_mosaic, save_mosaic_png
        from .pipeline import _estimated_geo

        est_geo = _estimated_geo(frames, result.poses)
        m, _, _, _ = build_mosaic(frames, geo_list=est_geo)
        save_mosaic_png(args.mosaic, m)
        print(f"estimated-pose mosaic written to {args.mosaic}")

    print(f"pairs: {result.pair_ids}; loop closures accepted: {result.n_lc_accepted}")
    print("throughput:", result.summary())
    print(f"graph error: {result.solve_error0:.3e} -> {result.solve_error:.3e}")
    if result.ate_dr is not None:
        print(f"ATE DR/EST: {result.ate_dr:.3f} / {result.ate_est:.3f} m")
    for key, e1 in result.eval1.items():
        print(
            f"Metric Statics: {e1.improved_pct:.1f} {e1.n_pairs} {key[0]} {key[1]}\n"
            f"Avg X,Y,NORM (DR/EST): {e1.avg_x_dr:.4f}/{e1.avg_x_est:.4f} "
            f"{e1.avg_y_dr:.4f}/{e1.avg_y_est:.4f} "
            f"{e1.avg_norm_dr:.4f}/{e1.avg_norm_est:.4f}"
        )
    for key, e2 in result.eval2.items():
        print(
            f"Metric Statics: {e2.range_improved_pct:.1f} {e2.plane_improved_pct:.1f} "
            f"{e2.n_pairs} {key[0]} {key[1]}\n"
            f"Avg R and P (DR/EST): {e2.avg_range_dr:.4f}/{e2.avg_range_est:.4f} "
            f"{e2.avg_plane_dr:.4f}/{e2.avg_plane_est:.4f}"
        )

    if args.metrics:
        metrics = {
            "n_frames": len(frames),
            "pairs": [list(p) for p in result.pair_ids],
            "n_lc_accepted": result.n_lc_accepted,
            "solve_error0": result.solve_error0,
            "solve_error": result.solve_error,
            "ate_dr": result.ate_dr,
            "ate_est": result.ate_est,
            "eval1": {f"{k}": e._asdict() | {"ini_dists": None, "fnl_dists": None} for k, e in result.eval1.items()},
            "eval2": {
                f"{k}": e._asdict()
                | {"range_dr_e": None, "range_est_e": None, "plane_dr_e": None, "plane_est_e": None}
                for k, e in result.eval2.items()
            },
            "timings": result.timings,
        }
        if result.pose_sigmas is not None:
            sig = np.asarray(result.pose_sigmas)
            metrics["pose_sigma_mean"] = sig[1:].mean(axis=0).tolist()
            metrics["pose_sigma_max_xy"] = float(
                np.sqrt(sig[1:, 3] ** 2 + sig[1:, 4] ** 2).max()
            )
        with open(args.metrics, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
        print(f"metrics written to {args.metrics}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
