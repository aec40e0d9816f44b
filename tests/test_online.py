"""Online/incremental SLAM interface tests (iSAM2-equivalent streaming)."""

import numpy as np
import pytest

from diasss_tpu.config import PipelineConfig
from diasss_tpu.evaluate import trajectory_ate
from diasss_tpu.frame import build_keyframe
from diasss_tpu.online import OnlineSlam
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


@pytest.mark.slow
def test_online_matches_batch_fixed_point():
    """Streaming frames one by one must land at (essentially) the batch optimum."""
    survey = make_survey(n_lines=3, n_pings=150, n_bins=512, n_landmarks=40, seed=7)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    gt = [l.gt_poses for l in survey.lines]

    import dataclasses

    from diasss_tpu.config import PoseGraphConfig

    # disable initial noise so both modes optimize the same problem
    cfg = dataclasses.replace(
        PipelineConfig(), pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0)
    )

    online = OnlineSlam(cfg)
    for i, f in enumerate(frames):
        poses = online.add_frame(f)
        # after each frame the estimate covers all pings so far
        assert poses.t.shape[0] == sum(len(l.dr_poses) for l in survey.lines[: i + 1])

    batch = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
    gt_all = np.concatenate(gt)
    ate_online = trajectory_ate(poses, gt_all)
    # same fixed point up to solver tolerance
    assert abs(ate_online - batch.ate_est) < 0.05, (ate_online, batch.ate_est)


@pytest.mark.slow
def test_online_fully_automatic():
    """Streaming ZERO-annotation SLAM: detection + dense matching + warm-started
    full BA per arriving frame (OnlineSlam(automatic_config()))."""
    import dataclasses

    from diasss_tpu.config import automatic_config

    survey = make_survey(
        n_lines=2, n_pings=200, n_bins=256, n_landmarks=150, n_tie_lines=1,
        seed=11, drift_xy=0.004,
    )
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    # no re-matching so streaming and batch accumulate the identical
    # correspondence set and must reach the same full-BA fixed point
    cfg = dataclasses.replace(automatic_config(), rematch_iters=0)
    online = OnlineSlam(cfg)
    for i, f in enumerate(frames):
        poses = online.add_frame(f)
        assert np.all(np.isfinite(np.asarray(poses.t)))
        assert poses.t.shape[0] == sum(len(x.dr_poses) for x in survey.lines[: i + 1])
    gt_all = np.concatenate([l.gt_poses for l in survey.lines])
    ate_online = trajectory_ate(poses, gt_all)
    dr_all = np.concatenate([l.dr_poses for l in survey.lines])
    from diasss_tpu.geometry import se3 as _se3
    import jax.numpy as jnp

    ate_dr = trajectory_ate(_se3.from_rodrigues_xyz(jnp.asarray(dr_all, jnp.float32)), gt_all)
    assert online.state.n_lc > 20, online.state.n_lc
    assert ate_online < ate_dr, (ate_online, ate_dr)

    # streaming final estimate ~ batch --auto estimate on the same survey
    batch = run_slam(frames, cfg, gt_rows_list=[l.gt_poses for l in survey.lines],
                     run_eval2=False)
    assert abs(ate_online - batch.ate_est) < 0.1 * max(ate_dr, 1.0), (
        ate_online, batch.ate_est,
    )


@pytest.mark.slow
def test_online_estimates_available_every_step():
    survey = make_survey(n_lines=2, n_pings=120, n_bins=512, n_landmarks=30, seed=9)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    online = OnlineSlam(PipelineConfig())
    p1 = online.add_frame(frames[0])
    assert np.all(np.isfinite(np.asarray(p1.t)))
    p2 = online.add_frame(frames[1])
    assert np.all(np.isfinite(np.asarray(p2.t)))
    assert online.frame_poses(1).t.shape[0] == 120
