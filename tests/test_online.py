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


def test_bucket_capacity_ladder():
    from diasss_tpu.online import bucket_capacity

    assert bucket_capacity(1) == 256
    assert bucket_capacity(256) == 256
    assert bucket_capacity(257) == 512
    assert bucket_capacity(300) == bucket_capacity(512) == 512
    assert bucket_capacity(5, base=16) == 16


def test_chain_padding_does_not_move_real_poses():
    """The identity leaf factors appended by bucketing must leave the real
    poses' optimum unchanged (online.py:_pad_chain_to contract)."""
    import jax.numpy as jnp

    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.geometry import se3
    from diasss_tpu.online import _pad_chain_to
    from diasss_tpu.solvers.pose_graph import build_chain_graph, solve_pose_graph

    rng = np.random.default_rng(5)
    P = 60
    rows = np.zeros((P, 6), np.float32)
    rows[:, 3] = np.arange(P) * 0.4
    rows[:, 4] = rng.normal(0, 0.3, P)
    lc_i = np.asarray([5, 20], np.int32)
    lc_j = np.asarray([40, 55], np.int32)
    lc_rows = np.zeros((2, 6), np.float32)
    lc_rows[:, 3:6] = rows[lc_j, 3:6] - rows[lc_i, 3:6] + 0.05
    cfg = PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0)
    graph = build_chain_graph(
        [rows], lc_i=lc_i, lc_j=lc_j,
        lc_meas=se3.from_rodrigues_xyz(jnp.asarray(lc_rows)),
        lc_sigmas=np.full((2, 6), 0.05, np.float32),
        lc_valid=np.ones(2, bool), cfg=cfg, noise_key=None,
    )
    poses_ref, _ = solve_pose_graph(graph, cfg)

    poses0, odo_meas = _pad_chain_to(graph.poses0, graph.odo_meas, 96)
    padded = graph._replace(poses0=poses0, odo_meas=odo_meas)
    poses_pad, _ = solve_pose_graph(padded, cfg)
    np.testing.assert_allclose(
        np.asarray(poses_pad.t[:P]), np.asarray(poses_ref.t), rtol=0, atol=1e-4
    )
    # the pad poses trail the last real pose
    np.testing.assert_allclose(
        np.asarray(poses_pad.t[P:]),
        np.broadcast_to(np.asarray(poses_pad.t[P - 1]), (36, 3)),
        rtol=0, atol=1e-3,
    )


@pytest.mark.slow
def test_online_bucketing_reuses_programs():
    """Frames whose cumulative ping counts share a power-of-two bucket must
    re-enter the same compiled solver program (VERDICT r1 item 9)."""
    import dataclasses

    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.solvers.pose_graph import solve_pose_graph

    # 4 parallel far-apart lines: no overlap gate fires, so the only shape
    # drivers are the pose count (120, 240, 360, 480) and the fixed empty
    # LC bucket -> exactly two buckets (256, 512), two compiles.
    survey = make_survey(n_lines=4, n_pings=120, n_bins=256, n_landmarks=10,
                         seed=3, spacing=5000.0)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    cfg = dataclasses.replace(
        PipelineConfig(),
        pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0),
    )
    online = OnlineSlam(cfg, bucket=True)
    c0 = solve_pose_graph._cache_size()
    for f in frames:
        poses = online.add_frame(f)
    assert poses.t.shape[0] == 480
    compiles = solve_pose_graph._cache_size() - c0
    assert compiles <= 2, compiles


@pytest.mark.slow
def test_online_fixed_lag_window():
    """window_frames bounds per-frame solve cost at O(window): solver shapes
    stop growing once the window fills (iSAM2 cost-profile answer), frozen
    history never changes, and accuracy stays near the full online solve."""
    import dataclasses

    import jax.numpy as jnp

    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.solvers.pose_graph import solve_pose_graph

    survey = make_survey(n_lines=4, n_pings=150, n_bins=512, n_landmarks=40,
                         seed=7, n_tie_lines=0)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    gt_all = np.concatenate([l.gt_poses for l in survey.lines])
    cfg = dataclasses.replace(
        PipelineConfig(),
        pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0),
    )

    full = OnlineSlam(cfg)
    for f in frames:
        poses_full = full.add_frame(f)

    win = OnlineSlam(cfg, window_frames=2)
    c0 = solve_pose_graph._cache_size()
    frozen_snapshot = None
    for k, f in enumerate(frames):
        poses_win = win.add_frame(f)
        if k == 2:  # window active: poses of frame 0 are frozen now
            frozen_snapshot = np.asarray(poses_win.t[:150]).copy()
    # frozen history never moved
    np.testing.assert_array_equal(np.asarray(poses_win.t[:150]), frozen_snapshot)
    # bounded compile count: window graphs share one bucketed shape
    assert solve_pose_graph._cache_size() - c0 <= 2
    assert poses_win.t.shape[0] == 600

    from diasss_tpu.geometry import se3 as _se3

    dr_all = np.concatenate([l.dr_poses for l in survey.lines])
    ate_dr = trajectory_ate(
        _se3.from_rodrigues_xyz(jnp.asarray(dr_all, jnp.float32)), gt_all
    )
    ate_win = trajectory_ate(poses_win, gt_all)
    ate_full = trajectory_ate(poses_full, gt_all)
    assert ate_win < ate_dr, (ate_win, ate_dr)
    # fixed-lag pays an accuracy price vs full smoothing, but stays close
    assert ate_win < 2.0 * ate_full + 0.1, (ate_win, ate_full)


def test_online_fixed_lag_window_full_ba():
    """Fixed-lag window over the JOINT BA (VERDICT r2 item 4): solver shapes
    bounded at O(window), frozen history never moves, frozen-endpoint sonar
    factors survive as constant-pose landmark constraints, and accuracy stays
    near the unwindowed streaming full BA."""
    import dataclasses

    import jax.numpy as jnp

    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.geometry import se3 as _se3
    from diasss_tpu.solvers.full_ba import solve_full_ba

    survey = make_survey(n_lines=4, n_pings=150, n_bins=512, n_landmarks=40,
                         seed=7, n_tie_lines=1)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    gt_all = np.concatenate([l.gt_poses for l in survey.lines])
    cfg = dataclasses.replace(
        PipelineConfig(),
        estimator="full_ba",
        pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0),
    )

    full = OnlineSlam(cfg)
    for f in frames:
        poses_full = full.add_frame(f)

    win = OnlineSlam(cfg, window_frames=2)
    c0 = solve_full_ba._cache_size()
    frozen_snapshot = None
    for k, f in enumerate(frames):
        poses_win = win.add_frame(f)
        if k == 2:
            frozen_snapshot = np.asarray(poses_win.t[:150]).copy()
    np.testing.assert_array_equal(np.asarray(poses_win.t[:150]), frozen_snapshot)
    # bounded compile count: window problems share one bucketed shape family
    assert solve_full_ba._cache_size() - c0 <= 3
    assert poses_win.t.shape[0] == sum(len(l.dr_poses) for l in survey.lines)

    dr_all = np.concatenate([l.dr_poses for l in survey.lines])
    ate_dr = trajectory_ate(
        _se3.from_rodrigues_xyz(jnp.asarray(dr_all, jnp.float32)), gt_all
    )
    ate_win = trajectory_ate(poses_win, gt_all)
    ate_full = trajectory_ate(poses_full, gt_all)
    assert ate_win < ate_dr, (ate_win, ate_dr)
    # fixed-lag pays an accuracy price vs full smoothing, but stays close
    assert ate_win < 2.0 * ate_full + 0.2, (ate_win, ate_full)


def test_window_ba_constant_pose_factors_constrain_landmarks():
    """A factor with one frozen endpoint must still constrain its landmark:
    the windowed problem carries it with kp_*_fix set, not dropped."""
    import dataclasses

    from diasss_tpu.config import PoseGraphConfig

    survey = make_survey(n_lines=3, n_pings=120, n_bins=512, n_landmarks=30,
                         seed=3, n_tie_lines=1)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    cfg = dataclasses.replace(
        PipelineConfig(),
        estimator="full_ba",
        pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0),
    )
    win = OnlineSlam(cfg, window_frames=2, bucket=False)
    probs = []
    from diasss_tpu.solvers import full_ba as fba

    orig = fba.solve_full_ba

    def capture(prob, *a, **k):
        probs.append(prob)
        return orig(prob, *a, **k)

    import diasss_tpu.online as online_mod

    # OnlineSlam imports solve_full_ba inside the method, patch the module attr
    fba.solve_full_ba = capture
    try:
        for f in frames:
            win.add_frame(f)
    finally:
        fba.solve_full_ba = orig
    last = probs[-1]
    assert last.kp_i_fix is not None
    n_fixed = int(np.asarray(last.kp_i_fix).sum() + np.asarray(last.kp_j_fix).sum())
    assert n_fixed > 0  # boundary-crossing factors kept as constant-pose
    # window chain is O(window): 2 frames x 120 pings
    assert last.poses0.t.shape[0] == 240


def test_online_window_full_ba_on_mesh_matches_single_device():
    """Streaming x mesh composition (VERDICT r3 item 6): fixed-lag windowed
    full BA runs sequence-parallel on an 8-device mesh — constant-pose
    (frozen-endpoint) factors owner-align like any other payload — and
    reaches the single-device windowed stream's estimates."""
    import dataclasses

    from diasss_tpu.config import PoseGraphConfig

    survey = make_survey(n_lines=4, n_pings=150, n_bins=512, n_landmarks=40,
                         seed=7, n_tie_lines=1)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                       l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    cfg1 = dataclasses.replace(
        PipelineConfig(),
        estimator="full_ba",
        pose_graph=PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0),
    )
    cfg8 = dataclasses.replace(cfg1, mesh_devices=8)

    one = OnlineSlam(cfg1, window_frames=2)
    eight = OnlineSlam(cfg8, window_frames=2)
    for f in frames:
        p1 = one.add_frame(f)
        p8 = eight.add_frame(f)
        assert p8.t.shape == p1.t.shape
    np.testing.assert_allclose(np.asarray(p8.t), np.asarray(p1.t), atol=5e-3)
