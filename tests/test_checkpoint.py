"""Checkpoint/resume roundtrip tests (SURVEY §5 checkpoint row)."""

import os
import numpy as np
import pytest

from diasss_tpu.checkpoint import (
    load_lc_results,
    load_trajectory_state,
    save_lc_results,
    save_trajectory_state,
)
from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


@pytest.fixture(scope="module")
def result():
    survey = make_survey(n_lines=2, n_pings=120, n_bins=512, n_landmarks=30, seed=2)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    return run_slam(frames, PipelineConfig(), run_eval2=False)


class TestCheckpoint:
    def test_lc_roundtrip(self, result, tmp_path):
        p = str(tmp_path / "lc.npz")
        save_lc_results(p, result.lc_results)
        back = load_lc_results(p)
        assert set(back.keys()) == set(result.lc_results.keys())
        for k in back:
            np.testing.assert_allclose(
                np.asarray(back[k].quality), np.asarray(result.lc_results[k].quality)
            )
            np.testing.assert_allclose(
                np.asarray(back[k].rel_pose.t), np.asarray(result.lc_results[k].rel_pose.t)
            )

    def test_trajectory_roundtrip(self, result, tmp_path):
        p = str(tmp_path / "traj.npz")
        save_trajectory_state(p, result.poses, result.frame_slices, {"ate": 1.25})
        poses, slices, meta = load_trajectory_state(p)
        np.testing.assert_allclose(np.asarray(poses.t), np.asarray(result.poses.t))
        assert slices == result.frame_slices
        assert meta == {"ate": 1.25}


def _drifted_graph(P=80, seed=5):
    import jax.numpy as jnp

    from diasss_tpu.config import PoseGraphConfig
    from diasss_tpu.geometry import se3
    from diasss_tpu.solvers.pose_graph import build_chain_graph

    rng = np.random.default_rng(seed)
    tt = np.zeros((P, 6), np.float32)
    tt[:, 3] = np.arange(P) * 0.4
    dr = tt.copy()
    dr[:, 4] += np.cumsum(rng.normal(0, 0.05, P)).astype(np.float32)
    lc_i = np.asarray([5, 20, 33], np.int32)
    lc_j = np.asarray([50, 65, 75], np.int32)
    lc_rows = np.zeros((3, 6), np.float32)
    lc_rows[:, 3:6] = tt[lc_j, 3:6] - tt[lc_i, 3:6]
    cfg = PoseGraphConfig(init_noise_xyz=0.0, init_noise_rpy_deg=0.0)
    graph = build_chain_graph(
        [dr], lc_i=lc_i, lc_j=lc_j,
        lc_meas=se3.from_rodrigues_xyz(jnp.asarray(lc_rows)),
        lc_sigmas=np.full((3, 6), 0.05, np.float32),
        lc_valid=np.ones(3, bool), cfg=cfg, noise_key=None,
    )
    return graph, cfg


class TestMidSolveCheckpoint:
    """Kill-and-resume of an interrupted optimization (SURVEY §5; the
    reference loses its implicit iSAM2 state on exit)."""

    def test_kill_after_first_chunk_then_resume(self, tmp_path, monkeypatch):
        from diasss_tpu import checkpoint
        from diasss_tpu.solvers.pose_graph import solve_pose_graph

        graph, cfg = _drifted_graph()
        ref, info_ref = solve_pose_graph(graph, cfg)
        path = str(tmp_path / "ck.npz")

        orig = checkpoint.save_solver_state
        calls = {"n": 0}

        def crashing(*a, **k):
            orig(*a, **k)
            calls["n"] += 1
            if calls["n"] == 1:
                raise KeyboardInterrupt("simulated kill after snapshot")

        monkeypatch.setattr(checkpoint, "save_solver_state", crashing)
        with pytest.raises(KeyboardInterrupt):
            checkpoint.solve_pose_graph_checkpointed(graph, cfg, path, chunk=2)
        monkeypatch.setattr(checkpoint, "save_solver_state", orig)

        st = checkpoint.load_solver_state(path)
        assert st["iterations"] == 2
        assert np.isfinite(st["lam"])

        # resume with the ORIGINAL graph: the driver restores the iterate
        poses, info = checkpoint.solve_pose_graph_checkpointed(graph, cfg, path, chunk=50)
        np.testing.assert_allclose(
            np.asarray(poses.t), np.asarray(ref.t), rtol=0, atol=1e-3
        )
        assert not os.path.exists(path)  # consumed on convergence
        # resume paid only the remaining work
        assert int(np.asarray(info.iterations)) + 2 <= cfg.max_gn_iters

    def test_full_ba_chunked_matches_one_shot(self, tmp_path):
        import jax.numpy as jnp

        from diasss_tpu import checkpoint
        from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig, PipelineConfig
        from diasss_tpu.frame import build_keyframe
        from diasss_tpu.pipeline import _overlap_pairs, _assemble_pairs
        from diasss_tpu.solvers.full_ba import build_ba_problem, solve_full_ba
        from diasss_tpu.synthetic import make_survey

        survey = make_survey(n_lines=2, n_pings=120, n_bins=256, n_landmarks=40,
                             seed=9)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                           l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        cfg = PipelineConfig()
        pair_ids = _overlap_pairs(frames, cfg.min_overlap)
        kps, _ = _assemble_pairs(frames, {}, pair_ids, cfg, True)
        ba = FullBAConfig()
        prob = build_ba_problem(frames, kps, pair_ids, ba, cfg.pose_graph, None)
        kp_cfg = KeypointNoiseConfig()
        poses_ref, lms_ref, _ = solve_full_ba(prob, ba, kp_cfg)
        path = str(tmp_path / "ba.npz")
        poses, lms, info = checkpoint.solve_full_ba_checkpointed(
            prob, ba, kp_cfg, path, chunk=3
        )
        np.testing.assert_allclose(
            np.asarray(poses.t), np.asarray(poses_ref.t), rtol=0, atol=2e-3
        )
        assert not os.path.exists(path)


class TestResumeAtStalledSnapshot:
    """Resuming a snapshot saved with stall >= 2 (the chunk ended exactly at
    the 2-trial stall exit, then the process died before cleanup) must not
    return info=None — the driver runs a zero-iteration solve so callers
    still get a consistent SolveInfo."""

    def test_pose_graph_resume_stalled(self, tmp_path):
        from diasss_tpu import checkpoint
        from diasss_tpu.solvers.pose_graph import solve_pose_graph

        graph, cfg = _drifted_graph()
        ref, info_ref = solve_pose_graph(graph, cfg)
        path = str(tmp_path / "ck.npz")
        # snapshot of the CONVERGED iterate with the stall exit recorded
        checkpoint.save_solver_state(
            path, ref, float(np.asarray(info_ref.lam)),
            int(np.asarray(info_ref.iterations)), stall=2,
        )
        poses, info = checkpoint.solve_pose_graph_checkpointed(
            graph, cfg, path, chunk=5
        )
        assert info is not None
        assert int(np.asarray(info.iterations)) == 0
        assert np.isfinite(float(np.asarray(info.error)))
        np.testing.assert_allclose(
            np.asarray(poses.t), np.asarray(ref.t), rtol=0, atol=1e-6
        )
        assert not os.path.exists(path)
