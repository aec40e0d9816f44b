"""Checkpoint/resume roundtrip tests (SURVEY §5 checkpoint row)."""

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
