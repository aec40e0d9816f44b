"""Full bundle adjustment (beyond-reference estimator) tests."""

import dataclasses

import numpy as np
import pytest

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


@pytest.fixture(scope="module")
def tie_survey():
    return make_survey(n_lines=3, n_pings=250, n_bins=512, n_landmarks=100, n_tie_lines=1, seed=5)


@pytest.fixture(scope="module")
def results(tie_survey):
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in tie_survey.lines
    ]
    gt = [l.gt_poses for l in tie_survey.lines]
    out = {}
    for est in ["two_stage", "full_ba"]:
        cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1, estimator=est)
        out[est] = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
    return out


class TestFullBA:
    def test_improves_over_dr(self, results):
        r = results["full_ba"]
        assert r.ate_est < r.ate_dr * 0.8, (r.ate_dr, r.ate_est)

    def test_beats_two_stage(self, results):
        """Joint BA uses crossing-line constraints the two-stage design cannot."""
        assert results["full_ba"].ate_est < results["two_stage"].ate_est, (
            results["full_ba"].ate_est,
            results["two_stage"].ate_est,
        )

    def test_landmark_consistency_improves(self, results):
        r = results["full_ba"]
        pcts = [e.improved_pct for e in r.eval1.values() if e.n_pairs > 0]
        assert np.nanmean(pcts) > 60.0, pcts

    def test_solver_converged(self, results):
        r = results["full_ba"]
        assert np.isfinite(r.solve_error)
        assert r.solve_error < r.solve_error0 * 1e-2
