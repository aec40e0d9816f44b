"""Golden regression pins: fixed-seed metrics must stay in tight ranges.

These are this framework's equivalent of the reference's golden end-to-end run
over its bundled test_data (SURVEY §4.1).  Ranges are deliberately loose enough
to survive benign numeric drift (BLAS versions, instruction scheduling) but
tight enough to catch algorithmic regressions.  If a deliberate change moves a
metric, update the range in the same commit and say why.
"""

import dataclasses

import numpy as np
import pytest

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


@pytest.fixture(scope="module")
def golden_result():
    survey = make_survey(n_lines=3, n_pings=150, n_bins=512, n_landmarks=40, seed=7)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    return run_slam(
        frames, PipelineConfig(), gt_rows_list=[l.gt_poses for l in survey.lines], run_eval2=True
    )


class TestGoldenTwoStage:
    def test_ate(self, golden_result):
        r = golden_result
        assert 0.6 < r.ate_dr < 0.8, r.ate_dr  # fixed-seed survey drift
        assert r.ate_est <= r.ate_dr * 1.02

    def test_pair_structure(self, golden_result):
        assert golden_result.pair_ids == [(0, 1), (1, 2)]
        total = sum(e.n_pairs for e in golden_result.eval1.values())
        assert 5 <= total <= 40, total

    def test_eval2_small_errors(self, golden_result):
        for e in golden_result.eval2.values():
            if e.n_pairs:
                assert e.avg_range_est < 0.2, e
                assert e.avg_plane_est < 1.0, e

    def test_graph_error_reduction(self, golden_result):
        assert golden_result.solve_error < golden_result.solve_error0 * 1e-3


class TestGoldenFullBA:
    def test_tie_line_accuracy(self):
        survey = make_survey(
            n_lines=3, n_pings=250, n_bins=512, n_landmarks=100, n_tie_lines=1, seed=5
        )
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1, estimator="full_ba")
        r = run_slam(
            frames, cfg, gt_rows_list=[l.gt_poses for l in survey.lines], run_eval2=False
        )
        # full BA on a crossing survey must recover most of the drift
        assert r.ate_est < r.ate_dr * 0.65, (r.ate_dr, r.ate_est)
