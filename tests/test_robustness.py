"""Robustness: the pipeline must behave sanely across random survey seeds."""

import dataclasses

import numpy as np
import pytest

from diasss_tpu.config import PipelineConfig
from diasss_tpu.frame import build_keyframe
from diasss_tpu.pipeline import run_slam
from diasss_tpu.synthetic import make_survey


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 13, 99])
def test_never_much_worse_than_dr(seed):
    """Across seeds: finite outputs and ATE never degrades beyond 5% of DR
    (the reference's quality gate philosophy: do no harm)."""
    survey = make_survey(n_lines=3, n_pings=150, n_bins=512, n_landmarks=40, seed=seed)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    r = run_slam(frames, PipelineConfig(), gt_rows_list=[l.gt_poses for l in survey.lines],
                 run_eval2=False)
    assert np.isfinite(r.ate_est)
    assert r.ate_est <= r.ate_dr * 1.05, (seed, r.ate_dr, r.ate_est)


@pytest.mark.slow
def test_full_ba_robust_across_seeds():
    for seed in [3, 42]:
        survey = make_survey(n_lines=3, n_pings=150, n_bins=512, n_landmarks=60,
                             n_tie_lines=1, seed=seed)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1, estimator="full_ba")
        r = run_slam(frames, cfg, gt_rows_list=[l.gt_poses for l in survey.lines],
                     run_eval2=False)
        assert np.isfinite(r.ate_est)
        assert r.ate_est <= r.ate_dr, (seed, r.ate_dr, r.ate_est)
