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


class TestDirectStep:
    def test_direct_matches_pcg_fixed_point(self, tie_survey):
        """The exact direct Woodbury step of the Schur-reduced system
        ("direct") reaches the same fixed point as the PCG path at pipeline
        scale with Huber ON (the realistic config) — on a real crossing-line
        survey with a few hundred correspondences, not just the tiny scipy
        cross-validation problem."""
        import jax.numpy as jnp

        from diasss_tpu.config import KeypointNoiseConfig
        from diasss_tpu.solvers.full_ba import build_ba_problem, solve_full_ba
        from diasss_tpu.pipeline import _assemble_pairs, _overlap_pairs

        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                           l.ground_ranges, l.annos)
            for l in tie_survey.lines
        ]
        cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1)
        pair_ids = _overlap_pairs(frames, cfg.min_overlap)
        kps_pairs, _cap = _assemble_pairs(frames, None, pair_ids, cfg, use_anno=True)
        prob = build_ba_problem(frames, kps_pairs, pair_ids, cfg.full_ba,
                                cfg.pose_graph)
        kp_cfg = KeypointNoiseConfig()

        res = {}
        for kind in ["tridiag", "direct"]:
            ba_cfg = dataclasses.replace(cfg.full_ba, preconditioner=kind)
            poses, lms, info = solve_full_ba(prob, ba_cfg, kp_cfg)
            res[kind] = (poses, lms, info)
            if kind == "direct":
                assert int(info.cg_iters_total) == 0

        e_pcg = float(res["tridiag"][2].error)
        e_dir = float(res["direct"][2].error)
        assert e_dir <= e_pcg * 1.02 + 1e-6, (e_dir, e_pcg)
        assert e_pcg <= e_dir * 1.02 + 1e-6, (e_dir, e_pcg)
        np.testing.assert_allclose(
            np.asarray(res["direct"][0].t), np.asarray(res["tridiag"][0].t),
            atol=5e-2,
        )


class TestPoseVariances:
    @pytest.mark.slow
    def test_variances_sane_and_grow_with_distance(self, tie_survey):
        """Hutchinson pose variances: positive, zero at the gauge, and growing
        away from the anchored start of the chain (drift accumulates)."""
        import jax

        from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig
        from diasss_tpu.pairs import get_kps_pairs
        from diasss_tpu.pipeline import _overlap_pairs
        from diasss_tpu.solvers.full_ba import (
            build_ba_problem,
            estimate_pose_variances,
            solve_full_ba,
        )

        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in tie_survey.lines
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
        kp_cfg = KeypointNoiseConfig()
        prob = build_ba_problem(frames, kps, pair_ids, ba, PipelineConfig().pose_graph, None)
        poses, lms, info = solve_full_ba(prob, ba, kp_cfg)
        var = np.asarray(
            estimate_pose_variances(prob, poses, lms, jax.random.PRNGKey(0), ba, kp_cfg, 8)
        )
        assert var.shape == (poses.t.shape[0], 6)
        assert np.all(var >= 0)
        assert np.allclose(var[0], 0.0)  # gauge
        # translation uncertainty grows from the anchored start toward the end
        txy_early = var[1:50, 3:5].mean()
        txy_late = var[-50:, 3:5].mean()
        assert txy_late > txy_early, (txy_early, txy_late)


@pytest.mark.slow
def test_fully_automatic_pipeline_improves():
    """detect -> cross-checked match -> joint BA must improve ATE with ZERO
    annotations on a crossing survey (the fully automatic flagship path)."""
    from diasss_tpu.config import DetectorConfig, MatcherConfig, PoseGraphConfig

    survey = make_survey(n_lines=3, n_pings=400, n_bins=512, n_landmarks=200,
                         n_tie_lines=1, seed=11)
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    cfg = PipelineConfig(
        min_overlap=0.1, estimator="full_ba",
        detector=DetectorConfig(n_features=1500, desc_size_scale=8.0 / 31.0),
        matcher=MatcherConfig(ratio_excl_radius=2.0, ratio_test=0.6, sift_dist_bound=450.0,
                              cross_check=True, scc_mode="xy"),
        pose_graph=PoseGraphConfig(use_anno=False),
    )
    r = run_slam(frames, cfg, gt_rows_list=[l.gt_poses for l in survey.lines], run_eval2=False)
    assert r.ate_est < r.ate_dr, (r.ate_dr, r.ate_est)


def test_direct_step_k_cols_trimming_equivalent(tie_survey):
    """k_direct_cols trims the Woodbury width to the (bucketed) valid count;
    the trimmed and full-width direct solves must be identical (padding
    columns are exactly zero)."""
    import jax.numpy as jnp
    import numpy as np

    from diasss_tpu.config import KeypointNoiseConfig
    from diasss_tpu.pipeline import _assemble_pairs, _overlap_pairs
    from diasss_tpu.solvers.full_ba import build_ba_problem, solve_full_ba

    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                       l.ground_ranges, l.annos)
        for l in tie_survey.lines
    ]
    cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1)
    pair_ids = _overlap_pairs(frames, cfg.min_overlap)
    kps_pairs, _ = _assemble_pairs(frames, None, pair_ids, cfg, use_anno=True)
    prob = build_ba_problem(frames, kps_pairs, pair_ids, cfg.full_ba, cfg.pose_graph)
    # append an invalid tail so the trim is guaranteed non-trivial
    pad = 128

    def zpad(a):
        return jnp.concatenate([a, jnp.zeros((pad, *a.shape[1:]), a.dtype)])

    prob = prob._replace(
        kp_i=zpad(prob.kp_i), kp_j=zpad(prob.kp_j),
        kp_sr_s=jnp.concatenate([prob.kp_sr_s, jnp.ones(pad, jnp.float32)]),
        kp_sr_t=jnp.concatenate([prob.kp_sr_t, jnp.ones(pad, jnp.float32)]),
        kp_valid=jnp.concatenate([prob.kp_valid, jnp.zeros(pad, bool)]),
        lm0=zpad(prob.lm0), lm_prior=zpad(prob.lm_prior),
    )
    n_valid = int(np.asarray(prob.kp_valid).sum())
    k_cols = min(int(prob.kp_i.shape[0]), max(128, -(-n_valid // 128) * 128))
    assert k_cols < int(prob.kp_i.shape[0])  # the trim is non-trivial here

    ba = dataclasses.replace(cfg.full_ba, preconditioner="direct", max_iters=8)
    kp_cfg = KeypointNoiseConfig()
    p_full, l_full, i_full = solve_full_ba(prob, ba, kp_cfg)
    p_trim, l_trim, i_trim = solve_full_ba(prob, ba, kp_cfg, k_direct_cols=k_cols)
    # the trimmed width changes f32 reduction order inside the chain solve;
    # agreement is to accumulated-ulp level (measured max ~5e-5 over 8 trials)
    np.testing.assert_allclose(np.asarray(p_trim.t), np.asarray(p_full.t), atol=1e-3)
    assert abs(float(i_trim.error) - float(i_full.error)) < 1e-3 * max(
        float(i_full.error), 1.0
    )
