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


class TestPoseMarginals:
    def test_exact_vs_dense_inversion(self):
        """ba_pose_marginals (Takahashi selected inversion + Woodbury
        correction) must equal the pose blocks of the DENSE inverse of the
        gauge-fixed robustified Gauss-Newton Hessian on a small problem."""
        import jax
        import jax.numpy as jnp

        from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig
        from diasss_tpu.factors.sss_point import kp_noise_sigmas
        from diasss_tpu.pairs import get_kps_pairs
        from diasss_tpu.pipeline import _overlap_pairs
        from diasss_tpu.solvers.full_ba import (
            _endpoint_poses,
            _huber_weight,
            _sss_factor_terms,
            ba_pose_marginals,
            build_ba_problem,
            solve_full_ba,
        )
        from diasss_tpu.solvers.pose_graph import _linearize_between

        survey = make_survey(n_lines=2, n_pings=40, n_bins=256, n_landmarks=25,
                             n_tie_lines=1, seed=4)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                           l.ground_ranges, l.annos)
            for l in survey.lines
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
        prob = build_ba_problem(frames, kps, pair_ids, ba,
                                PipelineConfig().pose_graph, None)
        poses, lms, _ = solve_full_ba(prob, ba, kp_cfg)
        cov = np.asarray(ba_pose_marginals(prob, poses, lms, ba, kp_cfg))
        P = int(poses.t.shape[0])
        K = int(prob.kp_i.shape[0])
        assert cov.shape == (P, 6, 6)
        assert np.allclose(cov[0], 0.0)  # gauge
        # symmetric positive(ish) diagonals
        assert np.allclose(cov, cov.transpose(0, 2, 1), atol=1e-6)
        assert np.all(cov[1:, np.arange(6), np.arange(6)] > 0)

        # dense reference: assemble the full (6P + 3K) robustified GN
        # Hessian from the SAME linearization, pin the gauge, invert
        sig_s = jax.vmap(lambda sr: kp_noise_sigmas(
            sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_s)
        sig_t = jax.vmap(lambda sr: kp_noise_sigmas(
            sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_t)
        idx_a = jnp.arange(P - 1)
        idx_b = jnp.arange(1, P)
        _, Ja, Jb = jax.vmap(_linearize_between)(
            poses[idx_a], poses[idx_b], prob.odo_meas,
            jnp.broadcast_to(prob.odo_sigmas, (P - 1, 6)),
        )
        pi, pj = _endpoint_poses(poses, prob)
        r_s, Jp_s, Jl_s = jax.vmap(_sss_factor_terms)(pi, lms, prob.kp_sr_s, sig_s)
        r_t, Jp_t, Jl_t = jax.vmap(_sss_factor_terms)(pj, lms, prob.kp_sr_t, sig_t)
        v = np.asarray(prob.kp_valid)
        w_s = np.asarray(_huber_weight(jnp.sum(jnp.where(
            prob.kp_valid[:, None], r_s, 0.0) ** 2, axis=-1), ba.huber_delta))
        w_t = np.asarray(_huber_weight(jnp.sum(jnp.where(
            prob.kp_valid[:, None], r_t, 0.0) ** 2, axis=-1), ba.huber_delta))
        n = 6 * P + 3 * K
        H = np.zeros((n, n))
        Ja, Jb = np.asarray(Ja, np.float64), np.asarray(Jb, np.float64)
        for k in range(P - 1):
            Haa = Ja[k].T @ Ja[k]; Hbb = Jb[k].T @ Jb[k]; Hab = Ja[k].T @ Jb[k]
            H[6*k:6*k+6, 6*k:6*k+6] += Haa
            H[6*(k+1):6*(k+1)+6, 6*(k+1):6*(k+1)+6] += Hbb
            H[6*k:6*k+6, 6*(k+1):6*(k+1)+6] += Hab
            H[6*(k+1):6*(k+1)+6, 6*k:6*k+6] += Hab.T
        Jp_s = np.asarray(Jp_s, np.float64) * (w_s * v)[:, None, None]
        Jp_t = np.asarray(Jp_t, np.float64) * (w_t * v)[:, None, None]
        Jl_s = np.asarray(Jl_s, np.float64) * (w_s * v)[:, None, None]
        Jl_t = np.asarray(Jl_t, np.float64) * (w_t * v)[:, None, None]
        ki = np.asarray(prob.kp_i)
        kj = np.asarray(prob.kp_j)
        sig_pr = np.asarray(prob.lm_prior_sigmas)
        for k in range(K):
            for (idx, Jp, Jl) in ((ki[k], Jp_s[k], Jl_s[k]), (kj[k], Jp_t[k], Jl_t[k])):
                p6 = slice(6 * idx, 6 * idx + 6)
                l3 = slice(6 * P + 3 * k, 6 * P + 3 * k + 3)
                H[p6, p6] += Jp.T @ Jp
                H[l3, l3] += Jl.T @ Jl
                H[p6, l3] += Jp.T @ Jl
                H[l3, p6] += Jl.T @ Jp
            # landmark prior
            l3 = slice(6 * P + 3 * k, 6 * P + 3 * k + 3)
            H[l3, l3] += np.diag(v[k] / sig_pr**2)
            H[l3, l3] += 1e-6 * np.eye(3)
        # gauge: pose 0 pinned
        H[:6, :] = 0.0
        H[:, :6] = 0.0
        H[:6, :6] = np.eye(6)
        # chain jitter used by the marginal computation
        for p in range(P):
            H[6*p:6*p+6, 6*p:6*p+6] += 1e-6 * np.eye(6)
        Hinv = np.linalg.inv(H)
        ref = np.stack([Hinv[6*p:6*p+6, 6*p:6*p+6] for p in range(P)])
        ref[0] = 0.0
        scale = np.abs(ref).max()
        assert np.abs(cov - ref).max() < 1e-3 * scale, (
            np.abs(cov - ref).max(), scale)

    def test_k_cols_trim_matches_full(self):
        """Trimming the Woodbury width to the valid count must not change
        the marginals (padding tail carries exactly-zero columns)."""
        from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig
        from diasss_tpu.pairs import get_kps_pairs
        from diasss_tpu.pipeline import _overlap_pairs
        from diasss_tpu.solvers.full_ba import (
            ba_pose_marginals,
            build_ba_problem,
            solve_full_ba,
        )

        survey = make_survey(n_lines=2, n_pings=40, n_bins=256, n_landmarks=20,
                             n_tie_lines=0, seed=6)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes,
                           l.ground_ranges, l.annos)
            for l in survey.lines
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
        prob = build_ba_problem(frames, kps, pair_ids, ba,
                                PipelineConfig().pose_graph, None)
        poses, lms, _ = solve_full_ba(prob, ba, kp_cfg)
        n_valid = int(np.asarray(prob.kp_valid).sum())
        K = int(prob.kp_i.shape[0])
        if n_valid == K:
            pytest.skip("no padding tail at this scale")
        full = np.asarray(ba_pose_marginals(prob, poses, lms, ba, kp_cfg))
        trim = np.asarray(ba_pose_marginals(prob, poses, lms, ba, kp_cfg,
                                            k_cols=n_valid))
        np.testing.assert_allclose(trim, full, rtol=0, atol=1e-5)


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


def test_gather_geo_endpoints_device_matches_host(rng):
    """The device geo-endpoint gather (round-5 continuation: only (K, 2)
    rows cross the host link instead of full geo rasters) returns exactly
    the host-gather fallback's values, padding included."""
    from collections import namedtuple

    import jax.numpy as jnp

    from diasss_tpu.solvers.full_ba import _gather_geo_endpoints

    FG = namedtuple("FG", "geo")
    F, N, M = 3, 24, 16
    geos = rng.normal(size=(F, N, M, 2)).astype(np.float32)
    K = 37  # deliberately not a multiple of the 128 bucket
    fs = rng.integers(0, F, K).astype(np.int64)
    ft = rng.integers(0, F, K).astype(np.int64)
    ps = rng.integers(0, N, K).astype(np.int64)
    pt = rng.integers(0, N, K).astype(np.int64)
    bs = rng.integers(0, M, K).astype(np.int64)
    bt = rng.integers(0, M, K).astype(np.int64)

    dev_frames = [FG(jnp.asarray(g)) for g in geos]
    host_frames = [FG(g) for g in geos]  # numpy geo -> host fallback
    g1_d, g2_d = _gather_geo_endpoints(dev_frames, fs, ps, bs, ft, pt, bt)
    g1_h, g2_h = _gather_geo_endpoints(host_frames, fs, ps, bs, ft, pt, bt)
    assert g1_d.shape == (K, 2) and g2_d.shape == (K, 2)
    np.testing.assert_array_equal(np.asarray(g1_d), g1_h)
    np.testing.assert_array_equal(np.asarray(g2_d), g2_h)
    # and both equal the direct raster read
    np.testing.assert_array_equal(g1_h, geos[fs, ps, bs])
    np.testing.assert_array_equal(g2_h, geos[ft, pt, bt])
