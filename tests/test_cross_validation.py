"""Cross-validation of our solvers against scipy.optimize.least_squares.

GTSAM is not available in this environment, so the independent reference for
the nonlinear solves is scipy's trust-region reflective solver on the identical
residual, parameterized in the same tangent space.  Both optimizers must reach
the same cost basin (identical fixed points up to solver tolerance).
"""

import numpy as np
import pytest
from scipy.optimize import least_squares

import jax
import jax.numpy as jnp

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig, PoseGraphConfig
from diasss_tpu.geometry import se3, so3, sonar
from diasss_tpu.solvers.lc import loop_closing_tfs


def _np_exp(w):
    w = np.asarray(w, float)
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        return np.eye(3) + W
    return (
        np.eye(3)
        + np.sin(th) / th * W
        + (1 - np.cos(th)) / th**2 * (W @ W)
    )


def _np_se3_exp(xi):
    w, v = xi[:3], xi[3:]
    R = _np_exp(w)
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        V = np.eye(3) + 0.5 * W
    else:
        V = (
            np.eye(3)
            + (1 - np.cos(th)) / th**2 * W
            + (th - np.sin(th)) / th**3 * (W @ W)
        )
    return R, V @ v


def _np_log_so3(R):
    tr = np.trace(R)
    c = np.clip((tr - 1) / 2, -1, 1)
    th = np.arccos(c)
    if th < 1e-8:
        return np.zeros(3)
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


class TestLCvsScipy:
    def test_same_fixed_point(self):
        """Our batched LM and scipy reach the same cost on one LC problem."""
        # scene: along-track DR error (the informative case)
        import sys

        sys.path.insert(0, "tests")
        from test_lc import build_scene

        scene = build_scene(dr_err=(2.0, 0.0))
        scene.pop("gt_t")
        kp_cfg = KeypointNoiseConfig()
        cfg = LoopClosureConfig()
        res = loop_closing_tfs(**scene, kp_cfg=kp_cfg, cfg=cfg)

        # rebuild the identical residual in numpy
        pair = np.asarray(scene["pairs"][0])
        dr_s = np.asarray(scene["dr_s"])
        dr_t = np.asarray(scene["dr_t"])
        id_s, id_t = int(pair[0]), int(pair[3])
        sr_s, sr_t = float(pair[2]), float(pair[5])
        deg = np.pi / 180

        R_s = _np_exp(dr_s[id_s, :3])
        t_s = dr_s[id_s, 3:6].astype(float)
        # target has yaw pi -> compass flip applies (optimizer.cpp:697-703)
        R_t0 = _np_exp(dr_t[id_t, :3]) @ _np_exp([0, 0, np.pi])
        t_t0 = dr_t[id_t, 3:6].astype(float)
        # relative measured (between of flipped poses)
        R_rel = R_s.T @ R_t0
        t_rel = R_s.T @ (t_t0 - t_s)

        sig_odo = np.array(
            [0.1 * deg, 0.1 * deg, 0.5 * deg,
             max(abs(t_rel[0]) * 2, 1e-3), max(abs(t_rel[1]) * 0.1, 1e-3), 0.1]
        )
        sig_kp1 = np.array([0.1, sr_s * 0.1 * deg])
        sig_kp2 = np.array([0.1, sr_t * 0.1 * deg])

        geo_s = np.asarray(scene["geo_s"])
        geo_t = np.asarray(scene["geo_t"])
        alts = np.asarray(scene["alts_s"])
        g1 = geo_s[id_s, int(pair[1])]
        g2 = geo_t[id_t, int(pair[4])]
        L0 = np.array(
            [0.5 * (g1[0] + g2[0]), 0.5 * (g1[1] + g2[1]),
             0.5 * ((dr_s[id_s, 5] - alts[id_s]) + (dr_t[id_t, 5] - alts[id_t]))]
        )

        def residual(x):
            xi, L = x[:6], x[6:]
            dR, dt = _np_se3_exp(xi)
            R2 = R_t0 @ dR
            t2 = R_t0 @ dt + t_t0
            # between residual: Log(meas^-1 (X1^-1 X2))
            Rb = R_s.T @ R2
            tb = R_s.T @ (t2 - t_s)
            E = R_rel.T @ Rb
            et = R_rel.T @ (tb - t_rel)
            w = _np_log_so3(E)
            # V^-1 approximately I for small w (adequate at the optimum)
            r_odo = np.concatenate([w, et]) / sig_odo
            p1 = R_s.T @ (L - t_s)
            r1 = np.array([np.linalg.norm(p1) - sr_s, p1[0]]) / sig_kp1
            p2 = R2.T @ (L - t2)
            r2 = np.array([np.linalg.norm(p2) - sr_t, p2[0]]) / sig_kp2
            return np.concatenate([r_odo, r1, r2])

        x0 = np.concatenate([np.zeros(6), L0])
        out = least_squares(residual, x0, method="trf", xtol=1e-12, ftol=1e-12)
        scipy_cost = out.cost  # 0.5 * ||r||^2

        # our solver's final cost on the same problem
        # (recompute from outputs: measurement consistency residuals)
        ours_range_e = float(res.est_range_e[0])
        ours_plane_e = float(res.est_plane_e[0])
        # both optimizers must drive the sonar measurements to ~0
        scipy_r = residual(out.x)
        assert abs(scipy_r[6]) < 0.5 and abs(scipy_r[8]) < 0.5  # whitened ranges
        assert ours_range_e < 0.05
        assert ours_plane_e < 0.05

        # the relative-pose outputs must agree: compare implied target position
        dR, dt = _np_se3_exp(out.x[:6])
        t2_scipy = R_t0 @ dt + t_t0
        rel_ours = np.asarray(res.rel_pose.t[0])
        t2_ours = t_s + np.asarray(_np_exp(dr_s[id_s, :3])) @ rel_ours
        np.testing.assert_allclose(t2_ours, t2_scipy, atol=0.15)


def _tangent_resid_pose_graph(graph):
    """Residual over the (P,6) tangent at poses0 (gauge: row 0 pinned), plus
    its analytic Jacobian via jax — fed to scipy's INDEPENDENT optimizer."""
    from diasss_tpu.solvers.pose_graph import _whitened_residuals

    P = graph.poses0.t.shape[0]

    def resid_jnp(x):
        xi = x.reshape(P, 6).at[0].set(0.0)
        poses = se3.retract(graph.poses0, xi)
        r_odo, r_lc = _whitened_residuals(poses, graph)
        return jnp.concatenate([r_odo.ravel(), r_lc.ravel()])

    resid_j = jax.jit(resid_jnp)
    jac_j = jax.jit(jax.jacfwd(resid_jnp))

    def resid(x):
        return np.asarray(resid_j(jnp.asarray(x, jnp.float32)), float)

    def jac(x):
        return np.asarray(jac_j(jnp.asarray(x, jnp.float32)), float)

    return resid, jac, P


def _make_pose_graph(P=14, n_lc=3, seed=0):
    """Drifted chain + ground-truth-consistent loop closures."""
    from diasss_tpu.solvers.pose_graph import build_chain_graph

    rng = np.random.default_rng(seed)
    gt = np.zeros((P, 6), np.float32)
    gt[:, 3] = np.arange(P) * 1.0
    gt[:, 4] = 0.1 * np.sin(np.arange(P))
    dr = gt.copy()
    dr[:, 3] += np.cumsum(rng.normal(0, 0.05, P)).astype(np.float32)
    dr[:, 4] += np.cumsum(rng.normal(0, 0.05, P)).astype(np.float32)
    dr[0] = gt[0]

    gt_poses = se3.from_rodrigues_xyz(jnp.asarray(gt))
    li = np.asarray([1, P // 2, 2], np.int32)[:n_lc]
    lj = np.asarray([P - 2, P - 1, P // 2 + 1], np.int32)[:n_lc]
    lc_meas = se3.between(gt_poses[jnp.asarray(li)], gt_poses[jnp.asarray(lj)])
    lc_sigmas = np.full((n_lc, 6), 0.05, np.float32)
    graph = build_chain_graph(
        [dr], lc_i=li, lc_j=lj, lc_meas=lc_meas, lc_sigmas=lc_sigmas,
        lc_valid=np.ones(n_lc, bool), cfg=PoseGraphConfig(), noise_key=None,
    )
    return graph


class TestPoseGraphVsScipy:
    @pytest.mark.parametrize("precond", ["auto", "direct", "chain"])
    def test_same_fixed_point(self, precond):
        """solve_pose_graph and scipy TRF reach the same optimum of the
        identical whitened residual (SURVEY §7: iSAM2 semantics without iSAM2).
        Covers both the PCG path ("auto") and the exact direct Woodbury chain
        factorization ("direct") — same fixed point, zero CG iterations."""
        from diasss_tpu.solvers.pose_graph import graph_error, solve_pose_graph

        graph = _make_pose_graph()
        cfg = PoseGraphConfig(max_gn_iters=60, preconditioner=precond)
        poses_ours, info = solve_pose_graph(graph, cfg)
        if precond == "direct":
            # direct = exact step, zero CG iterations (unified convention)
            assert int(info.cg_iters_total) == 0
        cost_ours = float(info.error)

        resid, jac, P = _tangent_resid_pose_graph(graph)
        out = least_squares(resid, np.zeros(P * 6), jac=jac, method="trf",
                            xtol=1e-12, ftol=1e-12, gtol=1e-12)
        cost_scipy = float(out.cost)

        # identical fixed-point cost (both solve the same LSQ problem)
        assert cost_ours <= cost_scipy * 1.02 + 1e-6, (cost_ours, cost_scipy)
        assert cost_scipy <= cost_ours * 1.02 + 1e-6, (cost_ours, cost_scipy)

        # identical pose estimates
        xi = jnp.asarray(out.x.reshape(P, 6), jnp.float32).at[0].set(0.0)
        poses_scipy = se3.retract(graph.poses0, xi)
        np.testing.assert_allclose(
            np.asarray(poses_ours.t), np.asarray(poses_scipy.t), atol=2e-2
        )
        # and scipy's solution evaluated by OUR error function matches too
        assert abs(float(graph_error(poses_scipy, graph)) - cost_scipy) < 1e-3


def _make_ba_problem(seed=0):
    """Two anti-parallel survey lines over abeam landmarks, cross-track drift
    on line 2 — the case two-stage cannot observe but full BA must correct."""
    from diasss_tpu.solvers.full_ba import BAProblem
    from diasss_tpu.solvers.pose_graph import build_chain_graph

    rng = np.random.default_rng(seed)
    n = 10
    z_p = 0.0
    # GT line 1: along +x at y=0; GT line 2: along -x at y=18 (yaw pi)
    gt1 = np.zeros((n, 6), np.float32)
    gt1[:, 3] = np.arange(n) * 2.0
    gt2 = np.zeros((n, 6), np.float32)
    gt2[:, 2] = np.pi
    gt2[:, 3] = (n - 1 - np.arange(n)) * 2.0
    gt2[:, 4] = 18.0
    gt = np.concatenate([gt1, gt2])

    # landmarks abeam of ping k on both lines: (x_k, y_l, z)
    K = 6
    ks = rng.choice(np.arange(1, n - 1), K, replace=False)
    lx = ks * 2.0
    ly = np.full(K, 9.0)
    lz = np.full(K, -12.0)
    lms_gt = np.stack([lx, ly, lz], axis=1)

    def slant(px, py, pz, l):
        return float(np.sqrt((l[0] - px) ** 2 + (l[1] - py) ** 2 + (l[2] - pz) ** 2))

    sr_s = np.asarray([slant(gt1[k, 3], 0.0, z_p, l) for k, l in zip(ks, lms_gt)], np.float32)
    # line 2 pose at x_k is ping index (n-1-k)
    sr_t = np.asarray([slant(lx[i], 18.0, z_p, lms_gt[i]) for i in range(K)], np.float32)

    # DR: line 2 drifts cross-track gradually (the unobservable-by-two-stage
    # error); the drift accumulates along the chain like real DR error does,
    # so with a matched odometry noise model correcting it is the optimum
    dr = gt.copy()
    dr[n:, 4] += np.linspace(0.15, 1.5, n, dtype=np.float32)
    dr[n:, 3] += np.linspace(0.08, 0.8, n, dtype=np.float32)

    kp_i = jnp.asarray(ks, jnp.int32)
    kp_j = jnp.asarray(n + (n - 1 - ks), jnp.int32)

    chain = build_chain_graph(
        [dr[:n], dr[n:]],
        lc_i=np.zeros(1, np.int32), lc_j=np.ones(1, np.int32),
        lc_meas=se3.identity((1,), jnp.float32),
        lc_sigmas=np.ones((1, 6), np.float32), lc_valid=np.zeros(1, bool),
        # odometry noise scaled to the injected per-step drift (0.15 m/step):
        # a 10-ping test line compresses the drift of thousands of real pings
        cfg=PoseGraphConfig(odo_sigma_x=0.15, odo_sigma_y=0.15), noise_key=None,
    )
    # landmark inits: midpoints of the DR geo projections, flat-floor z
    lm0 = lms_gt + rng.normal(0, 0.5, lms_gt.shape)
    prob = BAProblem(
        poses0=chain.poses0,
        odo_meas=chain.odo_meas,
        odo_sigmas=chain.odo_sigmas,
        kp_i=kp_i,
        kp_j=kp_j,
        kp_sr_s=jnp.asarray(sr_s),
        kp_sr_t=jnp.asarray(sr_t),
        kp_valid=jnp.ones(K, bool),
        lm0=jnp.asarray(lm0, jnp.float32),
        lm_prior=jnp.asarray(lm0, jnp.float32),
        lm_prior_sigmas=jnp.asarray([50.0, 50.0, 1.5], jnp.float32),
    )
    return prob, gt, lms_gt


def _tangent_resid_ba(prob, kp_cfg):
    """Residual over (pose tangent, landmark) params — same whitening and
    gauge as solve_full_ba, huber off."""
    from diasss_tpu.factors.sss_point import kp_noise_sigmas, sss_point_residual
    from diasss_tpu.factors.between import between_residual

    P = prob.poses0.t.shape[0]
    K = prob.lm0.shape[0]
    Ts = se3.identity(dtype=jnp.float32)

    def resid_jnp(x):
        xi = x[: P * 6].reshape(P, 6).at[0].set(0.0)
        lms = prob.lm0 + x[P * 6 :].reshape(K, 3)
        poses = se3.retract(prob.poses0, xi)
        r_odo = jax.vmap(between_residual)(
            poses[jnp.arange(P - 1)], poses[jnp.arange(1, P)], prob.odo_meas
        ) / prob.odo_sigmas

        def kp_res(pose, lm, sr):
            m = jnp.stack([sr, jnp.zeros_like(sr)])
            sig = kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
            return sss_point_residual(lm, pose, Ts, m) / sig

        r_s = jax.vmap(kp_res)(poses[prob.kp_i], lms, prob.kp_sr_s)
        r_t = jax.vmap(kp_res)(poses[prob.kp_j], lms, prob.kp_sr_t)
        r_pr = (lms - prob.lm_prior) / prob.lm_prior_sigmas
        return jnp.concatenate([r_odo.ravel(), r_s.ravel(), r_t.ravel(), r_pr.ravel()])

    resid_j = jax.jit(resid_jnp)
    jac_j = jax.jit(jax.jacfwd(resid_jnp))

    def resid(x):
        return np.asarray(resid_j(jnp.asarray(x, jnp.float32)), float)

    def jac(x):
        return np.asarray(jac_j(jnp.asarray(x, jnp.float32)), float)

    return resid, jac, P, K


class TestFullBAVsScipy:
    @pytest.mark.parametrize("precond", ["auto", "direct", "chain"])
    def test_same_fixed_point(self, precond):
        """solve_full_ba and scipy TRF agree on the joint pose+landmark optimum,
        and both improve on DR identically.  Covers both the PCG path ("auto")
        and the exact direct Woodbury step of the Schur-reduced system
        ("direct", full_ba.py:_direct_ba_step) — same fixed point, zero CG."""
        from diasss_tpu.config import FullBAConfig
        from diasss_tpu.solvers.full_ba import _ba_error, solve_full_ba

        prob, gt, lms_gt = _make_ba_problem()
        kp_cfg = KeypointNoiseConfig()
        cfg = FullBAConfig(huber_delta=0.0, max_iters=60, preconditioner=precond)
        poses_ours, lms_ours, info = solve_full_ba(prob, cfg, kp_cfg)
        if precond == "direct":
            # the direct path runs zero CG iterations by construction
            assert int(info.cg_iters_total) == 0
        cost_ours = float(info.error)

        resid, jac, P, K = _tangent_resid_ba(prob, kp_cfg)
        out = least_squares(resid, np.zeros(P * 6 + K * 3), jac=jac, method="trf",
                            xtol=1e-14, ftol=1e-14, gtol=1e-14)
        cost_scipy = float(out.cost)
        assert cost_ours <= cost_scipy * 1.05 + 1e-5, (cost_ours, cost_scipy)
        assert cost_scipy <= cost_ours * 1.05 + 1e-5, (cost_ours, cost_scipy)

        xi = jnp.asarray(out.x[: P * 6].reshape(P, 6), jnp.float32).at[0].set(0.0)
        poses_scipy = se3.retract(prob.poses0, xi)
        np.testing.assert_allclose(
            np.asarray(poses_ours.t), np.asarray(poses_scipy.t), atol=0.1
        )
        # both must improve on DR by the SAME amount (parallel-line range-only
        # geometry leaves a partial y/z gauge freedom, so full recovery is not
        # the optimum here — crossing-line recovery is covered in test_full_ba)
        err_dr = np.abs(np.asarray(prob.poses0.t)[10:, 1] - gt[10:, 4]).mean()
        err_ours = np.abs(np.asarray(poses_ours.t)[10:, 1] - gt[10:, 4]).mean()
        err_scipy = np.abs(np.asarray(poses_scipy.t)[10:, 1] - gt[10:, 4]).mean()
        assert err_dr > 0.8
        assert err_ours < err_dr
        assert abs(err_ours - err_scipy) < 0.1

    def test_marginal_variances_vs_dense_inverse(self):
        """ba_pose_marginals (EXACT: Takahashi selected inversion + Woodbury
        correction — round 5, replacing the Hutchinson estimator) against the
        dense marginal covariance diag of the full GN Hessian built by an
        INDEPENDENT autodiff linearization (landmarks marginalized by full
        inversion)."""
        from diasss_tpu.config import FullBAConfig
        from diasss_tpu.solvers.full_ba import ba_pose_marginals, solve_full_ba

        prob, _, _ = _make_ba_problem()
        kp_cfg = KeypointNoiseConfig()
        cfg = FullBAConfig(huber_delta=0.0, max_iters=60)
        poses, lms, _ = solve_full_ba(prob, cfg, kp_cfg)

        cov6 = np.asarray(ba_pose_marginals(prob, poses, lms, cfg, kp_cfg))
        var = cov6[:, np.arange(6), np.arange(6)]

        # dense reference: full GN Hessian at the solution, invert, marginalize.
        # prob_at.lm0=lms / poses0=poses so x=0 IS the solution; lm_prior keeps
        # the original centers (prior Jacobian is center-independent anyway)
        prob_at = prob._replace(poses0=poses, lm0=lms)
        resid2, jac2, P, K = _tangent_resid_ba(prob_at, kp_cfg)
        J = jac2(np.zeros(P * 6 + K * 3))
        H = J.T @ J
        # gauge: pose 0 fixed -> delete its 6 rows/cols
        keep = np.r_[np.arange(6, P * 6), np.arange(P * 6, P * 6 + K * 3)]
        H = H[np.ix_(keep, keep)]
        cov = np.linalg.inv(H + 1e-8 * np.eye(len(H)))
        var_ref = np.zeros((P, 6))
        var_ref[1:] = np.diag(cov)[: (P - 1) * 6].reshape(P - 1, 6)

        # exact computation, f32 solver vs f64 dense reference; compare the
        # entries f32 can resolve (rotation variances with the reference's
        # 0.001-deg odometry sigmas are ~1e-9 — at f32 resolution)
        np.testing.assert_allclose(var[0], 0.0)
        m = var_ref > 1e-6
        assert m.sum() >= 40  # all translation entries of poses 1..P-1
        rel = np.abs(var[m] - var_ref[m]) / var_ref[m]
        assert np.median(rel) < 0.02, np.median(rel)
        assert rel.max() < 0.1, rel.max()
