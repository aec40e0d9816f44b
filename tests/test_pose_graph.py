"""Global pose-graph solver tests: recovers the DR chain, applies loop closures."""

import jax
import jax.numpy as jnp
import numpy as np

from diasss_tpu.config import PoseGraphConfig
from diasss_tpu.geometry import se3
from diasss_tpu.solvers.pose_graph import (
    PoseGraph,
    build_chain_graph,
    graph_error,
    solve_pose_graph,
)


def _no_lc():
    return dict(
        lc_i=np.zeros(1, np.int32),
        lc_j=np.ones(1, np.int32),
        lc_meas=se3.identity((1,), jnp.float32),
        lc_sigmas=np.ones((1, 6), np.float32),
        lc_valid=np.zeros(1, bool),
    )


def _ate(poses, gt_rows):
    gt = se3.from_rodrigues_xyz(jnp.asarray(gt_rows, jnp.float32))
    d = np.asarray(poses.t) - np.asarray(gt.t)
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def make_chain(n=120, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, 6))
    rows[:, 2] = 0.002 * rng.normal(size=n)
    rows[:, 3] = np.arange(n) * 0.5
    rows[:, 4] = 0.05 * rng.normal(size=n)
    return rows


class TestChainOnly:
    def test_noisy_initials_return_to_dr_chain(self):
        rows = make_chain()
        g = build_chain_graph([rows], **_no_lc(), noise_key=jax.random.PRNGKey(1))
        # sanity: the noise really perturbed the initials
        dr = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        assert _ate(g.poses0, rows) > 0.3
        poses, info = solve_pose_graph(g, PoseGraphConfig())
        assert float(info.error) < float(info.error0) * 1e-3
        # exact odometry + fixed first pose => exact DR chain recovery
        np.testing.assert_allclose(np.asarray(poses.t), np.asarray(dr.t), atol=2e-2)

    def test_zero_noise_is_fixed_point(self):
        rows = make_chain()
        g = build_chain_graph([rows], **_no_lc(), noise_key=None)
        poses, info = solve_pose_graph(g, PoseGraphConfig())
        np.testing.assert_allclose(np.asarray(poses.t), np.asarray(g.poses0.t), atol=1e-3)


class TestWithLoopClosures:
    def test_lc_corrects_drift(self):
        """DR drifts; loop closures to ground truth pull the chain back."""
        n = 200
        rng = np.random.default_rng(2)
        gt = make_chain(n, seed=3)
        drift = np.cumsum(rng.normal(0, 1, (n, 2)) * 0.01 + 0.01, axis=0)
        dr = gt.copy()
        dr[:, 3] += drift[:, 0]
        dr[:, 4] += drift[:, 1]

        gt_poses = se3.from_rodrigues_xyz(jnp.asarray(gt, jnp.float32))
        # loop closures: every 25th pose pair (i, i+50) with GT relative pose
        lc_i = np.arange(10, n - 50, 25, dtype=np.int32)
        lc_j = (lc_i + 50).astype(np.int32)
        meas = se3.between(gt_poses[jnp.asarray(lc_i)], gt_poses[jnp.asarray(lc_j)])
        sig = np.full((len(lc_i), 6), 0.05, np.float32)

        g = build_chain_graph(
            [dr],
            lc_i=lc_i,
            lc_j=lc_j,
            lc_meas=meas,
            lc_sigmas=sig,
            lc_valid=np.ones(len(lc_i), bool),
            noise_key=None,
        )
        poses, info = solve_pose_graph(g, PoseGraphConfig())
        ate_dr = _ate(g.poses0, gt)
        ate_est = _ate(poses, gt)
        assert ate_est < ate_dr * 0.7, (ate_dr, ate_est)

    def test_invalid_lc_slots_are_inert(self):
        rows = make_chain()
        base = build_chain_graph([rows], **_no_lc(), noise_key=None)
        # same graph but with garbage measurements in invalid slots
        garbage = se3.expmap(jnp.ones((1, 6), jnp.float32))
        g2 = base._replace(lc_meas=garbage)
        e1 = float(graph_error(base.poses0, base))
        e2 = float(graph_error(g2.poses0, g2))
        assert e1 == e2

    def test_multi_frame_chain_links(self):
        """Concatenated frames form one chain (cross-frame odometry links)."""
        rows1 = make_chain(60, seed=5)
        rows2 = make_chain(60, seed=6)
        rows2[:, 3] += 40.0
        g = build_chain_graph([rows1, rows2], **_no_lc(), noise_key=jax.random.PRNGKey(4))
        poses, info = solve_pose_graph(g, PoseGraphConfig())
        dr = se3.from_rodrigues_xyz(jnp.asarray(np.concatenate([rows1, rows2]), jnp.float32))
        np.testing.assert_allclose(np.asarray(poses.t), np.asarray(dr.t), atol=3e-2)


def _drifted_lc_graph(n=120, n_lc=13, seed=5):
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, 6))
    rows[:, 3] = np.arange(n) * 0.5
    rows[:, 4] = 0.05 * rng.normal(size=n)
    gt = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
    lc_i = np.arange(2, n - 40, max((n - 42) // n_lc, 1), dtype=np.int32)[:n_lc]
    lc_j = (lc_i + 30).astype(np.int32)
    meas = se3.between(gt[jnp.asarray(lc_i)], gt[jnp.asarray(lc_j)])
    return build_chain_graph(
        [rows], lc_i=lc_i, lc_j=lc_j, lc_meas=meas,
        lc_sigmas=np.full((len(lc_i), 6), 0.05, np.float32),
        lc_valid=np.ones(len(lc_i), bool),
        noise_key=jax.random.PRNGKey(1),
    )


class TestDirectSolver:
    """preconditioner="direct": exact damped step by chain factorization +
    Woodbury over the LC columns — zero CG, same fixed point as PCG."""

    def test_same_fixed_point_as_pcg(self):
        import dataclasses

        g = _drifted_lc_graph()
        cfg_p = PoseGraphConfig(preconditioner="tridiag", tridiag_segment=32)
        cfg_d = dataclasses.replace(cfg_p, preconditioner="direct")
        p_p, i_p = solve_pose_graph(g, cfg_p)
        p_d, i_d = solve_pose_graph(g, cfg_d)
        np.testing.assert_allclose(np.asarray(p_d.t), np.asarray(p_p.t), atol=1e-3)
        assert abs(float(i_d.error) - float(i_p.error)) < 1e-2 * max(float(i_p.error), 1.0)
        # exact step: no CG iterations (unified direct convention)
        assert int(i_d.cg_iters_total) == 0

    def test_chain_only_no_lc(self):
        """L=0 branch: pure block-tridiagonal solve, recovers the DR chain."""
        rows = make_chain()
        g = build_chain_graph([rows], **_no_lc(), noise_key=jax.random.PRNGKey(1))
        # strip the placeholder LC slot entirely to hit the L_lc == 0 branch
        from diasss_tpu.geometry import se3 as _se3

        g0 = g._replace(
            lc_i=jnp.zeros((0,), jnp.int32), lc_j=jnp.zeros((0,), jnp.int32),
            lc_meas=_se3.identity((0,), jnp.float32),
            lc_sigmas=jnp.ones((0, 6), jnp.float32),
            lc_valid=jnp.zeros((0,), bool),
        )
        poses, info = solve_pose_graph(g0, PoseGraphConfig(preconditioner="direct"))
        dr = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        assert float(info.error) < float(info.error0) * 1e-3
        np.testing.assert_allclose(np.asarray(poses.t), np.asarray(dr.t), atol=2e-2)

    def test_invalid_lc_slots_inert(self):
        """Padded (valid=False) LC slots must not perturb the direct step —
        their zeroed Jacobian columns add exact zeros to V and identity rows
        to the capacitance."""
        g = _drifted_lc_graph()
        # append garbage invalid slots
        from diasss_tpu.geometry import se3 as _se3

        pad = 7
        garbage = _se3.expmap(jnp.ones((pad, 6), jnp.float32))
        gpad = g._replace(
            lc_i=jnp.concatenate([g.lc_i, jnp.full((pad,), 3, jnp.int32)]),
            lc_j=jnp.concatenate([g.lc_j, jnp.full((pad,), 60, jnp.int32)]),
            lc_meas=jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), g.lc_meas, garbage
            ),
            lc_sigmas=jnp.concatenate([g.lc_sigmas, jnp.full((pad, 6), 1e-3)]),
            lc_valid=jnp.concatenate([g.lc_valid, jnp.zeros((pad,), bool)]),
        )
        cfg = PoseGraphConfig(preconditioner="direct")
        p1, i1 = solve_pose_graph(g, cfg)
        p2, i2 = solve_pose_graph(gpad, cfg)
        np.testing.assert_allclose(np.asarray(p2.t), np.asarray(p1.t), atol=1e-4)


class TestDenseSegPreconditioner:
    """preconditioner="dense_seg" (the TPU-auto choice) must reach the same
    optimum as "tridiag" — it is the identical operator in MXU form."""

    def test_same_fixed_point_as_tridiag(self):
        import dataclasses

        from diasss_tpu.geometry import se3 as _se3

        rng = np.random.default_rng(5)
        n = 120
        rows = np.zeros((n, 6))
        rows[:, 3] = np.arange(n) * 0.5
        rows[:, 4] = 0.05 * rng.normal(size=n)
        gt = _se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        lc_i = np.arange(2, n - 40, 9, dtype=np.int32)
        lc_j = (lc_i + 30).astype(np.int32)
        meas = _se3.between(gt[jnp.asarray(lc_i)], gt[jnp.asarray(lc_j)])
        g = build_chain_graph(
            [rows], lc_i=lc_i, lc_j=lc_j, lc_meas=meas,
            lc_sigmas=np.full((len(lc_i), 6), 0.05, np.float32),
            lc_valid=np.ones(len(lc_i), bool),
            noise_key=jax.random.PRNGKey(1),
        )
        cfg_t = PoseGraphConfig(max_gn_iters=10, preconditioner="tridiag", tridiag_segment=32)
        cfg_d = dataclasses.replace(cfg_t, preconditioner="dense_seg")
        cfg_c = dataclasses.replace(cfg_t, preconditioner="chain")
        p_t, i_t = solve_pose_graph(g, cfg_t)
        p_d, i_d = solve_pose_graph(g, cfg_d)
        np.testing.assert_allclose(np.asarray(p_d.t), np.asarray(p_t.t), atol=1e-3)
        assert abs(float(i_d.error) - float(i_t.error)) < 1e-2 * max(float(i_t.error), 1.0)
        # the round-5 EXACT chain preconditioner reaches the same optimum
        # with no more CG iterations than the segmented approximation
        p_c, i_c = solve_pose_graph(g, cfg_c)
        np.testing.assert_allclose(np.asarray(p_c.t), np.asarray(p_t.t), atol=1e-3)
        assert int(i_c.cg_iters_total) <= int(i_d.cg_iters_total), (
            int(i_c.cg_iters_total), int(i_d.cg_iters_total))


class TestDampingSweep:
    """Opt-in lam_sweep_factors K>1: each LM trial solves the exact step for
    K damping candidates in one K-wide vmapped factorization and keeps the
    best improving one.  Same fixed point as the default single-lam schedule
    (kept opt-in: at bench scale the K-wide CR costs more than the serial
    trials it saves — see PoseGraphConfig.lam_sweep_factors)."""

    def test_sweep_matches_single_lam_fixed_point(self):
        import dataclasses

        g = _drifted_lc_graph()
        cfg_1 = PoseGraphConfig(preconditioner="direct")
        cfg_k = dataclasses.replace(cfg_1, lam_sweep_factors=(0.01, 0.1, 1.0, 10.0))
        p_1, i_1 = solve_pose_graph(g, cfg_1)
        p_k, i_k = solve_pose_graph(g, cfg_k)
        np.testing.assert_allclose(np.asarray(p_k.t), np.asarray(p_1.t), atol=1e-3)
        assert abs(float(i_k.error) - float(i_1.error)) < 1e-2 * max(float(i_1.error), 1.0)

    def test_sweep_chain_only(self):
        """L=0 branch under the sweep."""
        rows = make_chain()
        g = build_chain_graph([rows], **_no_lc(), noise_key=jax.random.PRNGKey(1))
        from diasss_tpu.geometry import se3 as _se3

        g0 = g._replace(
            lc_i=jnp.zeros((0,), jnp.int32), lc_j=jnp.zeros((0,), jnp.int32),
            lc_meas=_se3.identity((0,), jnp.float32),
            lc_sigmas=jnp.ones((0, 6), jnp.float32),
            lc_valid=jnp.zeros((0,), bool),
        )
        cfg = PoseGraphConfig(preconditioner="direct",
                              lam_sweep_factors=(0.1, 1.0, 10.0))
        poses, info = solve_pose_graph(g0, cfg)
        assert float(info.error) < float(info.error0) * 1e-3


class TestCoarseInit:
    """Opt-in coarse_init_stride > 1: solve the graph restricted to every
    stride-th pose, prolongate along the clean DR chain, start the fine LM
    there.  Pins (a) same fixed point as the plain solve, (b) the coarse
    init never starts worse than DR (err_init <= err0 by the adopt-gate),
    (c) the DR-chain scan / LC conjugation / prolongation machinery against
    regression (ADVICE r3)."""

    def test_same_fixed_point_and_adopt_gate(self):
        import dataclasses

        from diasss_tpu.solvers.pose_graph import (
            _coarse_graph_and_chain,
            _prolongate,
            graph_error,
        )

        g = _drifted_lc_graph()
        cfg_0 = PoseGraphConfig(preconditioner="direct")
        cfg_c = dataclasses.replace(cfg_0, coarse_init_stride=4)
        p_0, i_0 = solve_pose_graph(g, cfg_0)
        p_c, i_c = solve_pose_graph(g, cfg_c)
        np.testing.assert_allclose(np.asarray(p_c.t), np.asarray(p_0.t), atol=2e-3)
        assert abs(float(i_c.error) - float(i_0.error)) < 1e-2 * max(float(i_0.error), 1.0)

        # the coarse-informed init itself must lower the initial error on a
        # drifted graph (this is the claim that justifies the feature)
        cgraph, chain = _coarse_graph_and_chain(g, 4)
        cposes, _ = solve_pose_graph(cgraph, cfg_0, allow_coarse_init=False)
        cand = _prolongate(cposes, chain, 4)
        cand = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[:1], b[1:]], axis=0), g.poses0, cand
        )
        err0 = float(graph_error(g.poses0, g))
        err_cand = float(graph_error(cand, g))
        assert np.isfinite(err_cand)
        assert err_cand < err0, (err_cand, err0)

    def test_dr_chain_matches_cumulative_compose(self):
        from diasss_tpu.solvers.pose_graph import _dr_chain

        g = _drifted_lc_graph(n=17)
        chain = _dr_chain(g)
        # serial reference composition
        cur = jax.tree_util.tree_map(lambda a: a[0], g.poses0)
        for k in range(1, 17):
            step = jax.tree_util.tree_map(lambda a: a[k - 1], g.odo_meas)
            cur = se3.compose(cur, step)
            np.testing.assert_allclose(
                np.asarray(chain.t[k]), np.asarray(cur.t), atol=1e-4
            )

    def test_prolongate_identity_at_anchors(self):
        from diasss_tpu.solvers.pose_graph import _coarse_graph_and_chain, _prolongate

        g = _drifted_lc_graph(n=64)
        cgraph, chain = _coarse_graph_and_chain(g, 8)
        # prolongating the coarse INITIAL values along the chain reproduces
        # the chain at anchors (coarse0 = chain[anchors] by construction)
        fine = _prolongate(cgraph.poses0, chain, 8)
        np.testing.assert_allclose(
            np.asarray(fine.t[::8]), np.asarray(chain.t[::8]), atol=1e-4
        )


class TestPoseGraphMarginals:
    def test_exact_vs_dense_inverse(self):
        """pg_pose_marginals (Takahashi + LC Woodbury, round 5) must equal
        the pose blocks of the dense inverse of the gauge-fixed GN Hessian
        assembled from the same linearization."""
        import dataclasses

        from diasss_tpu.geometry import se3 as _se3
        from diasss_tpu.solvers.pose_graph import (
            _build_normal_terms,
            pg_pose_marginals,
        )

        rng = np.random.default_rng(9)
        n = 60
        rows = np.zeros((n, 6))
        rows[:, 3] = np.arange(n) * 0.5
        rows[:, 4] = 0.05 * rng.normal(size=n)
        gt = _se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        lc_i = np.arange(2, n - 25, 7, dtype=np.int32)
        lc_j = (lc_i + 20).astype(np.int32)
        meas = _se3.between(gt[jnp.asarray(lc_i)], gt[jnp.asarray(lc_j)])
        g = build_chain_graph(
            [rows], lc_i=lc_i, lc_j=lc_j, lc_meas=meas,
            lc_sigmas=np.full((len(lc_i), 6), 0.05, np.float32),
            lc_valid=np.ones(len(lc_i), bool),
            noise_key=jax.random.PRNGKey(2),
        )
        poses, _ = solve_pose_graph(g, PoseGraphConfig(max_gn_iters=15))
        cov = np.asarray(pg_pose_marginals(g, poses))
        P = n
        assert cov.shape == (P, 6, 6)
        assert np.allclose(cov[0], 0.0)

        # dense reference from the SAME whitened Jacobians
        idx_i, idx_j, _, Ji, Jj = _build_normal_terms(poses, g)
        Ji, Jj = np.asarray(Ji, np.float64), np.asarray(Jj, np.float64)
        ii, jj = np.asarray(idx_i), np.asarray(idx_j)
        H = np.zeros((6 * P, 6 * P))
        for f in range(len(ii)):
            a = slice(6 * ii[f], 6 * ii[f] + 6)
            b = slice(6 * jj[f], 6 * jj[f] + 6)
            H[a, a] += Ji[f].T @ Ji[f]
            H[b, b] += Jj[f].T @ Jj[f]
            H[a, b] += Ji[f].T @ Jj[f]
            H[b, a] += Jj[f].T @ Ji[f]
        H[:6, :] = 0.0
        H[:, :6] = 0.0
        H[:6, :6] = np.eye(6)
        for p in range(P):
            H[6 * p : 6 * p + 6, 6 * p : 6 * p + 6] += 1e-6 * np.eye(6)
        Hinv = np.linalg.inv(H)
        ref = np.stack([Hinv[6 * p : 6 * p + 6, 6 * p : 6 * p + 6]
                        for p in range(P)])
        ref[0] = 0.0
        scale = np.abs(ref).max()
        assert np.abs(cov - ref).max() < 1e-3 * scale, (
            np.abs(cov - ref).max(), scale)
        # loop closures must REDUCE uncertainty vs the chain alone
        g_nolc = g._replace(lc_valid=jnp.zeros_like(g.lc_valid))
        cov_nolc = np.asarray(pg_pose_marginals(g_nolc, poses))
        assert (np.trace(cov_nolc[-1]) > np.trace(cov[-1]))
