"""Factor residual/Jacobian tests and batched LM solver tests.

Jacobian ground truth is the reference's hand-derived formulas
(SSSpointfactor.cpp:19-76) — we check autodiff reproduces them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig
from diasss_tpu.factors import between_residual, prior_residual, sss_point_residual
from diasss_tpu.geometry import se3, so3
from diasss_tpu.solvers.lm import levenberg_marquardt, marginal_covariance
from diasss_tpu.solvers.triangulate import triangulate_batch


def rand_pose(rng, scale=1.0):
    return se3.expmap(jnp.asarray(rng.normal(size=(6,)) * scale, jnp.float32))


class TestSssPointFactor:
    def test_residual_value(self, rng):
        """Residual = [|p_s| - range, p_s.x] with p_s = Ts^-1 T^-1 p."""
        T = rand_pose(rng)
        Ts = rand_pose(rng, 0.1)
        p = jnp.asarray(rng.normal(size=(3,)) * 5, jnp.float32)
        m = jnp.asarray([7.0, 0.0], jnp.float32)
        r = sss_point_residual(p, T, Ts, m)
        p_s = np.asarray(se3.transform_to(Ts, se3.transform_to(T, p)))
        np.testing.assert_allclose(
            np.asarray(r), [np.linalg.norm(p_s) - 7.0, p_s[0]], atol=1e-5
        )

    def test_point_jacobian_matches_reference_formula(self, rng):
        """autodiff dr/dp == H1 of SSSpointfactor.cpp:19-26."""
        T = rand_pose(rng)
        Ts = rand_pose(rng, 0.1)
        p = jnp.asarray(rng.normal(size=(3,)) * 5, jnp.float32)
        m = jnp.asarray([7.0, 0.0], jnp.float32)
        J_auto = jax.jacfwd(lambda q: sss_point_residual(q, T, Ts, m))(p)
        # reference formula: J_s_kp = Ts_R^-1 * T_R^-1
        J_rot = np.asarray(Ts.R).T @ np.asarray(T.R).T
        p_s = np.asarray(se3.transform_to(Ts, se3.transform_to(T, p)))
        row1 = p_s @ J_rot / np.linalg.norm(p_s)
        row2 = np.array([1.0, 0.0, 0.0]) @ J_rot
        np.testing.assert_allclose(np.asarray(J_auto), np.stack([row1, row2]), atol=1e-4)

    def test_pose_jacobian_rotation_block_matches_reference(self, rng):
        """autodiff dr/dxi vs H2 'plan_a' of SSSpointfactor.cpp:28-76.

        The rotation block matches the reference formula
        (``block_r = Ts_R^-1 hat(p_m)``).  The reference's translation block
        ``block_t = -(Ts_R^-1 T_R^-1)`` (SSSpointfactor.cpp:37) carries an extra
        ``T_R^-1`` versus the exact derivative for GTSAM's expmap retraction
        (which is ``-Ts_R^-1``): a hand-derivation quirk in the reference that only
        perturbs its LM step direction, not the fixed point.  We verify autodiff
        gives the exact Jacobian: rotation block == reference, translation block
        == ``-Ts_R^-1``.
        """
        T = rand_pose(rng)
        Ts = rand_pose(rng, 0.1)
        p = jnp.asarray(rng.normal(size=(3,)) * 5, jnp.float32)
        m = jnp.asarray([7.0, 0.0], jnp.float32)
        J_auto = jax.jacfwd(
            lambda xi: sss_point_residual(p, se3.retract(T, xi), Ts, m)
        )(jnp.zeros(6, jnp.float32))
        Ts_Rinv = np.asarray(Ts.R).T
        p_m = np.asarray(se3.transform_to(T, p))
        block_r = Ts_Rinv @ np.asarray(so3.hat(jnp.asarray(p_m)))  # == reference
        block_t = -Ts_Rinv  # exact (reference adds an extra T_R^-1 here)
        J_pose = np.concatenate([block_r, block_t], axis=1)
        p_s = np.asarray(se3.transform_to(Ts, se3.transform_to(T, p)))
        row1 = p_s @ J_pose / np.linalg.norm(p_s)
        row2 = np.array([1.0, 0.0, 0.0]) @ J_pose
        np.testing.assert_allclose(np.asarray(J_auto), np.stack([row1, row2]), atol=1e-3)


class TestBetweenPrior:
    def test_between_zero_at_truth(self, rng):
        a, b = rand_pose(rng), rand_pose(rng)
        np.testing.assert_allclose(
            np.asarray(between_residual(a, b, se3.between(a, b))), np.zeros(6), atol=1e-5
        )

    def test_prior_zero_at_truth(self, rng):
        a = rand_pose(rng)
        np.testing.assert_allclose(np.asarray(prior_residual(a, a)), np.zeros(6), atol=1e-6)

    def test_between_local_linearization(self, rng):
        """residual(retract(x2, xi)) ~ residual + J xi for small xi."""
        a, b = rand_pose(rng), rand_pose(rng)
        m = se3.compose(se3.between(a, b), se3.expmap(jnp.asarray([0.01] * 6, jnp.float32)))
        f = lambda xi: between_residual(a, se3.retract(b, xi), m)
        J = jax.jacfwd(f)(jnp.zeros(6, jnp.float32))
        xi = jnp.asarray(rng.normal(size=(6,)) * 1e-3, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(f(xi)), np.asarray(f(jnp.zeros(6)) + J @ xi), atol=1e-5
        )


class TestLM:
    def test_converges_linear_problem(self):
        """Quadratic bowl: LM == least squares."""
        A = jnp.asarray([[2.0, 0.3], [0.1, 1.0], [0.5, 0.5]], jnp.float32)
        b = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
        res = levenberg_marquardt(lambda x: A @ x - b, lambda x, d: x + d, jnp.zeros(2, jnp.float32), 2)
        x_ls = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(res.x), x_ls, atol=1e-5)
        assert bool(res.converged)

    def test_vmapped_rosenbrock(self):
        """Batch of shifted Rosenbrock-style problems all converge."""

        def make_res(shift):
            def r(x):
                return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0] + shift])

            return r

        shifts = jnp.linspace(-0.3, 0.3, 8)

        def solve(s):
            return levenberg_marquardt(
                lambda x: jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0] + s]),
                lambda x, d: x + d,
                jnp.zeros(2, jnp.float32),
                2,
                max_iters=60,
            ).x

        xs = jax.vmap(solve)(shifts)
        np.testing.assert_allclose(np.asarray(xs[:, 0]), 1.0 + np.asarray(shifts), atol=1e-3)

    def test_marginal_covariance_linear(self):
        """(H^-1) block equals dense inverse block."""
        rng = np.random.default_rng(3)
        J = jnp.asarray(rng.normal(size=(20, 5)), jnp.float32)
        H = J.T @ J + 0.1 * jnp.eye(5)
        cov = marginal_covariance(H, slice(1, 3))
        full = np.linalg.inv(np.asarray(H))
        np.testing.assert_allclose(np.asarray(cov), full[1:3, 1:3], rtol=2e-3, atol=1e-5)


class TestTriangulate:
    def test_recovers_known_landmark(self, rng):
        """Two sonar observations of a known point recover it (z fixed by prior)."""
        kp_cfg = KeypointNoiseConfig()
        lc_cfg = LoopClosureConfig()
        K = 4
        # poses: two parallel track points 30 m apart at z = 0, looking down
        Tp_s = se3.Pose3(
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
            t=jnp.asarray(rng.normal(size=(K, 3)) * jnp.asarray([5, 5, 0.0]), jnp.float32),
        )
        Tp_t = se3.Pose3(
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
            t=Tp_s.t + jnp.asarray([0.0, 30.0, 0.0], jnp.float32),
        )
        Ts = se3.identity((K,), jnp.float32)
        # true landmark: between the tracks, 15 m deep
        L_true = 0.5 * (Tp_s.t + Tp_t.t) + jnp.asarray([0.0, 3.0, -15.0], jnp.float32)
        sr_s = jnp.linalg.norm(L_true - Tp_s.t, axis=-1)
        sr_t = jnp.linalg.norm(L_true - Tp_t.t, axis=-1)
        L0 = L_true + jnp.asarray(rng.normal(size=(K, 3)), jnp.float32) * jnp.asarray([2.0, 2.0, 0.05])
        L_est = triangulate_batch(Tp_s, Tp_t, Ts, Ts, sr_s, sr_t, L0, kp_cfg, lc_cfg, True)
        # ranges from both poses must be consistent at the optimum
        r_s = jnp.linalg.norm(L_est - Tp_s.t, axis=-1)
        r_t = jnp.linalg.norm(L_est - Tp_t.t, axis=-1)
        np.testing.assert_allclose(np.asarray(r_s), np.asarray(sr_s), atol=0.05)
        np.testing.assert_allclose(np.asarray(r_t), np.asarray(sr_t), atol=0.05)
