"""Batched landmark triangulation from two sonar observations.

Replaces ``Optimizer::TriangulateOneLandmark`` (/root/reference/src/core/
optimizer.cpp:984-1021) and ``TriangulateLandmarks`` (optimizer.cpp:1024-1101):
per-landmark 3-dof LM problems, solved for the whole batch at once with ``vmap``.

``triangulate_one`` includes the xy-loose / z-tight point prior of the reference's
single-landmark variant (sigmas ``(10, 10, baseline/100)``, optimizer.cpp:1005-1008);
``triangulate_pair_only`` is the prior-free batch variant (optimizer.cpp:1071-1072).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import KeypointNoiseConfig, LoopClosureConfig
from ..factors.sss_point import kp_noise_sigmas, sss_point_residual
from ..geometry import se3


def _tria_residual(L, Tp_s, Tp_t, Ts_s, Ts_t, sr_s, sr_t, lm_prior, prior_sigmas, kp_cfg, with_prior):
    sig_s = kp_noise_sigmas(sr_s, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
    sig_t = kp_noise_sigmas(sr_t, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
    m_s = jnp.stack([sr_s, jnp.zeros_like(sr_s)], axis=-1)
    m_t = jnp.stack([sr_t, jnp.zeros_like(sr_t)], axis=-1)
    r1 = sss_point_residual(L, Tp_s, Ts_s, m_s) / sig_s
    r2 = sss_point_residual(L, Tp_t, Ts_t, m_t) / sig_t
    parts = [r1, r2]
    if with_prior:
        parts.append((L - lm_prior) / prior_sigmas)
    return jnp.concatenate(parts, axis=-1)


def _solve_one(Tp_s, Tp_t, Ts_s, Ts_t, sr_s, sr_t, lm_init, kp_cfg, lc_cfg, with_prior):
    from .lm import levenberg_marquardt

    if with_prior:
        baseline = jnp.linalg.norm(Tp_s.t[:2] - Tp_t.t[:2])
        prior_sigmas = jnp.stack(
            [
                jnp.asarray(lc_cfg.tria_xy_sigma, lm_init.dtype),
                jnp.asarray(lc_cfg.tria_xy_sigma, lm_init.dtype),
                jnp.maximum(baseline / lc_cfg.tria_z_baseline_div, 1e-6),
            ]
        )
    else:
        prior_sigmas = jnp.ones((3,), lm_init.dtype)

    def residual_fn(L):
        return _tria_residual(
            L, Tp_s, Tp_t, Ts_s, Ts_t, sr_s, sr_t, lm_init, prior_sigmas, kp_cfg, with_prior
        )

    def retract_fn(L, delta):
        return L + delta

    res = levenberg_marquardt(residual_fn, retract_fn, lm_init, n_dim=3, max_iters=lc_cfg.max_lm_iters)
    return res.x


@functools.partial(jax.jit, static_argnames=("kp_cfg", "lc_cfg", "with_prior"))
def triangulate_batch(
    Tp_s: se3.Pose3,
    Tp_t: se3.Pose3,
    Ts_s: se3.Pose3,
    Ts_t: se3.Pose3,
    sr_s: jnp.ndarray,
    sr_t: jnp.ndarray,
    lm_init: jnp.ndarray,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    lc_cfg: LoopClosureConfig = LoopClosureConfig(),
    with_prior: bool = True,
) -> jnp.ndarray:
    """Triangulate K landmarks at once; all args batched over the leading dim."""
    fn = jax.vmap(lambda a, b, c, d, e, f, g: _solve_one(a, b, c, d, e, f, g, kp_cfg, lc_cfg, with_prior))
    return fn(Tp_s, Tp_t, Ts_s, Ts_t, sr_s, sr_t, lm_init)
