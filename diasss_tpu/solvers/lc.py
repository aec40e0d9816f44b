"""Batched loop-closure transform estimation.

Replaces ``Optimizer::LoopClosingTFs`` (/root/reference/src/core/optimizer.cpp:
641-982) — the reference's process-level hot spot, which solves one 15-dof GTSAM
LM problem *per keypoint correspondence, serially*.  Here the whole correspondence
batch is one ``vmap``'d LM solve: every iteration is a batch of dense 15x15
linearizations + Cholesky solves, an ideal TPU workload.

Per correspondence the mini factor graph is (optimizer.cpp:770-812):

* prior fixing the source ping pose at its DR value (sigma 1e-6, :773-775),
* a BetweenFactor with the DR relative pose, anisotropic noise
  ``(0.1deg, 0.1deg, 0.5deg, 2|dx|, |dy|/10, 0.1)`` (:778-781),
* two sonar point factors (range + zero-plane, :785-786),
* landmark initialized at the midpoint of the two geo projections with
  ``z = mean(pose_z - altitude)`` (:792-794).

The compass-flip guard pre-composes a yaw-pi rotation when ``|yaw| > 2*pi/3``
(:697-703).  NOTE (deliberate deviation, SURVEY §7): the reference's ``cps_pose``
variables persist across loop iterations — once one correspondence triggers the
flip it stays on for all later ones.  We apply the flip strictly per
correspondence, which is the evident intent.

Outputs per correspondence (optimizer.cpp:958-960):

* the relative pose ``(Tp_s cps_s^-1)^-1 (X2* cps_t^-1)``,
* the 6-vector marginal variance of the target pose (Marginals::QR equivalent),
* the quality score ``ini_dist / fnl_dist - 2`` used as the accept gate
  (:896, :234),

plus the eval_2 consistency metrics and depth estimates the reference dumps to
text files (:830-834, :925-951).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import KeypointNoiseConfig, LoopClosureConfig
from ..factors.between import between_residual
from ..factors.sss_point import kp_noise_sigmas, sss_point_residual
from ..geometry import se3, sonar

_DEG = jnp.pi / 180.0


class LCState(NamedTuple):
    """Variables of one mini problem: the target pose and the landmark (9 dof).

    The reference's graph also includes the source pose X1 pinned by a sigma=1e-6
    prior (optimizer.cpp:773-775).  Whitening by 1e-6 puts ~1e12 on the Hessian
    diagonal — hopeless conditioning in float32 — so we hold X1 *constant*, which
    is the evident intent of the near-rigid prior (the fixed point differs by
    O(1e-6)).  Deliberate, documented deviation (SURVEY.md §7 hard parts).
    """

    X2: se3.Pose3
    L: jnp.ndarray


class LCResult(NamedTuple):
    rel_pose: se3.Pose3  # (K,) relative transform source ping -> target ping
    variance6: jnp.ndarray  # (K, 6) marginal variances of the target pose
    quality: jnp.ndarray  # (K,) ini/fnl geo-dist ratio - 2 (accept if > 0)
    valid: jnp.ndarray  # (K,) input validity mask
    ini_dist: jnp.ndarray  # (K,) initial landmark geo distance (ini_lm_errors.txt)
    fnl_dist: jnp.ndarray  # (K,) final landmark geo distance (fnl_lm_errors.txt)
    dr_range_e: jnp.ndarray  # (K,) range consistency error, DR poses (dr_range_e.txt)
    dr_plane_e: jnp.ndarray  # (K,) plane consistency error, DR poses (dr_plane_e.txt)
    est_range_e: jnp.ndarray  # (K,) range error, estimated poses (est_range_e.txt)
    est_plane_e: jnp.ndarray  # (K,) plane error, estimated poses (est_plane_e.txt)
    depth_est: jnp.ndarray  # (K,) estimated landmark depth (depth_est_wp.txt)
    depth_drape: jnp.ndarray  # (K,) draping GT depth (depth_drape.txt)
    lm_iters: jnp.ndarray  # (K,) LM iterations used (observability)


def _retract(state: LCState, delta: jnp.ndarray) -> LCState:
    return LCState(
        X2=se3.retract(state.X2, delta[0:6]),
        L=state.L + delta[6:9],
    )


def _compass_flip(yaw, threshold, dtype):
    """yaw-pi pre-composition pose where |yaw| exceeds the threshold."""
    flip = jnp.abs(yaw) > threshold
    ang = jnp.where(flip, jnp.pi, 0.0).astype(dtype)
    return se3.Pose3(
        R=jnp.stack(
            [
                jnp.stack([jnp.cos(ang), -jnp.sin(ang), jnp.zeros_like(ang)], -1),
                jnp.stack([jnp.sin(ang), jnp.cos(ang), jnp.zeros_like(ang)], -1),
                jnp.stack([jnp.zeros_like(ang), jnp.zeros_like(ang), jnp.ones_like(ang)], -1),
            ],
            -2,
        ),
        t=jnp.zeros((*ang.shape, 3), dtype),
    )


def _solve_one(
    pair: jnp.ndarray,  # (7,) ping_s, bin_s, sr_s, ping_t, bin_t, sr_t, depth
    row_s: jnp.ndarray,  # (6,) DR row of the source ping (pre-gathered)
    row_t: jnp.ndarray,  # (6,) DR row of the target ping
    g_s: jnp.ndarray,  # (2,) geo position of the source pixel
    g_t: jnp.ndarray,  # (2,) geo position of the target pixel
    alt_s: jnp.ndarray,  # () source altitude
    alt_t: jnp.ndarray,  # () target altitude
    gras_t: jnp.ndarray,  # (G,) target ground-range table
    n_bins: int,
    kp_cfg: KeypointNoiseConfig,
    cfg: LoopClosureConfig,
):
    from .lm import levenberg_marquardt, marginal_covariance
    from .triangulate import _solve_one as triangulate_one

    dtype = row_s.dtype
    bin_t = pair[4].astype(jnp.int32)
    sr_s, sr_t = pair[2], pair[5]

    # compass-flip guard (optimizer.cpp:697-703)
    cps_s = _compass_flip(row_s[2], cfg.compass_flip_yaw, dtype)
    cps_t = _compass_flip(row_t[2], cfg.compass_flip_yaw, dtype)
    Tp_s = se3.compose(se3.from_rodrigues_xyz(row_s), cps_s)
    Tp_t = se3.compose(se3.from_rodrigues_xyz(row_t), cps_t)
    Tp_st = se3.between(Tp_s, Tp_t)

    # sensor lever arms are zero in the reference (frame.cpp:38-39)
    Ts = se3.identity(dtype=dtype)

    # noise models
    sig_kp1 = kp_noise_sigmas(sr_s, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
    sig_kp2 = kp_noise_sigmas(sr_t, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
    sig_odo = jnp.stack(
        [
            jnp.asarray(cfg.odo_sigma_ro_deg * _DEG, dtype),
            jnp.asarray(cfg.odo_sigma_pi_deg * _DEG, dtype),
            jnp.asarray(cfg.odo_sigma_ya_deg * _DEG, dtype),
            # the reference scales x/y sigmas by the DR displacement
            # (optimizer.cpp:778); floors keep the f32 whitening well conditioned
            # when a displacement component is ~0
            jnp.maximum(jnp.abs(Tp_st.t[0]) * cfg.odo_x_scale, 1e-3),
            jnp.maximum(jnp.abs(Tp_st.t[1]) * cfg.odo_y_scale, 1e-3),
            jnp.asarray(cfg.odo_sigma_z, dtype),
        ]
    )

    m1 = jnp.stack([sr_s, jnp.zeros_like(sr_s)])
    m2 = jnp.stack([sr_t, jnp.zeros_like(sr_t)])

    def residual_fn(state: LCState) -> jnp.ndarray:
        # X1 is the constant Tp_s (see LCState docstring)
        r_odo = between_residual(Tp_s, state.X2, Tp_st) / sig_odo
        r_kp1 = sss_point_residual(state.L, Tp_s, Ts, m1) / sig_kp1
        r_kp2 = sss_point_residual(state.L, state.X2, Ts, m2) / sig_kp2
        return jnp.concatenate([r_odo, r_kp1, r_kp2])

    # landmark init: midpoint of geo projections, z = mean(pose_z - altitude)
    # (optimizer.cpp:792-794)
    x_bar = 0.5 * (g_s[0] + g_t[0])
    y_bar = 0.5 * (g_s[1] + g_t[1])
    z_bar = 0.5 * ((row_s[5] - alt_s) + (row_t[5] - alt_t))
    L0 = jnp.stack([x_bar, y_bar, z_bar])

    state0 = LCState(X2=Tp_t, L=L0)
    res = levenberg_marquardt(residual_fn, _retract, state0, n_dim=9, max_iters=cfg.max_lm_iters)
    X2_est: se3.Pose3 = res.x.X2
    L_est = res.x.L

    # marginal covariance of X2 (optimizer.cpp:956); X2 occupies dims 0:6
    var6 = jnp.diagonal(marginal_covariance(res.hessian, slice(0, 6)))

    # relative pose output (optimizer.cpp:958): un-flip both sides
    src = se3.compose(Tp_s, se3.inverse(cps_s))
    dst = se3.compose(X2_est, se3.inverse(cps_t))
    rel = se3.between(src, dst)

    # ---- eval option 1 (optimizer.cpp:852-904): geo-distance improvement ----
    ini_dist = jnp.linalg.norm(g_s - g_t)
    new_pose = dst
    lm_geo_t = sonar.project_landmark_geo(
        new_pose.t[:2], jnp.arctan2(new_pose.R[1, 0], new_pose.R[0, 0]), bin_t, gras_t, n_bins
    )
    fnl_dist = jnp.linalg.norm(g_s - lm_geo_t)
    quality = ini_dist / jnp.maximum(fnl_dist, 1e-9) - cfg.quality_threshold

    # ---- eval option 2 (optimizer.cpp:906-953): triangulated consistency ----
    lm_dr = triangulate_one(Tp_s, Tp_t, Ts, Ts, sr_s, sr_t, L0, kp_cfg, cfg, True)
    lm_dr_s = se3.transform_to(Ts, se3.transform_to(Tp_s, lm_dr))
    lm_dr_t = se3.transform_to(Ts, se3.transform_to(Tp_t, lm_dr))
    dr_range_e = 0.5 * (
        jnp.abs(jnp.linalg.norm(lm_dr_s) - sr_s) + jnp.abs(jnp.linalg.norm(lm_dr_t) - sr_t)
    )
    dr_plane_e = 0.5 * (jnp.abs(lm_dr_s[0]) + jnp.abs(lm_dr_t[0]))

    lm_est_s = se3.transform_to(Ts, se3.transform_to(Tp_s, L_est))
    lm_est_t = se3.transform_to(Ts, se3.transform_to(X2_est, L_est))
    est_range_e = 0.5 * (
        jnp.abs(jnp.linalg.norm(lm_est_s) - sr_s) + jnp.abs(jnp.linalg.norm(lm_est_t) - sr_t)
    )
    est_plane_e = 0.5 * (jnp.abs(lm_est_s[0]) + jnp.abs(lm_est_t[0]))

    return (
        rel,
        var6,
        quality,
        ini_dist,
        fnl_dist,
        dr_range_e,
        dr_plane_e,
        est_range_e,
        est_plane_e,
        L_est[2],
        pair[6],
        res.iterations,
    )


def _gather_inputs(pairs, dr_s, dr_t, geo_s, geo_t, alts_s, alts_t):
    """Per-correspondence gathers from per-frame arrays."""
    id_s = pairs[:, 0].astype(jnp.int32)
    id_t = pairs[:, 3].astype(jnp.int32)
    bin_s = pairs[:, 1].astype(jnp.int32)
    bin_t = pairs[:, 4].astype(jnp.int32)
    return (
        dr_s[id_s],
        dr_t[id_t],
        geo_s[id_s, bin_s],
        geo_t[id_t, bin_t],
        alts_s[id_s],
        alts_t[id_t],
    )


@functools.partial(jax.jit, static_argnames=("n_bins", "kp_cfg", "cfg"))
def loop_closing_tfs(
    pairs: jnp.ndarray,  # (K, 7) padded keypoint pairs (GetKpsPairs rows)
    valid: jnp.ndarray,  # (K,) bool
    dr_s: jnp.ndarray,
    dr_t: jnp.ndarray,
    geo_s: jnp.ndarray,
    geo_t: jnp.ndarray,
    alts_s: jnp.ndarray,
    alts_t: jnp.ndarray,
    gras_t: jnp.ndarray,
    n_bins: int,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    cfg: LoopClosureConfig = LoopClosureConfig(),
) -> LCResult:
    """Solve all K loop-closure mini problems of one frame pair in one batch."""
    row_s, row_t, g_s, g_t, alt_s, alt_t = _gather_inputs(
        pairs, dr_s, dr_t, geo_s, geo_t, alts_s, alts_t
    )
    fn = jax.vmap(
        lambda p, rs, rt, gs, gt, as_, at_: _solve_one(
            p, rs, rt, gs, gt, as_, at_, gras_t, n_bins, kp_cfg, cfg
        )
    )
    (rel, var6, quality, ini_d, fnl_d, drr, drp, esr, esp, dep, dgt, iters) = fn(
        pairs, row_s, row_t, g_s, g_t, alt_s, alt_t
    )
    # padded slots never become loop closures
    quality = jnp.where(valid, quality, -jnp.inf)
    return LCResult(
        rel_pose=rel,
        variance6=var6,
        quality=quality,
        valid=valid,
        ini_dist=ini_d,
        fnl_dist=fnl_d,
        dr_range_e=drr,
        dr_plane_e=drp,
        est_range_e=esr,
        est_plane_e=esp,
        depth_est=dep,
        depth_drape=dgt,
        lm_iters=iters,
    )


@functools.partial(jax.jit, static_argnames=("n_bins", "kp_cfg", "cfg"))
def loop_closing_tfs_stacked(
    pairs: jnp.ndarray,  # (K, 7) correspondences from ALL frame pairs
    valid: jnp.ndarray,  # (K,)
    src_frame: jnp.ndarray,  # (K,) int32 source frame index
    tgt_frame: jnp.ndarray,  # (K,) int32 target frame index
    dr_all: jnp.ndarray,  # (F, N, 6) stacked DR rows (frames padded to equal N)
    geo_all: jnp.ndarray,  # (F, N, M, 2)
    alts_all: jnp.ndarray,  # (F, N)
    gras_all: jnp.ndarray,  # (F, G)
    n_bins: int,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    cfg: LoopClosureConfig = LoopClosureConfig(),
) -> LCResult:
    """Whole-survey loop-closure solve: every correspondence of every frame pair
    in ONE batched dispatch (the per-pair loop becomes device-side gathers).

    Requires frames stacked to a common ping count (pad + mask upstream).
    """
    id_s = pairs[:, 0].astype(jnp.int32)
    id_t = pairs[:, 3].astype(jnp.int32)
    bin_s = pairs[:, 1].astype(jnp.int32)
    bin_t = pairs[:, 4].astype(jnp.int32)
    row_s = dr_all[src_frame, id_s]
    row_t = dr_all[tgt_frame, id_t]
    g_s = geo_all[src_frame, id_s, bin_s]
    g_t = geo_all[tgt_frame, id_t, bin_t]
    alt_s = alts_all[src_frame, id_s]
    alt_t = alts_all[tgt_frame, id_t]
    gras_t = gras_all[tgt_frame]  # (K, G) — small

    fn = jax.vmap(
        lambda p, rs, rt, gs, gt, as_, at_, gr: _solve_one(
            p, rs, rt, gs, gt, as_, at_, gr, n_bins, kp_cfg, cfg
        )
    )
    (rel, var6, quality, ini_d, fnl_d, drr, drp, esr, esp, dep, dgt, iters) = fn(
        pairs, row_s, row_t, g_s, g_t, alt_s, alt_t, gras_t
    )
    quality = jnp.where(valid, quality, -jnp.inf)
    return LCResult(
        rel_pose=rel,
        variance6=var6,
        quality=quality,
        valid=valid,
        ini_dist=ini_d,
        fnl_dist=fnl_d,
        dr_range_e=drr,
        dr_plane_e=drp,
        est_range_e=esr,
        est_plane_e=esp,
        depth_est=dep,
        depth_drape=dgt,
        lm_iters=iters,
    )
