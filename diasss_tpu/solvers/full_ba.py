"""Full bundle adjustment: joint poses + landmarks with Schur elimination.

The reference's two-stage estimation (per-correspondence mini-solves ->
pose-graph of relative-pose factors, optimizer.cpp:641-982 + :21-317) discards
information: each landmark is solved in isolation against ONE pose pair, so a
correspondence between *perpendicular* survey lines contributes nothing (the
two zero-plane constraints always intersect — the quality gate rightly rejects
them), and cross-track drift stays unobservable.

This module is the BA core the BASELINE north star describes: one nonlinear
least-squares problem over ALL ping poses and ALL correspondence landmarks,

    min  sum ||odo residuals||^2 + sum_k ( ||sss(L_k, X_{s_k})||^2 +
         ||sss(L_k, X_{t_k})||^2 + ||L_k prior||^2 ),

solved by Levenberg-Marquardt where each linear step eliminates the landmarks
analytically (their Hessian is block-diagonal 3x3 — the classic BA Schur trick)
and solves the reduced pose system with the same factor-wise PCG used by the
pose-graph solver.  Everything is batched: per-landmark 3x3 inverses, per-factor
6x3/6x6 GEMMs, segment-sum scatters.  Landmark priors are the flat-floor depth
regularization (xy loose, z moderately tight — same physics as the reference's
triangulation prior, optimizer.cpp:1005-1008).

With crossing lines in the survey, this mode recovers BOTH horizontal drift
components — beyond the reference's capability.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FullBAConfig
from ..factors.between import between_residual
from ..factors.sss_point import kp_noise_sigmas, sss_point_residual
from ..geometry import se3

_HI = jax.lax.Precision.HIGHEST
_DEFP = jax.lax.Precision.DEFAULT  # see _direct_ba_step docstring


class BAProblem(NamedTuple):
    poses0: se3.Pose3  # (P,)
    odo_meas: se3.Pose3  # (P-1,)
    odo_sigmas: jnp.ndarray  # (6,)
    kp_i: jnp.ndarray  # (K,) int32 global source ping index
    kp_j: jnp.ndarray  # (K,) int32 global target ping index
    kp_sr_s: jnp.ndarray  # (K,) source slant ranges
    kp_sr_t: jnp.ndarray  # (K,)
    kp_valid: jnp.ndarray  # (K,)
    lm0: jnp.ndarray  # (K, 3) landmark initializations
    lm_prior: jnp.ndarray  # (K, 3) prior centers (= lm0)
    lm_prior_sigmas: jnp.ndarray  # (3,)
    # --- optional per-factor CONSTANT-pose endpoints (fixed-lag streaming:
    # a frozen pose outside the window stays in the factor as an exact
    # constant, so its sonar residual becomes a pure landmark constraint —
    # the "marginalize frozen-frame landmarks into priors" mechanism).  When
    # kp_{i,j}_fix[k] is True the factor evaluates at kp_pose_{s,t}[k] instead
    # of poses[kp_{i,j}[k]] and its pose Jacobian block is zero.
    kp_i_fix: jnp.ndarray = None  # (K,) bool, or None (all endpoints free)
    kp_j_fix: jnp.ndarray = None  # (K,) bool
    kp_pose_s: se3.Pose3 = None  # (K,) constant source poses where kp_i_fix
    kp_pose_t: se3.Pose3 = None  # (K,) constant target poses where kp_j_fix


class BAInfo(NamedTuple):
    error0: jnp.ndarray
    error: jnp.ndarray
    iterations: jnp.ndarray
    cg_iters_total: jnp.ndarray
    lam: jnp.ndarray = None  # final LM damping (resume/checkpoint state)
    stall: jnp.ndarray = None  # consecutive no-improvement trials (resume state)
    # resolved linear-solve kind ("direct"/"dense_seg"/"tridiag"/"jacobi",
    # "sp_" prefix = sequence-parallel mesh solver).  Trace-time static, so it
    # cannot ride out of the jitted solver itself — non-jit wrappers attach it
    # via _replace (parallel/seq.py) or callers compute it with
    # resolve_ba_solver_kind (pipeline.py).  VERDICT r4 item 3: silent
    # trace-time fallbacks (direct -> dense_seg past the Woodbury guard) must
    # be observable.
    solver_kind: str = None


def resolve_ba_solver_kind(preconditioner: str, P: int, K_pad: int) -> str:
    """Trace-time resolution of ``FullBAConfig.preconditioner`` — the single
    source of truth for the "auto" policy (used by :func:`solve_full_ba` AND
    by observability callers, so the recorded kind can never drift from the
    executed one).

    TPU: the exact direct Woodbury chain step (zero CG) up to 2048 padded
    correspondences; beyond that, chain-preconditioned PCG ("dense_seg").
    The cutover is MEASURED (scripts/ab_chain_ba.py, TPU v5e, P = 4200,
    PERF.md round 5): direct wins at K_pad = 2048 (0.99 s vs dense_seg
    1.28 s / chain 2.9 s) but collapses at 4096 (7.0 s — the (3K)^3
    capacitance Cholesky) where dense_seg 1.29 s / chain 1.11 s take over;
    at 8k/32k dense_seg and chain are within 10% of each other, so the
    familiar dense_seg stays the fallback and the EXACT-chain "chain"
    preconditioner remains opt-in (its CG counts are NOT materially lower —
    the spectrum is landmark-coupling-bound, not chain-bound, refuting the
    round-4 hypothesis; kept for LC-dominated pose graphs where it does
    win).  Elsewhere: "tridiag" PCG.
    """
    kind = preconditioner
    if kind == "auto":
        if jax.default_backend() == "tpu":
            mem_ok = P * 6 * (3 * K_pad + 1) * 4 * 3 < 4e9
            kind = "direct" if (K_pad <= 2048 and mem_ok) else "dense_seg"
        else:
            kind = "tridiag"
    return kind


def _sss_factor_terms(pose: se3.Pose3, lm: jnp.ndarray, sr: jnp.ndarray, sigmas):
    """Whitened residual + Jacobians (2x6 pose, 2x3 landmark) for one factor."""
    Ts = se3.identity(dtype=lm.dtype)
    m = jnp.stack([sr, jnp.zeros_like(sr)])

    def f(xi, dl):
        return sss_point_residual(lm + dl, se3.retract(pose, xi), Ts, m) / sigmas

    r = f(jnp.zeros(6, lm.dtype), jnp.zeros(3, lm.dtype))
    Jp = jax.jacfwd(f, argnums=0)(jnp.zeros(6, lm.dtype), jnp.zeros(3, lm.dtype))
    Jl = jax.jacfwd(f, argnums=1)(jnp.zeros(6, lm.dtype), jnp.zeros(3, lm.dtype))
    return r, Jp, Jl


def _tree_where(mask, a, b):
    """Row-wise tree select: mask (K,), leaves (K, ...)."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(mask.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), a, b
    )


def _endpoint_poses(poses: se3.Pose3, prob: BAProblem):
    """Effective per-factor endpoint poses: the optimized pose, or the
    constant (frozen) pose where a fix mask is set."""
    pi = poses[prob.kp_i]
    pj = poses[prob.kp_j]
    if prob.kp_i_fix is not None:
        pi = _tree_where(prob.kp_i_fix, prob.kp_pose_s, pi)
    if prob.kp_j_fix is not None:
        pj = _tree_where(prob.kp_j_fix, prob.kp_pose_t, pj)
    return pi, pj


def _huber_rho(sq_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Huber cost of a residual block given its squared norm (0.5*||r||^2 core)."""
    if delta <= 0:
        return 0.5 * sq_norm
    nr = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
    quad = 0.5 * sq_norm
    lin = delta * (nr - 0.5 * delta)
    return jnp.where(nr <= delta, quad, lin)


def _huber_weight(sq_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight sqrt(rho'(r)/r): multiply residual+Jacobian rows."""
    if delta <= 0:
        return jnp.ones_like(sq_norm)
    nr = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
    return jnp.sqrt(jnp.minimum(1.0, delta / nr))


def _ba_error(poses: se3.Pose3, lms: jnp.ndarray, prob: BAProblem, kp_cfg, huber_delta: float = 0.0) -> jnp.ndarray:
    P = prob.poses0.t.shape[0]
    r_odo = jax.vmap(between_residual)(
        poses[jnp.arange(P - 1)], poses[jnp.arange(1, P)], prob.odo_meas
    ) / prob.odo_sigmas
    Ts = se3.identity(dtype=lms.dtype)

    def kp_res(pose, lm, sr):
        m = jnp.stack([sr, jnp.zeros_like(sr)])
        sig = kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg)
        return sss_point_residual(lm, pose, Ts, m) / sig

    pose_i, pose_j = _endpoint_poses(poses, prob)
    r_s = jax.vmap(kp_res)(pose_i, lms, prob.kp_sr_s)
    r_t = jax.vmap(kp_res)(pose_j, lms, prob.kp_sr_t)
    r_pr = (lms - prob.lm_prior) / prob.lm_prior_sigmas
    # where-mask (not multiply): padded slots can hold inf/nan residuals
    v = prob.kp_valid[:, None]
    r_s = jnp.where(v, r_s, 0.0)
    r_t = jnp.where(v, r_t, 0.0)
    r_pr = jnp.where(v, r_pr, 0.0)
    return _ba_error_from_residuals(r_odo, r_s, r_t, r_pr, huber_delta)


def _ba_error_from_residuals(r_odo, r_s, r_t, r_pr, huber_delta: float) -> jnp.ndarray:
    rob = jnp.sum(_huber_rho(jnp.sum(r_s**2, axis=-1), huber_delta)) + jnp.sum(
        _huber_rho(jnp.sum(r_t**2, axis=-1), huber_delta)
    )
    return 0.5 * (jnp.sum(r_odo**2) + jnp.sum(r_pr**2)) + rob


def _direct_ba_step(prob, g_red, U_chain, D_p, L_ll, Hpl_s, Hpl_t, lam, P, K,
                    k_cols=None):
    """EXACT damped step of the Schur-reduced pose system — zero CG iterations.

    The reduced system decomposes as ``S = T' - V V^T``:

    * ``T'`` = odometry-chain block-tridiagonal + per-pose sonar-factor
      diagonal + LM damping ``lam * blockdiag`` — i.e. tridiag(diag =
      (1+lam) * D_p, offdiag = U_chain), solved exactly by the multi-RHS
      chain factorization (:mod:`.tridiag`);
    * ``V`` = the Schur coupling columns: landmark k's damped 3x3 Hessian
      ``H_ll,k = L_k L_k^T`` couples its two endpoint poses through
      ``Hpl H_ll^-1 H_lp = (Hpl L^-T)(Hpl L^-T)^T`` — a rank-<=3 SUBTRACTED
      correction per correspondence, so V has 3K columns with two nonzero
      6-row blocks each (at kp_i[k] and kp_j[k]).

    Woodbury with the subtracted sign:
    ``S^-1 b = w0 + Wv (I - V^T T'^-1 V)^-1 V^T w0`` where
    ``[w0 | Wv] = T'^-1 [b | V]`` — one chain factorization with 3K+1 RHS
    plus one dense (3K, 3K) Cholesky replace the hundreds-to-thousands of
    serial PCG iterations per LM trial (the capacitance ``I - V^T T'^-1 V``
    is SPD exactly when the damped Schur system is — guaranteed here).

    This mirrors :func:`.pose_graph._direct_lm_step_multi` (V there = LC
    factor columns); same gauge handling (pose-0-touching blocks zeroed, row
    0 decoupled, ``delta[0] == 0``) and same precision choice: DEFAULT matmul
    precision, not _HI — XLA's HIGHEST lowering of tiny batched contractions
    defeats vectorization (measured 12.5x on the pose-graph step, PERF.md
    round 3); the LM accept gate re-evaluates the TRUE error after every
    step, so a slightly inexact direct step costs at most an extra trial.

    Reference anchor: the per-ping iSAM2 solve this replaces at the flagship
    estimator, /root/reference/src/core/optimizer.cpp:264-268.

    ``k_cols`` (static, <= K): number of LEADING factor slots that carry the
    Woodbury columns.  ``build_ba_problem`` appends its invalid padding at
    the TAIL, so slots >= the (bucketed) valid count contribute exactly-zero
    columns — trimming them cuts the multi-RHS width (the step's dominant
    cost) by the padding fraction (up to ~40% at a power-of-two pad) without
    changing the result.  Callers must guarantee slots >= k_cols are invalid.
    """
    from .tridiag import solve_block_tridiag_multi, thomas_block_tridiag_multi

    multi_solve = (
        solve_block_tridiag_multi
        if jax.default_backend() == "tpu"
        else thomas_block_tridiag_multi
    )
    dtype = D_p.dtype
    eye6 = jnp.eye(6, dtype=dtype)

    if k_cols is None or k_cols > K:
        k_cols = K
    K = k_cols
    Hpl_s = Hpl_s[:K]
    Hpl_t = Hpl_t[:K]
    L_ll = L_ll[:K]
    kp_i = prob.kp_i[:K]
    kp_j = prob.kp_j[:K]

    # gauge: pose-0-touching Schur couplings vanish (the PCG matvec zeroes
    # v[0] and overwrites out[0], which is the same operator)
    Hpl_s0 = jnp.where((kp_i == 0)[:, None, None], 0.0, Hpl_s)
    Hpl_t0 = jnp.where((kp_j == 0)[:, None, None], 0.0, Hpl_t)
    # Vhat = Hpl L_ll^-T  (K, 6, 3): batched 3x3 triangular solves
    Vhat_s = jax.scipy.linalg.solve_triangular(
        L_ll, Hpl_s0.swapaxes(-1, -2), lower=True
    ).swapaxes(-1, -2)
    Vhat_t = jax.scipy.linalg.solve_triangular(
        L_ll, Hpl_t0.swapaxes(-1, -2), lower=True
    ).swapaxes(-1, -2)

    # V: (P, 6, K, 3) via one-hot broadcast-multiply, NOT scatter-add (a
    # traced-index scatter lowers to a serial per-row loop on TPU — the same
    # finding as pose_graph._direct_lm_step_multi's V construction)
    onehot_i = (kp_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    onehot_j = (kp_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    V = jnp.einsum("kp,kba->pbka", onehot_i, Vhat_s, precision=_DEFP) + jnp.einsum(
        "kp,kba->pbka", onehot_j, Vhat_t, precision=_DEFP
    )

    T_diag = ((1.0 + lam) * D_p + 1e-6 * eye6).at[0].set(eye6)
    U = U_chain.at[0].set(0.0)

    B = jnp.concatenate([(-g_red)[:, :, None], V.reshape(P, 6, 3 * K)], axis=2)
    W = multi_solve(T_diag, U, B)
    w0, Wv = W[:, :, 0], W[:, :, 1:]

    # capacitance C = I - V^T T'^-1 V, assembled by gathering W at the
    # factor endpoints (each V column group reads two pose blocks)
    AW = jnp.einsum(
        "kba,kbr->kar", Vhat_s, Wv[kp_i], precision=_DEFP
    ) + jnp.einsum("kba,kbr->kar", Vhat_t, Wv[kp_j], precision=_DEFP)
    C = jnp.eye(3 * K, dtype=dtype) - AW.reshape(3 * K, 3 * K)
    c0 = (
        jnp.einsum("kba,kb->ka", Vhat_s, w0[kp_i], precision=_DEFP)
        + jnp.einsum("kba,kb->ka", Vhat_t, w0[kp_j], precision=_DEFP)
    ).reshape(-1)
    Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
    y = jax.scipy.linalg.cho_solve((Lc, True), c0)
    delta = w0 + jnp.einsum("pbr,r->pb", Wv, y, precision=_DEFP)
    return delta.at[0].set(0.0)


def _finish_trial(poses, lms, err, lam, delta_p, cg_k,
                  Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve, prob, kp_cfg, cfg, P):
    """Shared trial tail: landmark back-substitution, retract, LM accept gate.
    ``delta_p`` comes from either the PCG or the direct Woodbury step."""
    delta_p = delta_p.at[0].set(0.0)

    hv = jnp.einsum("kab,kb->ka", Jp_s, delta_p[prob.kp_i], precision=_HI)
    ht = jnp.einsum("kab,kb->ka", Jp_t, delta_p[prob.kp_j], precision=_HI)
    w2 = jnp.einsum("kab,ka->kb", Jl_s, hv, precision=_HI) + jnp.einsum(
        "kab,ka->kb", Jl_t, ht, precision=_HI
    )
    delta_l = ll_solve(-g_l - w2)

    new_poses = se3.retract(poses, delta_p)
    new_poses = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            (jnp.arange(P) == 0).reshape((P,) + (1,) * (a.ndim - 1)), a, b
        ),
        poses,
        new_poses,
    )
    new_lms = lms + delta_l
    new_err = _ba_error(new_poses, new_lms, prob, kp_cfg, cfg.huber_delta)
    good = jnp.isfinite(new_err) & (new_err < err)
    poses = jax.tree_util.tree_map(lambda a, b: jnp.where(good, b, a), poses, new_poses)
    lms = jnp.where(good, new_lms, lms)
    err = jnp.where(good, new_err, err)
    lam = jnp.where(good, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 10.0, 1e6))
    return poses, lms, err, lam, cg_k


@functools.partial(jax.jit, static_argnames=("cfg", "kp_cfg", "k_direct_cols"))
def solve_full_ba(prob: BAProblem, cfg: FullBAConfig, kp_cfg, lam0=None,
                  stall0=None, k_direct_cols: int | None = None):
    """LM with per-trial Schur-eliminated linear solves; returns
    (poses, landmarks, BAInfo).  ``lam0`` / ``stall0`` resume LM damping and
    the stall-exit counter from a checkpoint (:mod:`..checkpoint`).

    ``k_direct_cols`` (static): leading factor slots that carry Woodbury
    columns in the "direct" path — callers that know the padding tail is
    invalid (build_ba_problem appends it) pass the bucketed valid count to
    trim the multi-RHS width; None = all K slots."""
    P = prob.poses0.t.shape[0]
    dtype = prob.poses0.t.dtype
    err0 = _ba_error(prob.poses0, prob.lm0, prob, kp_cfg, cfg.huber_delta)
    w_kp = prob.kp_valid.astype(dtype)

    K_pad = int(prob.kp_i.shape[0])
    # trace-time platform choice (see resolve_ba_solver_kind / the
    # FullBAConfig.preconditioner docstring).  TPU: the exact direct Woodbury
    # chain step (zero CG iterations) wins while the capacitance stays modest
    # — the Woodbury width is 3 per landmark, so the guard admits up to 1024
    # (padded) correspondences with bounded (P, 6, 3K+1) multi-RHS buffers.
    # Beyond that, chain-preconditioned PCG ("dense_seg").  CPU keeps tridiag
    # PCG.  The resolution is shared with observability callers so the
    # recorded solver kind can never drift from the executed one.
    precond_kind = resolve_ba_solver_kind(cfg.preconditioner, P, K_pad)

    sig_s = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_s)
    sig_t = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_t)

    def trial(carry):
        poses, lms, err, lam = carry

        # --- linearize all factors ---
        from .pose_graph import _linearize_between

        idx_a = jnp.arange(P - 1)
        idx_b = jnp.arange(1, P)
        r_o, Ja, Jb = jax.vmap(_linearize_between)(
            poses[idx_a], poses[idx_b],
            prob.odo_meas,
            jnp.broadcast_to(prob.odo_sigmas, (P - 1, 6)),
        )

        pose_i, pose_j = _endpoint_poses(poses, prob)
        r_s, Jp_s, Jl_s = jax.vmap(_sss_factor_terms)(
            pose_i, lms, prob.kp_sr_s, sig_s
        )
        r_t, Jp_t, Jl_t = jax.vmap(_sss_factor_terms)(
            pose_j, lms, prob.kp_sr_t, sig_t
        )
        # constant-pose endpoints: the pose block does not vary -> zero its
        # Jacobian (every gradient/Hessian/Schur scatter of this factor's
        # pose side vanishes; the landmark side remains a live constraint)
        if prob.kp_i_fix is not None:
            Jp_s = jnp.where(prob.kp_i_fix[:, None, None], 0.0, Jp_s)
        if prob.kp_j_fix is not None:
            Jp_t = jnp.where(prob.kp_j_fix[:, None, None], 0.0, Jp_t)
        vmask = prob.kp_valid
        r_s = jnp.where(vmask[:, None], r_s, 0.0)
        r_t = jnp.where(vmask[:, None], r_t, 0.0)
        # IRLS robustification: downweight gross sonar residuals (Huber)
        w_s = _huber_weight(jnp.sum(r_s**2, axis=-1), cfg.huber_delta)
        w_t = _huber_weight(jnp.sum(r_t**2, axis=-1), cfg.huber_delta)
        r_s = r_s * w_s[:, None]
        r_t = r_t * w_t[:, None]
        Jp_s = Jp_s * w_s[:, None, None]
        Jp_t = Jp_t * w_t[:, None, None]
        Jl_s = Jl_s * w_s[:, None, None]
        Jl_t = Jl_t * w_t[:, None, None]
        Jp_s = jnp.where(vmask[:, None, None], Jp_s, 0.0)
        Jp_t = jnp.where(vmask[:, None, None], Jp_t, 0.0)
        Jl_s = jnp.where(vmask[:, None, None], Jl_s, 0.0)
        Jl_t = jnp.where(vmask[:, None, None], Jl_t, 0.0)
        r_pr = jnp.where(
            vmask[:, None], (lms - prob.lm_prior) / prob.lm_prior_sigmas, 0.0
        )
        Jl_pr = (
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (lms.shape[0], 3, 3))
            / prob.lm_prior_sigmas[None, :, None]
        ) * w_kp[:, None, None]

        # --- gradients ---
        g_p = jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Ja, r_o, precision=_HI), idx_a, P
        ) + jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Jb, r_o, precision=_HI), idx_b, P
        )
        g_p = g_p + jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Jp_s, r_s, precision=_HI), prob.kp_i, P
        ) + jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Jp_t, r_t, precision=_HI), prob.kp_j, P
        )
        g_l = (
            jnp.einsum("kab,ka->kb", Jl_s, r_s, precision=_HI)
            + jnp.einsum("kab,ka->kb", Jl_t, r_t, precision=_HI)
            + jnp.einsum("kab,ka->kb", Jl_pr, r_pr, precision=_HI)
        )

        # --- Hessian blocks ---
        # pose block diagonal (for damping + preconditioner)
        D_p = jax.ops.segment_sum(
            jnp.einsum("kab,kac->kbc", Ja, Ja, precision=_HI), idx_a, P
        ) + jax.ops.segment_sum(
            jnp.einsum("kab,kac->kbc", Jb, Jb, precision=_HI), idx_b, P
        )
        D_p = D_p + jax.ops.segment_sum(
            jnp.einsum("kab,kac->kbc", Jp_s, Jp_s, precision=_HI), prob.kp_i, P
        ) + jax.ops.segment_sum(
            jnp.einsum("kab,kac->kbc", Jp_t, Jp_t, precision=_HI), prob.kp_j, P
        )
        # landmark 3x3 blocks (damped)
        H_ll = (
            jnp.einsum("kab,kac->kbc", Jl_s, Jl_s, precision=_HI)
            + jnp.einsum("kab,kac->kbc", Jl_t, Jl_t, precision=_HI)
            + jnp.einsum("kab,kac->kbc", Jl_pr, Jl_pr, precision=_HI)
        )
        H_ll = H_ll * (1.0 + lam) + 1e-6 * jnp.eye(3, dtype=dtype)
        L_ll = jnp.linalg.cholesky(H_ll)

        def ll_solve(x):  # (K, 3) or (K, 3, n)
            if x.ndim == 2:
                return jax.scipy.linalg.cho_solve((L_ll, True), x[..., None])[..., 0]
            return jax.scipy.linalg.cho_solve((L_ll, True), x)

        # H_pl blocks per factor: (K, 6, 3) = Jp^T Jl for each kp factor
        Hpl_s = jnp.einsum("kab,kac->kbc", Jp_s, Jl_s, precision=_HI)
        Hpl_t = jnp.einsum("kab,kac->kbc", Jp_t, Jl_t, precision=_HI)

        # gauge: pose 0 fixed
        def fix0_vec(v):
            return v.at[0].set(0.0)

        g_p = fix0_vec(g_p)
        D_p = D_p.at[0].set(jnp.eye(6, dtype=dtype))

        # --- Schur-reduced gradient: g~ = g_p - H_pl H_ll^-1 g_l ---
        y = ll_solve(g_l)  # (K, 3)
        g_red = g_p - (
            jax.ops.segment_sum(
                jnp.einsum("kac,kc->ka", Hpl_s, y, precision=_HI), prob.kp_i, P
            )
            + jax.ops.segment_sum(
                jnp.einsum("kac,kc->ka", Hpl_t, y, precision=_HI), prob.kp_j, P
            )
        )
        g_red = fix0_vec(g_red)

        U_chain = jnp.einsum("kab,kac->kbc", Ja, Jb, precision=_HI)  # (P-1, 6, 6)

        if precond_kind == "direct":
            delta_p = _direct_ba_step(
                prob, g_red, U_chain, D_p, L_ll, Hpl_s, Hpl_t, lam, P, K_pad,
                k_cols=k_direct_cols,
            )
            cg_k = jnp.asarray(0, jnp.int32)
            return _finish_trial(
                poses, lms, err, lam, delta_p, cg_k,
                Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve, prob, kp_cfg, cfg, P,
            )

        # --- Schur matvec ---
        def matvec(v):
            v = fix0_vec(v)
            # chain part
            va = v[idx_a]
            vb = v[idx_b]
            a = jnp.einsum("kab,kb->ka", Ja, va, precision=_HI) + jnp.einsum(
                "kab,kb->ka", Jb, vb, precision=_HI
            )
            out = jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Ja, a, precision=_HI), idx_a, P
            ) + jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Jb, a, precision=_HI), idx_b, P
            )
            # kp pose-diagonal part
            b_s = jnp.einsum("kab,kb->ka", Jp_s, v[prob.kp_i], precision=_HI)
            b_t = jnp.einsum("kab,kb->ka", Jp_t, v[prob.kp_j], precision=_HI)
            out = out + jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Jp_s, b_s, precision=_HI), prob.kp_i, P
            ) + jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Jp_t, b_t, precision=_HI), prob.kp_j, P
            )
            # damping
            out = out + lam * jnp.einsum("pab,pb->pa", D_p, v, precision=_HI)
            # Schur correction: - H_pl H_ll^-1 H_lp v
            w = jnp.einsum("kab,ka->kb", Jl_s, b_s, precision=_HI) + jnp.einsum(
                "kab,ka->kb", Jl_t, b_t, precision=_HI
            )  # (K, 3) = H_lp v
            yv = ll_solve(w)
            out = out - (
                jax.ops.segment_sum(
                    jnp.einsum("kac,kc->ka", Hpl_s, yv, precision=_HI), prob.kp_i, P
                )
                + jax.ops.segment_sum(
                    jnp.einsum("kac,kc->ka", Hpl_t, yv, precision=_HI), prob.kp_j, P
                )
            )
            out = out.at[0].set(v[0])
            return out

        # --- preconditioner: block-Jacobi of the reduced system ---
        # per-factor correction Hpl H_ll^-1 Hpl^T (6x6), scattered to the diag
        X_s = ll_solve(Hpl_s.swapaxes(-1, -2))  # (K, 3, 6) = H_ll^-1 Hpl^T
        X_t = ll_solve(Hpl_t.swapaxes(-1, -2))
        S_diag_corr = jax.ops.segment_sum(
            jnp.einsum("kac,kcb->kab", Hpl_s, X_s, precision=_HI), prob.kp_i, P
        ) + jax.ops.segment_sum(
            jnp.einsum("kac,kcb->kab", Hpl_t, X_t, precision=_HI), prob.kp_j, P
        )
        Dp_damped = D_p * (1.0 + lam) - S_diag_corr
        Dp_damped = Dp_damped.at[0].set(jnp.eye(6, dtype=dtype))
        # SPD guard: fall back toward the undamped diagonal if the Schur
        # correction overshoots numerically
        Dp_damped = Dp_damped + 1e-5 * jnp.eye(6, dtype=dtype)

        # (PCG family note: full BA's Schur system is hard enough that
        # block-Jacobi hits the CG cap and stalls the LM at a worse optimum —
        # measured ATE 1.98 vs 1.44 on TPU, round 1 — so the chain
        # preconditioner is the PCG choice on both backends; on TPU in its
        # MXU dense_seg form.)
        seg = cfg.tridiag_segment if jax.default_backend() != "tpu" else min(cfg.tridiag_segment, 64)
        if precond_kind == "chain":
            # EXACT chain preconditioner (round 5): factor the Schur-
            # corrected chain approximation T'' = tridiag(D_pc, U) ONCE per
            # LM trial into the two-level ChainFactor (dense segment
            # inverses + spike boundary system, tridiag.chain_factor); every
            # PCG application is then pure batched GEMM work AND solves the
            # chain exactly (dense_seg drops the cross-segment couplings).
            # CG counts become landmark-coupling-bound — the scalable step
            # above the direct Woodbury guard (VERDICT r4 item 2).
            from .tridiag import chain_factor, chain_solve

            U = U_chain.at[0].set(0.0)
            D_pc = jnp.where(
                jnp.isfinite(jnp.linalg.cholesky(Dp_damped)).all(axis=(-1, -2), keepdims=True),
                Dp_damped,
                D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype),
            )
            fac = chain_factor(D_pc, U, seg)

            def precond(v):
                return chain_solve(fac, v)

        elif precond_kind == "dense_seg":
            from .tridiag import (
                apply_dense_segment_inverses,
                auto_dense_segment,
                dense_segment_inverses,
            )

            U = U_chain.at[0].set(0.0)
            D_pc = jnp.where(
                jnp.isfinite(jnp.linalg.cholesky(Dp_damped)).all(axis=(-1, -2), keepdims=True),
                Dp_damped,
                D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype),
            )
            seg_d = auto_dense_segment(P, cfg.tridiag_segment)
            Minv = dense_segment_inverses(D_pc, U, seg_d)

            def precond(v):
                return apply_dense_segment_inverses(Minv, v)

        elif precond_kind == "tridiag":
            # chain preconditioner on the Schur system: the odometry part is
            # still exactly block-tridiagonal; solve it per CG iteration with
            # segment-parallel cyclic reduction (same rationale as pose_graph)
            from .tridiag import solve_block_tridiag_segmented

            U = U_chain.at[0].set(0.0)
            # keep the tridiag SPD even when the Schur diagonal correction
            # overshoots: clamp toward the uncorrected diagonal
            D_pc = jnp.where(
                jnp.isfinite(jnp.linalg.cholesky(Dp_damped)).all(axis=(-1, -2), keepdims=True),
                Dp_damped,
                D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype),
            )

            def precond(v):
                return solve_block_tridiag_segmented(D_pc, U, v, seg)

        else:
            Lp = jnp.linalg.cholesky(Dp_damped)
            ok = jnp.all(jnp.isfinite(Lp))
            Lp_safe = jnp.where(
                ok, Lp, jnp.linalg.cholesky(D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype))
            )

            def precond(v):
                return jax.scipy.linalg.cho_solve((Lp_safe, True), v[..., None])[..., 0]

        from .pose_graph import _pcg

        delta_p, cg_k = _pcg(matvec, -g_red, precond, cfg.cg_tol, cfg.cg_max_iters)
        return _finish_trial(
            poses, lms, err, lam, delta_p, cg_k,
            Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve, prob, kp_cfg, cfg, P,
        )

    def w_cond(state):
        _, _, _, _, k, stall, _ = state
        return (k < cfg.max_iters) & (stall < 2)

    def w_body(state):
        poses, lms, err, lam, k, stall, cg_total = state
        poses2, lms2, err2, lam2, cg_k = trial((poses, lms, err, lam))
        improved = (err - err2) > 1e-6 * jnp.maximum(err, 1e-30)
        stall = jnp.where(improved, 0, stall + 1)
        return poses2, lms2, err2, lam2, k + 1, stall, cg_total + cg_k

    lam_init = jnp.asarray(1e-4, dtype) if lam0 is None else jnp.asarray(lam0, dtype)
    stall_init = (
        jnp.asarray(0, jnp.int32) if stall0 is None else jnp.asarray(stall0, jnp.int32)
    )
    poses, lms, err, lam_f, iters, stall_f, cg_total = jax.lax.while_loop(
        w_cond,
        w_body,
        (
            prob.poses0,
            prob.lm0,
            err0,
            lam_init,
            jnp.asarray(0, jnp.int32),
            stall_init,
            jnp.asarray(0, jnp.int32),
        ),
    )
    return poses, lms, BAInfo(error0=err0, error=err, iterations=iters,
                              cg_iters_total=cg_total, lam=lam_f, stall=stall_f)


@jax.jit
def _geo_endpoint_kernel(geo_stack, fs, ps, bs, ft, pt, bt):
    return geo_stack[fs, ps, bs], geo_stack[ft, pt, bt]


def _gather_geo_endpoints(frames, fs, ping_s, bin_s, ft, ping_t, bin_t):
    """(K, 2) world-xy geo endpoints of each correspondence, source + target.

    When every frame's geo raster is a device array of one shape the gather
    runs ON DEVICE (one stacked program, indices padded to a 128 bucket so
    re-match rounds with shifting K reuse the compiled program) and only the
    two (K, 2) endpoint row sets are fetched.  Mixed shapes or host-resident
    geo fall back to a host-side numpy gather (same values either way — the
    device path reads the identical f32 raster elements)."""
    geos = [f.geo for f in frames]
    shapes = {tuple(np.shape(g)) for g in geos}
    if len(shapes) == 1 and all(isinstance(g, jax.Array) for g in geos):
        K = len(fs)
        kpad = max(128, -(-K // 128) * 128)

        def pad(a):
            a = a.astype(np.int32)
            return np.concatenate([a, np.zeros(kpad - K, np.int32)]) if kpad > K else a

        g1, g2 = jax.device_get(
            _geo_endpoint_kernel(
                jnp.stack(geos),
                *(jnp.asarray(pad(a)) for a in (fs, ping_s, bin_s, ft, ping_t, bin_t)),
            )
        )
        return g1[:K], g2[:K]
    out = []
    for f_idx, pings, bins in ((fs, ping_s, bin_s), (ft, ping_t, bin_t)):
        g = np.zeros((len(f_idx), 2), np.float32)
        for k in np.unique(f_idx):
            m = f_idx == k
            g[m] = np.asarray(geos[k])[pings[m], bins[m]]
        out.append(g)
    return tuple(out)


def build_ba_problem(
    frames,
    kps_pairs: dict,
    pair_ids,
    ba_cfg: "FullBAConfig",
    pose_cfg,
    noise_key=None,
):
    """Assemble a BAProblem from keyframes + per-pair keypoint batches.

    Every nadir-passing correspondence becomes a landmark — no quality gate
    (the joint solve weighs information by geometry instead of accept/reject).
    """
    import numpy as np

    from .pose_graph import build_chain_graph

    # batched device->host fetches: ONE stacked dispatch per attr/shape group
    # instead of one full-geo-image transfer per PAIR-loop iteration (frames
    # in several pairs were re-fetched each time)
    from ..pipeline import _fetch_frame_arrays_host

    involved = sorted({k for ij in pair_ids for k in ij} | set(range(len(frames))))
    dr_h, alts_h = _fetch_frame_arrays_host(
        frames, involved, attrs=("dr_poses", "altitudes")
    )
    dr_rows = [dr_h[k] for k in range(len(frames))]
    offsets = np.cumsum([0] + [r.shape[0] for r in dr_rows])

    # concatenated per-correspondence index rows (host numpy, ~K elements)
    fs_l, ft_l, cols_l = [], [], []
    for (i, j) in pair_ids:
        kp = kps_pairs[(i, j)]
        rows = kp.pairs[kp.valid]
        if not len(rows):
            continue
        fs_l.append(np.full(len(rows), i, np.int64))
        ft_l.append(np.full(len(rows), j, np.int64))
        cols_l.append(rows)

    if fs_l:
        fs = np.concatenate(fs_l)
        ft = np.concatenate(ft_l)
        rows = np.concatenate(cols_l)
        ping_s = rows[:, 0].astype(np.int64)
        bin_s = rows[:, 1].astype(np.int64)
        ping_t = rows[:, 3].astype(np.int64)
        bin_t = rows[:, 4].astype(np.int64)
        sr_s = rows[:, 2]
        sr_t = rows[:, 5]
        # geo ENDPOINT gather on device: only the (K, 2) gathered rows cross
        # the host link (one fetch) — fetching every full geo raster cost
        # ~6.5 MB per solve round at the auto bench point and ~17 MB at the
        # flagship full-BA point through the tunneled link (PERF.md round 5)
        g1, g2 = _gather_geo_endpoints(frames, fs, ping_s, bin_s, ft, ping_t, bin_t)
        kp_i = offsets[fs] + ping_s
        kp_j = offsets[ft] + ping_t
        if ba_cfg.max_geo_discrepancy > 0:
            keep = np.linalg.norm(g1 - g2, axis=1) <= ba_cfg.max_geo_discrepancy
            kp_i, kp_j = kp_i[keep], kp_j[keep]
            sr_s, sr_t = sr_s[keep], sr_t[keep]
            g1, g2 = g1[keep], g2[keep]
        dr_all = np.concatenate(dr_rows)
        alt_all = np.concatenate([alts_h[k] for k in range(len(frames))])
        z = 0.5 * (
            (dr_all[kp_i, 5] - alt_all[kp_i]) + (dr_all[kp_j, 5] - alt_all[kp_j])
        )
        lm0 = np.concatenate([0.5 * (g1 + g2), z[:, None]], axis=1)
        valid = np.ones(len(kp_i), bool)
    else:
        kp_i = np.zeros(1, np.int64)
        kp_j = np.zeros(1, np.int64)
        sr_s = np.ones(1)
        sr_t = np.ones(1)
        lm0 = np.zeros((1, 3))
        valid = np.zeros(1, bool)

    # pad the correspondence batch to a power of two (stable jit shapes)
    K = len(kp_i)
    cap = max(1, int(2 ** np.ceil(np.log2(K))))
    pad = cap - K

    def padded(a, fill=0):
        return np.concatenate([a, np.full((pad, *a.shape[1:]), fill, a.dtype)]) if pad else a


    chain = build_chain_graph(
        dr_rows,
        lc_i=np.zeros(1, np.int32),
        lc_j=np.ones(1, np.int32),
        lc_meas=se3.identity((1,), jnp.float32),
        lc_sigmas=np.ones((1, 6), np.float32),
        lc_valid=np.zeros(1, bool),
        cfg=pose_cfg,
        noise_key=noise_key,
    )

    return BAProblem(
        poses0=chain.poses0,
        odo_meas=chain.odo_meas,
        odo_sigmas=chain.odo_sigmas,
        kp_i=jnp.asarray(padded(kp_i), jnp.int32),
        kp_j=jnp.asarray(padded(kp_j), jnp.int32),
        kp_sr_s=jnp.asarray(padded(sr_s, 1.0), jnp.float32),
        kp_sr_t=jnp.asarray(padded(sr_t, 1.0), jnp.float32),
        kp_valid=jnp.asarray(padded(valid.astype(np.float32)) > 0),
        lm0=jnp.asarray(padded(lm0), jnp.float32),
        lm_prior=jnp.asarray(padded(lm0), jnp.float32),
        lm_prior_sigmas=jnp.asarray(
            [ba_cfg.lm_prior_xy_sigma, ba_cfg.lm_prior_xy_sigma, ba_cfg.lm_prior_z_sigma],
            jnp.float32,
        ),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "kp_cfg", "k_cols"))
def ba_pose_marginals(
    prob: BAProblem,
    poses: se3.Pose3,
    lms: jnp.ndarray,
    cfg: FullBAConfig,
    kp_cfg,
    k_cols: int | None = None,
) -> jnp.ndarray:
    """(P, 6, 6) EXACT marginal covariance blocks of the BA pose estimate.

    The reference reports pose uncertainty through GTSAM's exact QR marginals
    (/root/reference/src/core/optimizer.cpp:956); this is the full-BA
    equivalent: the block diagonal of the inverse Schur complement
    ``S^-1 = (T - V V^T)^-1`` at the solution, computed EXACTLY (round 5 —
    replaces the never-wired ~25%-error Hutchinson estimator):

    * ``diag blocks of T^-1`` by Takahashi-style selected inversion on the
      gauge-fixed chain (tridiag.block_tridiag_selected_inverse, O(P));
    * the low-rank Woodbury correction
      ``+ Wv (I - V^T T^-1 V)^-1 Wv^T`` per block, with ``Wv = T^-1 V`` from
      the same multi-RHS chain factorization as the direct LM step and ONE
      triangular solve of the capacitance Cholesky against all pose blocks.

    Linearization matches the solver's final trial (Huber IRLS weights at
    the solution, constant-pose endpoints respected); pose 0 is the gauge
    (zero covariance by construction).  ``k_cols`` trims the Woodbury width
    to the leading (bucketed-valid) factor slots exactly like the direct
    step — callers must guarantee slots >= k_cols are invalid.

    Cost: one chain factorization with 3*k_cols RHS + one (3k, 3k) Cholesky
    + one (3k, 6P) triangular solve — a one-time post-solve computation
    (~1-2 s at the flagship K<=1024 regime on TPU v5e; exactness is
    validated against dense inversion in tests/test_full_ba.py).
    """
    from .tridiag import (
        block_tridiag_selected_inverse,
        solve_block_tridiag_multi,
        thomas_block_tridiag_multi,
    )

    P = prob.poses0.t.shape[0]
    dtype = prob.poses0.t.dtype
    K = int(prob.kp_i.shape[0])
    if k_cols is None or k_cols > K:
        k_cols = K

    sig_s = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_s)
    sig_t = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(prob.kp_sr_t)

    idx_a = jnp.arange(P - 1)
    idx_b = jnp.arange(1, P)
    from .pose_graph import _linearize_between

    _, Ja, Jb = jax.vmap(_linearize_between)(
        poses[idx_a], poses[idx_b], prob.odo_meas,
        jnp.broadcast_to(prob.odo_sigmas, (P - 1, 6)),
    )
    pose_i, pose_j = _endpoint_poses(poses, prob)
    r_s, Jp_s, Jl_s = jax.vmap(_sss_factor_terms)(pose_i, lms, prob.kp_sr_s, sig_s)
    r_t, Jp_t, Jl_t = jax.vmap(_sss_factor_terms)(pose_j, lms, prob.kp_sr_t, sig_t)
    if prob.kp_i_fix is not None:
        Jp_s = jnp.where(prob.kp_i_fix[:, None, None], 0.0, Jp_s)
    if prob.kp_j_fix is not None:
        Jp_t = jnp.where(prob.kp_j_fix[:, None, None], 0.0, Jp_t)
    vmask = prob.kp_valid
    r_s = jnp.where(vmask[:, None], r_s, 0.0)
    r_t = jnp.where(vmask[:, None], r_t, 0.0)
    # final-trial Huber IRLS weights: the marginals are of the ROBUSTIFIED
    # Gauss-Newton system, matching what the solver converged on
    w_s = _huber_weight(jnp.sum(r_s**2, axis=-1), cfg.huber_delta)
    w_t = _huber_weight(jnp.sum(r_t**2, axis=-1), cfg.huber_delta)
    Jp_s = Jp_s * w_s[:, None, None]
    Jp_t = Jp_t * w_t[:, None, None]
    Jl_s = Jl_s * w_s[:, None, None]
    Jl_t = Jl_t * w_t[:, None, None]
    Jp_s = jnp.where(vmask[:, None, None], Jp_s, 0.0)
    Jp_t = jnp.where(vmask[:, None, None], Jp_t, 0.0)
    Jl_s = jnp.where(vmask[:, None, None], Jl_s, 0.0)
    Jl_t = jnp.where(vmask[:, None, None], Jl_t, 0.0)
    Jl_pr = (
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), (lms.shape[0], 3, 3))
        / prob.lm_prior_sigmas[None, :, None]
    ) * vmask[:, None, None].astype(dtype)

    # pose block diagonal of T (odometry + sonar), landmark blocks, couplings
    D_p = jax.ops.segment_sum(
        jnp.einsum("kab,kac->kbc", Ja, Ja, precision=_HI), idx_a, P
    ) + jax.ops.segment_sum(
        jnp.einsum("kab,kac->kbc", Jb, Jb, precision=_HI), idx_b, P
    ) + jax.ops.segment_sum(
        jnp.einsum("kab,kac->kbc", Jp_s, Jp_s, precision=_HI), prob.kp_i, P
    ) + jax.ops.segment_sum(
        jnp.einsum("kab,kac->kbc", Jp_t, Jp_t, precision=_HI), prob.kp_j, P
    )
    H_ll = (
        jnp.einsum("kab,kac->kbc", Jl_s, Jl_s, precision=_HI)
        + jnp.einsum("kab,kac->kbc", Jl_t, Jl_t, precision=_HI)
        + jnp.einsum("kab,kac->kbc", Jl_pr, Jl_pr, precision=_HI)
        + 1e-6 * jnp.eye(3, dtype=dtype)
    )
    L_ll = jnp.linalg.cholesky(H_ll)
    Hpl_s = jnp.einsum("kab,kac->kbc", Jp_s, Jl_s, precision=_HI)
    Hpl_t = jnp.einsum("kab,kac->kbc", Jp_t, Jl_t, precision=_HI)

    eye6 = jnp.eye(6, dtype=dtype)
    U_chain = jnp.einsum("kab,kac->kbc", Ja, Jb, precision=_HI)
    # gauge: pose 0 pinned (identity row, decoupled)
    T_diag = (D_p + 1e-6 * eye6).at[0].set(eye6)
    U = U_chain.at[0].set(0.0)

    # Woodbury columns, trimmed to the leading k_cols slots
    Hs = Hpl_s[:k_cols]
    Ht = Hpl_t[:k_cols]
    Lk = L_ll[:k_cols]
    kp_i = prob.kp_i[:k_cols]
    kp_j = prob.kp_j[:k_cols]
    Hs0 = jnp.where((kp_i == 0)[:, None, None], 0.0, Hs)
    Ht0 = jnp.where((kp_j == 0)[:, None, None], 0.0, Ht)
    Vhat_s = jax.scipy.linalg.solve_triangular(
        Lk, Hs0.swapaxes(-1, -2), lower=True
    ).swapaxes(-1, -2)
    Vhat_t = jax.scipy.linalg.solve_triangular(
        Lk, Ht0.swapaxes(-1, -2), lower=True
    ).swapaxes(-1, -2)
    onehot_i = (kp_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    onehot_j = (kp_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    V = jnp.einsum("kp,kba->pbka", onehot_i, Vhat_s, precision=_DEFP) + jnp.einsum(
        "kp,kba->pbka", onehot_j, Vhat_t, precision=_DEFP
    )

    multi_solve = (
        solve_block_tridiag_multi
        if jax.default_backend() == "tpu"
        else thomas_block_tridiag_multi
    )
    Wv = multi_solve(T_diag, U, V.reshape(P, 6, 3 * k_cols))  # (P, 6, 3k)

    AW = jnp.einsum(
        "kba,kbr->kar", Vhat_s, Wv[kp_i], precision=_DEFP
    ) + jnp.einsum("kba,kbr->kar", Vhat_t, Wv[kp_j], precision=_DEFP)
    C = jnp.eye(3 * k_cols, dtype=dtype) - AW.reshape(3 * k_cols, 3 * k_cols)
    Lc = jnp.linalg.cholesky(0.5 * (C + C.T))

    # correction blocks: Wv_p C^-1 Wv_p^T = Z_p^T Z_p, Z = Lc^-1 Wv^T
    Z = jax.scipy.linalg.solve_triangular(
        Lc, Wv.reshape(P * 6, 3 * k_cols).T, lower=True
    )  # (3k, 6P)
    corr = jnp.einsum(
        "kpa,kpb->pab", Z.reshape(3 * k_cols, P, 6), Z.reshape(3 * k_cols, P, 6),
        precision=_DEFP,
    )

    diagT = block_tridiag_selected_inverse(T_diag, U)
    cov = diagT + corr
    return cov.at[0].set(0.0)  # the gauge pose has zero uncertainty
