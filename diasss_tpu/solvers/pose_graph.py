"""Global pose-graph optimization — the TPU-native replacement for iSAM2.

The reference streams every ping into GTSAM's incremental iSAM2 solver
(/root/reference/src/core/optimizer.cpp:133-276): per ping it inserts a noisy DR
initial value, an odometry BetweenFactor to the previous ping (cross-frame links
connect consecutive frames, :172-186), an optional loop-closure BetweenFactor
(:203-260), and calls ``isam.update()`` twice (:264-268).  iSAM2's Bayes-tree
update is inherently sequential and pointer-heavy — the opposite of a TPU
workload — but its *fixed point* is the nonlinear least-squares optimum of the
full graph, which a batched Levenberg-Marquardt reaches directly (SURVEY §7
"iSAM2 semantics without iSAM2").

Structure exploited:

* all poses of all frames form ONE chain (the reference's cross-frame odometry
  makes the concatenated ping sequence globally consecutive), so the odometry
  factors are ``(i, i+1)`` for ``i in [0, P-1)``;
* loop closures are sparse extra between factors with per-factor diagonal
  covariances from the LC mini-solves (optimizer.cpp:250-256);
* the gauge is fixed by holding pose 0 constant — the f32-safe equivalent of the
  reference's sigma=1e-6 prior on the first ping (:164-170).

The linear system of each LM trial is solved with preconditioned conjugate
gradients where the Hessian-vector product is evaluated *factor-wise*
(gather -> batched 6x6 GEMMs -> segment-sum scatter): O(F) work per matvec,
fully parallel, shards cleanly over a device mesh (poses block-partitioned,
psum-reduced gradients).  The preconditioner is selectable
(PoseGraphConfig.preconditioner): block-Jacobi (wide batched kernels — wins on
TPU at survey scale) or the segment-parallel cyclic-reduction chain solve
(:mod:`.tridiag` — wins on CPU and very long chains); "auto" picks by backend.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PoseGraphConfig
from ..factors.between import between_residual
from ..geometry import se3

_HI = jax.lax.Precision.HIGHEST
_DEFP = jax.lax.Precision.DEFAULT  # see _direct_lm_step docstring


class PoseGraph(NamedTuple):
    """Static-shape pose-graph problem."""

    poses0: se3.Pose3  # (P,) initial values
    odo_meas: se3.Pose3  # (P-1,) odometry measurements between(i, i+1)
    odo_sigmas: jnp.ndarray  # (6,) shared odometry noise sigmas
    lc_i: jnp.ndarray  # (Fl,) int32 source pose index
    lc_j: jnp.ndarray  # (Fl,) int32 target pose index
    lc_meas: se3.Pose3  # (Fl,) loop-closure measurements
    lc_sigmas: jnp.ndarray  # (Fl, 6) per-factor sigmas (sqrt of LC variances)
    lc_valid: jnp.ndarray  # (Fl,) bool


class SolveInfo(NamedTuple):
    error0: jnp.ndarray
    error: jnp.ndarray
    iterations: jnp.ndarray
    cg_iters_total: jnp.ndarray
    grad_norm: jnp.ndarray
    lam: jnp.ndarray = None  # final LM damping (resume/checkpoint state)
    stall: jnp.ndarray = None  # consecutive no-improvement trials (resume state)
    # resolved linear-solve kind (see full_ba.BAInfo.solver_kind): trace-time
    # static, attached by non-jit wrappers / computed by callers via
    # resolve_pg_solver_kind — never inside the jitted solver.
    solver_kind: str = None


def resolve_pg_solver_kind(preconditioner: str, P: int, L_lc: int) -> str:
    """Trace-time resolution of ``PoseGraphConfig.preconditioner`` — single
    source of truth for the "auto" policy, shared by :func:`solve_pose_graph`
    and observability callers (VERDICT r4 item 3)."""
    kind = preconditioner
    if kind == "auto":
        if jax.default_backend() == "tpu":
            mem_ok = P * 6 * (6 * L_lc + 1) * 4 * 3 < 4e9  # V+B+W transients
            kind = "direct" if (L_lc <= 1024 and mem_ok) else "dense_seg"
        else:
            kind = "tridiag"
    return kind


def _whitened_residuals(poses: se3.Pose3, graph: PoseGraph):
    """All factor residuals, whitened; invalid LC slots contribute zero."""
    P = graph.poses0.t.shape[0]
    xi_a = poses[jnp.arange(P - 1)]
    xi_b = poses[jnp.arange(1, P)]
    r_odo = jax.vmap(between_residual)(xi_a, xi_b, graph.odo_meas) / graph.odo_sigmas
    xl_a = poses[graph.lc_i]
    xl_b = poses[graph.lc_j]
    r_lc = jax.vmap(between_residual)(xl_a, xl_b, graph.lc_meas) / graph.lc_sigmas
    r_lc = jnp.where(graph.lc_valid[:, None], r_lc, 0.0)
    return r_odo, r_lc


def graph_error(poses: se3.Pose3, graph: PoseGraph) -> jnp.ndarray:
    r_odo, r_lc = _whitened_residuals(poses, graph)
    return 0.5 * (jnp.sum(r_odo * r_odo) + jnp.sum(r_lc * r_lc))


def _linearize_between(xi: se3.Pose3, xj: se3.Pose3, meas: se3.Pose3, sigmas: jnp.ndarray):
    """Whitened residual + 6x6 Jacobians wrt right-perturbations of both poses."""

    def f(d):
        di, dj = d[:6], d[6:]
        return between_residual(se3.retract(xi, di), se3.retract(xj, dj), meas) / sigmas

    zero = jnp.zeros((12,), xi.t.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)
    return r, J[:, :6], J[:, 6:]


def _build_normal_terms(poses: se3.Pose3, graph: PoseGraph):
    """Per-factor whitened Jacobians, residuals, and index arrays."""
    P = poses.t.shape[0]
    idx_i = jnp.concatenate([jnp.arange(P - 1), graph.lc_i])
    idx_j = jnp.concatenate([jnp.arange(1, P), graph.lc_j])
    meas = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b]), graph.odo_meas, graph.lc_meas
    )
    sig = jnp.concatenate(
        [jnp.broadcast_to(graph.odo_sigmas, (P - 1, 6)), graph.lc_sigmas]
    )
    valid = jnp.concatenate([jnp.ones(P - 1, bool), graph.lc_valid])

    xi = poses[idx_i]
    xj = poses[idx_j]
    r, Ji, Jj = jax.vmap(_linearize_between)(xi, xj, meas, sig)
    w = valid[:, None].astype(r.dtype)
    return idx_i, idx_j, r * w, Ji * w[..., None], Jj * w[..., None]


def _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0: bool):
    """g = J^T r and the block-diagonal of H = J^T J (both with pose 0 fixed)."""
    gi = jnp.einsum("fab,fa->fb", Ji, r, precision=_HI)
    gj = jnp.einsum("fab,fa->fb", Jj, r, precision=_HI)
    g = jax.ops.segment_sum(gi, idx_i, P) + jax.ops.segment_sum(gj, idx_j, P)
    Di = jnp.einsum("fab,fac->fbc", Ji, Ji, precision=_HI)
    Dj = jnp.einsum("fab,fac->fbc", Jj, Jj, precision=_HI)
    D = jax.ops.segment_sum(Di, idx_i, P) + jax.ops.segment_sum(Dj, idx_j, P)
    if fixed0:
        g = g.at[0].set(0.0)
        D = D.at[0].set(jnp.eye(6, dtype=D.dtype))
    return g, D


def _make_matvec(idx_i, idx_j, Ji, Jj, P, lam, D, fixed0: bool):
    """(H + lam*blockdiag(D)) v with H applied factor-wise."""

    def matvec(v):  # v: (P, 6)
        if fixed0:
            v = v.at[0].set(0.0)
        vi = v[idx_i]
        vj = v[idx_j]
        a = jnp.einsum("fab,fb->fa", Ji, vi, precision=_HI) + jnp.einsum(
            "fab,fb->fa", Jj, vj, precision=_HI
        )
        out = jax.ops.segment_sum(
            jnp.einsum("fab,fa->fb", Ji, a, precision=_HI), idx_i, P
        ) + jax.ops.segment_sum(jnp.einsum("fab,fa->fb", Jj, a, precision=_HI), idx_j, P)
        out = out + lam * jnp.einsum("pab,pb->pa", D, v, precision=_HI)
        if fixed0:
            out = out.at[0].set(v[0])  # identity row keeps the fixed block inert
        return out

    return matvec


def _direct_lm_step(graph, idx_i, idx_j, Ji, Jj, g, D, lam, P, L_lc):
    """Single-lam exact damped step; see :func:`_direct_lm_step_multi`."""
    return _direct_lm_step_multi(
        graph, idx_i, idx_j, Ji, Jj, g, D, jnp.reshape(lam, (1,)), P, L_lc
    )[0]


def _direct_lm_step_multi(graph, idx_i, idx_j, Ji, Jj, g, D, lams, P, L_lc):
    """EXACT damped-LM steps for a (K,) vector of damping candidates — zero
    CG iterations; returns (K, P, 6) deltas.  The linearization, the chain
    coupling U and the Woodbury RHS block B are lam-independent and computed
    once; only the damped chain factorization + capacitance solve are
    vmapped over K, so a K-candidate damping sweep costs K-wide batched
    algebra on otherwise latency-bound narrow kernels, not K serial trials.

    The damped Hessian decomposes as ``H + lam*blockdiag(H) = T' + V V^T``:

    * ``T'`` = the odometry chain's block-tridiagonal Hessian plus the LM
      damping ``lam * blockdiag(H)`` — solved exactly by multi-RHS cyclic
      reduction (log2(P) levels of batched 6x6 algebra,
      :func:`.tridiag.solve_block_tridiag_multi`);
    * ``V`` = the loop-closure factor columns (6 per LC factor, width 6*L) —
      folded in by the Woodbury identity with one dense (6L, 6L) Cholesky.

    One chain factorization + one small dense solve replace the thousands of
    sequential PCG iterations the factor-wise matvec needs (PERF.md round-2
    shootout: 2664-7482 CG iters at P=3000).  Every piece is a wide batched
    GEMM — MXU work, no serial dependency chain beyond log2(P).

    Gauge handling matches the PCG path (pose 0 fixed): chain coupling U[0]
    and every LC Jacobian block touching pose 0 are zeroed, row 0 of T' is
    decoupled, so ``delta[0] == 0`` exactly (g[0] is already zero).

    Precision: this step runs its einsums at DEFAULT matmul precision, not
    the _HI the PCG matvec uses — measured on TPU v5e (P=3000, L=5): HIGHEST
    413 ms/step vs DEFAULT 33 ms (12x; XLA's HIGHEST lowering of the tiny
    6x6-batched contractions defeats vectorization).  The LM accept gate
    re-evaluates the TRUE error after every step, so a slightly inexact
    direct step costs at most an extra trial, never a wrong fixed point.
    """
    from .tridiag import (
        solve_block_tridiag,
        solve_block_tridiag_multi,
        thomas_block_tridiag_multi,
    )

    # backend-matched chain solve: the 2P-step Thomas scan wins on CPU (cheap
    # tiny cho_solves, O(1)-in-P compile); TPU pays for the serial scan over
    # small triangular solves, so the log2(P)-level batched cyclic reduction
    # wins there (measured P=3000, R=385, TPU v5e: Thomas 18.9 ms vs CR 3.7 ms
    # per multi-RHS solve; CPU: Thomas 4.8 s vs CR slower at trace-time cost)
    multi_solve = (
        solve_block_tridiag_multi
        if jax.default_backend() == "tpu"
        else thomas_block_tridiag_multi
    )

    dtype = D.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    Ji_o, Jj_o = Ji[: P - 1], Jj[: P - 1]
    U = jnp.einsum("fab,fac->fbc", Ji_o, Jj_o, precision=_DEFP).at[0].set(0.0)
    D_odo = jax.ops.segment_sum(
        jnp.einsum("fab,fac->fbc", Ji_o, Ji_o, precision=_DEFP), idx_i[: P - 1], P
    ) + jax.ops.segment_sum(
        jnp.einsum("fab,fac->fbc", Jj_o, Jj_o, precision=_DEFP), idx_j[: P - 1], P
    )
    D_odo = D_odo.at[0].set(eye6)

    # everything above this line is lam-independent and shared by all sweep
    # candidates; only the damped diagonal (and hence the chain factorization
    # + Woodbury) differs per lam — vmapped below, so a K-candidate damping
    # sweep is K-WIDE batched algebra, not K serial factorizations.
    if L_lc == 0:

        def solve_one(lam):
            T_diag = D_odo + lam * D + 1e-6 * eye6
            return solve_block_tridiag(T_diag, U, -g).at[0].set(0.0)

        return jax.vmap(solve_one)(lams)

    Ji_l = jnp.where((graph.lc_i == 0)[:, None, None], 0.0, Ji[P - 1 :])
    Jj_l = jnp.where((graph.lc_j == 0)[:, None, None], 0.0, Jj[P - 1 :])

    # V: (P, 6, L, 6) — column block l holds A_l^T, A_l v = Ji_l v_i + Jj_l v_j.
    # Built as a one-hot broadcast-multiply, NOT a scatter-add: a 2-index-dim
    # scatter with TRACED index vectors lowers to a serial per-row update loop
    # on TPU (measured: 393 ms/trial for the whole step vs 9 ms with this
    # construction — the scatter WAS the direct solver's cost).
    onehot_i = (graph.lc_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)  # (L, P)
    onehot_j = (graph.lc_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    V = jnp.einsum(
        "lp,lba->pbla", onehot_i, jnp.swapaxes(Ji_l, -1, -2), precision=_DEFP
    ) + jnp.einsum(
        "lp,lba->pbla", onehot_j, jnp.swapaxes(Jj_l, -1, -2), precision=_DEFP
    )

    B = jnp.concatenate([(-g)[:, :, None], V.reshape(P, 6, 6 * L_lc)], axis=2)

    def solve_one(lam):
        T_diag = D_odo + lam * D + 1e-6 * eye6
        W = multi_solve(T_diag, U, B)
        w0, Wv = W[:, :, 0], W[:, :, 1:]

        # capacitance C = I + V^T T'^-1 V, assembled by gathering W at the LC poses
        AW = jnp.einsum(
            "lab,lbr->lar", Ji_l, Wv[graph.lc_i], precision=_DEFP
        ) + jnp.einsum("lab,lbr->lar", Jj_l, Wv[graph.lc_j], precision=_DEFP)
        C = AW.reshape(6 * L_lc, 6 * L_lc) + jnp.eye(6 * L_lc, dtype=dtype)
        c0 = (
            jnp.einsum("lab,lb->la", Ji_l, w0[graph.lc_i], precision=_DEFP)
            + jnp.einsum("lab,lb->la", Jj_l, w0[graph.lc_j], precision=_DEFP)
        ).reshape(-1)
        Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
        y = jax.scipy.linalg.cho_solve((Lc, True), c0)
        delta = w0 - jnp.einsum("pbr,r->pb", Wv, y, precision=_DEFP)
        return delta.at[0].set(0.0)

    return jax.vmap(solve_one)(lams)


def _pcg(matvec, b, precond, tol, max_iters):
    """Preconditioned CG on the (P, 6) block vector space."""

    def dot(a, b):
        return jnp.sum(a * b)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    bnorm = jnp.sqrt(dot(b, b))
    thresh = tol * jnp.maximum(bnorm, 1e-30)

    def cond(state):
        _, r, _, _, k = state
        return (jnp.sqrt(dot(r, r)) > thresh) & (k < max_iters)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32)))
    return x, k


def _dr_chain(graph: PoseGraph) -> se3.Pose3:
    """Absolute pose chain implied by the odometry measurements alone:
    ``chain[p] = poses0[0] . odo[0] . ... . odo[p-1]`` — the clean
    (noise-free) dead-reckoning trajectory.  One associative scan of pose
    composition: log2(P) depth, batched 3x3 algebra."""
    rel = jax.lax.associative_scan(se3.compose, graph.odo_meas)
    P = graph.poses0.t.shape[0]
    first = jax.tree_util.tree_map(lambda a: a[:1], graph.poses0)
    base = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (P - 1,) + a.shape[1:]), first
    )
    rest = se3.compose(base, rel)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), first, rest
    )


@functools.partial(jax.jit, static_argnames=("stride",))
def _coarse_graph_and_chain(graph: PoseGraph, stride: int):
    """Restrict the pose graph to every ``stride``-th pose.

    Coarse odometry = the composed fine odometry between consecutive
    anchors; coarse LC (i, j) -> (i//stride, j//stride) with the
    measurement conjugated by the clean DR offsets from each endpoint to
    its anchor (exact if the fine solution followed DR within a segment);
    intra-segment LCs are dropped.  Odometry sigmas grow by sqrt(stride)
    (random-walk accumulation).
    """
    P = graph.poses0.t.shape[0]
    chain = _dr_chain(graph)
    idx_a = jnp.arange(0, P, stride)
    coarse0 = chain[idx_a]
    codo = se3.between(chain[idx_a[:-1]], chain[idx_a[1:]])
    ci, cj = graph.lc_i // stride, graph.lc_j // stride
    anchor_i, anchor_j = ci * stride, cj * stride
    lc_adj = se3.compose(
        se3.between(chain[anchor_i], chain[graph.lc_i]),
        se3.compose(
            graph.lc_meas,
            se3.inverse(se3.between(chain[anchor_j], chain[graph.lc_j])),
        ),
    )
    cgraph = PoseGraph(
        poses0=coarse0,
        odo_meas=codo,
        odo_sigmas=graph.odo_sigmas * jnp.sqrt(jnp.asarray(stride, graph.odo_sigmas.dtype)),
        lc_i=ci.astype(jnp.int32),
        lc_j=cj.astype(jnp.int32),
        lc_meas=lc_adj,
        lc_sigmas=graph.lc_sigmas,
        lc_valid=graph.lc_valid & (ci != cj),
    )
    return cgraph, chain


@functools.partial(jax.jit, static_argnames=("stride",))
def _prolongate(coarse_poses: se3.Pose3, chain: se3.Pose3, stride: int) -> se3.Pose3:
    """Fine initial values from a coarse solution: each pose = its segment
    anchor's coarse estimate composed with the clean DR offset to it."""
    P = chain.t.shape[0]
    k = jnp.arange(P) // stride
    anchors = k * stride
    return se3.compose(
        jax.tree_util.tree_map(lambda a: a[k], coarse_poses),
        se3.between(chain[anchors], chain),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "allow_coarse_init"))
def solve_pose_graph(graph: PoseGraph, cfg: PoseGraphConfig = PoseGraphConfig(),
                     lam0=None, stall0=None, allow_coarse_init: bool = True):
    """Batched LM on the full pose graph; returns (poses, SolveInfo).

    Reaches the same fixed point as the reference's repeated ``isam.update()``
    stream (the nonlinear LSQ optimum of the identical factor graph).
    ``lam0`` / ``stall0`` resume LM damping and the stall-exit counter from a
    checkpoint (:mod:`..checkpoint`) — carrying the stall counter keeps the
    2-trial stall exit identical across chunk boundaries.
    """
    P = graph.poses0.t.shape[0]
    err0 = graph_error(graph.poses0, graph)

    L_lc = graph.lc_i.shape[0]

    def make_trial(precond_kind):
        def trial(carry, _):
            poses, err, lam = carry
            idx_i, idx_j, r, Ji, Jj = _build_normal_terms(poses, graph)
            g, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)

            if precond_kind == "direct":
                # damping sweep: solve the exact step for K lam candidates in
                # ONE K-wide batched factorization and keep the best improving
                # one — a parallel line search in the damping dimension.
                # Default is K=1 (the classic accept *0.3 / reject *10
                # schedule): measured at the 12k bench point the vmapped CR
                # costs ~2.5x at K=4 (HBM traffic on the (K, P, 6, R)
                # buffers) and the sweep does not cut the trial count — see
                # PoseGraphConfig.lam_sweep_factors for the numbers.
                factors = jnp.asarray(cfg.lam_sweep_factors, dtype=lam.dtype)
                lams = jnp.clip(lam * factors, 1e-9, 1e6)
                deltas = _direct_lm_step_multi(
                    graph, idx_i, idx_j, Ji, Jj, g, D, lams, P, L_lc
                )
                # direct = zero CG iterations (convention unified across all
                # direct paths — full BA, SP pose graph, SP full BA)
                cg_k = jnp.asarray(0, jnp.int32)

                def apply_delta(delta):
                    new_poses = se3.retract(poses, delta)
                    return jax.tree_util.tree_map(
                        lambda a, b: jnp.where(
                            (jnp.arange(P) == 0).reshape(
                                (P,) + (1,) * (a.ndim - 1)
                            ),
                            a,
                            b,
                        ),
                        poses,
                        new_poses,
                    )

                cand_poses = jax.vmap(apply_delta)(deltas)
                cand_errs = jax.vmap(lambda p: graph_error(p, graph))(cand_poses)
                cand_errs = jnp.where(jnp.isfinite(cand_errs), cand_errs, jnp.inf)
                best = jnp.argmin(cand_errs)
                new_err = cand_errs[best]
                good = jnp.isfinite(new_err) & (new_err < err)
                poses = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(good, b[best], a), poses, cand_poses
                )
                err = jnp.where(good, new_err, err)
                # accept: adopt the winning candidate's damping (the next
                # sweep brackets around it; with a single factor this is the
                # classic *0.3 decay); reject: escalate past the largest
                # explored factor
                decay = 0.3 if len(cfg.lam_sweep_factors) == 1 else 1.0
                up = jnp.maximum(jnp.max(factors), 10.0)
                lam = jnp.where(
                    good,
                    jnp.maximum(lams[best] * decay, 1e-9),
                    jnp.minimum(lam * up, 1e6),
                )
                return (poses, err, lam), (jnp.linalg.norm(g), cg_k)

            Dp = D * (1.0 + lam) + 1e-6 * jnp.eye(6, dtype=D.dtype)

            if precond_kind == "chain":
                # EXACT chain preconditioner (round 5; see FullBAConfig
                # "chain"): factor the damped chain once per LM trial into
                # the two-level ChainFactor — every PCG application is
                # batched GEMM work and solves the chain exactly, so CG
                # counts are loop-closure-bound.  The scalable option past
                # the direct Woodbury guard (L > 1024 LC factors).
                from .tridiag import auto_dense_segment, chain_factor, chain_solve

                U = jnp.einsum("fab,fac->fbc", Ji[: P - 1], Jj[: P - 1], precision=_HI)
                U = U.at[0].set(0.0)
                fac = chain_factor(Dp, U, auto_dense_segment(P, cfg.tridiag_segment))

                def precond(v):
                    return chain_solve(fac, v)

            elif precond_kind == "dense_seg":
                from .tridiag import (
                    apply_dense_segment_inverses,
                    auto_dense_segment,
                    dense_segment_inverses,
                )

                U = jnp.einsum("fab,fac->fbc", Ji[: P - 1], Jj[: P - 1], precision=_HI)
                U = U.at[0].set(0.0)
                seg = auto_dense_segment(P, cfg.tridiag_segment)
                Minv = dense_segment_inverses(Dp, U, seg)

                def precond(v):
                    return apply_dense_segment_inverses(Minv, v)

            elif precond_kind == "tridiag":
                # exact chain preconditioner: the odometry part of H is exactly
                # block-tridiagonal, solved in log2(P) batched levels (cyclic
                # reduction) — PCG iterations are then governed by the
                # loop-closure corrections, not the chain length
                from .tridiag import solve_block_tridiag_segmented

                U = jnp.einsum(
                    "fab,fac->fbc", Ji[: P - 1], Jj[: P - 1], precision=_HI
                )
                # pose 0 is the gauge: decouple it (D row is identity in Dp)
                U = U.at[0].set(0.0)

                def precond(v):
                    return solve_block_tridiag_segmented(Dp, U, v, cfg.tridiag_segment)

            else:
                L = jnp.linalg.cholesky(Dp)

                def precond(v):
                    return jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]

            matvec = _make_matvec(idx_i, idx_j, Ji, Jj, P, lam, D, fixed0=True)
            delta, cg_k = _pcg(matvec, -g, precond, cfg.cg_tol, cfg.cg_max_iters)
            new_poses = se3.retract(poses, delta)
            # keep the fixed pose bit-identical
            new_poses = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    (jnp.arange(P) == 0).reshape((P,) + (1,) * (a.ndim - 1)), a, b
                ),
                poses,
                new_poses,
            )
            new_err = graph_error(new_poses, graph)
            good = jnp.isfinite(new_err) & (new_err < err)
            poses = jax.tree_util.tree_map(lambda a, b: jnp.where(good, b, a), poses, new_poses)
            err = jnp.where(good, new_err, err)
            lam = jnp.where(good, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 10.0, 1e6))
            return (poses, err, lam), (jnp.linalg.norm(g), cg_k)

        return trial

    # while_loop with convergence exit: stop when two consecutive accepted
    # trials improve the error by < rel_exit_tol (relative), or on iteration cap
    rel_exit_tol = 1e-6
    dtype = graph.poses0.t.dtype

    def run_phase(precond_kind, poses, err, lam, max_iters, stall_init):
        trial = make_trial(precond_kind)

        def w_cond(state):
            _, _, _, k, stall, _, _ = state
            return (k < max_iters) & (stall < 2)

        def w_body(state):
            poses, err, lam, k, stall, cg_total, gnorm = state
            (poses2, err2, lam2), (g_n, cg_k) = trial((poses, err, lam), None)
            improved = (err - err2) > rel_exit_tol * jnp.maximum(err, 1e-30)
            stall = jnp.where(improved, 0, stall + 1)
            return poses2, err2, lam2, k + 1, stall, cg_total + cg_k, g_n

        return jax.lax.while_loop(
            w_cond,
            w_body,
            (
                poses,
                err,
                lam,
                jnp.asarray(0, jnp.int32),
                stall_init,
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0.0, dtype),
            ),
        )

    # trace-time platform choice (see resolve_pg_solver_kind).  TPU: the
    # exact direct Woodbury chain step wins outright at survey scale —
    # measured P=3000/L=5 on v5e (scripts/profile_direct.py, round 3):
    # direct 99 ms (12 LM trials, ZERO CG) vs dense_seg PCG 1793 ms (11 LM,
    # 2252 CG), identical optimum (49.7 vs 49.69).  Guard: the Woodbury
    # multi-RHS buffers are (P, 6, 6L+1) floats and the capacitance Cholesky
    # is (6L)^3 — beyond ~1k LC factors the PCG path's memory profile is
    # safer, so "auto" falls back to dense_seg there (pick "direct"
    # explicitly to override).  Round-2 notes (still true for the PCG
    # family): jacobi 0.77 s but stalls at err 4.3e-3; jacobi->dense hybrid
    # tried and REJECTED.
    kind = resolve_pg_solver_kind(cfg.preconditioner, P, L_lc)

    lam_init = jnp.asarray(1e-4, dtype) if lam0 is None else jnp.asarray(lam0, dtype)
    stall_init = (
        jnp.asarray(0, jnp.int32) if stall0 is None else jnp.asarray(stall0, jnp.int32)
    )

    # coarse-to-fine initialization (opt-in, cfg.coarse_init_stride > 0):
    # solve the graph restricted to every stride-th pose first (P/stride
    # poses — the coarse solve costs ~1/stride of a fine trial), prolongate
    # along the clean DR chain, and start the fine LM from there.  Fresh
    # solves only: resumed (lam0/stall0) and warm-started callers pass
    # allow_coarse_init=False — a checkpoint iterate or a previous estimate
    # is already a better init than the DR chain.
    init_poses, err_init = graph.poses0, err0
    stride = int(getattr(cfg, "coarse_init_stride", 0) or 0)
    if (
        allow_coarse_init
        and stride > 1
        and lam0 is None
        and stall0 is None
        and P > 4 * stride
    ):
        cgraph, chain = _coarse_graph_and_chain(graph, stride)
        import dataclasses as _dc

        ccfg = _dc.replace(cfg, coarse_init_stride=0)
        cposes, _cinfo = solve_pose_graph(cgraph, ccfg, allow_coarse_init=False)
        cand = _prolongate(cposes, chain, stride)
        # keep the gauge pose exactly and only adopt the coarse-informed
        # init if it actually starts closer to the optimum
        cand = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[:1], b[1:]], axis=0), graph.poses0, cand
        )
        err_cand = graph_error(cand, graph)
        better = jnp.isfinite(err_cand) & (err_cand < err0)
        init_poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, b, a), graph.poses0, cand
        )
        err_init = jnp.where(better, err_cand, err0)

    poses, err, lam_f, iters, stall_f, cg_total, gnorm = run_phase(
        kind, init_poses, err_init, lam_init, cfg.max_gn_iters, stall_init
    )
    info = SolveInfo(
        error0=err0,
        error=err,
        iterations=iters,
        cg_iters_total=cg_total,
        grad_norm=gnorm,
        lam=lam_f,
        stall=stall_f,
    )
    return poses, info


@jax.jit
def _build_chain_device(rows):
    dr_poses = se3.from_rodrigues_xyz(rows)
    P = rows.shape[0]
    odo_meas = se3.between(dr_poses[: P - 1], dr_poses[1:])
    return dr_poses, odo_meas


@jax.jit
def _build_chain_device_noise(rows, noise_sig, noise_key):
    dr_poses = se3.from_rodrigues_xyz(rows)
    P = rows.shape[0]
    odo_meas = se3.between(dr_poses[: P - 1], dr_poses[1:])
    noise = jax.random.normal(noise_key, (P, 6)) * noise_sig
    # first pose stays exact (it is the gauge)
    noise = noise.at[0].set(0.0)
    poses0 = se3.compose(dr_poses, se3.expmap(noise.astype(jnp.float32)))
    return poses0, odo_meas


def build_chain_graph(
    dr_rows_list,
    lc_i,
    lc_j,
    lc_meas,
    lc_sigmas,
    lc_valid,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    noise_key=None,
):
    """Assemble the global PoseGraph from per-frame DR rows + LC factors.

    ``dr_rows_list``: list of (N_f, 6) arrays.  Pose indices are global over the
    concatenation (the reference's unique_id, optimizer.cpp:101-114).  Odometry
    measurements are exact DR relative poses (optimizer.cpp:180-199); initial
    values get the reference's injected Gaussian noise (optimizer.cpp:154-160)
    when ``noise_key`` is given.
    """
    import numpy as np

    rows = jnp.asarray(np.concatenate(dr_rows_list, axis=0), jnp.float32)

    deg = np.pi / 180.0
    odo_sigmas = jnp.asarray(
        [
            cfg.odo_sigma_ro_deg * deg,
            cfg.odo_sigma_pi_deg * deg,
            cfg.odo_sigma_ya_deg * deg,
            cfg.odo_sigma_x,
            cfg.odo_sigma_y,
            cfg.odo_sigma_z,
        ],
        jnp.float32,
    )

    # ONE jitted program for the device math: op-by-op dispatch of the
    # Rodrigues/between/compose chains cost ~40 tiny programs — and on a
    # remote-dispatch tunnel ~10-20 ms latency EACH (~0.7 s of the 12k-pose
    # bench's pose_graph stage before this)
    if noise_key is not None:
        noise_sig = jnp.concatenate(
            [
                jnp.full((3,), cfg.init_noise_rpy_deg * deg, jnp.float32),
                jnp.full((3,), cfg.init_noise_xyz, jnp.float32),
            ]
        )
        poses0, odo_meas = _build_chain_device_noise(rows, noise_sig, noise_key)
    else:
        poses0, odo_meas = _build_chain_device(rows)

    return PoseGraph(
        poses0=poses0,
        odo_meas=odo_meas,
        odo_sigmas=odo_sigmas,
        lc_i=jnp.asarray(lc_i, jnp.int32),
        lc_j=jnp.asarray(lc_j, jnp.int32),
        lc_meas=lc_meas,
        lc_sigmas=jnp.asarray(lc_sigmas, jnp.float32),
        lc_valid=jnp.asarray(lc_valid, bool),
    )


@jax.jit
def pg_pose_marginals(graph: PoseGraph, poses: se3.Pose3) -> jnp.ndarray:
    """(P, 6, 6) EXACT marginal covariance blocks of the pose-graph estimate
    — the two-stage estimator's global analogue of GTSAM's QR ``Marginals``
    (the reference only ever computes marginals of the per-correspondence
    MINI-graphs, optimizer.cpp:956; a global trajectory covariance is beyond
    its capability).  Mirrors :func:`..full_ba.ba_pose_marginals`:

        H = T + V V^T,  diag(H^-1)_p = diag(T^-1)_p - Wv_p C^-1 Wv_p^T

    with T the gauge-fixed odometry chain (Takahashi selected inversion,
    O(P)), V the loop-closure factor columns (6 per factor — the ADDED sign,
    so loop closures SUBTRACT uncertainty, as they must), ``Wv = T^-1 V``
    from the same multi-RHS chain solve as the direct LM step, and
    ``C = I + V^T T^-1 V``.  Linearized at the solution; pose 0 is the
    gauge (zero covariance).  Exactness pinned against a dense inverse in
    tests/test_pose_graph.py.
    """
    from .tridiag import (
        block_tridiag_selected_inverse,
        solve_block_tridiag_multi,
        thomas_block_tridiag_multi,
    )

    P = poses.t.shape[0]
    dtype = poses.t.dtype
    L = int(graph.lc_i.shape[0])
    eye6 = jnp.eye(6, dtype=dtype)
    idx_i, idx_j, r, Ji, Jj = _build_normal_terms(poses, graph)

    Ji_o, Jj_o = Ji[: P - 1], Jj[: P - 1]
    U = jnp.einsum("fab,fac->fbc", Ji_o, Jj_o, precision=_DEFP).at[0].set(0.0)
    D_odo = jax.ops.segment_sum(
        jnp.einsum("fab,fac->fbc", Ji_o, Ji_o, precision=_DEFP), idx_i[: P - 1], P
    ) + jax.ops.segment_sum(
        jnp.einsum("fab,fac->fbc", Jj_o, Jj_o, precision=_DEFP), idx_j[: P - 1], P
    )
    T_diag = (D_odo + 1e-6 * eye6).at[0].set(eye6)  # gauge: pose 0 pinned
    diagT = block_tridiag_selected_inverse(T_diag, U)
    if L == 0:
        return diagT.at[0].set(0.0)

    # LC columns; blocks touching the gauge pose vanish (as in the direct step)
    Ji_l = jnp.where((graph.lc_i == 0)[:, None, None], 0.0, Ji[P - 1 :])
    Jj_l = jnp.where((graph.lc_j == 0)[:, None, None], 0.0, Jj[P - 1 :])
    onehot_i = (graph.lc_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    onehot_j = (graph.lc_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
    V = jnp.einsum(
        "lp,lba->pbla", onehot_i, jnp.swapaxes(Ji_l, -1, -2), precision=_DEFP
    ) + jnp.einsum(
        "lp,lba->pbla", onehot_j, jnp.swapaxes(Jj_l, -1, -2), precision=_DEFP
    )
    multi_solve = (
        solve_block_tridiag_multi
        if jax.default_backend() == "tpu"
        else thomas_block_tridiag_multi
    )
    Wv = multi_solve(T_diag, U, V.reshape(P, 6, 6 * L))  # (P, 6, 6L)
    AW = jnp.einsum(
        "lab,lbr->lar", Ji_l, Wv[graph.lc_i], precision=_DEFP
    ) + jnp.einsum("lab,lbr->lar", Jj_l, Wv[graph.lc_j], precision=_DEFP)
    C = AW.reshape(6 * L, 6 * L) + jnp.eye(6 * L, dtype=dtype)
    Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
    Z = jax.scipy.linalg.solve_triangular(
        Lc, Wv.reshape(P * 6, 6 * L).T, lower=True
    )  # (6L, 6P)
    corr = jnp.einsum(
        "kpa,kpb->pab", Z.reshape(6 * L, P, 6), Z.reshape(6 * L, P, 6),
        precision=_DEFP,
    )
    return (diagT - corr).at[0].set(0.0)
