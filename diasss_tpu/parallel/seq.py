"""Sequence-parallel (SP) solvers: the pose chain block-partitioned over devices.

This is the engine's long-context scaling axis (SURVEY §5): the reference
streams every ping serially through iSAM2 (optimizer.cpp:146-276), so its
memory and time grow with total pings on one CPU.  Here the concatenated ping
chain is cut into ``n_devices`` contiguous blocks; each device owns

* its pose block ``(B, 6)`` (B = ceil(P/n)),
* the odometry factors whose SOURCE pose it owns (factor k couples poses
  ``k -> k+1``), and
* a shard of the correspondence/landmark axis (full BA).

Per-device memory for every O(P)-heavy tensor — poses, odometry Jacobian
batches ``(B, 6, 6)``, Hessian block-diagonals, PCG/tridiag state — is
``O(P/n)``.  Communication per CG matvec:

* **halo exchange**: each chain factor at a block boundary needs the FIRST
  pose of the next block — one ``ppermute`` of a single 6-vector (and one
  reverse ``ppermute`` to send the boundary factor's gradient/matvec
  contribution back).  This is the blockwise Schur/halo pattern of SURVEY §5.
* **loop closures** (pose graph): LC endpoints are gathered with an L-sized
  masked ``psum`` (L = #loop closures, tiny) — every device then evaluates the
  identical L-sized LC algebra and keeps only the rows it owns.  No O(P)
  buffer anywhere.
* **correspondences** (full BA): owner-aligned — each sonar factor lives on
  the device owning its SOURCE pose (one build-time ``all_to_all`` reshard,
  :mod:`.alltoall`), so the source gather is a local read; the TARGET pose
  endpoint rides a routed ``all_to_all`` exchange of only the unique rows
  each device pair shares (O(n * Rj) per matvec, Rj <= K/n).  There is no
  O(P) collective anywhere in the BA solve.

The preconditioner is the segment-parallel block-tridiagonal chain solve
(:mod:`..solvers.tridiag`) applied per block — device boundaries act as
segment cuts, which is exactly the approximation ``tridiag_segment`` already
makes on one device, so single-device and SP solves agree to solver tolerance
(equivalence-tested on the 8-device CPU mesh, tests/test_seq_parallel.py).

Everything below runs INSIDE one ``shard_map``-wrapped LM loop: scalar state
(error, lambda) is computed from psum-reduced quantities and therefore stays
bit-identical across devices.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _jax_shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _jax_shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import FullBAConfig, KeypointNoiseConfig, PoseGraphConfig
from ..geometry import se3
from ..solvers.pose_graph import PoseGraph, SolveInfo, _linearize_between
from ..solvers.full_ba import BAProblem, BAInfo, _sss_factor_terms, _huber_weight, _huber_rho
from ..factors.between import between_residual
from ..factors.sss_point import kp_noise_sigmas

_HI = lax.Precision.HIGHEST
_DEFP = lax.Precision.DEFAULT  # the direct step's einsums (see pose_graph._direct_lm_step_multi)


def _tree_concat(a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.concatenate([x, y]), a, b)


def to_host(x) -> np.ndarray:
    """Fetch a device array to host numpy, multi-process safe: an array
    sharded over a multi-host mesh is not fully addressable from one process,
    so gather it with ``process_allgather`` (every process gets the global
    value); single-process arrays take the plain path."""
    if getattr(x, "is_fully_addressable", True) or jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _pad_chain(graph: PoseGraph, n: int):
    """Pad poses to n*B with identity poses and the odometry factor array to
    one entry per pose (factor k couples k -> k+1; entries >= P-1 invalid)."""
    P_real = int(graph.poses0.t.shape[0])
    B = -(-P_real // n)
    P_pad = n * B
    pp = P_pad - P_real
    poses0 = graph.poses0
    if pp:
        poses0 = _tree_concat(poses0, se3.identity((pp,), poses0.t.dtype))
    # odo_meas has P_real-1 entries; pad to P_pad (dummy identity measurements)
    pf = P_pad - (P_real - 1)
    odo_meas = _tree_concat(graph.odo_meas, se3.identity((pf,), poses0.t.dtype))
    return poses0, odo_meas, B, P_pad, P_real


def resolve_seq_pg_solver_kind(preconditioner: str, B: int, L: int) -> str:
    """Trace-time resolution of the SP pose-graph linear-solve kind — the
    single source of truth shared by the jitted solver and observability
    callers (VERDICT r4 item 3).  "direct" on the mesh = the SPIKE exact
    chain factorization."""
    kind = preconditioner
    if kind == "auto":
        if jax.default_backend() == "tpu":
            mem_ok = B * 6 * (6 * L + 1) * 4 * 3 < 4e9
            kind = "direct" if (L <= 1024 and mem_ok and B >= 2) else "dense_seg"
        else:
            kind = "tridiag"
    if kind == "direct" and B < 2:
        kind = "tridiag"  # SPIKE needs >= 2 rows per device
    return kind


def resolve_seq_ba_solver_kind(preconditioner: str, B: int, n: int, Kf: int) -> str:
    """Trace-time resolution of the SP full-BA linear-solve kind (see
    resolve_seq_pg_solver_kind); the capacitance width is 3 per GLOBAL
    (padded) correspondence slot, so the guard uses n * Kf."""
    kind = preconditioner
    if kind == "auto":
        if jax.default_backend() == "tpu":
            Kg = n * Kf
            mem_ok = B * 6 * (3 * Kg + 1) * 4 * 3 < 4e9
            kind = "direct" if (Kg <= 1024 and mem_ok and B >= 2) else "dense_seg"
        else:
            kind = "tridiag"
    if kind == "direct" and B < 2:
        kind = "tridiag"  # SPIKE needs >= 2 rows per device
    return kind


def _pcg_dist(matvec, b, precond, tol, max_iters, dot):
    """PCG with a caller-supplied (psum-reducing) inner product."""
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

    x, r, _, _, k = lax.while_loop(cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32)))
    return x, k


@functools.partial(
    jax.jit, static_argnames=("mesh", "cfg", "axis", "B", "P_real")
)
def _seq_pg_run(poses0, odo_meas, lc_i, lc_j, lc_meas, lc_sigmas, lc_valid,
                odo_sigmas, lam0, stall0, mesh: Mesh, cfg: PoseGraphConfig,
                axis: str, B: int, P_real: int):
    n = mesh.devices.size

    perm_from_next = [((i + 1) % n, i) for i in range(n)]  # recv block d+1's row
    perm_to_next = [(i, (i + 1) % n) for i in range(n)]    # send boundary term fwd

    def solve_blk(poses0_blk, odo_blk, lc_i, lc_j, lc_meas, lc_sigmas, lc_valid,
                  odo_sigmas, lam0, stall0):
        d = lax.axis_index(axis)
        gidx = d * B + jnp.arange(B)
        is_pad = gidx >= P_real
        # rows held fixed: the gauge (global pose 0) and padding
        fix_rows = (gidx == 0) | is_pad
        odo_valid = gidx < P_real - 1  # factor k couples k -> k+1
        dtype = poses0_blk.t.dtype
        eyeB = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (B, 6, 6))

        L = lc_i.shape[0]
        lc_owner_i = lc_i // B
        lc_owner_j = lc_j // B
        lc_loc_i = lc_i % B
        lc_loc_j = lc_j % B

        def halo_next(x_first):
            return lax.ppermute(x_first, axis, perm_from_next)

        def shifted(tree_blk):
            """Per-factor second operand: pose k+1 (local rows 1.. plus the
            halo row — the next block's first pose)."""
            halo = jax.tree_util.tree_map(
                lambda x: halo_next(x[0:1]), tree_blk
            )
            return jax.tree_util.tree_map(
                lambda a, h: jnp.concatenate([a[1:], h]), tree_blk, halo
            )

        def gather_lc(tree_blk, owner, loc):
            """(L,)-sized gather of pose entries: masked local read + psum."""
            mine = owner == d

            def g(x):
                v = x[loc]
                m = mine.reshape(mine.shape + (1,) * (v.ndim - 1))
                return lax.psum(jnp.where(m, v, jnp.zeros_like(v)), axis)

            return jax.tree_util.tree_map(g, tree_blk)

        def scatter_lc(vals, owner, loc):
            """Keep only the rows this device owns; segment-sum into the block."""
            mine = owner == d
            lidx = jnp.where(mine, loc, B)  # row B = dump slot
            return jax.ops.segment_sum(vals, lidx, B + 1)[:B]

        def fix_vec(v):
            return jnp.where(fix_rows[:, None], 0.0, v)

        def chain_residuals(poses_blk):
            xj = shifted(poses_blk)
            r = jax.vmap(between_residual)(poses_blk, xj, odo_blk) / odo_sigmas
            return jnp.where(odo_valid[:, None], r, 0.0)

        def lc_residuals(poses_blk):
            xi = gather_lc(poses_blk, lc_owner_i, lc_loc_i)
            xj = gather_lc(poses_blk, lc_owner_j, lc_loc_j)
            r = jax.vmap(between_residual)(xi, xj, lc_meas) / lc_sigmas
            return jnp.where(lc_valid[:, None], r, 0.0)

        def error(poses_blk):
            r_o = chain_residuals(poses_blk)
            r_l = lc_residuals(poses_blk)  # identical on every device
            return 0.5 * (lax.psum(jnp.sum(r_o * r_o), axis) + jnp.sum(r_l * r_l))

        err0 = error(poses0_blk)

        # trace-time linear-solve choice (mirrors solve_pose_graph's "auto"):
        # on TPU the EXACT direct step — now distributable via the SPIKE
        # chain factorization (tridiag.spike_block_tridiag_multi) — replaces
        # PCG outright under the same guards as the single-device solver
        # (the per-device multi-RHS buffers are (B, 6, 6L+1), n-fold smaller).
        precond_kind = resolve_seq_pg_solver_kind(cfg.preconditioner, B, L)

        def direct_step(g_blk, D, D_chain, Ji, Jj, Jli, Jlj, lam):
            """EXACT damped LM step, distributed: the chain factorization is
            the SPIKE solve (one local multi-RHS factorization + an O(n*R)
            boundary exchange); the Woodbury correction over the (replicated,
            L-sized) loop-closure columns is assembled with the same masked
            gather/psum as the LC residuals.  Same math as
            solvers.pose_graph._direct_lm_step_multi, same gauge handling.
            """
            from ..solvers.tridiag import spike_block_tridiag_multi

            # chain couplings: row k couples local k -> k+1 (k = B-1 crosses
            # the boundary).  Invalid factors are already zero (Ji/Jj masked);
            # zero around fixed rows (gauge + padding)
            U_all = jnp.einsum("kab,kac->kbc", Ji, Jj, precision=_DEFP)
            # row k+1 of the boundary factor (k = B-1) lives on the NEXT
            # device: its first row is fixed iff it is padding (or the cyclic
            # wrap on the last device — whose boundary factor is invalid
            # anyway).  Using the local wrap fix_rows[0] here would wrongly
            # zero device 0's boundary coupling (its row 0 is the gauge).
            next_first_fixed = ((d + 1) * B >= P_real) | (d == n - 1)
            cz = fix_rows | jnp.concatenate(
                [fix_rows[1:], jnp.reshape(next_first_fixed, (1,))]
            )
            U_all = jnp.where(cz[:, None, None], 0.0, U_all)

            # gauge: LC Jacobian blocks touching global pose 0 vanish
            Jli0 = jnp.where((lc_i == 0)[:, None, None], 0.0, Jli)
            Jlj0 = jnp.where((lc_j == 0)[:, None, None], 0.0, Jlj)

            # V rows this device owns: (B, 6, 6L) one-hot broadcast-multiply
            # (NOT scatter-add — same TPU lowering finding as the
            # single-device construction)
            loc = jnp.arange(B)
            oh_i = ((lc_owner_i == d)[:, None] & (lc_loc_i[:, None] == loc)).astype(dtype)
            oh_j = ((lc_owner_j == d)[:, None] & (lc_loc_j[:, None] == loc)).astype(dtype)
            V = jnp.einsum(
                "lb,lca->bcla", oh_i, jnp.swapaxes(Jli0, -1, -2), precision=_DEFP
            ) + jnp.einsum(
                "lb,lca->bcla", oh_j, jnp.swapaxes(Jlj0, -1, -2), precision=_DEFP
            )
            V = V.reshape(B, 6, 6 * L)

            T_diag = D_chain + lam * D + 1e-6 * jnp.eye(6, dtype=dtype)
            T_diag = jnp.where(fix_rows[:, None, None], eyeB, T_diag)

            B_rhs = jnp.concatenate([(-g_blk)[:, :, None], V], axis=2)
            W = spike_block_tridiag_multi(
                T_diag, U_all[: B - 1], U_all[B - 1], B_rhs, axis, n
            )
            w0, Wv = W[:, :, 0], W[:, :, 1:]

            # capacitance C = I + V^T T'^-1 V (replicated after the gathers)
            Wv_i = gather_lc(Wv, lc_owner_i, lc_loc_i)  # (L, 6, 6L)
            Wv_j = gather_lc(Wv, lc_owner_j, lc_loc_j)
            w0_i = gather_lc(w0, lc_owner_i, lc_loc_i)  # (L, 6)
            w0_j = gather_lc(w0, lc_owner_j, lc_loc_j)
            AW = jnp.einsum("lab,lbr->lar", Jli0, Wv_i, precision=_DEFP) + jnp.einsum(
                "lab,lbr->lar", Jlj0, Wv_j, precision=_DEFP
            )
            C = AW.reshape(6 * L, 6 * L) + jnp.eye(6 * L, dtype=dtype)
            c0 = (
                jnp.einsum("lab,lb->la", Jli0, w0_i, precision=_DEFP)
                + jnp.einsum("lab,lb->la", Jlj0, w0_j, precision=_DEFP)
            ).reshape(-1)
            Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
            y = jax.scipy.linalg.cho_solve((Lc, True), c0)
            delta = w0 - jnp.einsum("bar,r->ba", Wv, y, precision=_DEFP)
            return fix_vec(delta)

        def trial(carry, _):
            poses_blk, err, lam = carry

            # --- linearize the chain factors this device owns ---
            xj = shifted(poses_blk)
            sig_b = jnp.broadcast_to(odo_sigmas, (B, 6))
            r_o, Ji, Jj = jax.vmap(_linearize_between)(poses_blk, xj, odo_blk, sig_b)
            w = odo_valid[:, None].astype(dtype)
            r_o = r_o * w
            Ji = Ji * w[..., None]
            Jj = Jj * w[..., None]

            # --- linearize the LC factors (L-sized, evaluated identically
            # everywhere after the psum gather) ---
            xl_i = gather_lc(poses_blk, lc_owner_i, lc_loc_i)
            xl_j = gather_lc(poses_blk, lc_owner_j, lc_loc_j)
            r_l, Jli, Jlj = jax.vmap(_linearize_between)(xl_i, xl_j, lc_meas, lc_sigmas)
            wl = lc_valid[:, None].astype(dtype)
            r_l = r_l * wl
            Jli = Jli * wl[..., None]
            Jlj = Jlj * wl[..., None]

            # --- gradient ---
            g_blk = jnp.einsum("kab,ka->kb", Ji, r_o, precision=_HI)
            c = jnp.einsum("kab,ka->kb", Jj, r_o, precision=_HI)
            g_blk = g_blk.at[1:].add(c[:-1])
            g_blk = g_blk.at[0:1].add(lax.ppermute(c[-1:], axis, perm_to_next))
            g_blk = g_blk + scatter_lc(
                jnp.einsum("lab,la->lb", Jli, r_l, precision=_HI), lc_owner_i, lc_loc_i
            )
            g_blk = g_blk + scatter_lc(
                jnp.einsum("lab,la->lb", Jlj, r_l, precision=_HI), lc_owner_j, lc_loc_j
            )
            g_blk = fix_vec(g_blk)

            # --- block-diagonal of H (chain part kept separate: the direct
            # step's T' needs it undamped) ---
            Di = jnp.einsum("kab,kac->kbc", Ji, Ji, precision=_HI)
            Dj = jnp.einsum("kab,kac->kbc", Jj, Jj, precision=_HI)
            D_chain = Di.at[1:].add(Dj[:-1])
            D_chain = D_chain.at[0:1].add(lax.ppermute(Dj[-1:], axis, perm_to_next))
            D = D_chain + scatter_lc(
                jnp.einsum("lab,lac->lbc", Jli, Jli, precision=_HI), lc_owner_i, lc_loc_i
            )
            D = D + scatter_lc(
                jnp.einsum("lab,lac->lbc", Jlj, Jlj, precision=_HI), lc_owner_j, lc_loc_j
            )
            D = jnp.where(fix_rows[:, None, None], eyeB, D)

            if precond_kind == "direct":
                delta = direct_step(g_blk, D, D_chain, Ji, Jj, Jli, Jlj, lam)
                cg_k = jnp.asarray(0, jnp.int32)  # direct = zero CG, all paths
                new_poses = se3.retract(poses_blk, delta)
                new_poses = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        fix_rows.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                    ),
                    poses_blk,
                    new_poses,
                )
                new_err = error(new_poses)
                good = jnp.isfinite(new_err) & (new_err < err)
                poses_blk = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(good, b, a), poses_blk, new_poses
                )
                err = jnp.where(good, new_err, err)
                lam = jnp.where(
                    good, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 10.0, 1e6)
                )
                g_norm = jnp.sqrt(lax.psum(jnp.sum(g_blk * g_blk), axis))
                return (poses_blk, err, lam), (g_norm, cg_k)

            Dp = D * (1.0 + lam) + 1e-6 * jnp.eye(6, dtype=dtype)

            # --- preconditioner: per-block chain solve (device boundaries act
            # as tridiag segment cuts — same approximation as the single-device
            # segmented solve with aligned segments) ---
            if precond_kind in ("tridiag", "dense_seg"):
                U_loc = jnp.einsum(
                    "kab,kac->kbc", Ji[: B - 1], Jj[: B - 1], precision=_HI
                )
                cz = fix_rows[: B - 1] | fix_rows[1:]
                U_loc = jnp.where(cz[:, None, None], 0.0, U_loc)
                seg = min(cfg.tridiag_segment, B)
                if precond_kind == "dense_seg":
                    from ..solvers.tridiag import (
                        apply_dense_segment_inverses,
                        auto_dense_segment,
                        dense_segment_inverses,
                    )

                    seg_d = min(auto_dense_segment(B, cfg.tridiag_segment), B)
                    Minv = dense_segment_inverses(Dp, U_loc, seg_d)

                    def precond(v):
                        return apply_dense_segment_inverses(Minv, v)

                else:
                    from ..solvers.tridiag import solve_block_tridiag_segmented

                    def precond(v):
                        return solve_block_tridiag_segmented(Dp, U_loc, v, seg)

            else:
                Lp = jnp.linalg.cholesky(Dp)

                def precond(v):
                    return jax.scipy.linalg.cho_solve((Lp, True), v[..., None])[..., 0]

            # --- distributed matvec: (H + lam D) v ---
            def matvec(v):
                v = fix_vec(v)
                v_next = halo_next(v[0:1])
                vj = jnp.concatenate([v[1:], v_next])
                a = jnp.einsum("kab,kb->ka", Ji, v, precision=_HI) + jnp.einsum(
                    "kab,kb->ka", Jj, vj, precision=_HI
                )
                out = jnp.einsum("kab,ka->kb", Ji, a, precision=_HI)
                cb = jnp.einsum("kab,ka->kb", Jj, a, precision=_HI)
                out = out.at[1:].add(cb[:-1])
                out = out.at[0:1].add(lax.ppermute(cb[-1:], axis, perm_to_next))
                # LC part (L-sized, identical on every device after the gathers)
                vi = gather_lc(v, lc_owner_i, lc_loc_i)
                vjl = gather_lc(v, lc_owner_j, lc_loc_j)
                al = jnp.einsum("lab,lb->la", Jli, vi, precision=_HI) + jnp.einsum(
                    "lab,lb->la", Jlj, vjl, precision=_HI
                )
                out = out + scatter_lc(
                    jnp.einsum("lab,la->lb", Jli, al, precision=_HI), lc_owner_i, lc_loc_i
                )
                out = out + scatter_lc(
                    jnp.einsum("lab,la->lb", Jlj, al, precision=_HI), lc_owner_j, lc_loc_j
                )
                out = out + lam * jnp.einsum("pab,pb->pa", D, v, precision=_HI)
                return jnp.where(fix_rows[:, None], v, out)

            def dot(a, b):
                return lax.psum(jnp.sum(a * b), axis)

            delta, cg_k = _pcg_dist(matvec, -g_blk, precond, cfg.cg_tol, cfg.cg_max_iters, dot)
            delta = fix_vec(delta)
            new_poses = se3.retract(poses_blk, delta)
            new_poses = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    fix_rows.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                ),
                poses_blk,
                new_poses,
            )
            new_err = error(new_poses)
            good = jnp.isfinite(new_err) & (new_err < err)
            poses_blk = jax.tree_util.tree_map(
                lambda a, b: jnp.where(good, b, a), poses_blk, new_poses
            )
            err = jnp.where(good, new_err, err)
            lam = jnp.where(good, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 10.0, 1e6))
            g_norm = jnp.sqrt(dot(g_blk, g_blk))
            return (poses_blk, err, lam), (g_norm, cg_k)

        rel_exit_tol = 1e-6

        def w_cond(state):
            _, _, _, k, stall, _, _ = state
            return (k < cfg.max_gn_iters) & (stall < 2)

        def w_body(state):
            poses_blk, err, lam, k, stall, cg_total, gnorm = state
            (p2, e2, l2), (g_n, cg_k) = trial((poses_blk, err, lam), None)
            improved = (err - e2) > rel_exit_tol * jnp.maximum(err, 1e-30)
            stall = jnp.where(improved, 0, stall + 1)
            return p2, e2, l2, k + 1, stall, cg_total + cg_k, g_n

        poses_blk, err, lam_f, iters, stall_f, cg_total, gnorm = lax.while_loop(
            w_cond,
            w_body,
            (
                poses0_blk,
                err0,
                jnp.asarray(lam0, dtype),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(stall0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0.0, dtype),
            ),
        )
        info = SolveInfo(
            error0=err0, error=err, iterations=iters,
            cg_iters_total=cg_total, grad_norm=gnorm, lam=lam_f, stall=stall_f,
        )
        return poses_blk, info

    fn = shard_map(
        solve_blk,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis),  # poses0 tree, odo_meas tree (leading dim)
            P(), P(), P(), P(), P(), P(), P(), P(),  # lc + odo_sigmas + lam0 + stall0 replicated
        ),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
    return fn(poses0, odo_meas, lc_i, lc_j, lc_meas, lc_sigmas, lc_valid,
              odo_sigmas, lam0, stall0)


def seq_pose_graph_solve(mesh: Mesh, graph: PoseGraph,
                         cfg: PoseGraphConfig = PoseGraphConfig(),
                         axis: str = "data", lam0=None, stall0=None):
    """Pose-graph LM with the pose CHAIN block-partitioned over the mesh.

    Unlike :func:`..parallel.shard.sharded_pose_graph_solve` (which shards only
    the LC factor batch and replicates the chain), every O(P) tensor here lives
    ``O(P/n)`` per device — the solver scales to missions whose pose system
    exceeds one chip.  Same fixed point as :func:`solve_pose_graph` up to CG
    tolerance.  Returns ``(poses, SolveInfo)``.
    """
    n = mesh.devices.size
    poses0, odo_meas, B, P_pad, P_real = _pad_chain(graph, n)
    lam_init = jnp.asarray(1e-4 if lam0 is None else lam0, poses0.t.dtype)
    stall_init = jnp.asarray(0 if stall0 is None else stall0, jnp.int32)
    poses_pad, info = _seq_pg_run(
        poses0, odo_meas,
        graph.lc_i, graph.lc_j, graph.lc_meas, graph.lc_sigmas, graph.lc_valid,
        graph.odo_sigmas, lam_init, stall_init, mesh, cfg, axis, B, P_real,
    )
    # solver-kind observability: the trace-time resolution cannot ride out of
    # the jitted solver, so the (non-jit) wrapper attaches it here with the
    # SAME resolver the solver used ("sp_" = sequence-parallel mesh path;
    # sp_direct = SPIKE exact chain factorization)
    kind = resolve_seq_pg_solver_kind(
        cfg.preconditioner, B, int(graph.lc_i.shape[0])
    )
    return poses_pad[:P_real], info._replace(solver_kind="sp_" + kind)


# ---------------------------------------------------------------------------
# Full BA: pose chain SP + owner-aligned correspondence sharding
# ---------------------------------------------------------------------------
#
# Correspondences are RESHARDED onto the device that owns their SOURCE pose
# block (one all_to_all at problem build, parallel/alltoall.reshard_rows), so
# per CG matvec the source-pose gather is a LOCAL index read.  The target-pose
# endpoint still crosses blocks; it is served by a ROUTED exchange built once
# at problem build: each device pre-computes the UNIQUE pose rows every other
# device needs from it (``need_idx``, (n, Rj) int32) and each factor's slot in
# the receive buffer (``recv_slot``); per matvec ONE all_to_all of (n, Rj, 6)
# rows replaces the former O(P) ``all_gather`` (and its psum_scatter partner —
# the reverse scatter rides the SAME routing transposed).  Rj = max unique
# target poses requested over any device pair <= K/n, so communication per
# matvec is O(n * Rj) instead of O(P).


def _simulate_reshard_layout(dest: np.ndarray, valid: np.ndarray, n: int,
                             capacity: int) -> np.ndarray:
    """Host-side replica of :func:`..parallel.alltoall.reshard_rows` row
    placement: returns ``out_orig`` of shape (n * n * capacity,), the ORIGINAL
    row index occupying each post-reshard slot (-1 = empty).

    Device d's rows are laid out as ``[src_0 lane (capacity), src_1 lane, ...]``
    with each lane holding the rows source ``a`` sends to ``d`` in ``a``'s
    stable destination-sorted order — exactly the all_to_all receive layout.
    Routing tables are derived from this simulation instead of fetching the
    device output, so the build also works multi-process (where the resharded
    arrays are not fully addressable from one host).
    """
    K = len(dest)
    pad = (-K) % n
    dest_p = np.concatenate([dest, np.zeros(pad, dest.dtype)])
    valid_p = np.concatenate([valid, np.zeros(pad, bool)])
    kb = (K + pad) // n
    Kf = n * capacity
    out_orig = np.full(n * Kf, -1, np.int64)
    for a in range(n):
        base = a * kb
        d_blk = np.where(valid_p[base : base + kb], dest_p[base : base + kb], n)
        order = np.argsort(d_blk, kind="stable")
        d_sorted = d_blk[order]
        for d in range(n):
            rows = base + order[d_sorted == d]
            rows = rows[:capacity]  # overflow drops (capacity is sized exact)
            out_orig[d * Kf + a * capacity : d * Kf + a * capacity + len(rows)] = rows
    return out_orig


def _align_ba(mesh: Mesh, prob: BAProblem, axis: str):
    """Owner-align a BAProblem over the mesh (build-time, once per problem).

    Returns the padded chain plus the resharded factor arrays and routing
    tables (see the section comment above).  The float payload moves with ONE
    device-side all_to_all (:func:`..parallel.alltoall.reshard_rows`); the
    int32 routing tables are computed host-side from a layout simulation that
    is bit-equal to the device reshard (tests/test_seq_parallel.py pins this).
    """
    from .alltoall import reshard_rows

    n = mesh.devices.size
    chain = PoseGraph(
        poses0=prob.poses0, odo_meas=prob.odo_meas, odo_sigmas=prob.odo_sigmas,
        lc_i=jnp.zeros(1, jnp.int32), lc_j=jnp.zeros(1, jnp.int32),
        lc_meas=se3.identity((1,), prob.poses0.t.dtype),
        lc_sigmas=jnp.ones((1, 6), prob.poses0.t.dtype),
        lc_valid=jnp.zeros(1, bool),
    )
    poses0, odo_meas, B, P_pad, P_real = _pad_chain(chain, n)

    kp_i = np.asarray(prob.kp_i, np.int64)
    kp_j = np.asarray(prob.kp_j, np.int64)
    valid = np.asarray(prob.kp_valid, bool)
    K = len(kp_i)
    dest = np.minimum(kp_i // B, n - 1).astype(np.int32)

    # exact per-lane capacity -> reshard_rows drops nothing
    pad = (-K) % n
    kb = (K + pad) // n
    src = np.arange(K) // kb
    lane = np.zeros((n, n), np.int64)
    np.add.at(lane, (src[valid], dest[valid]), 1)
    capacity = max(1, int(lane.max()))

    # device-side payload reshard (ONE all_to_all per leaf).  Constant-pose
    # (fixed-lag window) endpoints ride along as per-factor payload: the fix
    # masks and the frozen poses (identity / all-free when the problem has
    # none) — a frozen endpoint's pose is factor DATA, not solver state, so
    # it owner-aligns exactly like the slant ranges (VERDICT r3 item 6).
    K_rows = int(prob.kp_i.shape[0])
    fix_i = prob.kp_i_fix if prob.kp_i_fix is not None else jnp.zeros(K_rows, bool)
    fix_j = prob.kp_j_fix if prob.kp_j_fix is not None else jnp.zeros(K_rows, bool)
    cps = prob.kp_pose_s if prob.kp_pose_s is not None else se3.identity(
        (K_rows,), prob.poses0.t.dtype
    )
    cpt = prob.kp_pose_t if prob.kp_pose_t is not None else se3.identity(
        (K_rows,), prob.poses0.t.dtype
    )
    tree = dict(
        sr_s=prob.kp_sr_s, sr_t=prob.kp_sr_t,
        lm0=prob.lm0, lm_prior=prob.lm_prior,
        fix_i=fix_i, fix_j=fix_j,
        cps_R=cps.R, cps_t=cps.t, cpt_R=cpt.R, cpt_t=cpt.t,
    )
    out, vout, dropped = reshard_rows(
        mesh, tree, jnp.asarray(dest), jnp.asarray(valid),
        capacity=capacity, axis=axis,
    )
    if dropped:
        raise AssertionError(
            f"owner-align reshard dropped {dropped} rows at exact capacity"
        )

    # host-side routing tables from the simulated layout
    out_orig = _simulate_reshard_layout(dest, valid, n, capacity)
    Kf = n * capacity
    v_r = out_orig >= 0
    safe = np.where(v_r, out_orig, 0)
    kp_i_r = np.where(v_r, kp_i[safe], 0)
    kp_j_r = np.where(v_r, kp_j[safe], 0)
    kp_loc_i = (kp_i_r % B).astype(np.int32)
    owner_j = (kp_j_r // B).astype(np.int32)
    loc_j = (kp_j_r % B).astype(np.int32)

    uniq_store = {}
    Rj = 1
    for d in range(n):
        sl = slice(d * Kf, (d + 1) * Kf)
        for a in range(n):
            m = v_r[sl] & (owner_j[sl] == a)
            uniq = np.unique(loc_j[sl][m])
            uniq_store[(a, d)] = uniq
            Rj = max(Rj, len(uniq))
    recv_slot = np.zeros(n * Kf, np.int32)
    for d in range(n):
        sl = slice(d * Kf, (d + 1) * Kf)
        slot = np.zeros(Kf, np.int32)
        for a in range(n):
            m = v_r[sl] & (owner_j[sl] == a)
            uniq = uniq_store[(a, d)]
            if len(uniq):
                slot[m] = a * Rj + np.searchsorted(uniq, loc_j[sl][m])
        recv_slot[sl] = slot
    need_idx = np.zeros((n, n, Rj), np.int32)
    for (a, d), uniq in uniq_store.items():
        need_idx[a, d, : len(uniq)] = uniq

    aligned = dict(
        kp_loc_i=jnp.asarray(kp_loc_i),
        recv_slot=jnp.asarray(recv_slot),
        sr_s=out["sr_s"], sr_t=out["sr_t"],
        kp_valid=vout,
        lm0=out["lm0"], lm_prior=out["lm_prior"],
        need_idx=jnp.asarray(need_idx.reshape(n * n, Rj)),
        # global TARGET pose index per slot (direct step's V construction —
        # the routed tables only carry owner/slot, not the raw index)
        kp_gj=jnp.asarray(kp_j_r.astype(np.int32)),
        fix_i=out["fix_i"], fix_j=out["fix_j"],
        cps=se3.Pose3(out["cps_R"], out["cps_t"]),
        cpt=se3.Pose3(out["cpt_R"], out["cpt_t"]),
    )
    return poses0, odo_meas, aligned, out_orig, B, Kf, Rj, P_real


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "kp_cfg", "axis", "B", "Kf", "Rj", "P_real"),
)
def _seq_ba_run(poses0, odo_meas, odo_sigmas,
                kp_loc_i, recv_slot, kp_sr_s, kp_sr_t, kp_valid, lm0, lm_prior,
                need_idx, kp_gj, fix_i, fix_j, cps, cpt, lm_prior_sigmas,
                mesh: Mesh, cfg: FullBAConfig, kp_cfg: KeypointNoiseConfig,
                axis: str, B: int, Kf: int, Rj: int, P_real: int):
    n = mesh.devices.size
    perm_from_next = [((i + 1) % n, i) for i in range(n)]
    perm_to_next = [(i, (i + 1) % n) for i in range(n)]

    # trace-time linear-solve choice (mirrors solve_full_ba's "auto"): on TPU
    # the exact direct Woodbury step of the Schur-reduced system runs on the
    # mesh via the SPIKE chain factorization; the capacitance width is 3 per
    # GLOBAL (padded) correspondence slot, so the guard uses n * Kf.
    precond_kind = resolve_seq_ba_solver_kind(cfg.preconditioner, B, n, Kf)

    def solve_blk(poses0_blk, odo_blk, odo_sigmas,
                  loc_i_b, slot_b, sr_s_b, sr_t_b, kv_b, lm0_b, lmp_b,
                  need_b, gj_b, fix_i_b, fix_j_b, cps_b, cpt_b,
                  lm_prior_sigmas):
        d = lax.axis_index(axis)
        gidx = d * B + jnp.arange(B)
        is_pad = gidx >= P_real
        fix_rows = (gidx == 0) | is_pad
        odo_valid = gidx < P_real - 1
        dtype = poses0_blk.t.dtype
        eyeB = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (B, 6, 6))
        nR = n * Rj

        sig_s = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(sr_s_b)
        sig_t = jax.vmap(lambda sr: kp_noise_sigmas(sr, kp_cfg.sigma_r, kp_cfg.alpha_bw_deg))(sr_t_b)

        def halo_next(x_first):
            return lax.ppermute(x_first, axis, perm_from_next)

        def shifted(tree_blk):
            halo = jax.tree_util.tree_map(lambda x: halo_next(x[0:1]), tree_blk)
            return jax.tree_util.tree_map(
                lambda a, h: jnp.concatenate([a[1:], h]), tree_blk, halo
            )

        # --- routed j-endpoint exchange (module section comment): the ONLY
        # cross-device traffic the sonar factors generate, O(n*Rj) per call ---
        def routed_gather(tree_blk):
            """Per-factor values of the TARGET pose row: each device sends the
            (n, Rj) unique rows its peers requested; one all_to_all; factors
            read their row from the receive buffer at ``slot_b``."""

            def g(x):
                send = x[need_b]  # (n, Rj, ...)
                recv = lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=True)
                return recv.reshape((nR,) + x.shape[1:])[slot_b]

            return jax.tree_util.tree_map(g, tree_blk)

        def routed_scatter(vals):
            """Transpose of :func:`routed_gather`: per-factor contributions to
            the TARGET pose aggregate locally by slot, ride the same all_to_all
            back, and scatter-add into the owner's block rows."""
            buf = jax.ops.segment_sum(vals, slot_b, nR)
            buf = buf.reshape((n, Rj) + vals.shape[1:])
            got = lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=True)
            out = jnp.zeros((B,) + vals.shape[1:], vals.dtype)
            return out.at[need_b.reshape(-1)].add(got.reshape((nR,) + vals.shape[1:]))

        def local_gather(tree_blk):
            """Source-pose values: owner-aligned, a plain local index read."""
            return jax.tree_util.tree_map(lambda x: x[loc_i_b], tree_blk)

        def _row_where(mask, a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(
                    mask.reshape((-1,) + (1,) * (x.ndim - 1)), x, y
                ),
                a, b,
            )

        def endpoint_poses(poses_blk):
            """Effective per-factor endpoint poses: the optimized pose, or
            the frozen constant where the fix mask is set (fixed-lag window
            factors — the frozen side contributes NO pose Jacobian but keeps
            constraining the landmark; solvers/full_ba.py:_endpoint_poses)."""
            pi = _row_where(fix_i_b, cps_b, local_gather(poses_blk))
            pj = _row_where(fix_j_b, cpt_b, routed_gather(poses_blk))
            return pi, pj

        def local_scatter(vals):
            return jax.ops.segment_sum(vals, loc_i_b, B)

        def fix_vec(v):
            return jnp.where(fix_rows[:, None], 0.0, v)

        # --- error (distributed) ---
        def error(poses_blk, lms_b):
            xj = shifted(poses_blk)
            r_o = jax.vmap(between_residual)(poses_blk, xj, odo_blk) / odo_sigmas
            r_o = jnp.where(odo_valid[:, None], r_o, 0.0)
            pose_i, pose_j = endpoint_poses(poses_blk)
            Ts = se3.identity(dtype=dtype)

            def kp_res(pose, lm, sr, sig):
                from ..factors.sss_point import sss_point_residual

                m = jnp.stack([sr, jnp.zeros_like(sr)])
                return sss_point_residual(lm, pose, Ts, m) / sig

            r_s = jax.vmap(kp_res)(pose_i, lms_b, sr_s_b, sig_s)
            r_t = jax.vmap(kp_res)(pose_j, lms_b, sr_t_b, sig_t)
            r_pr = (lms_b - lmp_b) / lm_prior_sigmas
            v = kv_b[:, None]
            r_s = jnp.where(v, r_s, 0.0)
            r_t = jnp.where(v, r_t, 0.0)
            r_pr = jnp.where(v, r_pr, 0.0)
            rob = jnp.sum(_huber_rho(jnp.sum(r_s**2, axis=-1), cfg.huber_delta)) + jnp.sum(
                _huber_rho(jnp.sum(r_t**2, axis=-1), cfg.huber_delta)
            )
            local = 0.5 * (jnp.sum(r_o**2) + jnp.sum(r_pr**2)) + rob
            return lax.psum(local, axis)

        err0 = error(poses0_blk, lm0_b)
        w_kp = kv_b.astype(dtype)

        def _seq_ba_finish(poses_blk, lms_b, err, lam, delta_p, cg_k,
                           Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve):
            """Shared trial tail: landmark back-substitution (one routed
            gather for the target endpoints), retract, LM accept gate.
            ``delta_p`` comes from either the PCG or the direct SPIKE step."""
            hv = jnp.einsum("kab,kb->ka", Jp_s, delta_p[loc_i_b], precision=_HI)
            ht = jnp.einsum("kab,kb->ka", Jp_t, routed_gather(delta_p), precision=_HI)
            w2 = jnp.einsum("kab,ka->kb", Jl_s, hv, precision=_HI) + jnp.einsum(
                "kab,ka->kb", Jl_t, ht, precision=_HI
            )
            delta_l = ll_solve(-g_l - w2)

            new_poses = se3.retract(poses_blk, delta_p)
            new_poses = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    fix_rows.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                ),
                poses_blk,
                new_poses,
            )
            new_lms = lms_b + delta_l
            new_err = error(new_poses, new_lms)
            good = jnp.isfinite(new_err) & (new_err < err)
            poses_blk = jax.tree_util.tree_map(
                lambda a, b: jnp.where(good, b, a), poses_blk, new_poses
            )
            lms_b = jnp.where(good, new_lms, lms_b)
            err = jnp.where(good, new_err, err)
            lam = jnp.where(good, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 10.0, 1e6))
            return poses_blk, lms_b, err, lam, cg_k

        def trial(carry):
            poses_blk, lms_b, err, lam = carry

            # --- chain linearization (local + halo) ---
            xj = shifted(poses_blk)
            sig_b = jnp.broadcast_to(odo_sigmas, (B, 6))
            r_o, Ja, Jb = jax.vmap(_linearize_between)(poses_blk, xj, odo_blk, sig_b)
            w = odo_valid[:, None].astype(dtype)
            r_o = r_o * w
            Ja = Ja * w[..., None]
            Jb = Jb * w[..., None]

            # --- sonar factor linearization on my owner-aligned shard ---
            pose_i, pose_j = endpoint_poses(poses_blk)  # O(n*Rj) exchange
            r_s, Jp_s, Jl_s = jax.vmap(_sss_factor_terms)(
                pose_i, lms_b, sr_s_b, sig_s
            )
            r_t, Jp_t, Jl_t = jax.vmap(_sss_factor_terms)(
                pose_j, lms_b, sr_t_b, sig_t
            )
            # frozen endpoints: constant pose -> zero pose Jacobian (the
            # landmark side remains a live constraint)
            Jp_s = jnp.where(fix_i_b[:, None, None], 0.0, Jp_s)
            Jp_t = jnp.where(fix_j_b[:, None, None], 0.0, Jp_t)
            vmask = kv_b
            r_s = jnp.where(vmask[:, None], r_s, 0.0)
            r_t = jnp.where(vmask[:, None], r_t, 0.0)
            w_s = _huber_weight(jnp.sum(r_s**2, axis=-1), cfg.huber_delta)
            w_t = _huber_weight(jnp.sum(r_t**2, axis=-1), cfg.huber_delta)
            r_s = r_s * w_s[:, None]
            r_t = r_t * w_t[:, None]
            Jp_s = jnp.where(vmask[:, None, None], Jp_s * w_s[:, None, None], 0.0)
            Jp_t = jnp.where(vmask[:, None, None], Jp_t * w_t[:, None, None], 0.0)
            Jl_s = jnp.where(vmask[:, None, None], Jl_s * w_s[:, None, None], 0.0)
            Jl_t = jnp.where(vmask[:, None, None], Jl_t * w_t[:, None, None], 0.0)
            r_pr = jnp.where(vmask[:, None], (lms_b - lmp_b) / lm_prior_sigmas, 0.0)
            Jl_pr = (
                jnp.broadcast_to(jnp.eye(3, dtype=dtype), (Kf, 3, 3))
                / lm_prior_sigmas[None, :, None]
            ) * w_kp[:, None, None]

            # --- gradients ---
            g_p = jnp.einsum("kab,ka->kb", Ja, r_o, precision=_HI)
            cb = jnp.einsum("kab,ka->kb", Jb, r_o, precision=_HI)
            g_p = g_p.at[1:].add(cb[:-1])
            g_p = g_p.at[0:1].add(lax.ppermute(cb[-1:], axis, perm_to_next))
            g_p = g_p + local_scatter(
                jnp.einsum("kab,ka->kb", Jp_s, r_s, precision=_HI)
            ) + routed_scatter(
                jnp.einsum("kab,ka->kb", Jp_t, r_t, precision=_HI)
            )
            g_l = (
                jnp.einsum("kab,ka->kb", Jl_s, r_s, precision=_HI)
                + jnp.einsum("kab,ka->kb", Jl_t, r_t, precision=_HI)
                + jnp.einsum("kab,ka->kb", Jl_pr, r_pr, precision=_HI)
            )

            # --- Hessian blocks ---
            D_p = jnp.einsum("kab,kac->kbc", Ja, Ja, precision=_HI)
            Djj = jnp.einsum("kab,kac->kbc", Jb, Jb, precision=_HI)
            D_p = D_p.at[1:].add(Djj[:-1])
            D_p = D_p.at[0:1].add(lax.ppermute(Djj[-1:], axis, perm_to_next))
            D_p = D_p + local_scatter(
                jnp.einsum("kab,kac->kbc", Jp_s, Jp_s, precision=_HI)
            ) + routed_scatter(
                jnp.einsum("kab,kac->kbc", Jp_t, Jp_t, precision=_HI)
            )
            H_ll = (
                jnp.einsum("kab,kac->kbc", Jl_s, Jl_s, precision=_HI)
                + jnp.einsum("kab,kac->kbc", Jl_t, Jl_t, precision=_HI)
                + jnp.einsum("kab,kac->kbc", Jl_pr, Jl_pr, precision=_HI)
            )
            H_ll = H_ll * (1.0 + lam) + 1e-6 * jnp.eye(3, dtype=dtype)
            L_ll = jnp.linalg.cholesky(H_ll)

            def ll_solve(x):
                if x.ndim == 2:
                    return jax.scipy.linalg.cho_solve((L_ll, True), x[..., None])[..., 0]
                return jax.scipy.linalg.cho_solve((L_ll, True), x)

            Hpl_s = jnp.einsum("kab,kac->kbc", Jp_s, Jl_s, precision=_HI)
            Hpl_t = jnp.einsum("kab,kac->kbc", Jp_t, Jl_t, precision=_HI)

            g_p = jnp.where(fix_rows[:, None], 0.0, g_p)
            D_p = jnp.where(fix_rows[:, None, None], eyeB, D_p)

            # --- Schur-reduced gradient ---
            y = ll_solve(g_l)
            g_red = g_p - (
                local_scatter(jnp.einsum("kac,kc->ka", Hpl_s, y, precision=_HI))
                + routed_scatter(jnp.einsum("kac,kc->ka", Hpl_t, y, precision=_HI))
            )
            g_red = jnp.where(fix_rows[:, None], 0.0, g_red)

            if precond_kind == "direct":
                # --- EXACT damped step, distributed (zero CG): SPIKE chain
                # factorization + Woodbury over the landmark coupling columns
                # (3 per global correspondence slot).  Same math as
                # solvers.full_ba._direct_ba_step; the V rows of REMOTE target
                # poses are built from one small all_gather of the per-factor
                # coupling blocks (n*Kf*36 floats — factor metadata, not pose
                # state), and the capacitance gathers W rows with a masked
                # psum.  All collectives are per-TRIAL, not per-CG-iteration.
                from ..solvers.tridiag import spike_block_tridiag_multi

                Kg = n * Kf
                U_all = jnp.einsum("kab,kac->kbc", Ja, Jb, precision=_DEFP)
                next_first_fixed = ((d + 1) * B >= P_real) | (d == n - 1)
                cz = fix_rows | jnp.concatenate(
                    [fix_rows[1:], jnp.reshape(next_first_fixed, (1,))]
                )
                U_all = jnp.where(cz[:, None, None], 0.0, U_all)

                gi_b = d * B + loc_i_b  # source pose is local (owner-aligned)
                Hpl_s0 = jnp.where((gi_b == 0)[:, None, None], 0.0, Hpl_s)
                Hpl_t0 = jnp.where((gj_b == 0)[:, None, None], 0.0, Hpl_t)
                Vhat_s = jax.scipy.linalg.solve_triangular(
                    L_ll, Hpl_s0.swapaxes(-1, -2), lower=True
                ).swapaxes(-1, -2)  # (Kf, 6, 3)
                Vhat_t = jax.scipy.linalg.solve_triangular(
                    L_ll, Hpl_t0.swapaxes(-1, -2), lower=True
                ).swapaxes(-1, -2)

                VS_all = lax.all_gather(Vhat_s, axis).reshape(Kg, 6, 3)
                VT_all = lax.all_gather(Vhat_t, axis).reshape(Kg, 6, 3)
                gi_all = lax.all_gather(gi_b, axis).reshape(Kg)
                gj_all = lax.all_gather(gj_b, axis).reshape(Kg)

                loc = jnp.arange(B)
                ohi = (
                    ((gi_all // B) == d)[:, None] & ((gi_all % B)[:, None] == loc)
                ).astype(dtype)
                ohj = (
                    ((gj_all // B) == d)[:, None] & ((gj_all % B)[:, None] == loc)
                ).astype(dtype)
                V = jnp.einsum("qb,qca->bcqa", ohi, VS_all, precision=_DEFP) + jnp.einsum(
                    "qb,qca->bcqa", ohj, VT_all, precision=_DEFP
                )
                V = V.reshape(B, 6, 3 * Kg)

                T_diag = (1.0 + lam) * D_p + 1e-6 * jnp.eye(6, dtype=dtype)
                T_diag = jnp.where(fix_rows[:, None, None], eyeB, T_diag)
                B_rhs = jnp.concatenate([(-g_red)[:, :, None], V], axis=2)
                W = spike_block_tridiag_multi(
                    T_diag, U_all[: B - 1], U_all[B - 1], B_rhs, axis, n
                )
                w0, Wv = W[:, :, 0], W[:, :, 1:]

                def gather_global(x, g):
                    own = (g // B) == d
                    v = x[g % B]
                    m = own.reshape(own.shape + (1,) * (v.ndim - 1))
                    return lax.psum(jnp.where(m, v, jnp.zeros_like(v)), axis)

                Wi = gather_global(Wv, gi_all)  # (Kg, 6, 3Kg)
                Wj = gather_global(Wv, gj_all)
                w0i = gather_global(w0, gi_all)  # (Kg, 6)
                w0j = gather_global(w0, gj_all)
                AW = jnp.einsum("qba,qbr->qar", VS_all, Wi, precision=_DEFP) + jnp.einsum(
                    "qba,qbr->qar", VT_all, Wj, precision=_DEFP
                )
                C = jnp.eye(3 * Kg, dtype=dtype) - AW.reshape(3 * Kg, 3 * Kg)
                c0 = (
                    jnp.einsum("qba,qb->qa", VS_all, w0i, precision=_DEFP)
                    + jnp.einsum("qba,qb->qa", VT_all, w0j, precision=_DEFP)
                ).reshape(-1)
                Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
                yw = jax.scipy.linalg.cho_solve((Lc, True), c0)
                delta_p = w0 + jnp.einsum("bar,r->ba", Wv, yw, precision=_DEFP)
                cg_k = jnp.asarray(0, jnp.int32)
                return _seq_ba_finish(
                    poses_blk, lms_b, err, lam, fix_vec(delta_p), cg_k,
                    Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve,
                )

            # --- Schur matvec: chain halo + ONE routed gather + ONE routed
            # scatter — no O(P) collective anywhere ---
            def matvec(v):
                v = fix_vec(v)
                v_next = halo_next(v[0:1])
                vj = jnp.concatenate([v[1:], v_next])
                a = jnp.einsum("kab,kb->ka", Ja, v, precision=_HI) + jnp.einsum(
                    "kab,kb->ka", Jb, vj, precision=_HI
                )
                out = jnp.einsum("kab,ka->kb", Ja, a, precision=_HI)
                cc = jnp.einsum("kab,ka->kb", Jb, a, precision=_HI)
                out = out.at[1:].add(cc[:-1])
                out = out.at[0:1].add(lax.ppermute(cc[-1:], axis, perm_to_next))
                b_s = jnp.einsum("kab,kb->ka", Jp_s, v[loc_i_b], precision=_HI)
                b_t = jnp.einsum("kab,kb->ka", Jp_t, routed_gather(v), precision=_HI)
                wv = jnp.einsum("kab,ka->kb", Jl_s, b_s, precision=_HI) + jnp.einsum(
                    "kab,ka->kb", Jl_t, b_t, precision=_HI
                )
                yv = ll_solve(wv)
                out = out + local_scatter(
                    jnp.einsum("kab,ka->kb", Jp_s, b_s, precision=_HI)
                    - jnp.einsum("kac,kc->ka", Hpl_s, yv, precision=_HI)
                ) + routed_scatter(
                    jnp.einsum("kab,ka->kb", Jp_t, b_t, precision=_HI)
                    - jnp.einsum("kac,kc->ka", Hpl_t, yv, precision=_HI)
                )
                out = out + lam * jnp.einsum("pab,pb->pa", D_p, v, precision=_HI)
                return jnp.where(fix_rows[:, None], v, out)

            # --- preconditioner: chain tridiag per block with the Schur
            # diagonal correction (clamped SPD, same scheme as solve_full_ba) ---
            X_s = ll_solve(Hpl_s.swapaxes(-1, -2))
            X_t = ll_solve(Hpl_t.swapaxes(-1, -2))
            S_corr = local_scatter(
                jnp.einsum("kac,kcb->kab", Hpl_s, X_s, precision=_HI)
            ) + routed_scatter(
                jnp.einsum("kac,kcb->kab", Hpl_t, X_t, precision=_HI)
            )
            Dp_damped = D_p * (1.0 + lam) - S_corr
            Dp_damped = jnp.where(fix_rows[:, None, None], eyeB, Dp_damped)
            Dp_damped = Dp_damped + 1e-5 * jnp.eye(6, dtype=dtype)

            seg = cfg.tridiag_segment if jax.default_backend() != "tpu" else min(cfg.tridiag_segment, 64)
            seg = min(seg, B)
            if precond_kind in ("tridiag", "dense_seg"):
                U_loc = jnp.einsum("kab,kac->kbc", Ja[: B - 1], Jb[: B - 1], precision=_HI)
                cz = fix_rows[: B - 1] | fix_rows[1:]
                U_loc = jnp.where(cz[:, None, None], 0.0, U_loc)
                D_pc = jnp.where(
                    jnp.isfinite(jnp.linalg.cholesky(Dp_damped)).all(axis=(-1, -2), keepdims=True),
                    Dp_damped,
                    D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype),
                )
                if precond_kind == "dense_seg":
                    from ..solvers.tridiag import (
                        apply_dense_segment_inverses,
                        auto_dense_segment,
                        dense_segment_inverses,
                    )

                    seg_d = min(auto_dense_segment(B, cfg.tridiag_segment), B)
                    Minv = dense_segment_inverses(D_pc, U_loc, seg_d)

                    def precond(v):
                        return apply_dense_segment_inverses(Minv, v)

                else:
                    from ..solvers.tridiag import solve_block_tridiag_segmented

                    def precond(v):
                        return solve_block_tridiag_segmented(D_pc, U_loc, v, seg)

            else:
                Lp = jnp.linalg.cholesky(Dp_damped)
                ok = jnp.all(jnp.isfinite(Lp))
                Lp_safe = jnp.where(
                    ok, Lp, jnp.linalg.cholesky(D_p * (1.0 + lam) + 1e-5 * jnp.eye(6, dtype=dtype))
                )

                def precond(v):
                    return jax.scipy.linalg.cho_solve((Lp_safe, True), v[..., None])[..., 0]

            def dot(a, b):
                return lax.psum(jnp.sum(a * b), axis)

            delta_p, cg_k = _pcg_dist(matvec, -g_red, precond, cfg.cg_tol, cfg.cg_max_iters, dot)
            return _seq_ba_finish(
                poses_blk, lms_b, err, lam, fix_vec(delta_p), cg_k,
                Jp_s, Jp_t, Jl_s, Jl_t, g_l, ll_solve,
            )

        def w_cond(state):
            _, _, _, _, k, stall, _ = state
            return (k < cfg.max_iters) & (stall < 2)

        def w_body(state):
            poses_blk, lms_b, err, lam, k, stall, cg_total = state
            p2, l2, e2, lam2, cg_k = trial((poses_blk, lms_b, err, lam))
            improved = (err - e2) > 1e-6 * jnp.maximum(err, 1e-30)
            stall = jnp.where(improved, 0, stall + 1)
            return p2, l2, e2, lam2, k + 1, stall, cg_total + cg_k

        dtype0 = poses0_blk.t.dtype
        poses_blk, lms_b, err, _, iters, _, cg_total = lax.while_loop(
            w_cond,
            w_body,
            (
                poses0_blk,
                lm0_b,
                err0,
                jnp.asarray(1e-4, dtype0),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
            ),
        )
        info = BAInfo(error0=err0, error=err, iterations=iters, cg_iters_total=cg_total)
        return poses_blk, lms_b, info

    fn = shard_map(
        solve_blk,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(),
        ),
        out_specs=(P(axis), P(axis), P()),
        check_rep=False,
    )
    return fn(poses0, odo_meas, odo_sigmas,
              kp_loc_i, recv_slot, kp_sr_s, kp_sr_t, kp_valid, lm0, lm_prior,
              need_idx, kp_gj, fix_i, fix_j, cps, cpt, lm_prior_sigmas)


def seq_full_ba_solve(mesh: Mesh, prob: BAProblem,
                      cfg: FullBAConfig = FullBAConfig(),
                      kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
                      axis: str = "data"):
    """Joint Schur-complement BA: pose chain SP + owner-aligned correspondences.

    Correspondences are resharded onto their source-pose owners at problem
    build (ONE ``all_to_all``, :func:`..parallel.alltoall.reshard_rows`); the
    target-pose endpoint rides a routed all_to_all exchange of only the unique
    rows each device pair actually shares (see the section comment above).
    Per-device memory: O(P/n) for every pose-chain tensor, O(K/n) for every
    correspondence/landmark tensor; per-matvec communication O(n * Rj) — there
    is NO O(P) collective anywhere in the solve.  Same fixed point as
    :func:`..solvers.full_ba.solve_full_ba` up to CG tolerance.
    Returns ``(poses, landmarks, BAInfo)`` with landmarks in the caller's
    original factor order.
    """
    n = mesh.devices.size
    poses0, odo_meas, aligned, out_orig, B, Kf, Rj, P_real = _align_ba(mesh, prob, axis)
    K_real = int(prob.kp_i.shape[0])
    poses_pad, lms_aligned, info = _seq_ba_run(
        poses0, odo_meas, prob.odo_sigmas,
        aligned["kp_loc_i"], aligned["recv_slot"], aligned["sr_s"],
        aligned["sr_t"], aligned["kp_valid"], aligned["lm0"],
        aligned["lm_prior"], aligned["need_idx"], aligned["kp_gj"],
        aligned["fix_i"], aligned["fix_j"], aligned["cps"], aligned["cpt"],
        prob.lm_prior_sigmas,
        mesh, cfg, kp_cfg, axis, B, Kf, Rj, P_real,
    )
    # un-permute landmarks back to the caller's factor order (invalid rows
    # keep their initialization, matching the single-device solver)
    lms = np.array(np.asarray(prob.lm0), copy=True)
    occupied = out_orig >= 0
    lms[out_orig[occupied]] = to_host(lms_aligned)[occupied]
    kind = resolve_seq_ba_solver_kind(cfg.preconditioner, B, n, Kf)
    return poses_pad[:P_real], jnp.asarray(lms), info._replace(
        solver_kind="sp_" + kind
    )
