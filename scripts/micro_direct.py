"""Microbenchmark the direct LM step's components at the bench problem size."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diasss_tpu.config import PoseGraphConfig
from diasss_tpu.geometry import se3
from diasss_tpu.solvers.pose_graph import (
    PoseGraph, _build_normal_terms, _direct_lm_step, _gradient_and_diag,
    build_chain_graph, solve_pose_graph,
)
from diasss_tpu.solvers.tridiag import (
    solve_block_tridiag, solve_block_tridiag_multi, thomas_block_tridiag_multi,
)


def make_graph(P=3000, L=5, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.zeros((P, 6))
    rows[:, 3] = np.arange(P) * 0.5
    rows[:, 4] = 0.05 * rng.normal(size=P)
    gt = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
    lc_i = np.linspace(2, P - 40, L).astype(np.int32)
    lc_j = (lc_i + 31).astype(np.int32)
    meas = se3.between(gt[jnp.asarray(lc_i)], gt[jnp.asarray(lc_j)])
    return build_chain_graph(
        [rows], lc_i=lc_i, lc_j=lc_j, lc_meas=meas,
        lc_sigmas=np.full((L, 6), 0.05, np.float32),
        lc_valid=np.ones(L, bool),
        noise_key=jax.random.PRNGKey(2),
    )


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real fetch (tunnel): sum to scalar
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    P, L = 3000, 5
    g = make_graph(P, L)

    @jax.jit
    def linearize(graph):
        return _build_normal_terms(graph.poses0, graph)

    @jax.jit
    def direct_step(graph):
        idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
        g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
        lam = jnp.asarray(1e-4, jnp.float32)
        return _direct_lm_step(graph, idx_i, idx_j, Ji, Jj, g_, D, lam, P, L)

    print(f"linearize: {timeit(linearize, g)*1000:.1f} ms")
    print(f"linearize+direct step: {timeit(direct_step, g)*1000:.1f} ms")

    # chain-solve alone, multi-RHS R = 1+6L
    R = 1 + 6 * L
    rng = np.random.default_rng(1)
    diag = jnp.asarray(
        np.einsum("pab,pcb->pac", rng.standard_normal((P, 6, 6)),
                  rng.standard_normal((P, 6, 6))).astype(np.float32)
        + 10 * np.eye(6, dtype=np.float32)
    )
    off = jnp.asarray(0.01 * rng.standard_normal((P - 1, 6, 6)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((P, 6, R)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((P, 6)).astype(np.float32))

    cr_multi = jax.jit(solve_block_tridiag_multi)
    th_multi = jax.jit(thomas_block_tridiag_multi)
    cr_one = jax.jit(solve_block_tridiag)
    print(f"CR multi R={R}: {timeit(cr_multi, diag, off, B)*1000:.1f} ms")
    print(f"Thomas multi R={R}: {timeit(th_multi, diag, off, B)*1000:.1f} ms")
    print(f"CR single RHS: {timeit(cr_one, diag, off, b1)*1000:.1f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def bisect():
    P, L = 3000, 5
    g = make_graph(P, L)
    import diasss_tpu.solvers.pose_graph as pg

    def parts(graph, stop):
        idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
        g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
        lam = jnp.asarray(1e-4, jnp.float32)
        dtype = D.dtype
        eye6 = jnp.eye(6, dtype=dtype)
        Ji_o, Jj_o = Ji[: P - 1], Jj[: P - 1]
        U = jnp.einsum("fab,fac->fbc", Ji_o, Jj_o).at[0].set(0.0)
        D_odo = jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Ji_o, Ji_o), idx_i[: P - 1], P
        ) + jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Jj_o, Jj_o), idx_j[: P - 1], P
        )
        D_odo = D_odo.at[0].set(eye6)
        T_diag = D_odo + lam * D + 1e-6 * eye6
        if stop == "tdiag":
            return T_diag
        Ji_l = jnp.where((graph.lc_i == 0)[:, None, None], 0.0, Ji[P - 1:])
        Jj_l = jnp.where((graph.lc_j == 0)[:, None, None], 0.0, Jj[P - 1:])
        onehot_i = (graph.lc_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
        onehot_j = (graph.lc_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
        V = jnp.einsum("lp,lba->pbla", onehot_i, jnp.swapaxes(Ji_l, -1, -2)) + \
            jnp.einsum("lp,lba->pbla", onehot_j, jnp.swapaxes(Jj_l, -1, -2))
        if stop == "V":
            return V
        Bm = jnp.concatenate([(-g_)[:, :, None], V.reshape(P, 6, 6 * L)], axis=2)
        W = solve_block_tridiag_multi(T_diag, U, Bm)
        if stop == "W":
            return W
        w0, Wv = W[:, :, 0], W[:, :, 1:]
        AW = jnp.einsum("lab,lbr->lar", Ji_l, Wv[graph.lc_i]) + jnp.einsum(
            "lab,lbr->lar", Jj_l, Wv[graph.lc_j])
        C = AW.reshape(6 * L, 6 * L) + jnp.eye(6 * L, dtype=dtype)
        if stop == "C":
            return C
        Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
        c0 = (jnp.einsum("lab,lb->la", Ji_l, w0[graph.lc_i]) +
              jnp.einsum("lab,lb->la", Jj_l, w0[graph.lc_j])).reshape(-1)
        y = jax.scipy.linalg.cho_solve((Lc, True), c0)
        if stop == "chol":
            return y
        delta = w0 - jnp.einsum("pbr,r->pb", Wv, y)
        return delta.at[0].set(0.0)

    for stop in ("tdiag", "V", "W", "C", "chol", "all"):
        f = jax.jit(functools.partial(parts, stop=stop))
        print(f"up to {stop}: {timeit(f, g)*1000:.1f} ms")


if __name__ == "__main__" and "bisect" in sys.argv:
    bisect()


def precision_test():
    P, L = 3000, 5
    g = make_graph(P, L)
    import diasss_tpu.solvers.pose_graph as pg

    def direct_step(graph):
        idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
        g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
        lam = jnp.asarray(1e-4, jnp.float32)
        return _direct_lm_step(graph, idx_i, idx_j, Ji, Jj, g_, D, lam, P, L)

    for prec in ("HIGHEST", "DEFAULT"):
        pg._HI = getattr(jax.lax.Precision, prec)
        f = jax.jit(direct_step)
        print(f"_direct_lm_step with {prec}: {timeit(f, g)*1000:.1f} ms")
    pg._HI = jax.lax.Precision.HIGHEST


if __name__ == "__main__" and "prec" in sys.argv:
    precision_test()


def compare():
    P, L = 3000, 5
    g = make_graph(P, L)
    import diasss_tpu.solvers.pose_graph as pg

    def via_fn(graph):
        idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
        g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
        lam = jnp.asarray(1e-4, jnp.float32)
        return _direct_lm_step(graph, idx_i, idx_j, Ji, Jj, g_, D, lam, P, L)

    def inline(graph):
        idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
        g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
        lam = jnp.asarray(1e-4, jnp.float32)
        dtype = D.dtype
        _HI = jax.lax.Precision.HIGHEST
        eye6 = jnp.eye(6, dtype=dtype)
        Ji_o, Jj_o = Ji[: P - 1], Jj[: P - 1]
        U = jnp.einsum("fab,fac->fbc", Ji_o, Jj_o, precision=_HI).at[0].set(0.0)
        D_odo = jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Ji_o, Ji_o, precision=_HI), idx_i[: P - 1], P
        ) + jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Jj_o, Jj_o, precision=_HI), idx_j[: P - 1], P
        )
        D_odo = D_odo.at[0].set(eye6)
        T_diag = D_odo + lam * D + 1e-6 * eye6
        Ji_l = jnp.where((graph.lc_i == 0)[:, None, None], 0.0, Ji[P - 1:])
        Jj_l = jnp.where((graph.lc_j == 0)[:, None, None], 0.0, Jj[P - 1:])
        onehot_i = (graph.lc_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
        onehot_j = (graph.lc_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
        V = jnp.einsum("lp,lba->pbla", onehot_i, jnp.swapaxes(Ji_l, -1, -2), precision=_HI) + \
            jnp.einsum("lp,lba->pbla", onehot_j, jnp.swapaxes(Jj_l, -1, -2), precision=_HI)
        Bm = jnp.concatenate([(-g_)[:, :, None], V.reshape(P, 6, 6 * L)], axis=2)
        W = solve_block_tridiag_multi(T_diag, U, Bm)
        w0, Wv = W[:, :, 0], W[:, :, 1:]
        AW = jnp.einsum("lab,lbr->lar", Ji_l, Wv[graph.lc_i], precision=_HI) + jnp.einsum(
            "lab,lbr->lar", Jj_l, Wv[graph.lc_j], precision=_HI)
        C = AW.reshape(6 * L, 6 * L) + jnp.eye(6 * L, dtype=dtype)
        Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
        c0 = (jnp.einsum("lab,lb->la", Ji_l, w0[graph.lc_i], precision=_HI) +
              jnp.einsum("lab,lb->la", Jj_l, w0[graph.lc_j], precision=_HI)).reshape(-1)
        y = jax.scipy.linalg.cho_solve((Lc, True), c0)
        delta = w0 - jnp.einsum("pbr,r->pb", Wv, y, precision=_HI)
        return delta.at[0].set(0.0)

    for name, fn in (("via_fn", via_fn), ("inline", inline)):
        f = jax.jit(fn)
        print(f"{name}: {timeit(f, g)*1000:.1f} ms")
        ca = f.lower(g).compile().cost_analysis()
        print(f"  flops={ca.get('flops',0):.3g} bytes={ca.get('bytes accessed',0):.3g}")


if __name__ == "__main__" and "cmp" in sys.argv:
    compare()


def compare2():
    P, L = 3000, 5
    g = make_graph(P, L)

    def make(prec):
        kw = {} if prec is None else {"precision": prec}

        def inline(graph):
            idx_i, idx_j, r, Ji, Jj = _build_normal_terms(graph.poses0, graph)
            g_, D = _gradient_and_diag(idx_i, idx_j, r, Ji, Jj, P, fixed0=True)
            lam = jnp.asarray(1e-4, jnp.float32)
            dtype = D.dtype
            eye6 = jnp.eye(6, dtype=dtype)
            Ji_o, Jj_o = Ji[: P - 1], Jj[: P - 1]
            U = jnp.einsum("fab,fac->fbc", Ji_o, Jj_o, **kw).at[0].set(0.0)
            D_odo = jax.ops.segment_sum(
                jnp.einsum("fab,fac->fbc", Ji_o, Ji_o, **kw), idx_i[: P - 1], P
            ) + jax.ops.segment_sum(
                jnp.einsum("fab,fac->fbc", Jj_o, Jj_o, **kw), idx_j[: P - 1], P
            )
            D_odo = D_odo.at[0].set(eye6)
            T_diag = D_odo + lam * D + 1e-6 * eye6
            Ji_l = jnp.where((graph.lc_i == 0)[:, None, None], 0.0, Ji[P - 1:])
            Jj_l = jnp.where((graph.lc_j == 0)[:, None, None], 0.0, Jj[P - 1:])
            onehot_i = (graph.lc_i[:, None] == jnp.arange(P)[None, :]).astype(dtype)
            onehot_j = (graph.lc_j[:, None] == jnp.arange(P)[None, :]).astype(dtype)
            V = jnp.einsum("lp,lba->pbla", onehot_i, jnp.swapaxes(Ji_l, -1, -2), **kw) + \
                jnp.einsum("lp,lba->pbla", onehot_j, jnp.swapaxes(Jj_l, -1, -2), **kw)
            Bm = jnp.concatenate([(-g_)[:, :, None], V.reshape(P, 6, 6 * L)], axis=2)
            W = solve_block_tridiag_multi(T_diag, U, Bm)
            w0, Wv = W[:, :, 0], W[:, :, 1:]
            AW = jnp.einsum("lab,lbr->lar", Ji_l, Wv[graph.lc_i], **kw) + jnp.einsum(
                "lab,lbr->lar", Jj_l, Wv[graph.lc_j], **kw)
            C = AW.reshape(6 * L, 6 * L) + jnp.eye(6 * L, dtype=dtype)
            Lc = jnp.linalg.cholesky(0.5 * (C + C.T))
            c0 = (jnp.einsum("lab,lb->la", Ji_l, w0[graph.lc_i], **kw) +
                  jnp.einsum("lab,lb->la", Jj_l, w0[graph.lc_j], **kw)).reshape(-1)
            y = jax.scipy.linalg.cho_solve((Lc, True), c0)
            delta = w0 - jnp.einsum("pbr,r->pb", Wv, y, **kw)
            return delta.at[0].set(0.0)

        return inline

    for name, prec in (("none", None), ("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)):
        f = jax.jit(make(prec))
        t = timeit(f, g)
        ca = f.lower(g).compile().cost_analysis()
        print(f"prec={name}: {t*1000:.1f} ms flops={ca.get('flops',0):.3g} "
              f"bytes={ca.get('bytes accessed',0):.3g}")


if __name__ == "__main__" and "cmp2" in sys.argv:
    compare2()


def solve_ab(P=3000, L=384):
    import dataclasses
    g = make_graph(P, L)
    for kind in ("dense_seg", "direct"):
        cfg = PoseGraphConfig(preconditioner=kind)
        poses, info = solve_pose_graph(g, cfg)
        jax.block_until_ready(poses.t)
        t0 = time.perf_counter()
        poses, info = solve_pose_graph(g, cfg)
        err = float(info.error)
        dt = time.perf_counter() - t0
        print(f"P={P} L={L} {kind}: {dt*1000:.1f} ms LM={int(info.iterations)} "
              f"cg={int(info.cg_iters_total)} err={err:.5g}")


if __name__ == "__main__" and "solveab" in sys.argv:
    solve_ab(int(sys.argv[2]), int(sys.argv[3]))
