"""Block-tridiagonal solve via cyclic reduction — TPU-parallel chain algebra.

The pose-graph Hessian is (block-tridiagonal chain from odometry) + (sparse
loop-closure terms).  The chain part is exactly solvable in ``log2(P)`` levels
of *batched* 6x6 linear algebra with cyclic reduction — each level eliminates
the odd-indexed blocks simultaneously — in contrast to the sequential Thomas
algorithm.  Used as the CG preconditioner in
:mod:`diasss_tpu.solvers.pose_graph`: with the chain solved exactly, PCG
iteration count is governed by the (few) loop-closure corrections instead of
the chain length (SURVEY §5 long-context row).

Convention: symmetric system ``T x = b`` with diagonal blocks ``D[i]`` (P, 6, 6)
and super-diagonal blocks ``U[i]`` coupling (i, i+1) (P-1, 6, 6); the
sub-diagonal is ``U[i]^T``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _solve_blocks(D, X):
    """Batched solve D_i Y_i = X_i for (..., 6, 6) or (..., 6) rhs."""
    L = jnp.linalg.cholesky(D)
    if X.ndim == D.ndim:
        return jax.scipy.linalg.cho_solve((L, True), X)
    return jax.scipy.linalg.cho_solve((L, True), X[..., None])[..., 0]


def _invert_blocks(D):
    """Explicit batched 6x6 SPD inverses (cholesky vs identity).

    On TPU, triangular solves against narrow RHS are far slower than GEMMs;
    computing the inverse ONCE per cyclic-reduction level and applying it as
    batched matmuls keeps every level on the MXU.  The blocks are LM-damped
    SPD, so the explicit inverse is numerically safe here."""
    eye = jnp.broadcast_to(jnp.eye(D.shape[-1], dtype=D.dtype), D.shape)
    L = jnp.linalg.cholesky(D)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def solve_block_tridiag(D: jnp.ndarray, U: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system; returns x with b's shape.

    Pure recursion over halved systems — trace-time depth is ceil(log2(P)), and
    every level is one batch of 6x6 Cholesky factorizations and GEMMs.

    A dense-tail cutoff (stop recursing at <=64 block-rows, finish with one
    dense (6P, 6P) Cholesky) was tried and REJECTED — measured TPU v5e at the
    12k-pose bench graph: the 30-trial direct LM solve went 0.97 s -> 13.7 s
    steady-state.  The deep narrow levels are NOT a latency problem (the whole
    recursion lives inside one jitted program; the batched 6x6 einsums are
    cheap), while dense Cholesky/triangular solves at a few hundred rows are
    exactly the latency-bound TPU shape `_invert_blocks` exists to avoid.
    """
    P = D.shape[0]
    if P == 1:
        return _solve_blocks(D, b)
    if P == 2:
        # dense 12x12 solve
        A = jnp.block([[D[0], U[0]], [U[0].swapaxes(-1, -2), D[1]]])
        x = jnp.linalg.solve(A, jnp.concatenate([b[0], b[1]])[:, None])[:, 0]
        return jnp.stack([x[:6], x[6:]])

    odd = jnp.arange(1, P, 2)
    even = jnp.arange(0, P, 2)
    n_odd = odd.shape[0]
    n_even = even.shape[0]

    D_odd = D[odd]
    b_odd = b[odd]
    # couplings of odd i to its even neighbors: left U[i-1] (always exists),
    # right U[i] (missing when i == P-1)
    U_left = U[odd - 1]  # (n_odd, 6, 6): block (i-1, i)
    has_right = odd + 1 < P
    U_right = jnp.where(
        has_right[:, None, None], U[jnp.minimum(odd, U.shape[0] - 1)], 0.0
    )  # block (i, i+1)

    # D_odd^-1 applied to couplings and rhs — ONE factorization per level,
    # applications as batched GEMMs (MXU work; triangular solves on narrow
    # blocks are the TPU bottleneck this avoids)
    Dinv = _invert_blocks(D_odd)
    Dinv_Ul = _mm(Dinv, U_left.swapaxes(-1, -2))  # D^-1 U_left^T
    Dinv_Ur = _mm(Dinv, U_right)  # D^-1 U_right
    if b.ndim == 3:
        Dinv_b = _mm(Dinv, b_odd)
    else:
        Dinv_b = jnp.einsum("kab,kb->ka", Dinv, b_odd, precision=_HI)

    # reduced system on even indices
    D_new = D[even]
    b_new = b[even]
    # contribution from odd block i = even_left + 1 (exists when even j has a
    # right odd neighbor, i.e. j + 1 < P):
    # D'_j -= U_j D_{j+1}^-1 U_j^T ; b'_j -= U_j D_{j+1}^-1 b_{j+1}
    has_rodd = even + 1 < P
    k_r = jnp.minimum((even + 1 - 1) // 2, n_odd - 1)  # odd neighbor index in odd-array
    corr_D_r = _mm(U[jnp.minimum(even, U.shape[0] - 1)], Dinv_Ul[k_r])
    corr_b_r = jnp.einsum(
        "kab,kb->ka", U[jnp.minimum(even, U.shape[0] - 1)], Dinv_b[k_r], precision=_HI
    )
    D_new = D_new - jnp.where(has_rodd[:, None, None], corr_D_r, 0.0)
    b_new = b_new - jnp.where(has_rodd[:, None], corr_b_r, 0.0)

    # contribution from odd block i = even_left - 1 (exists when j - 1 >= 0):
    # D'_j -= U_{j-1}^T D_{j-1}^-1 U_{j-1} ; b'_j -= U_{j-1}^T D_{j-1}^-1 b_{j-1}
    has_lodd = even - 1 >= 0
    k_l = jnp.maximum((even - 1 - 1) // 2, 0)
    Ul_T = U[jnp.maximum(even - 1, 0)].swapaxes(-1, -2)
    # D_{j-1}^-1 U_{j-1} is the "right coupling" solve of odd block j-1
    corr_D_l = _mm(Ul_T, Dinv_Ur[k_l])
    corr_b_l = jnp.einsum(
        "kab,kb->ka", Ul_T, Dinv_b[k_l], precision=_HI
    )
    D_new = D_new - jnp.where(has_lodd[:, None, None], corr_D_l, 0.0)
    b_new = b_new - jnp.where(has_lodd[:, None], corr_b_l, 0.0)

    # new couplings between consecutive even blocks j, j+2 (via odd j+1):
    # U'_k = -U_j D_{j+1}^-1 U_{j+1}   for k = j/2, valid when j+2 < P
    j_idx = even[:-1]
    U_new = -_mm(U[j_idx], Dinv_Ur[jnp.minimum(j_idx // 2, n_odd - 1)])
    # guard: when j+1 == P-1 has no right coupling, U_right row was zeroed -> fine

    x_even = solve_block_tridiag(D_new, U_new, b_new)

    # back-substitute odd unknowns:
    # x_i = D_i^-1 (b_i - U_{i-1}^T x_{i-1} - U_i x_{i+1})
    x_left = x_even[jnp.minimum((odd - 1) // 2, n_even - 1)]
    x_right_idx = jnp.minimum((odd + 1) // 2, n_even - 1)
    x_right = jnp.where(has_right[:, None], x_even[x_right_idx], 0.0)
    rhs = b_odd - jnp.einsum("kab,ka->kb", U_left, x_left, precision=_HI)
    rhs = rhs - jnp.einsum("kab,kb->ka", U_right, x_right, precision=_HI)
    x_odd = jnp.einsum("kab,kb->ka", Dinv, rhs, precision=_HI)

    x = jnp.zeros_like(b)
    x = x.at[even].set(x_even)
    x = x.at[odd].set(x_odd)
    return x


def solve_block_tridiag_multi(D: jnp.ndarray, U: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Multi-RHS exact chain solve: ``B`` is (P, 6, R); returns (P, 6, R).

    vmap over the RHS axis reuses every Cholesky factorization of the cyclic
    reduction across all R columns (``in_axes=None`` keeps the D/U path
    unbatched) — the marginal cost per extra column is one batched GEMM per
    level.  This is what makes the Woodbury direct solvers
    (:func:`diasss_tpu.solvers.pose_graph.solve_pose_graph` kind="direct")
    cheap: one factorization serves the gradient AND all low-rank columns.
    """
    return jax.vmap(solve_block_tridiag, in_axes=(None, None, 2), out_axes=2)(D, U, B)


def thomas_block_tridiag_multi(D: jnp.ndarray, U: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Multi-RHS exact chain solve by block-Thomas (LDL-style) ``lax.scan``.

    Same result as :func:`solve_block_tridiag_multi`, different cost shape:
    cyclic reduction unrolls ``log2(P)`` levels at trace time (compile cost
    grows with P and the vmapped RHS width), while this is TWO scans whose body
    is one 6x6 Cholesky + a (6, R) triangular solve — compile cost is O(1) in
    P.  Runtime is 2P sequential steps of tiny GEMMs; with R in the hundreds
    (the Woodbury direct solvers) each step still feeds the MXU a (6, R) tile,
    so the serial chain is far cheaper than the PCG iteration chain it
    replaces.  ``B``: (P, 6, R); returns (P, 6, R).
    """
    P = D.shape[0]
    if P == 1:
        return _solve_blocks(D, B)
    Upad = jnp.concatenate([jnp.zeros((1,) + U.shape[1:], U.dtype), U])  # U[i-1] at row i

    def fwd(carry, inp):
        L_prev, c_prev = carry
        Di, Ui_prev, Bi = inp
        # M = U_{i-1}^T S_{i-1}^-1  ->  S_i = D_i - M U_{i-1}, c_i = B_i - M c_{i-1}
        SinvU = jax.scipy.linalg.cho_solve((L_prev, True), Ui_prev)  # S^-1 U
        Si = Di - _mm(Ui_prev.swapaxes(-1, -2), SinvU)
        ci = Bi - _mm(Ui_prev.swapaxes(-1, -2), jax.scipy.linalg.cho_solve((L_prev, True), c_prev))
        Li = jnp.linalg.cholesky(Si)
        return (Li, ci), (Li, ci)

    L0 = jnp.linalg.cholesky(D[0])
    (_, _), (Ls, cs) = jax.lax.scan(fwd, (L0, B[0]), (D[1:], U, B[1:]))
    Ls = jnp.concatenate([L0[None], Ls])
    cs = jnp.concatenate([B[0][None], cs])

    # back substitution: x_i = S_i^-1 (c_i - U_i x_{i+1})
    xP = jax.scipy.linalg.cho_solve((Ls[-1], True), cs[-1])

    def bwd(x_next, inp):
        Li, ci, Ui = inp
        xi = jax.scipy.linalg.cho_solve((Li, True), ci - _mm(Ui, x_next))
        return xi, xi

    _, xs = jax.lax.scan(bwd, xP, (Ls[:-1], cs[:-1], U), reverse=True)
    return jnp.concatenate([xs, xP[None]])


def spike_block_tridiag_multi(
    D_loc: jnp.ndarray,
    U_loc: jnp.ndarray,
    U_bd: jnp.ndarray,
    B_rhs: jnp.ndarray,
    axis: str,
    n: int,
) -> jnp.ndarray:
    """Distributed EXACT multi-RHS block-tridiagonal solve (SPIKE partitioning).

    Must be called INSIDE a ``shard_map`` over mesh axis ``axis`` (``n``
    devices).  The global chain is block-partitioned: this device owns

    * ``D_loc`` (B, 6, 6) — its diagonal blocks,
    * ``U_loc`` (B-1, 6, 6) — couplings between ITS consecutive rows,
    * ``U_bd`` (6, 6) — the coupling of its LAST row to the NEXT device's
      first row (MUST be zero on the last device / across invalid factors),
    * ``B_rhs`` (B, 6, R) — its rows of the right-hand sides.

    Algorithm (the classic SPIKE factorization, TPU-shaped):

    1. ONE local multi-RHS chain factorization (cyclic reduction on TPU,
       Thomas scan elsewhere — same choice as the single-device direct
       solvers) applied to ``[B_rhs | e_last U_bd | e_first U_prev^T]`` —
       the 12 extra "spike" columns cost two more RHS-group GEMMs per level;
    2. an ``all_gather`` of ONLY the first/last rows of the local solutions
       and spikes — O(n * R) floats, the solve's entire communication;
    3. every device assembles and solves the same dense (12n, 12n) reduced
       boundary system (replicated, tiny — 96x96 at n=8);
    4. local back-substitution ``x = w - F y_next - G y_prev``.

    Exact (no segment-cut approximation): equivalence with the single-device
    :func:`solve_block_tridiag_multi` is pinned by tests/test_tridiag.py.
    This is what makes the direct Woodbury LM step distributable — the chain
    factorization was the only O(P)-serial piece (SURVEY §5 long-context row).
    """
    from jax import lax

    B = D_loc.shape[0]
    if B < 2:
        raise ValueError("SPIKE partitioning needs >= 2 rows per device")
    R = B_rhs.shape[2]
    dtype = D_loc.dtype

    multi_solve = (
        solve_block_tridiag_multi
        if jax.default_backend() == "tpu"
        else thomas_block_tridiag_multi
    )

    # left coupling: the PREVIOUS device's boundary block (cyclic ppermute is
    # safe — device n-1's U_bd is zero by contract, so device 0's G vanishes)
    U_prev = lax.ppermute(U_bd, axis, [(i, (i + 1) % n) for i in range(n)])

    cols = jnp.zeros((B, 6, 12), dtype)
    cols = cols.at[B - 1, :, :6].set(U_bd)  # right-spike source
    cols = cols.at[0, :, 6:].set(U_prev.T)  # left-spike source
    W = multi_solve(D_loc, U_loc, jnp.concatenate([B_rhs, cols], axis=2))
    w, F, G = W[:, :, :R], W[:, :, R : R + 6], W[:, :, R + 6 :]

    # boundary exchange: first/last rows of w (6, R) and spikes (6, 6)
    spikes = jnp.stack([F[0], F[B - 1], G[0], G[B - 1]])  # (4, 6, 6)
    Fg = lax.all_gather(spikes, axis)  # (n, 4, 6, 6), replicated
    wg = lax.all_gather(jnp.stack([w[0], w[B - 1]]), axis)  # (n, 2, 6, R)

    # reduced system M y = wr over the boundary unknowns
    # y = [x_0[0], x_0[B-1], x_1[0], x_1[B-1], ...]:
    #   x_d[0]   + F_d[0]   x_{d+1}[0] + G_d[0]   x_{d-1}[B-1] = w_d[0]
    #   x_d[B-1] + F_d[B-1] x_{d+1}[0] + G_d[B-1] x_{d-1}[B-1] = w_d[B-1]
    M = jnp.zeros((n, 2, 6, n, 2, 6), dtype)
    ii = jnp.arange(n)
    ee = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (n, 2, 6, 6))
    M = M.at[ii[:, None], jnp.arange(2)[None, :], :, ii[:, None], jnp.arange(2)[None, :], :].set(ee)
    for d in range(n):  # n is static and small; unrolled at trace time
        if d + 1 < n:
            M = M.at[d, 0, :, d + 1, 0, :].add(Fg[d, 0])
            M = M.at[d, 1, :, d + 1, 0, :].add(Fg[d, 1])
        if d - 1 >= 0:
            M = M.at[d, 0, :, d - 1, 1, :].add(Fg[d, 2])
            M = M.at[d, 1, :, d - 1, 1, :].add(Fg[d, 3])
    m = 12 * n
    y = jnp.linalg.solve(M.reshape(m, m), wg.reshape(m, R))  # replicated
    yb = y.reshape(n, 2, 6, R)

    d_idx = lax.axis_index(axis)
    y_next = jnp.where(d_idx + 1 < n, 1.0, 0.0) * yb[jnp.minimum(d_idx + 1, n - 1), 0]
    y_prev = jnp.where(d_idx - 1 >= 0, 1.0, 0.0) * yb[jnp.maximum(d_idx - 1, 0), 1]
    x = w - jnp.einsum("bac,cr->bar", F, y_next, precision=_HI)
    x = x - jnp.einsum("bac,cr->bar", G, y_prev, precision=_HI)
    return x


def solve_block_tridiag_segmented(
    D: jnp.ndarray, U: jnp.ndarray, b: jnp.ndarray, segment: int = 256
) -> jnp.ndarray:
    """Segment-parallel approximate solve: the chain is cut into independent
    segments of length ``segment`` (inter-segment couplings dropped), and all
    segments run through cyclic reduction *together* (vmap) — log2(segment)
    levels of wide batched ops instead of log2(P) levels of narrow ones.

    As a preconditioner this is between block-Jacobi (segment=1) and the exact
    chain solve (segment=P): on TPU the wide-batch shape wins wall-clock even
    though PCG needs a few more iterations.  This is also exactly the
    sequence-parallel partitioning of the pose chain (SURVEY §5): each device
    can own a contiguous run of segments with no communication inside the
    preconditioner.
    """
    P = D.shape[0]
    if P <= segment:
        return solve_block_tridiag(D, U, b)
    S = -(-P // segment)
    pad = S * segment - P
    eye = jnp.broadcast_to(jnp.eye(6, dtype=D.dtype), (pad, 6, 6))
    D_p = jnp.concatenate([D, eye]) if pad else D
    b_p = jnp.concatenate([b, jnp.zeros((pad, 6), b.dtype)]) if pad else b
    # U_p[i] couples (i, i+1); zero the couplings that cross segment borders
    U_full = jnp.concatenate([U, jnp.zeros((pad + 1, 6, 6), U.dtype)])[: S * segment]
    idx = jnp.arange(S * segment)
    cross = (idx % segment) == (segment - 1)
    U_full = jnp.where(cross[:, None, None], 0.0, U_full)
    D_seg = D_p.reshape(S, segment, 6, 6)
    b_seg = b_p.reshape(S, segment, 6)
    U_seg = U_full.reshape(S, segment, 6, 6)[:, : segment - 1]
    x = jax.vmap(solve_block_tridiag)(D_seg, U_seg, b_seg)
    return x.reshape(S * segment, 6)[:P]


def dense_segment_inverses(D: jnp.ndarray, U: jnp.ndarray, segment: int) -> jnp.ndarray:
    """(S, 6*segment, 6*segment) explicit inverses of the per-segment dense
    chain matrices — the MXU formulation of the segmented chain preconditioner.

    Cyclic reduction (:func:`solve_block_tridiag_segmented`) applies the same
    linear operator in ``log2(segment)`` levels of NARROW 6x6 batched algebra —
    measured ~10x wall vs block-Jacobi on TPU (PERF.md round 1): the MXU is idle
    on 6-wide kernels.  Assembling each segment's block-tridiagonal matrix
    densely and inverting ONCE per LM trial turns every PCG preconditioner
    application into a single wide batched GEMM ``(S, m, m) @ (S, m)`` — pure
    MXU work — while computing the exact same preconditioner (cross-segment
    couplings dropped, chain exact within a segment).

    Cost: one batched (S, m, m) inversion per trial (m = 6*segment) and
    ``36 * P * segment`` floats of memory — callers shrink ``segment`` as P
    grows (see :func:`auto_dense_segment`).
    """
    P = D.shape[0]
    S = -(-P // segment)
    pad = S * segment - P
    eye6 = jnp.eye(6, dtype=D.dtype)
    if pad:
        D = jnp.concatenate([D, jnp.broadcast_to(eye6, (pad, 6, 6))])
    U_full = jnp.concatenate([U, jnp.zeros((pad + 1, 6, 6), U.dtype)])[: S * segment]
    idx = jnp.arange(S * segment)
    cross = (idx % segment) == (segment - 1)
    U_full = jnp.where(cross[:, None, None], 0.0, U_full)

    D_seg = D.reshape(S, segment, 6, 6)
    U_seg = U_full.reshape(S, segment, 6, 6)[:, : segment - 1]

    m = 6 * segment
    T = jnp.zeros((S, segment, 6, segment, 6), D.dtype)
    ii = jnp.arange(segment)
    T = T.at[:, ii, :, ii, :].set(jnp.swapaxes(D_seg, 0, 1))
    if segment > 1:
        jj = jnp.arange(segment - 1)
        T = T.at[:, jj, :, jj + 1, :].set(jnp.swapaxes(U_seg, 0, 1))
        T = T.at[:, jj + 1, :, jj, :].set(
            jnp.swapaxes(U_seg.swapaxes(-1, -2), 0, 1)
        )
    M = T.reshape(S, m, m)
    # NOTE: a bf16 inverse store was tried (halves apply bytes) and REJECTED:
    # the chain matrices are ill-conditioned enough that bf16 rounding wrecks
    # the preconditioner (measured P=3000 TPU: solve 1.8 s -> 4.5 s and the
    # reached optimum degraded 3.2e-3 -> 1.0e-2).  f32 it stays.
    return jnp.linalg.inv(M)


def apply_dense_segment_inverses(Minv: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Apply precomputed segment inverses: one batched GEMM.  ``b``: (P, 6)."""
    S, m, _ = Minv.shape
    segment = m // 6
    P = b.shape[0]
    pad = S * segment - P
    b_p = jnp.concatenate([b, jnp.zeros((pad, 6), b.dtype)]) if pad else b
    x = jnp.einsum("sij,sj->si", Minv, b_p.reshape(S, m), precision=_HI)
    return x.reshape(S * segment, 6)[:P]


def auto_dense_segment(P: int, requested: int, budget_floats: int = 150_000_000) -> int:
    """Largest power-of-two segment <= requested whose inverse store
    ``36 * P * segment`` floats fits the budget (>= 8).

    On TPU the segment is additionally capped at 64: the per-trial batched
    inversion cost grows ~segment^2 while CG savings flatten — measured at
    P=3000 (PERF.md round-2 sweep): seg 64 = 1.81 s total solve vs
    seg 256 = 2.91 s, seg 128 = 4.72 s."""
    if jax.default_backend() == "tpu":
        requested = min(requested, 64)
    seg = 8
    while seg * 2 <= requested and 36 * P * (seg * 2) <= budget_floats:
        seg *= 2
    return min(seg, max(8, requested))


class ChainFactor(NamedTuple):
    """Reusable EXACT factorization of a block-tridiagonal chain — the
    single-device SPIKE two-level scheme, shaped for the MXU.

    The chain is cut into S segments of ``segment`` block-rows; each
    segment's dense matrix is inverted ONCE (batched (S, m, m) inversion,
    m = 6*segment), the 12 spike columns per segment couple neighbors, and
    the (12S, 12S) reduced boundary system is inverted densely.  Every
    apply is then pure batched GEMM work: ``x = Minv b`` per segment, one
    (12S, 12S) @ (12S, R) boundary correction, two spike GEMMs.

    Unlike :func:`dense_segment_inverses` (which DROPS the cross-segment
    couplings and is therefore only a preconditioner), this is an exact
    solve — interchangeable with :func:`solve_block_tridiag_multi` /
    :func:`thomas_block_tridiag_multi`, but with cost that rides the MXU:
    measured TPU v5e (PERF.md round 5) the direct BA step's multi-RHS solve
    drops from CR's narrow log2(P)-level recursion to two wide GEMMs.
    """

    Minv: jnp.ndarray  # (S, m, m) per-segment dense inverses
    F: jnp.ndarray  # (S, m, 6) right spikes (coupling to next segment)
    G: jnp.ndarray  # (S, m, 6) left spikes (coupling to previous segment)
    Rinv: jnp.ndarray  # (12S, 12S) inverse of the reduced boundary system
    # segment size and the real row count are DERIVED from shapes at apply
    # time (m // 6 and b.shape[0]) so a ChainFactor can cross jit boundaries
    # without its metadata becoming traced arrays


def chain_factor(D: jnp.ndarray, U: jnp.ndarray, segment: int = 64) -> ChainFactor:
    """Factor the SPD block-tridiagonal chain (D: (P, 6, 6), U: (P-1, 6, 6))
    into a :class:`ChainFactor` (see there).  One batched (S, m, m) dense
    inversion + one (12S, 12S) dense inversion; all later applies are GEMMs."""
    P = D.shape[0]
    S = -(-P // segment)
    pad = S * segment - P
    eye6 = jnp.eye(6, dtype=D.dtype)
    if pad:
        D = jnp.concatenate([D, jnp.broadcast_to(eye6, (pad, 6, 6))])
    U_full = jnp.concatenate([U, jnp.zeros((pad + 1, 6, 6), U.dtype)])[: S * segment]
    # boundary couplings: U_bd[s] couples segment s's LAST row to s+1's first
    idx = jnp.arange(S * segment)
    cross = (idx % segment) == (segment - 1)
    U_bd = U_full[segment - 1 :: segment]  # (S, 6, 6); U_bd[S-1] is junk ->
    U_bd = U_bd.at[S - 1].set(0.0)  # no next segment
    U_in = jnp.where(cross[:, None, None], 0.0, U_full)

    D_seg = D.reshape(S, segment, 6, 6)
    U_seg = U_in.reshape(S, segment, 6, 6)[:, : segment - 1]

    m = 6 * segment
    T = jnp.zeros((S, segment, 6, segment, 6), D.dtype)
    ii = jnp.arange(segment)
    T = T.at[:, ii, :, ii, :].set(jnp.swapaxes(D_seg, 0, 1))
    if segment > 1:
        jj = jnp.arange(segment - 1)
        T = T.at[:, jj, :, jj + 1, :].set(jnp.swapaxes(U_seg, 0, 1))
        T = T.at[:, jj + 1, :, jj, :].set(jnp.swapaxes(U_seg.swapaxes(-1, -2), 0, 1))
    Minv = jnp.linalg.inv(T.reshape(S, m, m))

    # spikes: F_s = Minv_s (e_last x U_bd[s]); G_s = Minv_s (e_first x U_bd[s-1]^T)
    U_prev = jnp.concatenate([jnp.zeros((1, 6, 6), D.dtype), U_bd[:-1]])
    F = jnp.einsum("sij,sjb->sib", Minv[:, :, m - 6 :], U_bd, precision=_HI)
    G = jnp.einsum("sij,sjb->sib", Minv[:, :, :6],
                   U_prev.swapaxes(-1, -2), precision=_HI)

    # reduced boundary system over y = [x_s[first6], x_s[last6]]:
    #   x_s[first] + F_s[first] y_{s+1,first} + G_s[first] y_{s-1,last} = w_s[first]
    #   x_s[last]  + F_s[last]  y_{s+1,first} + G_s[last]  y_{s-1,last} = w_s[last]
    M = jnp.zeros((S, 2, 6, S, 2, 6), D.dtype)
    si = jnp.arange(S)
    ee = jnp.broadcast_to(jnp.eye(6, dtype=D.dtype), (S, 2, 6, 6))
    M = M.at[si[:, None], jnp.arange(2)[None, :], :, si[:, None],
             jnp.arange(2)[None, :], :].set(ee)
    for s in range(S):  # S is static and modest; unrolled at trace time
        if s + 1 < S:
            M = M.at[s, 0, :, s + 1, 0, :].add(F[s, :6])
            M = M.at[s, 1, :, s + 1, 0, :].add(F[s, m - 6 :])
        if s - 1 >= 0:
            M = M.at[s, 0, :, s - 1, 1, :].add(G[s, :6])
            M = M.at[s, 1, :, s - 1, 1, :].add(G[s, m - 6 :])
    Rinv = jnp.linalg.inv(M.reshape(12 * S, 12 * S))
    return ChainFactor(Minv=Minv, F=F, G=G, Rinv=Rinv)


def chain_solve(fac: ChainFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Exact chain solve with a prebuilt :class:`ChainFactor`.
    ``b``: (P, 6) or (P, 6, R); returns the same shape."""
    single = b.ndim == 2
    if single:
        b = b[:, :, None]
    P, _, Rn = b.shape
    S, m, _ = fac.Minv.shape
    segment = m // 6
    pad = S * segment - P
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 6, Rn), b.dtype)])
    bs = b.reshape(S, m, Rn)
    w = jnp.einsum("sij,sjr->sir", fac.Minv, bs, precision=_HI)  # (S, m, R)

    wb = jnp.stack([w[:, :6], w[:, m - 6 :]], axis=1)  # (S, 2, 6, R)
    y = jnp.einsum("ab,br->ar", fac.Rinv, wb.reshape(12 * S, Rn),
                   precision=_HI).reshape(S, 2, 6, Rn)
    y_next = jnp.concatenate([y[1:, 0], jnp.zeros((1, 6, Rn), b.dtype)])  # (S, 6, R)
    y_prev = jnp.concatenate([jnp.zeros((1, 6, Rn), b.dtype), y[:-1, 1]])
    x = w - jnp.einsum("sib,sbr->sir", fac.F, y_next, precision=_HI)
    x = x - jnp.einsum("sib,sbr->sir", fac.G, y_prev, precision=_HI)
    x = x.reshape(S * segment, 6, Rn)[:P]
    return x[:, :, 0] if single else x


def block_tridiag_selected_inverse(D: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """(P, 6, 6) DIAGONAL blocks of T^-1 for the SPD block-tridiagonal T —
    Takahashi-style selected inversion, O(P) instead of any dense inverse.

    Forward block-elimination Schur diagonals ``S_i = D_i - U_{i-1}^T
    S_{i-1}^-1 U_{i-1}``, then the classic backward recurrence for a block
    tridiagonal inverse's diagonal:

        Sigma_P = S_P^-1
        Sigma_i = S_i^-1 + (S_i^-1 U_i) Sigma_{i+1} (S_i^-1 U_i)^T

    Two ``lax.scan``s of 6x6 algebra.  Used by the exact full-BA pose
    marginals (solvers/full_ba.ba_pose_marginals): diag(S^-1) of the Schur
    system = this on the chain part + the low-rank Woodbury correction.
    Reference anchor: GTSAM QR ``Marginals`` (optimizer.cpp:956).
    """
    P = D.shape[0]
    if P == 1:
        return jnp.linalg.inv(D)

    def inv6(A):
        return jnp.linalg.inv(A)

    def fwd(S_inv_prev, inp):
        Di, Ui_prev = inp
        Si = Di - Ui_prev.T @ S_inv_prev @ Ui_prev
        S_inv = inv6(Si)
        return S_inv, S_inv

    S0 = inv6(D[0])
    _, S_rest = jax.lax.scan(fwd, S0, (D[1:], U))
    S_invs = jnp.concatenate([S0[None], S_rest])  # (P, 6, 6)

    def bwd(Sigma_next, inp):
        S_inv_i, Ui = inp
        M = S_inv_i @ Ui
        Sigma_i = S_inv_i + M @ Sigma_next @ M.T
        return Sigma_i, Sigma_i

    _, Sig_rest = jax.lax.scan(bwd, S_invs[-1], (S_invs[:-1], U), reverse=True)
    return jnp.concatenate([Sig_rest, S_invs[-1][None]])
