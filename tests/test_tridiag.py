"""Cyclic-reduction block-tridiagonal solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.solvers.tridiag import solve_block_tridiag


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_caches():
    """The recursive cyclic-reduction program deterministically segfaults the
    XLA CPU compiler when compiled after ~130 accumulated test compilations
    (jax 0.9.0; passes in a fresh process).  Clearing the caches resets
    whatever compiler state triggers it."""
    jax.clear_caches()
    yield


def make_system(P, rng):
    U = rng.normal(size=(max(P - 1, 0), 6, 6)) * 0.3
    D = np.zeros((P, 6, 6))
    for i in range(P):
        A = rng.normal(size=(6, 6))
        D[i] = A @ A.T + 6 * np.eye(6)
    b = rng.normal(size=(P, 6))
    T = np.zeros((6 * P, 6 * P))
    for i in range(P):
        T[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] = D[i]
    for i in range(P - 1):
        T[6 * i : 6 * i + 6, 6 * i + 6 : 6 * i + 12] = U[i]
        T[6 * i + 6 : 6 * i + 12, 6 * i : 6 * i + 6] = U[i].T
    return D, U, b, T


@pytest.mark.parametrize("P", [1, 2, 3, 5, 8, 17, 64, 65, 127, 128])
def test_matches_dense_solve(P, rng):
    D, U, b, T = make_system(P, rng)
    x_ref = np.linalg.solve(T, b.ravel()).reshape(P, 6)
    x = np.asarray(
        solve_block_tridiag(
            jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32), jnp.asarray(b, jnp.float32)
        )
    )
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("P", [63, 64, 65, 130])
def test_multi_rhs_dense_tail_matches_thomas(P, rng):
    """The two multi-RHS chain solves used by the direct Woodbury LM step
    must agree: cyclic reduction == the sequential block-Thomas scan
    (guards any future recursion-restructure, e.g. a dense-tail cutoff —
    tried and rejected, see solve_block_tridiag's docstring)."""
    from diasss_tpu.solvers.tridiag import (
        solve_block_tridiag_multi,
        thomas_block_tridiag_multi,
    )

    D, U, _, _ = make_system(P, rng)
    B = jnp.asarray(rng.normal(size=(P, 6, 7)), jnp.float32)
    Dj, Uj = jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32)
    x_cr = np.asarray(solve_block_tridiag_multi(Dj, Uj, B))
    x_th = np.asarray(thomas_block_tridiag_multi(Dj, Uj, B))
    np.testing.assert_allclose(x_cr, x_th, rtol=2e-3, atol=2e-4)


def test_identity_system(rng):
    P = 9
    D = jnp.broadcast_to(jnp.eye(6), (P, 6, 6))
    U = jnp.zeros((P - 1, 6, 6))
    b = jnp.asarray(rng.normal(size=(P, 6)), jnp.float32)
    x = solve_block_tridiag(D, U, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(b), atol=1e-6)


class TestDenseSegment:
    """MXU formulation: dense per-segment inverses applied as one batched GEMM
    must equal the cyclic-reduction segmented solve (same linear operator)."""

    @pytest.mark.parametrize("P,segment", [(53, 16), (64, 64), (200, 32), (7, 16)])
    def test_matches_cyclic_reduction(self, P, segment):
        from diasss_tpu.solvers.tridiag import (
            apply_dense_segment_inverses,
            dense_segment_inverses,
            solve_block_tridiag_segmented,
        )

        rng = np.random.default_rng(0)
        A = rng.normal(size=(P, 6, 6)).astype(np.float32)
        D = jnp.asarray(A @ A.transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.float32))
        U = jnp.asarray(0.3 * rng.normal(size=(max(P - 1, 0), 6, 6)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(P, 6)).astype(np.float32))
        ref = solve_block_tridiag_segmented(D, U, b, segment)
        Minv = dense_segment_inverses(D, U, segment)
        out = apply_dense_segment_inverses(Minv, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    def test_auto_segment_shrinks_with_chain_length(self):
        from diasss_tpu.solvers.tridiag import auto_dense_segment

        assert auto_dense_segment(3_000, 256) == 256
        assert auto_dense_segment(100_000, 256) <= 64
        assert auto_dense_segment(1_000_000, 256) >= 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("P_blocks", [64, 96])
def test_spike_matches_single_device(n_dev, P_blocks, rng):
    """The distributed SPIKE factorization == the single-device exact
    multi-RHS chain solve, at 2/4/8 devices (virtual CPU mesh).  This is the
    piece that makes the direct Woodbury LM step distributable."""
    from jax.sharding import Mesh, PartitionSpec as P
    from diasss_tpu.parallel.seq import shard_map
    from diasss_tpu.solvers.tridiag import (
        solve_block_tridiag_multi,
        spike_block_tridiag_multi,
    )

    D, U, _, _ = make_system(P_blocks, rng)
    R = 9
    Brhs = rng.normal(size=(P_blocks, 6, R))
    Dj = jnp.asarray(D, jnp.float32)
    Uj = jnp.asarray(U, jnp.float32)
    Bj = jnp.asarray(Brhs, jnp.float32)
    x_ref = np.asarray(solve_block_tridiag_multi(Dj, Uj, Bj))

    Bq = P_blocks // n_dev
    assert Bq * n_dev == P_blocks
    # per-device layout: U_loc = intra-block couplings, U_bd = boundary block
    U_pad = jnp.concatenate([Uj, jnp.zeros((1, 6, 6), jnp.float32)])  # (P, 6, 6)

    mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), ("data",))

    def solve_blk(D_b, U_b, B_b):
        # U_b: (Bq, 6, 6) — row k couples local k -> k+1; last row is the
        # boundary coupling (zero on the last device by the U_pad zero row)
        return spike_block_tridiag_multi(
            D_b, U_b[: Bq - 1], U_b[Bq - 1], B_b, "data", n_dev
        )

    fn = shard_map(
        solve_blk, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    x = np.asarray(fn(Dj, U_pad, Bj))
    np.testing.assert_allclose(x, x_ref, rtol=3e-3, atol=3e-4)
