"""Dense Levenberg-Marquardt on product manifolds, built for ``vmap``.

The reference solves thousands of *independent* small nonlinear problems serially —
one GTSAM ``LevenbergMarquardtOptimizer`` per keypoint correspondence
(/root/reference/src/core/optimizer.cpp:815-822) and one per triangulated landmark
(optimizer.cpp:1013-1016).  Each problem has 3-15 degrees of freedom.  On TPU we
express one problem as a dense tangent-space LM solve and ``vmap`` it over the whole
correspondence batch: the per-iteration work becomes batched 15x15 Cholesky solves —
a perfect MXU/VPU workload instead of a pointer-chasing serial loop.

The manifold is abstracted by two caller-provided functions:

* ``residual_fn(x) -> r``: whitened residual vector of the current estimate ``x``
  (any pytree).
* ``retract_fn(x, delta) -> x'``: apply a tangent step ``delta in R^n``.

Linearization uses ``jax.jacfwd`` of ``delta -> residual_fn(retract_fn(x, delta))``
at ``delta = 0`` — exact Jacobians, replacing the reference's hand-derived ones
(SSSpointfactor.cpp:19-76), which our tests verify against this autodiff ground
truth.

LM control flow mirrors GTSAM defaults (LevenbergMarquardtParams): initial lambda
1e-5, lambda factor 10, upper bound 1e5, stop on relative error decrease < 1e-5.
Control flow is a fixed-trip ``lax.fori_loop`` with masked updates so it is jit- and
vmap-safe (converged problems freeze while others continue).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: object  # final estimate (same pytree as x0)
    error: jnp.ndarray  # final 0.5*||r||^2 (GTSAM error convention)
    initial_error: jnp.ndarray
    hessian: jnp.ndarray  # J^T J at the final estimate (n, n) — for marginals
    iterations: jnp.ndarray
    converged: jnp.ndarray


def _linearize(residual_fn, retract_fn, x, n_dim: int):
    def local_resid(delta):
        return residual_fn(retract_fn(x, delta))

    zero = jnp.zeros((n_dim,), dtype=jnp.result_type(float))
    r = local_resid(zero)
    J = jax.jacfwd(local_resid)(zero)
    return r, J


def levenberg_marquardt(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    n_dim: int,
    max_iters: int = 40,
    lambda_init: float = 1e-5,
    lambda_factor: float = 10.0,
    lambda_max: float = 1e5,
    rel_tol: float = 1e-5,
    abs_tol: float = 1e-5,
) -> LMResult:
    """Minimize ``0.5 * ||residual_fn(x)||^2`` over the manifold.

    One fori_loop trip = one LM trial (solve + accept/reject), matching how GTSAM
    counts "inner" iterations.  All state updates are ``jnp.where``-masked so the
    function is safely vmappable.
    """
    dtype = jnp.result_type(float)

    def error_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    err0 = error_of(x0)

    def body(_, state):
        x, err, lam, done, iters = state
        r, J = _linearize(residual_fn, retract_fn, x, n_dim)
        H = J.T @ J
        g = J.T @ r
        A = H + lam * jnp.eye(n_dim, dtype=dtype)
        # Cholesky solve; fall back to lstsq-like behavior by jitter on failure is
        # handled by the lambda escalation path (a failed factorization produces
        # NaNs -> step rejected -> lambda grows).
        L = jnp.linalg.cholesky(A)
        delta = jax.scipy.linalg.cho_solve((L, True), -g)
        x_new = retract_fn(x, delta)
        err_new = error_of(x_new)
        good = jnp.isfinite(err_new) & (err_new < err)
        x = jax.tree_util.tree_map(lambda a, b: jnp.where(good & ~done, b, a), x, x_new)
        err = jnp.where(good & ~done, err_new, err)
        lam_up = jnp.minimum(lam * lambda_factor, lambda_max)
        lam_dn = lam / lambda_factor
        lam = jnp.where(done, lam, jnp.where(good, lam_dn, lam_up))
        # Freeze only on lambda stall.  Accepted LM steps are monotone, and the
        # batch runs in lockstep, so an early "convergence" exit saves nothing but
        # risks freezing a problem in a high-lambda (tiny-step) regime — observed
        # on Rosenbrock-style valleys.  GTSAM-style small-decrease convergence is
        # still *reported* (see below) for observability.
        stalled = (~good) & (lam >= lambda_max)
        done = done | stalled
        iters = iters + jnp.where(done, 0, 1)
        return x, err, lam, done, iters

    lam0 = jnp.asarray(lambda_init, dtype)
    done0 = jnp.asarray(False)
    state = (x0, err0, lam0, done0, jnp.asarray(0, jnp.int32))
    x, err, lam, done, iters = jax.lax.fori_loop(0, max_iters, body, state)

    # final Hessian for marginal covariances (Marginals::QR equivalent,
    # optimizer.cpp:956: cov = (J^T J)^-1 at the solution)
    r, J = _linearize(residual_fn, retract_fn, x, n_dim)
    H = J.T @ J
    # report convergence: gradient small relative to problem scale, or error ~ 0
    grad_norm = jnp.linalg.norm(J.T @ r)
    converged = (grad_norm <= 1e-3 * (1.0 + err)) | (err <= abs_tol)
    return LMResult(x=x, error=err, initial_error=err0, hessian=H, iterations=iters, converged=converged)


def marginal_covariance(hessian: jnp.ndarray, block: slice) -> jnp.ndarray:
    """Marginal covariance of a variable block: ``(H^-1)[block, block]``.

    Equivalent to ``gtsam::Marginals(graph, result, QR).marginalCovariance``
    (optimizer.cpp:956) — the full-state covariance is the inverse of the whitened
    Gauss-Newton Hessian; a marginal is the corresponding diagonal block.
    """
    n = hessian.shape[-1]
    # solve H X = I restricted to the block columns, then slice rows
    eye = jnp.eye(n, dtype=hessian.dtype)[:, block]
    L = jnp.linalg.cholesky(hessian)
    cols = jax.scipy.linalg.cho_solve((L, True), eye)
    return cols[block, :]
