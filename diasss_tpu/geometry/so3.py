"""SO(3) operations with GTSAM-compatible conventions.

The reference parameterizes all rotations through ``gtsam::Rot3::Rodrigues(r, p, y)``
(e.g. /root/reference/src/core/optimizer.cpp:150-152), which is the *exponential map*
of the axis-angle vector ``[r, p, y]`` — NOT an Euler-angle constructor.  We replicate
that convention exactly: :func:`exp` is the matrix exponential via the Rodrigues
formula, :func:`log` its inverse, and :func:`rpy` extracts xyz-Euler angles
(``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``) matching ``gtsam::Rot3::rpy()`` used by the
trajectory writers (optimizer.cpp:1181-1182).

All functions are shape-polymorphic over leading batch dimensions and dtype-polymorphic
(float32 on TPU, float64 under x64 for parity tests).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    """3x3 matmul at full f32 precision (TPU defaults to bf16 passes)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``w``: last dim 3 -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jnp.ndarray):
    """Numerically-stable ``A = sin t / t`` and ``B = (1 - cos t) / t^2``.

    Taylor fallbacks keep gradients finite at theta -> 0.
    """
    eps = jnp.asarray(1e-8, theta2.dtype)
    safe = jnp.maximum(theta2, eps)
    theta = jnp.sqrt(safe)
    small = theta2 < eps
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe)
    return a, b


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map (Rodrigues): axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Matches ``gtsam::Rot3::Rodrigues`` / ``Rot3::Expmap``.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _sinc_coeffs(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * _mm(W, W)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Stable for small angles and near pi (uses the diagonal for the axis near pi).
    """
    dtype = R.dtype
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Clamp strictly inside (-1, 1): arccos has an infinite derivative at +-1,
    # which poisons forward-mode Jacobians of any residual evaluated at the
    # identity (the common case — LM linearizes at the measurement).  The value
    # error introduced is O(sqrt(eps)) in theta and O(eps) in the result (theta
    # only enters through slowly-varying coefficients there).
    eps_c = jnp.asarray(1e-7, dtype)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps_c, 1.0 - eps_c)
    theta = jnp.arccos(cos_t)
    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    antisym = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin_t = jnp.sin(theta)
    eps = jnp.asarray(1e-6, dtype)
    small = theta < eps
    near_pi = theta > (jnp.pi - 1e-3)
    # small-angle: theta/(2 sin theta) ~ 1/2 + theta^2/12
    scale_generic = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_t, jnp.asarray(1e-12, dtype)),
    )
    w_generic = scale_generic[..., None] * antisym
    # near-pi branch: axis from the largest diagonal of (R + I)/2
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2)) + jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), jnp.asarray(1e-12, dtype))
    # fix sign so axis agrees with antisymmetric part
    sign = jnp.where(jnp.sum(axis * antisym, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * sign[..., None] * axis
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(w): translation part of the SE(3) exponential.

    ``J_l = I + B * hat(w) + C * hat(w)^2`` with B=(1-cos t)/t^2, C=(t-sin t)/t^3.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    eps = jnp.asarray(1e-8, theta2.dtype)
    safe = jnp.maximum(theta2, eps)
    theta = jnp.sqrt(safe)
    small = theta2 < eps
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe * theta))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * _mm(W, W)


def left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) left Jacobian (used by the SE(3) log map)."""
    theta2 = jnp.sum(w * w, axis=-1)
    eps = jnp.asarray(1e-8, theta2.dtype)
    safe = jnp.maximum(theta2, eps)
    theta = jnp.sqrt(safe)
    small = theta2 < eps
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), jnp.asarray(1e-12, w.dtype))) / safe,
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * _mm(W, W)


def rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Extract (roll, pitch, yaw) with ``R = Rz(y) @ Ry(p) @ Rx(r)``.

    Matches ``gtsam::Rot3::rpy()`` (trajectory writer format,
    /root/reference/src/core/optimizer.cpp:1181-1182).
    """
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def yaw(R: jnp.ndarray) -> jnp.ndarray:
    """Yaw angle, matches ``gtsam::Rot3::yaw()`` (optimizer.cpp:871-878)."""
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), matching ``Rot3::quaternion()``.

    Branch-free Shepperd's method (safe under jit/vmap).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    d0 = 4.0 * jnp.maximum(qw0, 1e-12)
    c0 = jnp.stack([qw0, (m21 - m12) / d0, (m02 - m20) / d0, (m10 - m01) / d0], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    d1 = 4.0 * jnp.maximum(qx1, 1e-12)
    c1 = jnp.stack([(m21 - m12) / d1, qx1, (m01 + m10) / d1, (m02 + m20) / d1], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    d2 = 4.0 * jnp.maximum(qy2, 1e-12)
    c2 = jnp.stack([(m02 - m20) / d2, (m01 + m10) / d2, qy2, (m12 + m21) / d2], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    d3 = 4.0 * jnp.maximum(qz3, 1e-12)
    c3 = jnp.stack([(m10 - m01) / d3, (m02 + m20) / d3, (m12 + m21) / d3, qz3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
