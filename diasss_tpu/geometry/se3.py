"""SE(3) poses as batched (R, t) arrays with GTSAM-compatible semantics.

A pose batch is a pair of arrays ``R: (..., 3, 3)`` and ``t: (..., 3)``; we keep them
as a small NamedTuple pytree so poses flow through jit/vmap/pjit untouched.

Conventions copied from the reference's use of ``gtsam::Pose3``:

* construction from DR rows ``(r, p, y, x, y, z)`` uses ``Rot3::Rodrigues`` on the
  first three entries (/root/reference/src/core/optimizer.cpp:150-152) — see
  :func:`from_rodrigues_xyz`.
* ``transformTo`` maps world -> body: ``R^T (p - t)``
  (/root/reference/src/core/SSSpointfactor.cpp:15).
* tangent vectors are ordered ``(omega, v)`` — rotation first — matching the noise
  sigma layout ``(ro, pi, ya, x, y, z)`` everywhere in the reference
  (optimizer.cpp:182-183).
* ``expmap``/``logmap`` are the full SE(3) exponential (GTSAM 4.x default retract).
* ``between(a, b) = a^-1 * b`` and the BetweenFactor residual is
  ``Logmap(measured^-1 * between(x1, x2))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import so3

_HI = lax.Precision.HIGHEST


class Pose3(NamedTuple):
    """Batched rigid transform; fields broadcast over leading dims."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @property
    def shape(self):
        return self.t.shape[:-1]

    def __getitem__(self, idx):
        return Pose3(self.R[idx], self.t[idx])


def identity(shape=(), dtype=jnp.float32) -> Pose3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*shape, 3, 3))
    t = jnp.zeros((*shape, 3), dtype=dtype)
    return Pose3(R, t)


def from_rodrigues_xyz(rpyxyz: jnp.ndarray) -> Pose3:
    """Build poses from reference DR rows ``(r, p, y, x, y, z)``.

    The reference feeds the first three entries to ``Rot3::Rodrigues`` — i.e. they are
    treated as an axis-angle vector, not Euler angles (optimizer.cpp:150-152).
    """
    return Pose3(so3.exp(rpyxyz[..., :3]), rpyxyz[..., 3:6])


def compose(a: Pose3, b: Pose3) -> Pose3:
    return Pose3(jnp.matmul(a.R, b.R, precision=_HI), jnp.einsum("...ij,...j->...i", a.R, b.t, precision=_HI) + a.t)


def inverse(a: Pose3) -> Pose3:
    Rt = jnp.swapaxes(a.R, -1, -2)
    return Pose3(Rt, -jnp.einsum("...ij,...j->...i", Rt, a.t, precision=_HI))


def between(a: Pose3, b: Pose3) -> Pose3:
    """``a^-1 * b`` (gtsam::Pose3::between)."""
    return compose(inverse(a), b)


def transform_to(a: Pose3, p: jnp.ndarray) -> jnp.ndarray:
    """World point -> body frame: ``R^T (p - t)`` (gtsam::Pose3::transformTo)."""
    return jnp.einsum("...ji,...j->...i", a.R, p - a.t, precision=_HI)


def transform_from(a: Pose3, p: jnp.ndarray) -> jnp.ndarray:
    """Body point -> world frame: ``R p + t``."""
    return jnp.einsum("...ij,...j->...i", a.R, p, precision=_HI) + a.t


def expmap(xi: jnp.ndarray) -> Pose3:
    """SE(3) exponential of tangent ``xi = (omega, v)`` (..., 6) -> Pose3."""
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3.exp(w)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(w), v, precision=_HI)
    return Pose3(R, t)


def logmap(a: Pose3) -> jnp.ndarray:
    """SE(3) logarithm -> tangent ``(omega, v)`` (..., 6)."""
    w = so3.log(a.R)
    v = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inv(w), a.t, precision=_HI)
    return jnp.concatenate([w, v], axis=-1)


def retract(a: Pose3, xi: jnp.ndarray) -> Pose3:
    """Right-retraction ``a * Expmap(xi)`` — the GTSAM 4.x Pose3 default."""
    return compose(a, expmap(xi))


def local(a: Pose3, b: Pose3) -> jnp.ndarray:
    """Local coordinates of ``b`` around ``a``: ``Logmap(a^-1 b)``."""
    return logmap(between(a, b))


def to_rpyxyz(a: Pose3) -> jnp.ndarray:
    """Pose -> ``(roll, pitch, yaw, x, y, z)`` with rpy from :func:`so3.rpy`.

    This is the all-frames trajectory dump format (optimizer.cpp:1181-1182).
    """
    return jnp.concatenate([so3.rpy(a.R), a.t], axis=-1)


def to_quat_xyzw_t(a: Pose3) -> jnp.ndarray:
    """Pose -> ``(qx, qy, qz, qw, x, y, z)`` — the pairwise dump format
    (optimizer.cpp:1119-1121)."""
    q = so3.to_quaternion(a.R)  # (w, x, y, z)
    return jnp.concatenate([q[..., 1:], q[..., :1], a.t], axis=-1)


def adjoint(a: Pose3) -> jnp.ndarray:
    """Adjoint map (..., 6, 6) with (omega, v) ordering."""
    zero = jnp.zeros_like(a.R)
    top = jnp.concatenate([a.R, zero], axis=-1)
    bottom = jnp.concatenate([jnp.matmul(so3.hat(a.t), a.R, precision=_HI), a.R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
