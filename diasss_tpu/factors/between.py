"""Pose-graph factors: between (odometry / loop closure), priors.

Residual conventions copied from GTSAM (used throughout optimizer.cpp):

* ``BetweenFactor<Pose3>``: ``r = Logmap(measured^-1 * (x1^-1 * x2))``, tangent
  ordering (omega, v) matching the sigma layout ``(ro, pi, ya, x, y, z)``
  (optimizer.cpp:182-183).
* ``PriorFactor<Pose3>``: ``r = Logmap(prior^-1 * x)`` (optimizer.cpp:166-168).
* ``PriorFactor<Point3>``: ``r = x - prior`` (optimizer.cpp:1006-1008).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3


def between_residual(x1: se3.Pose3, x2: se3.Pose3, measured: se3.Pose3) -> jnp.ndarray:
    """(..., 6) tangent residual of a BetweenFactor<Pose3>."""
    return se3.local(measured, se3.between(x1, x2))


def prior_residual(x: se3.Pose3, prior: se3.Pose3) -> jnp.ndarray:
    """(..., 6) tangent residual of a PriorFactor<Pose3>."""
    return se3.local(prior, x)


def point_prior_residual(p: jnp.ndarray, prior: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) residual of a PriorFactor<Point3>."""
    return p - prior
