"""Sonar slant-range/plane measurement factors.

The reference's ``SssPointFactor`` (/root/reference/src/core/SSSpointfactor.cpp:11-80)
constrains a 3-D landmark ``p`` and a ping pose ``T`` through the sonar measurement::

    p_s = Ts^-1 * T^-1 * p          # landmark in the sensor frame
    r   = [ |p_s| - slant_range,    # range residual
            p_s.x - 0 ]             # along-track / zero-plane residual

``LMTriaFactor`` (LMtriangulatefactor.cpp:10-27) is the same residual with the pose
held constant (unary factor on the landmark).

The noise model is diagonal with sigmas ``(sigma_r, slant_range * alpha_bw)``
(optimizer.cpp:685,706-707): 0.1 m range noise and a 0.1 deg beam-width angular term
scaled by range.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3


def sss_point_residual(point: jnp.ndarray, pose: se3.Pose3, sensor: se3.Pose3, measured: jnp.ndarray) -> jnp.ndarray:
    """Residual of the sonar point factor.

    Args:
      point:    (..., 3) landmark in world coordinates.
      pose:     ping pose (body -> world).
      sensor:   sensor offset pose ``Ts`` (sensor -> body; identity lever arm in the
                reference, frame.cpp:38-39).
      measured: (..., 2) measurement ``(slant_range, 0.0)``.

    Returns:
      (..., 2) residual ``[|p_s| - m0, p_s.x - m1]`` (SSSpointfactor.cpp:79).
    """
    p_body = se3.transform_to(pose, point)
    p_s = se3.transform_to(sensor, p_body)
    rng = jnp.linalg.norm(p_s, axis=-1)
    return jnp.stack([rng - measured[..., 0], p_s[..., 0] - measured[..., 1]], axis=-1)


def sss_point_whitened(point, pose, sensor, measured, sigmas):
    """Noise-whitened residual: ``r / sigmas``."""
    return sss_point_residual(point, pose, sensor, measured) / sigmas


def kp_noise_sigmas(slant_range: jnp.ndarray, sigma_r: float = 0.1, alpha_bw_deg: float = 0.1) -> jnp.ndarray:
    """Diagonal sigmas ``(sigma_r, slant_range * alpha_bw)`` (optimizer.cpp:706-707)."""
    alpha = alpha_bw_deg * jnp.pi / 180.0
    return jnp.stack([jnp.full_like(slant_range, sigma_r), slant_range * alpha], axis=-1)
