"""Intensity-centroid keypoint orientation (IC_Angle, ORBextractor.cpp:77-104).

The reference computes ``atan2(m01, m10)`` over a circular patch of radius 15
around each keypoint.  We extract 31x31 patches for the whole keypoint batch
(vmapped dynamic slices) and reduce with precomputed coordinate/disk masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # HALF_PATCH_SIZE (ORBextractor.cpp:55)


def _disk_masks(dtype=jnp.float32):
    size = 2 * HALF_PATCH + 1
    ys, xs = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    # the reference's u_max table is the circle rasterization: |(x,y)| within radius
    inside = (xs**2 + ys**2) <= HALF_PATCH**2 + HALF_PATCH // 2
    return (
        jnp.asarray(xs * inside, dtype),
        jnp.asarray(ys * inside, dtype),
    )


def extract_patches(img: jnp.ndarray, kps: jnp.ndarray, half: int) -> jnp.ndarray:
    """(K, 2) integer keypoints (x, y) -> (K, 2h+1, 2h+1) patches (edge-clamped)."""
    size = 2 * half + 1
    pad = jnp.pad(img, half, mode="edge")

    def one(kp):
        # kp is (x, y); dynamic_slice origin = (y, x) in the padded image
        return jax.lax.dynamic_slice(pad, (kp[1], kp[0]), (size, size))

    return jax.vmap(one)(kps.astype(jnp.int32))


def ic_angles(img: jnp.ndarray, kps: jnp.ndarray) -> jnp.ndarray:
    """Orientation in radians for each keypoint (level coordinates)."""
    xs, ys = _disk_masks(img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32)
    patches = extract_patches(img.astype(jnp.float32), kps, HALF_PATCH)
    m10 = jnp.sum(patches * xs, axis=(-2, -1))
    m01 = jnp.sum(patches * ys, axis=(-2, -1))
    return jnp.arctan2(m01, m10)
