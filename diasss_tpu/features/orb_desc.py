"""Steered binary (ORB-style) descriptors.

The reference vendors ORB-SLAM2's ``computeOrbDescriptor`` + the trained
``bit_pattern_31_`` but ships it dead (ORBextractor.cpp:108-147, 150-408; the
live path uses SIFT).  The matcher's Hamming branch exists too
(FEAmatcher.cpp:140-176, 442-458).  We keep the descriptor choice pluggable
(SURVEY §7 step 5): this module provides the binary path.

Deviations (deliberate): the 256 point-pairs are drawn from a seeded Gaussian
(sigma = patch/5, the classic BRIEF recipe) instead of copying the trained
OpenCV table; bits are stored as +-1 float32 so the Hamming distance becomes a
matmul on the MXU: ``hamming = (256 - b1 . b2) / 2``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
PATCH_HALF = 15  # sample within the 31x31 ORB patch


@functools.lru_cache(maxsize=1)
def _pattern():
    """(N_BITS, 2, 2) point-pair offsets, deterministic."""
    rng = np.random.default_rng(19)
    pts = rng.normal(0.0, PATCH_HALF / 5.0 * 2.0, (N_BITS, 2, 2))
    pts = np.clip(pts, -PATCH_HALF, PATCH_HALF)
    return pts.astype(np.float32)


def _bilinear(img, xs, ys):
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def orb_descriptors(
    img: jnp.ndarray,
    kps: jnp.ndarray,  # (K, 2) float (x, y)
    angles: jnp.ndarray,  # (K,) radians (steering, computeOrbDescriptor:112-113)
    sizes: jnp.ndarray,  # (K,) kp size; pattern scales with size/31
) -> jnp.ndarray:
    """(K, 256) float32 in {-1, +1}: the binary descriptor in matmul form."""
    img = img.astype(jnp.float32)
    pat = jnp.asarray(_pattern())  # (256, 2, 2)
    cos_a = jnp.cos(angles)
    sin_a = jnp.sin(angles)
    scale = sizes / (2.0 * PATCH_HALF + 1.0)

    def one(kp, c, s, sc):
        # rotate + scale the pattern (steered BRIEF)
        px = (c * pat[..., 0] - s * pat[..., 1]) * sc + kp[0]  # (256, 2)
        py = (s * pat[..., 0] + c * pat[..., 1]) * sc + kp[1]
        v = _bilinear(img, px, py)  # (256, 2)
        return jnp.where(v[:, 0] < v[:, 1], 1.0, -1.0)

    return jax.vmap(one)(kps, cos_a, sin_a, scale)


def hamming_matrix(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """(K1, K2) Hamming distances from +-1 encodings — one MXU matmul."""
    dot = jnp.matmul(b1, b2.T, precision=jax.lax.Precision.HIGHEST)
    return 0.5 * (b1.shape[1] - dot)
