"""SIFT descriptors as a batched dense-patch kernel.

The reference's detector ultimately emits 128-d float SIFT descriptors — it calls
``cv::SiftDescriptorExtractor::compute`` on the 13x13-blurred pyramid levels at
the FAST keypoints (ORBextractor.cpp:1043-1047, 1092-1098).  OpenCV's
implementation loops sparse samples per keypoint; the TPU formulation instead:

1. bilinearly samples a fixed ``S x S`` grid (rotated by the keypoint angle,
   scaled to the descriptor window) around every keypoint at once — a batched
   gather;
2. computes gradients on the sampled patches;
3. soft-assigns magnitude-weighted orientations into the 4x4 spatial x 8
   orientation histogram with trilinear weights and a Gaussian spatial window —
   batched small matmuls;
4. normalizes, clips at 0.2, renormalizes, scales by 512 (OpenCV convention, so
   the reference matcher's L2 ``dist_bound = 350`` keeps its meaning,
   FEAmatcher.cpp:108).

This is the standard dense-patch SIFT formulation (deliberate deviation from
OpenCV's sample loop; same descriptor family and value range — match quality is
validated end-to-end by the matcher tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

D_SPATIAL = 4  # SIFT_DESCR_WIDTH
N_ORI = 8  # SIFT_DESCR_HIST_BINS
SCL_FCTR = 3.0  # SIFT_DESCR_SCL_FCTR: bin width = 3 * scale
PATCH = 32  # sample grid (PATCH x PATCH), 8 samples per spatial bin
# (the reference's SIFT-on-ORB-keypoints yields ~+-93 px windows at kp.size=31;
#  32x32 samples keep aliasing acceptable after the 13x13 sigma-2 blur)
MAG_THRESH = 0.2
INT_FCTR = 512.0


def _sample_grid_np():
    """Normalized sample offsets in descriptor-window units [-d/2, d/2)
    (host-side constant table)."""
    step = D_SPATIAL / PATCH
    coords = (np.arange(PATCH) + 0.5) * step - D_SPATIAL / 2  # bin units
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    return gx.astype(np.float32), gy.astype(np.float32)


def _sample_grid():
    gx, gy = _sample_grid_np()
    return jnp.asarray(gx), jnp.asarray(gy)


@functools.partial(jax.jit, static_argnames=())
def _bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _soft_assign_matrices():
    """Precomputed trilinear pooling weights.

    Returns (PATCH*PATCH, D*D) spatial weights including the Gaussian window.
    """
    gx, gy = _sample_grid_np()
    # spatial bin centers at -1.5, -0.5, 0.5, 1.5 (bin units)
    centers = np.arange(D_SPATIAL) - (D_SPATIAL - 1) / 2
    wx = np.maximum(0.0, 1.0 - np.abs(gx.reshape(-1, 1) - centers[None, :]))
    wy = np.maximum(0.0, 1.0 - np.abs(gy.reshape(-1, 1) - centers[None, :]))
    w_spatial = wy[:, :, None] * wx[:, None, :]  # (S*S, d, d)
    # Gaussian window, sigma = half the descriptor width (OpenCV)
    r2 = gx.reshape(-1) ** 2 + gy.reshape(-1) ** 2
    gauss = np.exp(-r2 / (2 * (0.5 * D_SPATIAL) ** 2))
    w = w_spatial * gauss[:, None, None]
    return w.reshape(PATCH * PATCH, D_SPATIAL * D_SPATIAL).astype(np.float32)


_W_SPATIAL_NP = None


def _get_w_spatial():
    """Pooling-weight table; cached as NUMPY (a jnp cache built during a trace
    would leak a tracer across traces) and converted per call — jit folds the
    conversion into a constant."""
    global _W_SPATIAL_NP
    if _W_SPATIAL_NP is None:
        _W_SPATIAL_NP = _soft_assign_matrices()
    return jnp.asarray(_W_SPATIAL_NP)


def sift_descriptors(
    img: jnp.ndarray,
    kps: jnp.ndarray,  # (K, 2) float (x, y) in image coords
    angles: jnp.ndarray,  # (K,) radians
    sizes: jnp.ndarray,  # (K,) keypoint size (diameter, px)
) -> jnp.ndarray:
    """(K, 128) float descriptors."""
    img = img.astype(jnp.float32)
    gx, gy = _sample_grid()  # (P, P) in bin units
    w_spatial = _get_w_spatial()  # (P*P, 16)

    scl = sizes * 0.5  # OpenCV: scl = kpt.size * 0.5f
    hist_width = SCL_FCTR * scl  # pixels per spatial bin

    cos_a = jnp.cos(angles)
    sin_a = jnp.sin(angles)

    def sample_one(kp, c, s, hw):
        # rotate/scale the grid into image coords
        ox = (c * gx - s * gy) * hw + kp[0]
        oy = (s * gx + c * gy) * hw + kp[1]
        return _bilinear_sample(img, ox, oy)

    patches = jax.vmap(sample_one)(kps, cos_a, sin_a, hist_width)  # (K, P, P)

    # gradients on the sampled patch (already rotated -> orientations relative)
    dx = jnp.gradient(patches, axis=2)
    dy = jnp.gradient(patches, axis=1)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)  # (-pi, pi]

    # soft orientation binning (linear over the two nearest of 8 bins)
    obin = (ori / (2 * jnp.pi) * N_ORI) % N_ORI  # [0, 8)
    o0 = jnp.floor(obin)
    fo = obin - o0
    o0 = o0.astype(jnp.int32) % N_ORI
    o1 = (o0 + 1) % N_ORI
    onehot0 = jax.nn.one_hot(o0, N_ORI, dtype=jnp.float32) * (1.0 - fo)[..., None]
    onehot1 = jax.nn.one_hot(o1, N_ORI, dtype=jnp.float32) * fo[..., None]
    ow = (onehot0 + onehot1) * mag[..., None]  # (K, P, P, 8)

    K = kps.shape[0]
    ow_flat = ow.reshape(K, PATCH * PATCH, N_ORI)
    # (K, S, 8) x (S, 16) -> (K, 16, 8): batched matmul on the MXU
    hist = jnp.einsum("kso,sb->kbo", ow_flat, w_spatial, precision=jax.lax.Precision.HIGHEST)
    desc = hist.reshape(K, D_SPATIAL * D_SPATIAL * N_ORI)

    # normalize -> clip 0.2 -> renormalize -> x512 (OpenCV convention)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-6)
    desc = jnp.minimum(desc, MAG_THRESH)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-6) * INT_FCTR
    return desc
