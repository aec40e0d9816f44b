"""Feature detector orchestration — the ORBextractor::operator() equivalent.

Pipeline per level (ORBextractor.cpp:1049-1113):

1. bilinear pyramid (6 levels, x1.2 — frame.cpp:180),
2. FAST-9 with the two-threshold fallback: cells with no corner at the initial
   threshold (12) retry at the minimum threshold (7) (ORBextractor.cpp:806-816),
3. spatially-uniform top-K selection with a per-cell cap — the static-shape
   replacement for the quadtree ``DistributeOctTree`` (ORBextractor.cpp:539-763):
   the quadtree's purpose is an even spatial spread of the best responses, which
   a per-cell quota achieves with sorts instead of recursion (deliberate,
   documented deviation),
4. intensity-centroid orientation (IC_Angle),
5. descriptors on the 13x13/sigma-2 blurred level image
   (ORBextractor.cpp:1092-1098): SIFT (the reference's live path) or the
   binary steered-BRIEF family (its dead-code path), per config,
6. coordinates rescaled to level 0 (ORBextractor.cpp:1103-1108).

Keypoint capacity is static (``n_features``) with a validity mask — XLA-friendly
fixed shapes end to end.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from .fast import fast_score, nms3
from .orient import ic_angles
from .pyramid import build_pyramid, gaussian_blur
from .sift import sift_descriptors

PATCH_SIZE = 31  # ORBextractor.cpp PATCH_SIZE


class DetectedFeatures(NamedTuple):
    xy: jnp.ndarray  # (K, 2) float32 (x, y) in level-0 coordinates
    response: jnp.ndarray  # (K,)
    angle: jnp.ndarray  # (K,) radians
    size: jnp.ndarray  # (K,) keypoint size (px, level-0 scale convention)
    level: jnp.ndarray  # (K,) int32 pyramid level
    desc: jnp.ndarray  # (K, D) float32 descriptors: D=128 SIFT or D=256 binary (+-1)
    valid: jnp.ndarray  # (K,) bool


def features_per_level(n_features: int, n_levels: int, scale_factor: float):
    """ORBextractor ctor distribution (ORBextractor.cpp:418-430)."""
    factor = 1.0 / scale_factor
    n_first = n_features * (1 - factor) / (1 - factor**n_levels)
    out = []
    acc = 0
    for lvl in range(n_levels - 1):
        k = int(round(n_first * factor**lvl))
        out.append(k)
        acc += k
    out.append(max(n_features - acc, 0))
    return out


@functools.partial(jax.jit, static_argnames=("k_level", "cell_size", "cell_cap", "edge"))
def _select_keypoints(score: jnp.ndarray, k_level: int, cell_size: int, cell_cap: int, edge: int):
    """Top-k_level responses with a per-cell cap; returns (xy, resp, valid)."""
    n, m = score.shape
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(m)[None, :]
    border = (rows < edge) | (rows >= n - edge) | (cols < edge) | (cols >= m - edge)
    score = jnp.where(border, 0.0, score)

    n_cx = -(-m // cell_size)
    cell_id = (rows // cell_size) * n_cx + (cols // cell_size)  # (n, m)

    flat_score = score.ravel()
    flat_cell = cell_id.ravel()
    total = flat_score.shape[0]

    # sort by (cell, -score): stable rank within each cell
    order = jnp.lexsort((-flat_score, flat_cell))
    cell_sorted = flat_cell[order]
    is_start = jnp.concatenate([jnp.ones(1, bool), cell_sorted[1:] != cell_sorted[:-1]])
    idx = jnp.arange(total)
    block_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank_in_cell = idx - block_start
    keep = (rank_in_cell < cell_cap) & (flat_score[order] > 0.0)

    capped_score = jnp.where(keep, flat_score[order], 0.0)
    top_vals, top_pos = jax.lax.top_k(capped_score, k_level)
    pix = order[top_pos]
    ys = pix // m
    xs = pix % m
    valid = top_vals > 0.0
    return jnp.stack([xs, ys], -1).astype(jnp.float32), top_vals, valid


def _fast(img, t: float):
    """FAST score: Pallas kernel on TPU (36x the XLA formulation), XLA fallback
    elsewhere (the Pallas interpreter is slower than XLA on CPU)."""
    if jax.default_backend() == "tpu":
        from .fast_pallas import fast_score_pallas

        return fast_score_pallas(img, t)
    return fast_score(img, t)


@functools.partial(jax.jit, static_argnames=("ini_t", "min_t", "cell_size"))
def _two_threshold_score(img, ini_t: float, min_t: float, cell_size: int):
    """FAST map using ini_t, falling back to min_t in cells with no ini_t corner."""
    s_hi = nms3(_fast(img, ini_t))
    s_lo = nms3(_fast(img, min_t))
    has_hi = jax.lax.reduce_window(
        s_hi, 0.0, jax.lax.max, (cell_size, cell_size), (cell_size, cell_size), "SAME"
    )
    n, m = img.shape
    # broadcast the per-cell flag back to pixels
    has_hi_full = jnp.repeat(jnp.repeat(has_hi > 0, cell_size, 0), cell_size, 1)[:n, :m]
    return jnp.where(has_hi_full, s_hi, s_lo)


@functools.partial(jax.jit, static_argnames=("lvl", "k_level", "cfg"))
def _detect_level(limg: jnp.ndarray, lvl: int, k_level: int, cfg: DetectorConfig) -> DetectedFeatures:
    """One fused program per pyramid level: FAST -> selection -> orientation ->
    blur -> SIFT.  One compile + one dispatch per level instead of a dozen
    (several previously eager) stages — essential for remote-dispatch setups."""
    scale = cfg.scale_factor**lvl
    score = _two_threshold_score(
        limg, float(cfg.ini_fast_threshold), float(cfg.min_fast_threshold), cfg.cell_size
    )
    n_cells = (limg.shape[0] // cfg.cell_size + 1) * (limg.shape[1] // cfg.cell_size + 1)
    cell_cap = max(1, int(np.ceil(3 * k_level / max(n_cells, 1))))
    xy, resp, valid = _select_keypoints(
        score, k_level, cfg.cell_size, cell_cap, cfg.edge_threshold
    )
    ang = ic_angles(limg, xy)
    blurred = gaussian_blur(limg, cfg.blur_ksize, cfg.blur_sigma)
    size_lvl = PATCH_SIZE * scale  # kp.size convention (ORBextractor.cpp:847)
    sizes_arr = jnp.full((k_level,), size_lvl * cfg.desc_size_scale, jnp.float32)
    if cfg.descriptor == "geo_patch":
        # world-aligned patches are attached by the pipeline (they need the
        # frame's geo map, and re-matching recomputes them per solve iteration)
        desc = jnp.zeros((k_level, 1), jnp.float32)
    elif cfg.descriptor == "orb":
        from .orb_desc import orb_descriptors

        desc = orb_descriptors(blurred, xy, ang, sizes_arr)
    else:
        desc = sift_descriptors(blurred, xy, ang, sizes_arr)
    return DetectedFeatures(
        xy=xy * scale,
        response=resp,
        angle=ang,
        size=jnp.full((k_level,), size_lvl, jnp.float32),
        level=jnp.full((k_level,), lvl, jnp.int32),
        desc=desc,
        valid=valid,
    )


def detect_features(
    norm_img: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cfg: DetectorConfig = DetectorConfig(),
) -> DetectedFeatures:
    """Detect keypoints + SIFT descriptors on a normalized waterfall image.

    ``mask`` applies the post-filter of Frame::DetectFeature (frame.cpp:184-195):
    keypoints landing outside the filter mask are invalidated.
    """
    img = norm_img.astype(jnp.float32)
    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    per_level = features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    parts = [
        _detect_level(limg, lvl, k_level, cfg)
        for lvl, (limg, k_level) in enumerate(zip(levels, per_level))
        if k_level > 0
    ]

    feats = DetectedFeatures(*[jnp.concatenate([getattr(p, f) for p in parts]) for f in DetectedFeatures._fields])

    if mask is not None:
        xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, mask.shape[1] - 1)
        yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, mask.shape[0] - 1)
        inside = mask[yi, xi]
        feats = feats._replace(valid=feats.valid & inside)
    return feats
