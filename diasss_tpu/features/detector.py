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

Two execution layouts produce bit-identical valid keypoints:

* **per-level** (default): one fused program per pyramid level.  Measured on
  TPU v5e (500x512 frame): first-call compile 56 s, steady 144 ms incl. the
  tunnel fetch — the compile cost is set by the top-K selection, which the
  cell-tiled two-stage top_k keeps small (the round-1 global lexsort put
  first-call compile at ~226 s).
* **stacked**: every level is replicate-padded to a common shape and the
  levels are row-concatenated, so the whole detection is ONE compiled program
  with ONE Pallas FAST instantiation per threshold and ONE dispatch.
  Replicate padding equals the edge-clamped gathers the per-level path
  already uses, so keypoints (positions, responses, angles) match bit-for-bit
  and descriptors to float tolerance (the SIFT contraction's batch size
  differs, which changes XLA's reduction tiling); FAST scores inside a 3-px
  frame of each level's true extent are zeroed in BOTH layouts before
  NMS/cell logic (they were roll-wrap garbage anyway and the selection border
  is wider).  Measured SLOWER than per-level on TPU v5e (compile 344 s,
  steady 279 ms: all six levels pay level-0-padded selection/SIFT work), so
  it is opt-in — useful where dispatch count, not padded FLOPs, dominates.
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
from .pyramid import build_pyramid, gaussian_blur, pyramid_shapes
from .sift import sift_descriptors

PATCH_SIZE = 31  # ORBextractor.cpp PATCH_SIZE
FAST_FRAME = 3  # FAST circle radius: scores this close to the true extent are junk


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


def _cell_cap(h: int, w: int, k_level: int, cell_size: int) -> int:
    n_cells = (h // cell_size + 1) * (w // cell_size + 1)
    return max(1, int(np.ceil(3 * k_level / max(n_cells, 1))))


def _frame_mask(score: jnp.ndarray, h, w) -> jnp.ndarray:
    """Zero scores outside the true (h, w) extent and inside the FAST frame."""
    n, m = score.shape
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(m)[None, :]
    ok = (rows >= FAST_FRAME) & (rows < h - FAST_FRAME) & (cols >= FAST_FRAME) & (
        cols < w - FAST_FRAME
    )
    return jnp.where(ok, score, 0.0)


def _select_keypoints(score: jnp.ndarray, k_level: int, cell_size: int, cell_cap,
                      cap_max: int, edge: int, h, w):
    """Top-k_level responses with a per-cell cap; returns (xy, resp, valid).

    Two-stage selection: per-cell ``top_k`` over (cell_size x cell_size) tiles
    (small-k over ~1k elements, batched over cells), then a global ``top_k``
    over the ~C*cap_max candidates.  Equivalent to ranking the full image by
    (cell, -score, flat index) with a per-cell quota — candidates are laid out
    cell-major/rank-major, so top_k's index tie-break reproduces that order —
    but compiles and runs far cheaper than a global lexsort over n*m pixels
    (which dominated detector compile AND steady-state time on TPU).

    ``cell_cap``/``h``/``w`` may be traced scalars (the stacked layout vmaps
    over levels whose true extents differ); ``k_level``/``cell_size``/
    ``cap_max`` (a static upper bound on cell_cap)/``edge`` are static.
    """
    n, m = score.shape
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(m)[None, :]
    border = (rows < edge) | (rows >= h - edge) | (cols < edge) | (cols >= w - edge)
    score = jnp.where(border, 0.0, score)

    cs = cell_size
    n_cy, n_cx = -(-n // cs), -(-m // cs)
    sc = jnp.pad(score, ((0, n_cy * cs - n), (0, n_cx * cs - m)))
    tiles = sc.reshape(n_cy, cs, n_cx, cs).transpose(0, 2, 1, 3).reshape(-1, cs * cs)

    cell_vals, cell_pos = jax.lax.top_k(tiles, cap_max)  # (C, cap_max)
    keep = (jnp.arange(cap_max) < cell_cap) & (cell_vals > 0.0)
    cand = jnp.where(keep, cell_vals, 0.0).ravel()  # cell-major, rank-major
    if cand.shape[0] < k_level:  # tiny images: fewer candidate slots than k
        cand = jnp.pad(cand, (0, k_level - cand.shape[0]))

    top_vals, top_idx = jax.lax.top_k(cand, k_level)
    cell = top_idx // cap_max
    within = cell_pos[cell, top_idx % cap_max]
    ys = (cell // n_cx) * cs + within // cs
    xs = (cell % n_cx) * cs + within % cs
    valid = top_vals > 0.0
    return jnp.stack([xs, ys], -1).astype(jnp.float32), top_vals, valid


def _fast(img, t: float):
    """FAST score: Pallas kernel on TPU (36x the XLA formulation), XLA fallback
    elsewhere (the Pallas interpreter is slower than XLA on CPU)."""
    if jax.default_backend() == "tpu":
        from .fast_pallas import fast_score_pallas

        return fast_score_pallas(img, t)
    return fast_score(img, t)


def _combine_two_threshold(s_hi, s_lo, cell_size: int):
    """Use the ini-threshold map, falling back to min-threshold in cells with no
    ini-threshold corner (ORBextractor.cpp:806-816).  Inputs are NMS'd maps.

    Cells are anchored at (0, 0) via explicit trailing padding — "SAME"
    padding would center the windows (pad_lo = pad//2), misaligning the cell
    grid with the ``jnp.repeat`` broadcast below and shifting it between
    padded (stacked) and exact (per-level) layouts."""
    n, m = s_hi.shape
    pad_r = -(-n // cell_size) * cell_size - n
    pad_c = -(-m // cell_size) * cell_size - m
    has_hi = jax.lax.reduce_window(
        s_hi, 0.0, jax.lax.max, (cell_size, cell_size), (cell_size, cell_size),
        [(0, pad_r), (0, pad_c)],
    )
    has_hi_full = jnp.repeat(jnp.repeat(has_hi > 0, cell_size, 0), cell_size, 1)[:n, :m]
    return jnp.where(has_hi_full, s_hi, s_lo)


def _two_threshold_score(img, ini_t: float, min_t: float, cell_size: int, h, w):
    """FAST map using ini_t, falling back to min_t in cells with no ini_t corner.
    ``(h, w)`` is the true extent (= img.shape unless the image is padded)."""
    s_hi = nms3(_frame_mask(_fast(img, ini_t), h, w))
    s_lo = nms3(_frame_mask(_fast(img, min_t), h, w))
    return _combine_two_threshold(s_hi, s_lo, cell_size)


@functools.partial(jax.jit, static_argnames=("lvl", "k_level", "cfg"))
def _detect_level(limg: jnp.ndarray, lvl: int, k_level: int, cfg: DetectorConfig) -> DetectedFeatures:
    """One fused program per pyramid level (cross-check layout)."""
    scale = cfg.scale_factor**lvl
    n, m = limg.shape
    score = _two_threshold_score(
        limg, float(cfg.ini_fast_threshold), float(cfg.min_fast_threshold),
        cfg.cell_size, n, m,
    )
    cap = _cell_cap(n, m, k_level, cfg.cell_size)
    xy, resp, valid = _select_keypoints(
        score, k_level, cfg.cell_size, cap, cap, cfg.edge_threshold, n, m
    )
    ang = ic_angles(limg, xy)
    blurred = gaussian_blur(limg, cfg.blur_ksize, cfg.blur_sigma)
    size_lvl = PATCH_SIZE * scale  # kp.size convention (ORBextractor.cpp:847)
    sizes_arr = jnp.full((k_level,), size_lvl * cfg.desc_size_scale, jnp.float32)
    desc = _descriptors(blurred, xy, ang, sizes_arr, cfg)
    return DetectedFeatures(
        xy=xy * scale,
        response=resp,
        angle=ang,
        size=jnp.full((k_level,), size_lvl, jnp.float32),
        level=jnp.full((k_level,), lvl, jnp.int32),
        desc=desc,
        valid=valid,
    )


def _descriptors(blurred, xy, ang, sizes_arr, cfg: DetectorConfig):
    k = xy.shape[0]
    if cfg.descriptor == "geo_patch":
        # world-aligned patches are attached by the pipeline (they need the
        # frame's geo map, and re-matching recomputes them per solve iteration)
        return jnp.zeros((k, 1), jnp.float32)
    if cfg.descriptor == "orb":
        from .orb_desc import orb_descriptors

        return orb_descriptors(blurred, xy, ang, sizes_arr)
    return sift_descriptors(blurred, xy, ang, sizes_arr)


def _pad_replicate(img: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Pad to (H, W) by replicating the last row/column — identical to the
    edge-clamped gathers the patch extractors apply, so reads past the true
    extent return the same values in both layouts."""
    h, w = img.shape
    yi = jnp.minimum(jnp.arange(H), h - 1)
    xi = jnp.minimum(jnp.arange(W), w - 1)
    return img[yi[:, None], xi[None, :]]


@functools.partial(jax.jit, static_argnames=("meta", "k_max", "cfg"))
def _detect_stacked(raw_stack: jnp.ndarray, meta: tuple, k_max: int, cfg: DetectorConfig) -> DetectedFeatures:
    """ALL pyramid levels in ONE compiled program.

    ``raw_stack`` is the (L, Hp, Wp) replicate-padded pyramid (padded OUTSIDE
    this program so the resize arithmetic is the eager computation the
    per-level layout also consumes — fusion inside a bigger program may
    reassociate resize floats and flip threshold-marginal corners); ``meta``
    is a per-level tuple of static ``(h, w, k_level, cell_cap)``.  The levels
    are row-concatenated for FAST, so the Pallas kernel is instantiated ONCE
    per threshold for the whole pyramid (the per-level layout instantiates
    one kernel per level shape — ~6x the Mosaic compile work and 6
    dispatches).  Row seams leak only into each level's FAST frame / padding,
    which both layouts zero before NMS and cell logic, so valid keypoints are
    bit-identical and descriptors match to float tolerance
    (tests/test_features.py cross-checks the two layouts).
    """
    L, Hp, Wp = raw_stack.shape

    # blur at each TRUE shape (reflect-101 at the true boundary, like the
    # reference), then pad — padding first would smear replicate rows inward
    blur_stack = jnp.stack(
        [
            _pad_replicate(
                gaussian_blur(raw_stack[lvl, :h, :w], cfg.blur_ksize, cfg.blur_sigma),
                Hp, Wp,
            )
            for lvl, (h, w, _, _) in enumerate(meta)
        ]
    )

    raw_cat = raw_stack.reshape(L * Hp, Wp)
    s_hi = _fast(raw_cat, float(cfg.ini_fast_threshold)).reshape(L, Hp, Wp)
    s_lo = _fast(raw_cat, float(cfg.min_fast_threshold)).reshape(L, Hp, Wp)

    h_arr = jnp.asarray([m[0] for m in meta], jnp.int32)
    w_arr = jnp.asarray([m[1] for m in meta], jnp.int32)
    cap_arr = jnp.asarray([m[3] for m in meta], jnp.int32)

    cap_max = max(c for _, _, _, c in meta)

    def level_select(s_hi_l, s_lo_l, h, w, cap):
        score = _combine_two_threshold(
            nms3(_frame_mask(s_hi_l, h, w)), nms3(_frame_mask(s_lo_l, h, w)),
            cfg.cell_size,
        )
        return _select_keypoints(
            score, k_max, cfg.cell_size, cap, cap_max, cfg.edge_threshold, h, w
        )

    xy, resp, valid = jax.vmap(level_select)(s_hi, s_lo, h_arr, w_arr, cap_arr)
    ang = jax.vmap(ic_angles)(raw_stack, xy)

    scales = [cfg.scale_factor**lvl for lvl in range(L)]
    sizes = jnp.asarray(
        [[PATCH_SIZE * s * cfg.desc_size_scale] * k_max for s in scales], jnp.float32
    )
    desc = jax.vmap(lambda b, p, a, sz: _descriptors(b, p, a, sz, cfg))(
        blur_stack, xy, ang, sizes
    )

    # assemble: the first k_level rows of level l's k_max-sized top-k are
    # exactly the per-level top-k (top_k is totally ordered by (value, index))
    fields = {f: [] for f in DetectedFeatures._fields}
    for lvl, (h, w, k_level, _) in enumerate(meta):
        if k_level == 0:
            continue
        sl = slice(0, k_level)
        fields["xy"].append(xy[lvl, sl] * scales[lvl])
        fields["response"].append(resp[lvl, sl])
        fields["angle"].append(ang[lvl, sl])
        fields["size"].append(jnp.full((k_level,), PATCH_SIZE * scales[lvl], jnp.float32))
        fields["level"].append(jnp.full((k_level,), lvl, jnp.int32))
        fields["desc"].append(desc[lvl, sl])
        fields["valid"].append(valid[lvl, sl])
    return DetectedFeatures(**{f: jnp.concatenate(v) for f, v in fields.items()})


def detect_features(
    norm_img: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cfg: DetectorConfig = DetectorConfig(),
    stacked: bool = False,
) -> DetectedFeatures:
    """Detect keypoints + SIFT descriptors on a normalized waterfall image.

    ``mask`` applies the post-filter of Frame::DetectFeature (frame.cpp:184-195):
    keypoints landing outside the filter mask are invalidated.  ``stacked``
    selects the single-program layout (see :func:`_detect_stacked` and the
    module docstring's measurements) — both layouts return bit-identical
    valid keypoints (descriptors equal to float tolerance).
    """
    img = norm_img.astype(jnp.float32)
    per_level = features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    if stacked:
        shapes = pyramid_shapes(img.shape, cfg.n_levels, cfg.scale_factor)
        meta = tuple(
            (h, w, k, _cell_cap(h, w, k, cfg.cell_size))
            for (h, w), k in zip(shapes, per_level)
        )
        k_max = max(k for k in per_level)
        levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        Hp = max(-(-h // 64) * 64 for h, _, _, _ in meta)  # 64 = Pallas row tile
        Wp = meta[0][1]
        raw_stack = jnp.stack([_pad_replicate(l, Hp, Wp) for l in levels])
        feats = _detect_stacked(raw_stack, meta, k_max, cfg)
    else:
        levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        parts = [
            _detect_level(limg, lvl, k_level, cfg)
            for lvl, (limg, k_level) in enumerate(zip(levels, per_level))
            if k_level > 0
        ]
        feats = DetectedFeatures(
            *[jnp.concatenate([getattr(p, f) for p in parts]) for f in DetectedFeatures._fields]
        )

    if mask is not None:
        xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, mask.shape[1] - 1)
        yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, mask.shape[0] - 1)
        inside = mask[yi, xi]
        feats = feats._replace(valid=feats.valid & inside)
    return feats
