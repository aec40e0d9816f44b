"""Keyframe data model and waterfall-image preprocessing as vectorized XLA ops.

Replaces the reference ``Frame`` (/root/reference/src/core/frame.cpp) whose
constructor runs four O(N*M) pixel loops per survey line; here each step is one
fused XLA op over the whole image (and batches over frames under vmap):

* :func:`normalize_sss`    — frame.cpp:57-81   (C3)
* :func:`filtered_mask`    — frame.cpp:83-124  (C4)
* geo-referencing          — via :func:`diasss_tpu.geometry.sonar.geo_image` (C5)
* feature detection        — :mod:`diasss_tpu.features` (C6/C7), attached by the
  pipeline when ``use_anno=False`` (the annotation-driven path, diasss2.cpp's
  USE_ANNO=1 default, does not need descriptors).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import functools
import jax
import jax.numpy as jnp
import numpy as np

from .config import MaskConfig, NormalizeConfig


class Keyframe(NamedTuple):
    """One survey line; device-resident tensors + host-side metadata.

    Mirrors the produced items of the reference Frame (frame.h:29-47).
    """

    img_id: int  # host static
    # (N, M) float32 raw waterfall intensities.  Device-resident on the
    # default path; with host_preprocess=True this is a host np.ndarray (no
    # downstream device program reads it — only the optional mosaic, which
    # uploads it lazily).
    raw: jnp.ndarray
    # (N, M) uint8 normalized image / (N, M) bool keypoint-validity mask.
    # Device-resident by default; with host_imagery=True (annotation-driven
    # pipelines, which never read imagery in device programs) these stay
    # host np.ndarrays and consumers upload lazily on first use.
    norm: jnp.ndarray
    mask: jnp.ndarray
    geo: jnp.ndarray  # (N, M, 2) world (x, y) per pixel
    dr_poses: jnp.ndarray  # (N, 6) dead-reckoning rows (r, p, y, x, y, z)
    altitudes: jnp.ndarray  # (N,)
    ground_ranges: jnp.ndarray  # (M//2,)
    annos: np.ndarray  # (Ka, 7) int annotation rows, host-side (may be empty)


def normalize_sss(raw: jnp.ndarray, cfg: NormalizeConfig = NormalizeConfig()) -> jnp.ndarray:
    """``(x - min) / (mean*2.5 - min) * 255``, clipped to 255, as uint8
    (frame.cpp:57-81)."""
    raw = raw.astype(jnp.float32)
    mn = jnp.min(raw)
    max_used = jnp.mean(raw) * cfg.mean_factor
    out = (raw - mn) / (max_used - mn) * 255.0
    out = jnp.clip(out, 0.0, 255.0)
    # OpenCV convertTo(CV_8U) rounds to nearest
    return jnp.round(out).astype(jnp.uint8)


def filtered_mask(raw: jnp.ndarray, cfg: MaskConfig = MaskConfig()) -> jnp.ndarray:
    """Binary keypoint-validity mask (frame.cpp:83-124), vectorized.

    Four suppression rules:
      1. bright pixels (> mean * 2.5) kill a box neighborhood around them —
         implemented as a max-pool dilation.  The reference's box is
         ``[i-6, i+5] x [j-6, j+5]`` with an unsigned-underflow bug near the top
         border (frame.cpp:100-102, SURVEY §7 "quirks NOT to replicate"); we use
         a symmetric 13x13 window and clamp at borders.
      2. the center nadir stripe (cols within +-width of M/2),
      3. the first/last ``side`` pings,
      4. the left/right ``side*0.6`` columns.

    Deviation from the reference: the border suppressions (rules 3-4) keep the
    reference's fixed margins (150 pings / 90 cols, frame.cpp:86) whenever they
    leave at least a quarter of the dimension usable — i.e. behavior is
    unchanged at and near reference scale (~5k-ping lines).  Applied verbatim
    to a short line those margins mask EVERY pixel (e.g. 2*150 >= a 200-ping
    image), leaving the detected-feature path with zero keypoints — a
    degenerate case the reference never hits; only then is the margin clamped
    to a quarter of the image per side (half remains usable).
    """
    raw = raw.astype(jnp.float32)
    n, m = raw.shape
    bright = raw > jnp.mean(raw) * cfg.bright_factor
    r = cfg.bright_radius
    dilated = jax.lax.reduce_window(
        bright,
        False,
        jax.lax.bitwise_or,
        window_dimensions=(2 * r + 1, 2 * r + 1),
        window_strides=(1, 1),
        padding="SAME",
    )
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(m)[None, :]
    center = (cols > m // 2 - cfg.center_width) & (cols < m // 2 + cfg.center_width)
    def clamped_margin(ref_margin: int, dim: int) -> int:
        return ref_margin if dim - 2 * ref_margin >= dim // 4 else dim // 4

    side_p = clamped_margin(cfg.side_pings, n)
    turn = (rows < side_p) | (rows > n - side_p)
    side_c = clamped_margin(int(cfg.side_pings * cfg.side_cols_frac), m)
    sides = (cols < side_c) | (cols > m - side_c)
    return ~(dilated | center | turn | sides)


def _memo_batch(fn):
    """Thunk memoizer: the wrapped fn runs at most once; every lazy view of
    the batch shares the one result."""
    cell = []

    def get():
        if not cell:
            cell.append(fn())
        return cell[0]

    get.cell = cell  # exposes computed-yet state (_LazyHostImagery.computed)
    return get


class _LazyHostImagery:
    """One frame's host-resident norm/mask, computed on FIRST USE.

    ``host_imagery=True`` callers (annotation-driven pipelines — the
    reference default) never read imagery in any program, so the host
    normalize/mask work (~0.23 s at the 12k bench point, PERF round 5) is
    deferred until a consumer (detection, dense matching, mosaic, viz)
    converts one via ``np.asarray`` / ``np.stack`` / a jnp op — all of which
    route through ``__array__``.  The underlying batch computes ONCE and is
    shared by every frame's view."""

    __slots__ = ("_get", "_idx", "shape", "dtype", "ndim")

    def __init__(self, get, idx, shape, dtype):
        self._get = get
        self._idx = idx
        self.shape = shape
        self.dtype = np.dtype(dtype)
        self.ndim = len(shape)

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._get()[self._idx])
        return a if dtype is None else a.astype(dtype, copy=False)

    def __getitem__(self, key):
        return self.__array__()[key]

    def __jax_array__(self):
        # jnp ops (stack, jit-arg conversion) accept the lazy view directly
        return jnp.asarray(self.__array__())

    def __getattr__(self, name):
        # any other ndarray attribute/method (.astype, .reshape, ...)
        # materializes the view and delegates
        return getattr(self.__array__(), name)

    @property
    def computed(self) -> bool:
        """Whether any view of the shared batch has been materialized yet."""
        return bool(self._get.cell)


def build_keyframe(
    img_id: int,
    raw: np.ndarray,
    dr_poses: np.ndarray,
    altitudes: np.ndarray,
    ground_ranges: np.ndarray,
    annos: Optional[np.ndarray] = None,
    norm_cfg: NormalizeConfig = NormalizeConfig(),
    mask_cfg: MaskConfig = MaskConfig(),
    dtype=jnp.float32,
    host_preprocess: bool = False,
    host_imagery: bool = False,
) -> Keyframe:
    """Assemble a Keyframe: upload tensors, run the preprocessing ops.

    Equivalent of the reference Frame constructor (frame.cpp:18-55) minus feature
    detection (attached separately by the feature pipeline).
    ``host_preprocess`` / ``host_imagery``: see :func:`build_keyframes_batch`.
    """
    from .geometry import sonar

    poses_j = jnp.asarray(dr_poses, dtype)
    alts_j = jnp.asarray(altitudes, dtype)
    grs_j = jnp.asarray(ground_ranges, dtype)
    n_bins = raw.shape[1]
    if host_preprocess:
        raw_np = np.asarray(raw)[None]
        n, m = raw_np.shape[1], raw_np.shape[2]
        if host_imagery:
            # host-resident AND lazy (see build_keyframes_batch)
            norm = _LazyHostImagery(
                _memo_batch(lambda: _normalize_sss_np(raw_np, norm_cfg)), 0,
                (n, m), np.uint8)
            mask = _LazyHostImagery(
                _memo_batch(lambda: _filtered_mask_np(raw_np, mask_cfg)), 0,
                (n, m), np.bool_)
        else:
            norm = jnp.asarray(_normalize_sss_np(raw_np, norm_cfg)[0])
            packed = np.packbits(_filtered_mask_np(raw_np, mask_cfg)[0].reshape(1, -1), axis=1)
            mask = _unpack_mask(jnp.asarray(packed), n, m)[0]
        geo = _geo_batch(poses_j[None], grs_j[None], m)[0]
        raw_j = np.asarray(raw, np.float32)  # host-resident (see Keyframe.raw)
    else:
        raw_j = jnp.asarray(raw, dtype)
        # one jitted program for the whole preprocess (op-by-op dispatch costs a
        # tunnel round trip per op on remote-dispatch setups; the batch path
        # already had this via _preprocess_batch)
        norm, mask, geo = _preprocess_one(raw_j, poses_j, grs_j, norm_cfg, mask_cfg)
    return Keyframe(
        img_id=img_id,
        raw=raw_j,
        norm=norm,
        mask=mask,
        geo=geo,
        dr_poses=poses_j,
        altitudes=alts_j,
        ground_ranges=grs_j,
        annos=np.zeros((0, 7), np.int64) if annos is None else np.asarray(annos),
    )


def normalize_columns(raw: jnp.ndarray) -> jnp.ndarray:
    """Column-wise mean normalization + clip [0, 3] + rescale to [0, 255].

    The reference's alternate normalizer ``Util::NormalizeConvertSSS``
    (util.cpp:339-417, default path rs_by_column with clip): each column divided
    by its mean, clipped to [0, 3], min-max rescaled to 0-255, uint8.
    """
    raw = raw.astype(jnp.float32)
    col_mean = jnp.mean(raw, axis=0, keepdims=True)
    x = raw / jnp.maximum(col_mean, 1e-12)
    x = jnp.clip(x, 0.0, 3.0)
    mn = jnp.min(x)
    mx = jnp.max(x)
    x = (x - mn) * (255.0 / jnp.maximum(mx - mn, 1e-12))
    return jnp.round(x).astype(jnp.uint8)


def _normalize_sss_np(raws: np.ndarray, cfg: NormalizeConfig) -> np.ndarray:
    """Host (numpy) mirror of :func:`normalize_sss` over a stacked (F, N, M)
    batch.  Same float32 math; ``np.round`` and ``jnp.round`` both round
    half-to-even, so values differ from the device path only where the
    frame-wide min/mean reductions differ in the last ulp (see
    ``test_pipeline.test_host_preprocess_matches_device``)."""
    raws = raws.astype(np.float32)
    flat = raws.reshape(raws.shape[0], -1)
    mn = flat.min(axis=1)[:, None, None]
    max_used = flat.mean(axis=1, dtype=np.float32)[:, None, None] * cfg.mean_factor
    out = (raws - mn) / (max_used - mn) * 255.0
    np.clip(out, 0.0, 255.0, out=out)
    return np.round(out).astype(np.uint8)


def _box_or_np(bits: np.ndarray, r: int) -> np.ndarray:
    """(F, N, M) binary box-OR dilation with zero padding — pure numpy.

    Integral-image window sum > 0 over a (2r+1, 2r+1) box: bit-identical to a
    binary maximum filter / the device ``reduce_window(..., bitwise_or,
    padding="SAME")``, with no scipy dependency (the package declares only
    jax + numpy; host_preprocess is the default CLI path)."""
    f, n, m = bits.shape
    S = np.zeros((f, n + 1, m + 1), np.int32)
    np.cumsum(bits, axis=1, out=S[:, 1:, 1:])
    np.cumsum(S[:, 1:, 1:], axis=2, out=S[:, 1:, 1:])
    i = np.arange(n)
    j = np.arange(m)
    lo_i, hi_i = np.maximum(i - r, 0), np.minimum(i + r + 1, n)
    lo_j, hi_j = np.maximum(j - r, 0), np.minimum(j + r + 1, m)
    win = (
        S[:, hi_i[:, None], hi_j[None, :]]
        - S[:, lo_i[:, None], hi_j[None, :]]
        - S[:, hi_i[:, None], lo_j[None, :]]
        + S[:, lo_i[:, None], lo_j[None, :]]
    )
    return win > 0


def _filtered_mask_np(raws: np.ndarray, cfg: MaskConfig) -> np.ndarray:
    """Host (pure numpy) mirror of :func:`filtered_mask` over (F, N, M):
    the box-OR dilation is an integral-image window sum > 0, identical to
    the device ``reduce_window(..., bitwise_or, padding="SAME")``."""
    raws = raws.astype(np.float32)
    f, n, m = raws.shape
    mean = raws.reshape(f, -1).mean(axis=1, dtype=np.float32)[:, None, None]
    bright = (raws > mean * cfg.bright_factor).astype(np.uint8)
    dilated = _box_or_np(bright, cfg.bright_radius)
    rows = np.arange(n)[:, None]
    cols = np.arange(m)[None, :]
    center = (cols > m // 2 - cfg.center_width) & (cols < m // 2 + cfg.center_width)

    def clamped_margin(ref_margin: int, dim: int) -> int:
        return ref_margin if dim - 2 * ref_margin >= dim // 4 else dim // 4

    side_p = clamped_margin(cfg.side_pings, n)
    turn = (rows < side_p) | (rows > n - side_p)
    side_c = clamped_margin(int(cfg.side_pings * cfg.side_cols_frac), m)
    sides = (cols < side_c) | (cols > m - side_c)
    return ~(dilated | (center | turn | sides)[None])


@functools.partial(jax.jit, static_argnames=("n", "m"))
def _unpack_mask(packed: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Device-side unpack of a host ``np.packbits`` mask: (F, ceil(N*M/8))
    uint8 -> (F, N, M) bool.  Big-endian bit order (numpy default)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)  # (F, B, 8)
    flat = bits.reshape(packed.shape[0], -1)[:, : n * m]
    return flat.reshape(packed.shape[0], n, m).astype(bool)


@functools.partial(jax.jit, static_argnames=("n_bins",))
def _geo_batch(poses: jnp.ndarray, grs: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    from .geometry import sonar

    return jax.vmap(lambda p, g: sonar.geo_image(p[:, 3:5], p[:, 2], g, n_bins))(
        poses, grs
    )


@functools.partial(jax.jit, static_argnames=("norm_cfg", "mask_cfg"))
def _preprocess_one(raw, poses, grs, norm_cfg, mask_cfg):
    from .geometry import sonar

    n_bins = raw.shape[1]
    return (
        normalize_sss(raw, norm_cfg),
        filtered_mask(raw, mask_cfg),
        sonar.geo_image(poses[:, 3:5], poses[:, 2], grs, n_bins),
    )


@functools.partial(jax.jit, static_argnames=("norm_cfg", "mask_cfg"))
def _preprocess_batch(raws, poses, grs, norm_cfg, mask_cfg):
    n_bins = raws.shape[2]
    from .geometry import sonar

    return (
        jax.vmap(lambda r: normalize_sss(r, norm_cfg))(raws),
        jax.vmap(lambda r: filtered_mask(r, mask_cfg))(raws),
        jax.vmap(lambda p, g: sonar.geo_image(p[:, 3:5], p[:, 2], g, n_bins))(poses, grs),
    )


def build_keyframes_batch(
    items,
    norm_cfg: NormalizeConfig = NormalizeConfig(),
    mask_cfg: MaskConfig = MaskConfig(),
    dtype=jnp.float32,
    host_preprocess: bool = False,
    host_imagery: bool = False,
):
    """Batched :func:`build_keyframe`: ``items`` is a list of
    ``(img_id, raw, dr_poses, altitudes, ground_ranges, annos)`` tuples.

    When every line has the same shape (the common equal-length-line survey),
    ALL preprocessing (normalize + mask + geo) runs as ONE vmapped device
    program over the stacked ``(N, pings, bins)`` batch instead of 3*N
    dispatches; otherwise falls back to per-frame construction.  Same values
    as the per-frame path.

    ``host_preprocess=True`` computes normalize + mask on the HOST (numpy,
    exactly the reference's own CPU placement, frame.cpp:57-124) and uploads
    only the uint8 normalized image plus a bit-packed mask — 3.6x fewer bytes
    than the float32 raw raster.  On remote-dispatch (tunneled) devices the
    raw-image upload is the dominant preprocessing cost (PERF.md); no
    downstream device program reads ``raw`` (only the optional mosaic, which
    uploads lazily).  Values match the device path except where the
    frame-wide min/mean reductions differ in the last ulp.

    ``host_imagery=True`` (requires host_preprocess) additionally keeps the
    normalized image AND the mask HOST-resident (numpy): the annotation-
    driven pipeline (USE_ANNO=1, the reference default) never reads imagery
    in any device program — only detection/dense matching do — so uploading
    it is pure transfer waste (6.9 MB at the 12k bench point, roughly half
    the non-solve wall through the tunnel; PERF.md round 5).  Consumers
    that DO need imagery upload it on first use (jnp ops auto-convert; the
    stacked matchers np.stack host batches into one transfer), so a
    detected-mode run with host_imagery on still works, just with a lazier
    upload.
    """
    shapes = {(np.shape(it[1]), np.shape(it[2]), np.shape(it[3])) for it in items}
    if len(shapes) != 1:
        return [build_keyframe(*it, norm_cfg=norm_cfg, mask_cfg=mask_cfg, dtype=dtype,
                               host_preprocess=host_preprocess,
                               host_imagery=host_imagery)
                for it in items]
    poses = jnp.asarray(np.stack([it[2] for it in items]), dtype)
    grs = jnp.asarray(np.stack([it[4] for it in items]), dtype)
    # altitudes ride the same stacked upload (len == n_pings, guaranteed by
    # the same-shape gate above): per-frame jnp.asarray cost one host->device
    # transfer per FRAME through the remote tunnel
    alts = jnp.asarray(np.stack([it[3] for it in items]), dtype)
    raws_np = np.stack([it[1] for it in items])
    if host_preprocess:
        f, n, m = raws_np.shape[0], raws_np.shape[1], raws_np.shape[2]
        if host_imagery:
            # host-resident AND lazy: annotation-driven pipelines never read
            # norm/mask, so the host normalize/mask work (~0.23 s at the 12k
            # bench point — PERF round 5) is deferred until a consumer
            # actually converts one; the batch computes ONCE, shared by all
            # frames' views
            norm_get = _memo_batch(lambda: _normalize_sss_np(raws_np, norm_cfg))
            mask_get = _memo_batch(lambda: _filtered_mask_np(raws_np, mask_cfg))
            norms = [_LazyHostImagery(norm_get, k, (n, m), np.uint8) for k in range(f)]
            masks = [_LazyHostImagery(mask_get, k, (n, m), np.bool_) for k in range(f)]
        else:
            norms_np = _normalize_sss_np(raws_np, norm_cfg)
            masks_np = _filtered_mask_np(raws_np, mask_cfg)
            packed = np.packbits(masks_np.reshape(f, -1), axis=1)
            norms = jnp.asarray(norms_np)
            masks = _unpack_mask(jnp.asarray(packed), n, m)
        geos = _geo_batch(poses, grs, m)
        raws = raws_np.astype(np.float32, copy=False)  # host-resident (see Keyframe.raw)
    else:
        raws = jnp.asarray(raws_np, dtype)
        norms, masks, geos = _preprocess_batch(raws, poses, grs, norm_cfg, mask_cfg)
    out = []
    for k, it in enumerate(items):
        annos = it[5] if len(it) > 5 else None
        out.append(
            Keyframe(
                img_id=it[0],
                raw=raws[k],
                norm=norms[k],
                mask=masks[k],
                geo=geos[k],
                dr_poses=poses[k],
                altitudes=alts[k],
                ground_ranges=grs[k],
                annos=np.zeros((0, 7), np.int64) if annos is None else np.asarray(annos),
            )
        )
    return out
