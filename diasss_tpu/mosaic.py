"""Geo-referenced mosaicking of waterfall images.

The reference sketches mosaicking through PCL point clouds but ships it
commented out (util.cpp:419-557, SURVEY §2 "dead/disabled code").  The
TPU-native formulation is a scatter-mean: every waterfall pixel already has a
world (x, y) from the geo image; normalize intensities per column
(``Util::NormalizeConvertSSS`` semantics), bucket pixels into a world grid, and
average overlapping contributions with ``segment_sum``.  One fused device
program per frame; frames accumulate into shared (sum, count) planes.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .frame import Keyframe, normalize_columns


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _accumulate(intens, geo, x0, y0, res, width: int, height: int):
    """Scatter-add one frame's pixels into the (height, width) world grid."""
    xi = jnp.clip(((geo[..., 0] - x0) / res).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(((geo[..., 1] - y0) / res).astype(jnp.int32), 0, height - 1)
    flat = (yi * width + xi).ravel()
    v = intens.astype(jnp.float32).ravel()
    s = jax.ops.segment_sum(v, flat, width * height)
    c = jax.ops.segment_sum(jnp.ones_like(v), flat, width * height)
    return s.reshape(height, width), c.reshape(height, width)


def build_mosaic(
    frames: List[Keyframe],
    resolution: float = 0.25,
    margin: float = 5.0,
    geo_list=None,
):
    """Average-intensity world mosaic of all frames.

    ``geo_list`` optionally overrides each frame's geo image — pass the
    estimated-pose geo (pipeline._estimated_geo) for a drift-corrected SLAM
    map product instead of the DR-referenced one.

    Returns (mosaic (H, W) float32 with NaN where no data, x0, y0, resolution).
    """
    geos = geo_list if geo_list is not None else [f.geo for f in frames]
    xs = np.concatenate([np.asarray(g[..., 0]).ravel() for g in geos])
    ys = np.concatenate([np.asarray(g[..., 1]).ravel() for g in geos])
    x0 = float(xs.min() - margin)
    y0 = float(ys.min() - margin)
    width = int((xs.max() + margin - x0) / resolution) + 1
    height = int((ys.max() + margin - y0) / resolution) + 1

    total = jnp.zeros((height, width), jnp.float32)
    count = jnp.zeros((height, width), jnp.float32)
    for f, g in zip(frames, geos):
        intens = normalize_columns(f.raw)
        s, c = _accumulate(intens, g, x0, y0, resolution, width, height)
        total = total + s
        count = count + c
    mosaic = jnp.where(count > 0, total / jnp.maximum(count, 1.0), jnp.nan)
    return np.asarray(mosaic), x0, y0, resolution


def save_mosaic_png(path: str, mosaic: np.ndarray) -> None:
    """Render the mosaic to a grayscale PNG (NaN = black)."""
    from .viz import write_png

    img = np.nan_to_num(mosaic, nan=0.0)
    mx = img.max() if img.max() > 0 else 1.0
    gray = (img / mx * 255).astype(np.uint8)
    write_png(path, np.repeat(gray[..., None], 3, axis=-1))
