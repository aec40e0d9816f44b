"""Side-scan sonar imaging geometry as vectorized XLA ops.

Replaces the reference's per-pixel loops:

* flat-seafloor geo-referencing of every (ping, bin) cell
  (/root/reference/src/core/frame.cpp:126-165),
* slant-range recovery from altitude + ground-range tables
  (/root/reference/src/core/optimizer.cpp:616-619),
* the nadir-proximity keypoint gate (optimizer.cpp:602-609).

A waterfall image has shape (n_pings, n_bins); bins [M/2, M) are the starboard side
(ground range increasing with bin), bins [0, M/2) the port side (ground range
decreasing toward bin 0 is wrong — the reference counts the ground-range index *up*
as the port column index decreases; see frame.cpp:146-151 where ``count`` keeps
incrementing through the port loop).  Concretely, with M columns and G = M/2 ground
range entries, the ground-range index of column j is::

    starboard (j >= G):  g(j) = j - G         range index in [0, G)
    port      (j <  G):  g(j) = G - j         NOTE: reaches G at j=0 (reference quirk)

The reference indexes ``g_range[count]`` with ``count`` running G..(2G-1)... actually
``count`` continues from G after the starboard loop and *decrements* — producing
indices G, G-1, ..., 1 for port columns 0..G-1, i.e. ``g(j) = G - j`` which reads
``g_range[G]`` out of bounds at j=0 in C++ (frame.cpp:148 quirk).  We clamp to G-1
(SURVEY §7 "Quirks NOT to replicate").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ground_range_index(col: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Ground-range table index for waterfall column(s) ``col`` (int array).

    Mirrors frame.cpp:139-151 / optimizer.cpp:616-619 (|bin - M/2|), clamped in-range.
    """
    half = n_bins // 2
    idx = jnp.abs(col - half)
    return jnp.clip(idx, 0, half - 1)


def is_starboard(col: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """True for starboard-side columns.

    NOTE: the reference's LoopClosingTFs labels ``bin < M/2`` as ``side=1`` and uses
    ``tf_stb`` for it (optimizer.cpp:712-716); since both lever arms are {0,0,0}
    (frame.cpp:38-39) the label never matters numerically.  We use the geometric
    convention (col >= M/2 is starboard, matching the geo-image fill order
    frame.cpp:139-151).
    """
    return col >= (n_bins // 2)


def slant_range(alt: jnp.ndarray, ground_range: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(altitude^2 + ground_range^2)`` (optimizer.cpp:616-619)."""
    return jnp.sqrt(alt * alt + ground_range * ground_range)


def slant_range_at(
    ping: jnp.ndarray,
    col: jnp.ndarray,
    altitudes: jnp.ndarray,
    ground_ranges: jnp.ndarray,
    n_bins: int,
) -> jnp.ndarray:
    """Slant range of keypoints at integer (ping, col) — fully gather-based."""
    alt = altitudes[ping]
    gr = ground_ranges[ground_range_index(col, n_bins)]
    return slant_range(alt, gr)


def nadir_mask(col_s, col_t, n_gr_s: int, n_gr_t: int, nd_thres: int = 20):
    """Keep pairs whose columns are >= nd_thres bins away from the nadir line.

    Mirrors optimizer.cpp:602-609 where the distance is ``|bin - len(ground_ranges)|``
    (len(ground_ranges) == M/2).
    """
    d_s = jnp.abs(col_s - n_gr_s)
    d_t = jnp.abs(col_t - n_gr_t)
    return (d_s >= nd_thres) & (d_t >= nd_thres)


@functools.partial(jax.jit, static_argnames=("n_bins",))
def geo_image(
    pose_xy: jnp.ndarray,
    pose_yaw: jnp.ndarray,
    ground_ranges: jnp.ndarray,
    n_bins: int,
    tf_stb: jnp.ndarray | None = None,
    tf_port: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flat-seafloor geo-referencing of a full waterfall image, vectorized.

    Args:
      pose_xy:       (N, 2) AUV positions per ping (columns 3,4 of the DR rows).
      pose_yaw:      (N,)   yaw per ping (column 2 of the DR rows — used raw as an
                     angle by the reference, frame.cpp:141-149).
      ground_ranges: (G,)   ground range table, G == n_bins // 2.
      n_bins:        M, number of waterfall columns.
      tf_stb/tf_port: optional (3,) sensor lever arms — subtracted like
                     frame.cpp:141-149 (reference sets them to zero, frame.cpp:38-39).

    Returns:
      (N, M, 2) array of world (x, y) per pixel.  Starboard columns use heading
      ``yaw + pi/2``, port columns ``yaw - pi/2`` (frame.cpp:139-151).
    """
    dtype = pose_xy.dtype
    half = n_bins // 2
    cols = jnp.arange(n_bins)
    gr_idx = ground_range_index(cols, n_bins)  # (M,)
    gr = ground_ranges[gr_idx].astype(dtype)  # (M,)
    stb = is_starboard(cols, n_bins)  # (M,)

    ang = pose_yaw[:, None] + jnp.where(stb[None, :], jnp.pi / 2, -jnp.pi / 2).astype(dtype)
    offx = gr[None, :] * jnp.cos(ang)
    offy = gr[None, :] * jnp.sin(ang)

    lever = jnp.zeros((2,), dtype) if tf_stb is None else jnp.asarray(tf_stb[:2], dtype)
    lever_p = jnp.zeros((2,), dtype) if tf_port is None else jnp.asarray(tf_port[:2], dtype)
    lx = jnp.where(stb, lever[0], lever_p[0])
    ly = jnp.where(stb, lever[1], lever_p[1])

    x = pose_xy[:, None, 0] - lx[None, :] + offx
    y = pose_xy[:, None, 1] - ly[None, :] + offy
    return jnp.stack([x, y], axis=-1)


def project_landmark_geo(pose_xy, pose_yaw, col, ground_ranges, n_bins: int):
    """Geo (x, y) of the pixel at column ``col`` under pose (xy, yaw).

    This is the evaluator's re-projection with the *estimated* pose
    (optimizer.cpp:866-879): port columns use ``yaw + pi/2 - pi``, starboard
    ``yaw - pi/2 - pi`` — note the extra ``-pi`` versus the geo-image formula; the
    reference evaluator flips the side convention (and we replicate it bit-for-bit
    because the accept/reject metric depends on it).
    """
    half = n_bins // 2
    gr = ground_ranges[ground_range_index(col, n_bins)]
    port_side = col < half
    ang = jnp.where(port_side, pose_yaw + jnp.pi / 2 - jnp.pi, pose_yaw - jnp.pi / 2 - jnp.pi)
    x = pose_xy[..., 0] + gr * jnp.cos(ang)
    y = pose_xy[..., 1] + gr * jnp.sin(ang)
    return jnp.stack([x, y], axis=-1)


def bbox_iou_overlap(geo_a: jnp.ndarray, geo_b: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bbox IoU of two frames' geo extents (util.cpp:13-43)."""
    ax_min = jnp.min(geo_a[..., 0])
    ax_max = jnp.max(geo_a[..., 0])
    ay_min = jnp.min(geo_a[..., 1])
    ay_max = jnp.max(geo_a[..., 1])
    bx_min = jnp.min(geo_b[..., 0])
    bx_max = jnp.max(geo_b[..., 0])
    by_min = jnp.min(geo_b[..., 1])
    by_max = jnp.max(geo_b[..., 1])
    x_ol = jnp.minimum(ax_max, bx_max) - jnp.maximum(ax_min, bx_min)
    y_ol = jnp.minimum(ay_max, by_max) - jnp.maximum(ay_min, by_min)
    area_ol = x_ol * y_ol
    area_a = jnp.abs(ax_max - ax_min) * jnp.abs(ay_max - ay_min)
    area_b = jnp.abs(bx_max - bx_min) * jnp.abs(by_max - by_min)
    iou = area_ol / (area_a + area_b - area_ol)
    return jnp.where((x_ol > 0) & (y_ol > 0), iou, jnp.zeros_like(iou))
