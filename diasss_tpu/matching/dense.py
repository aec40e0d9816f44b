"""Dense world-correlation matching — repeatability-free correspondence search.

The keypoint matcher (geosearch.py, FEAmatcher parity) requires the SAME
physical point to be detected in BOTH frames; on speckle-dominated sonar
imagery FAST repeatability across passes is the yield bottleneck (measured:
~150 cross-detected points from 2x2000 keypoints, NOTES_ROUND1.md).  This
module removes that requirement:

1. rasterize the TARGET frame into a world-aligned grid (scatter-mean of the
   normalized waterfall — same op as :mod:`..mosaic`), keeping per-cell mean
   (ping, bin) provenance so matches map back to waterfall coordinates;
2. rasterize the SOURCE frame the same way and read each source keypoint's
   world-aligned patch out of it (both sides must see the SAME cell-average
   smoothing: correlating point-sampled patches against cell-averaged ones
   loses ~0.2 NCC on speckle — measured), then slide that patch over candidate
   world offsets around the keypoint's predicted position and score normalized
   cross-correlation — patch grid and raster share resolution and axis
   alignment, so each candidate is a direct window read, and the search is one
   batched (n_offsets, K) score tensor;
3. verify with a LOCAL DISPLACEMENT-FIELD consistency filter: true matches of
   nearby keypoints share the same drift displacement (drift is smooth), so
   each match must agree with the median displacement of its spatial
   neighbors.  This replaces the reference's single global along-track-offset
   SCC (FEAmatcher.cpp:185-248), which under-fits surveys whose drift varies
   along the line.

Works for ANY source keypoint over textured seafloor — yield scales with
keypoint count, not with cross-pass detector repeatability.  All device work
is fixed-shape and batched (raster dims bucketed to multiples of 64).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DenseMatchConfig, DetectorConfig
from ..features.detector import DetectedFeatures


class WorldRaster(NamedTuple):
    img: jnp.ndarray  # (H, W) mean normalized intensity (0 where empty)
    cnt: jnp.ndarray  # (H, W) contributing-pixel count
    ping: jnp.ndarray  # (H, W) mean source ping index
    col: jnp.ndarray  # (H, W) mean source bin (column) index
    x0: float
    y0: float
    res: float


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _rasterize(norm_img, geo, x0, y0, res, width: int, height: int):
    n, m = norm_img.shape
    xi = jnp.clip(((geo[..., 0] - x0) / res).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(((geo[..., 1] - y0) / res).astype(jnp.int32), 0, height - 1)
    flat = (yi * width + xi).ravel()
    v = norm_img.astype(jnp.float32).ravel()
    pings = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[:, None], (n, m)).ravel()
    cols = jnp.broadcast_to(jnp.arange(m, dtype=jnp.float32)[None, :], (n, m)).ravel()
    total = width * height
    c = jax.ops.segment_sum(jnp.ones_like(v), flat, total)
    s = jax.ops.segment_sum(v, flat, total)
    sp = jax.ops.segment_sum(pings, flat, total)
    sc = jax.ops.segment_sum(cols, flat, total)
    cs = jnp.maximum(c, 1.0)
    return (
        (s / cs).reshape(height, width),
        c.reshape(height, width),
        (sp / cs).reshape(height, width),
        (sc / cs).reshape(height, width),
    )


def raster_shape(geo, res: float, margin: float = 2.0):
    """(height, width) a frame's world raster needs, bucketed to x64."""
    gx = np.asarray(geo[..., 0])
    gy = np.asarray(geo[..., 1])
    return _shape_from_bounds(gx.min(), gx.max(), gy.min(), gy.max(), res, margin)


def _shape_from_bounds(xmin, xmax, ymin, ymax, res: float, margin: float):
    width = int(np.ceil((xmax + 2 * margin - xmin) / res)) + 1
    height = int(np.ceil((ymax + 2 * margin - ymin) / res)) + 1
    return int(np.ceil(height / 64) * 64), int(np.ceil(width / 64) * 64)


@jax.jit
def _geo_bounds_batch(geo_st: jnp.ndarray) -> jnp.ndarray:
    """(F, N, M, 2) stacked geo -> (F, 4) [xmin, xmax, ymin, ymax].

    One device reduction + a (F, 4) fetch replaces the full-geo host fetches
    the stacked matcher used for raster sizing — ~10 MB/round through the
    (tunneled) host<->device link at the auto bench point, measured ~0.7 s of
    the ~1.5 s per-round non-program matching wall (PERF.md round 5)."""
    x = geo_st[..., 0].reshape(geo_st.shape[0], -1)
    y = geo_st[..., 1].reshape(geo_st.shape[0], -1)
    return jnp.stack([x.min(axis=1), x.max(axis=1), y.min(axis=1), y.max(axis=1)], axis=1)


@jax.jit
def _geo_kps_batch(geo_st: jnp.ndarray, xy_st: jnp.ndarray) -> jnp.ndarray:
    """(F, N, M, 2) geo + (F, K, 2) pixel coords -> (F, K, 2) world positions
    in ONE program (the per-frame host loop cost 2 dispatches per frame)."""
    N, M = geo_st.shape[1], geo_st.shape[2]
    xi = jnp.clip(xy_st[..., 0].astype(jnp.int32), 0, M - 1)
    yi = jnp.clip(xy_st[..., 1].astype(jnp.int32), 0, N - 1)
    return jax.vmap(lambda g, yy, xx: g[yy, xx])(geo_st, yi, xi)


def world_raster(
    norm_img, geo, res: float, margin: float = 2.0, shape: tuple | None = None
) -> WorldRaster:
    """World-aligned raster of one frame (dims bucketed to multiples of 64 so
    similar frames share compiled programs).  ``shape=(H, W)`` overrides the
    frame-fit dims — the stacked matcher rasterizes every frame at the
    survey-common shape so rasters stack into one (F, H, W) array (cells
    beyond a frame's extent simply stay empty)."""
    gx = np.asarray(geo[..., 0])
    gy = np.asarray(geo[..., 1])
    x0 = float(gx.min() - margin)
    y0 = float(gy.min() - margin)
    if shape is None:
        height, width = raster_shape(geo, res, margin)
    else:
        height, width = shape
    img, cnt, ping, col = _rasterize(norm_img, geo, x0, y0, res, width, height)
    return WorldRaster(img, cnt, ping, col, x0, y0, res)


def _window_slices(img: jnp.ndarray, cnt: jnp.ndarray, cy, cx, ext: int, size: int):
    """(K, size, size) windows of ``img``/``cnt`` centered-ish at (cy, cx)
    with element-clip (border replication) semantics, as edge-padded
    ``vmap(dynamic_slice)`` reads.

    The obvious fancy-index gather ``img[cy + dy, cx + dx]`` lowers to a
    per-ELEMENT XLA gather — measured ~14 ns/element on TPU v5e, 1.7 s for
    the stacked matcher's 84 M window elements, i.e. ~90% of the whole dense
    program (PERF.md round 5).  ``dynamic_slice`` of an edge-padded raster
    produces IDENTICAL values 20x faster.

    Padding is 2*ext per side so the equivalence holds for every center in
    [-ext, H+ext): padded[(cy + d) + 2*ext] == img[clip(cy + d, 0, H-1)] for
    all |d| <= ext (edge padding IS the clip).  Centers further out than
    that hit dynamic_slice's internal start clamp and read shifted garbage —
    but for those, EVERY candidate offset's patch is out of bounds, so the
    callers' in-bounds validity masks exclude them from any decision.

    ``ext`` = max |offset| from the center; ``size`` = window rows (= cols);
    requires size == 2*ext + 1 (rows center-ext .. center+ext).
    """
    img_p = jnp.pad(img, 2 * ext, mode="edge")
    cnt_p = jnp.pad(cnt, 2 * ext, mode="edge")
    # padded start = (center - ext) + 2*ext; dynamic_slice clamps internally
    y0 = cy + ext
    x0 = cx + ext

    def one(y, x):
        return (
            jax.lax.dynamic_slice(img_p, (y, x), (size, size)),
            jax.lax.dynamic_slice(cnt_p, (y, x), (size, size)),
        )

    return jax.vmap(one)(y0, x0)


@functools.partial(jax.jit, static_argnames=("half", "min_cover"))
def _raster_patches(raster: WorldRaster, geo_kp: jnp.ndarray, half: int, min_cover: float):
    """(K, (2*half+1)^2) mean-free unit patches read from a frame's own world
    raster at each keypoint's cell, + validity (coverage & contrast)."""
    cx = jnp.round((geo_kp[:, 0] - raster.x0) / raster.res).astype(jnp.int32)
    cy = jnp.round((geo_kp[:, 1] - raster.y0) / raster.res).astype(jnp.int32)
    k = 2 * half + 1
    vw, cw = _window_slices(raster.img, raster.cnt, cy, cx, half, k)
    v = vw.reshape(-1, k * k)
    have = (cw > 0).reshape(-1, k * k)
    nh = jnp.sum(have, axis=1)
    mean = jnp.sum(jnp.where(have, v, 0.0), axis=1) / jnp.maximum(nh, 1)
    vz = jnp.where(have, v - mean[:, None], 0.0)
    nrm = jnp.linalg.norm(vz, axis=1)
    desc = vz / jnp.maximum(nrm, 1e-6)[:, None]
    return desc, (nh >= min_cover * k * k) & (nrm > 1e-3)


def _split_parity_planes(W: jnp.ndarray, s: int, Sp: int) -> jnp.ndarray:
    """(K, S, S) windows -> (s*s, Sp, Sp, K) zero-padded parity planes;
    plane p*s+q = W[:, p::s, q::s] (trim-then-pad to Sp).  Serves the
    lattice-path XLA scan in :func:`_correlate`."""
    planes = []
    for py in range(s):
        for px in range(s):
            pl_ = jnp.transpose(W[:, py::s, px::s], (1, 2, 0))[:Sp, :Sp]
            pl_ = jnp.pad(
                pl_,
                ((0, Sp - pl_.shape[0]), (0, Sp - pl_.shape[1]), (0, 0)),
            )
            planes.append(pl_)
    return jnp.stack(planes)


class DenseMatches(NamedTuple):
    tgt_geo: jnp.ndarray  # (K, 2) matched world position in the target raster
    tgt_ping: jnp.ndarray  # (K,) target ping (float, scatter-mean provenance)
    tgt_col: jnp.ndarray  # (K,) target bin
    score: jnp.ndarray  # (K,) best NCC
    ok: jnp.ndarray  # (K,) accepted mask (pre smoothness filter)


@functools.partial(
    jax.jit,
    static_argnames=(
        "half", "n_ring", "step_cells", "ncc_min", "ncc_ratio", "min_cover",
        "lattice",
    ),
)
def _correlate(
    desc_q: jnp.ndarray,  # (K, G) world-aligned unit patches of the source kps
    ok_q: jnp.ndarray,  # (K,)
    geo_q: jnp.ndarray,  # (K, 2) source kp world positions
    raster: WorldRaster,
    half: int,
    n_ring: int,  # search extent in CELLS on each side
    step_cells: int,
    ncc_min: float,
    ncc_ratio: float,
    min_cover: float,
    lattice: bool | None = None,  # None = auto; tests/ablation force a path
):
    """Dense NCC search, shift-scan formulation (round 4).

    The original implementation mapped over candidate offsets, gathering a
    fresh (K, G) patch from the GLOBAL raster and recomputing that window's
    mean/norm statistics per offset — measured 75 s for the auto bench
    survey's matching stage on TPU v5e (scatter-pattern gathers + per-offset
    reductions).  This formulation computes the SAME scores as one pass:

    1. gather each keypoint's (S, S) local window ONCE (S = full stride-1
       offset extent + patch size);
    2. ONE ``lax.scan`` over the k*k patch cell positions accumulates all
       five correlation statistics simultaneously as (K, T, T) elementwise
       FMAs on dynamic slices of the windows (T = stride-1 offset extent):
       sum q*v*have, sum q*have, sum have, sum v*have, sum v^2*have;
    3. the NCC for EVERY stride-1 offset follows elementwise:
       s = (sum qv - mean * sum q*have) / ||v - mean||_have — algebraically
       identical to the original per-offset normalization;
    4. the coarse lattice / second-best-outside-neighborhood / stride-1
       refinement logic then just INDEXES the full score tensor at the same
       positions the original evaluated (identical decisions up to f32
       accumulation order).

    Measured micro-benchmark (K=2000, k=17, T=43, scripts/micro_dense.py +
    PERF.md round 4): 10,425 ms -> 108 ms (~96x) on TPU v5e and ~15x on CPU
    over the map-over-offsets formulation.

    Memory envelope (the map-over-offsets version was batch-bounded; this one
    is not): per pair the program holds the (K, S, S) window gathers (x3:
    values/have/masked) and ~7 (K, T, T) f32 score/statistic tensors, S = T +
    2*half, T = 2*(n_ring + step_cells - 1) + 1.  At the defaults (K=2000,
    half=8, n_ring=20, step=2) that is ~28 MB + ~52 MB per pair; the stacked
    whole-survey program (``_dense_pairs_program``) multiplies by the gated
    pair count.  Surveys whose pairs * K * S^2 would not fit HBM should route
    per-pair (``stacked=False``) — at bench scale (6 pairs) the stacked
    working set is ~0.5 GB of a 16 GB chip.
    """
    img, cnt = raster.img, raster.cnt
    H, W = img.shape
    res = raster.res
    k = 2 * half + 1
    R = n_ring + max(step_cells - 1, 0)  # refinement can step past the lattice
    T = 2 * R + 1
    S = T + k - 1

    cx = jnp.round((geo_q[:, 0] - raster.x0) / res).astype(jnp.int32)
    cy = jnp.round((geo_q[:, 1] - raster.y0) / res).astype(jnp.int32)

    # local windows (K, S, S) as edge-padded dynamic slices — identical
    # values to the original per-element index clip, 20x faster (see
    # _window_slices).  Intensities scale to [0, 1]: NCC is scale-invariant
    # and the integral images below then stay well inside f32's
    # exact-integer range.
    vw, cw = _window_slices(img, cnt, cy, cx, R + half, S)
    Wv = vw * (1.0 / 255.0)  # (K, S, S)
    Wh = (cw > 0).astype(jnp.float32)
    Wvh = Wv * Wh

    q = desc_q.reshape(-1, k, k)
    K = q.shape[0]

    # q-independent window statistics (sum have, sum v*have, sum v^2*have
    # over every k x k window) via integral images: O(K*S^2) instead of
    # k^2 more scan accumulations
    def box_sums(X):
        c = jnp.cumsum(jnp.cumsum(X, axis=1), axis=2)
        c = jnp.pad(c, ((0, 0), (1, 0), (1, 0)))
        return (
            c[:, k : k + T, k : k + T]
            - c[:, 0:T, k : k + T]
            - c[:, k : k + T, 0:T]
            + c[:, 0:T, 0:T]
        )

    C1 = box_sums(Wh)
    C2 = box_sums(Wvh)
    C3 = box_sums(Wv * Wvh)

    # window statistics shared by every offset (mean / norm / validity follow
    # from C1..C3 elementwise — no k*k factor, cheap at full stride-1 T)
    mean = C2 / jnp.maximum(C1, 1.0)
    nrm = jnp.sqrt(jnp.maximum(C3 - mean * mean * C1, 0.0))
    # per-offset validity on the full stride-1 grid
    doff = jnp.arange(T) - R  # offset value at each grid index
    cover_ok = C1 >= min_cover * k * k
    inb_y = ((cy[:, None] + doff[None, :] - half) >= 0) & (
        (cy[:, None] + doff[None, :] + half) < H
    )  # (K, T)
    inb_x = ((cx[:, None] + doff[None, :] - half) >= 0) & (
        (cx[:, None] + doff[None, :] + half) < W
    )
    # contrast floor: the original tested ||v - mean|| > 1e-3 on 0..255
    # intensities; v here is scaled by 1/255
    valid = cover_ok & (nrm > 1e-3 / 255.0) & inb_y[:, :, None] & inb_x[:, None, :]

    # coarse lattice = the original candidate grid (row-major, same ordering)
    g = jnp.arange(-n_ring, n_ring + 1, step_cells, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([oy.ravel(), ox.ravel()], axis=1)  # (O, 2)
    lat = g + R  # indices into the T grid

    # q-dependent correlations.  Round-5 lattice path (step_cells > 1): the
    # decision only ever reads the stride-s lattice plus a (2s-1)^2
    # refinement neighborhood around each winner, so the k*k-step scan
    # accumulation can run on the LATTICE only (~s^2 less FMA volume via
    # parity-plane slicing: W[o + d] = plane[(o+d) % s][(o+d) // s] makes
    # every lattice shift a contiguous slice) with refinement scores
    # recomputed per winner from the window blocks below.  ON TPU the
    # lattice path is OFF by default: the full-map Pallas kernel runs the
    # 289-step accumulation VMEM-resident in ~4 ms/pair (dense_pallas.py),
    # so the lattice saving is noise there, and a Pallas lattice kernel
    # attempt faulted the TPU worker at production shape (K=2000, n_ring=20)
    # when embedded in the full program — removed rather than shipped
    # half-debugged (round 5).  Off-TPU the XLA scan dominates the stage and
    # the lattice cut is real (it also keeps the CPU test suite fast).
    lattice_path = (
        step_cells > 1
        and n_ring % step_cells == 0
        and jax.default_backend() != "tpu"
        if lattice is None
        else lattice
    )
    if lattice_path:
        s = step_cells
        # ONE scan over the k*k patch cells with dynamic slices of the
        # stacked parity planes — identical accumulation order to the
        # full-map scan
        L = 2 * (n_ring // s) + 1
        a_max = (k + s - 2) // s
        Sp = a_max + L
        # (s*s, Sp, Sp, K) -> K-major for the scan slices
        wv_p = jnp.transpose(_split_parity_planes(Wvh, s, Sp), (0, 3, 1, 2))
        wh_p = jnp.transpose(_split_parity_planes(Wh, s, Sp), (0, 3, 1, 2))

        def body(acc, i):
            dy, dx = i // k, i % k
            ey, ex = dy + s - 1, dx + s - 1
            p = (ey % s) * s + (ex % s)
            ay, ax = ey // s, ex // s
            sv = jax.lax.dynamic_slice(wv_p, (p, 0, ay, ax), (1, K, L, L))[0]
            sh = jax.lax.dynamic_slice(wh_p, (p, 0, ay, ax), (1, K, L, L))[0]
            qi = q.reshape(K, -1)[:, i][:, None, None]
            A, B = acc
            return (A + qi * sv, B + qi * sh), None

        z = jnp.zeros((K, L, L), jnp.float32)
        (Aq_c, Bq_c), _ = jax.lax.scan(body, (z, z), jnp.arange(k * k))
        mean_c = mean[:, lat[:, None], lat[None, :]]
        nrm_c = nrm[:, lat[:, None], lat[None, :]]
        s_lat = (Aq_c - mean_c * Bq_c) / jnp.maximum(nrm_c, 1e-6)
        s_lat = jnp.where(valid[:, lat[:, None], lat[None, :]], s_lat, -2.0)
        scores = s_lat.reshape(K, -1).T  # (O, K), row-major like the full path
    else:
        if jax.default_backend() == "tpu":
            # Pallas kernel: each 128-keypoint block's windows AND
            # accumulators stay VMEM-resident for all k*k steps (read-once/
            # write-once HBM traffic — measured vs the scan below on v5e)
            from .dense_pallas import qcorr_pallas

            Aq, Bq = qcorr_pallas(Wvh, Wh, desc_q, k, T)
        else:
            def body(acc, i):
                dy, dx = i // k, i % k
                sh = jax.lax.dynamic_slice(Wh, (0, dy, dx), (K, T, T))
                sv = jax.lax.dynamic_slice(Wvh, (0, dy, dx), (K, T, T))
                qi = q[:, dy, dx][:, None, None]
                Aq, Bq = acc
                return (Aq + qi * sv, Bq + qi * sh), None

            z = jnp.zeros((K, T, T), jnp.float32)
            (Aq, Bq), _ = jax.lax.scan(body, (z, z), jnp.arange(k * k))
        s_full = (Aq - mean * Bq) / jnp.maximum(nrm, 1e-6)
        s_full = jnp.where(valid, s_full, -2.0)  # (K, T, T)
        scores = s_full[:, lat[:, None], lat[None, :]].reshape(K, -1).T  # (O, K)

    best_o = jnp.argmax(scores, axis=0)  # (K,)
    best = jnp.take_along_axis(scores, best_o[None, :], axis=0)[0]
    # second best outside the best's immediate neighborhood (correlated cells)
    sep = jnp.max(jnp.abs(offs[:, None, :] - offs[best_o][None, :, :]), axis=-1)
    far = sep > max(2, step_cells)
    second = jnp.max(jnp.where(far, scores, -2.0), axis=0)

    boff = offs[best_o]  # (K, 2) cells
    if step_cells > 1:
        # stride-1 refinement around the coarse winner (same positions the
        # original evaluated; all within +-R by construction)
        dg = jnp.arange(-(step_cells - 1), step_cells, dtype=jnp.int32)
        ddy, ddx = jnp.meshgrid(dg, dg, indexing="ij")
        deltas = jnp.stack([ddy.ravel(), ddx.ravel()], axis=1)  # (D, 2)
        fy = boff[None, :, 0] + deltas[:, 0:1]  # (D, K)
        fx = boff[None, :, 1] + deltas[:, 1:2]
        if lattice_path:
            # recompute the refinement scores from the windows (the full map
            # was never built on this path): ONE dynamic slice per keypoint
            # of the (k + 2(s-1))^2 block covering all D refinement patches
            # (a (D, K, k, k) fancy gather costs ~150 ms at the bench shape
            # — the same per-element-gather trap as the windows), then D
            # static sub-slices dotted with q.
            blk = k + 2 * (step_cells - 1)
            by = boff[:, 0] + R - (step_cells - 1)  # (K,) block start rows
            bx = boff[:, 1] + R - (step_cells - 1)

            def _blk(wv, wh, y0, x0):
                return (
                    jax.lax.dynamic_slice(wv, (y0, x0), (blk, blk)),
                    jax.lax.dynamic_slice(wh, (y0, x0), (blk, blk)),
                )

            Bv, Bh = jax.vmap(_blk)(Wvh, Wh, by, bx)  # (K, blk, blk)
            D = int(deltas.shape[0])
            w = 2 * step_cells - 1  # refinement grid width (deltas row-major)
            Aq_f = jnp.stack([
                jnp.einsum("kij,kij->k",
                           Bv[:, d // w : d // w + k, d % w : d % w + k], q)
                for d in range(D)
            ])  # (D, K)
            Bq_f = jnp.stack([
                jnp.einsum("kij,kij->k",
                           Bh[:, d // w : d // w + k, d % w : d % w + k], q)
                for d in range(D)
            ])
            ki = jnp.arange(K)[None, :]
            mean_f = mean[ki, fy + R, fx + R]
            nrm_f = nrm[ki, fy + R, fx + R]
            fine = (Aq_f - mean_f * Bq_f) / jnp.maximum(nrm_f, 1e-6)
            fine = jnp.where(valid[ki, fy + R, fx + R], fine, -2.0)
        else:
            fine = s_full[jnp.arange(K)[None, :], fy + R, fx + R]  # (D, K)
        fbest = jnp.argmax(fine, axis=0)
        best = jnp.take_along_axis(fine, fbest[None, :], axis=0)[0]
        boff = boff + deltas[fbest]

    ok = ok_q & (best >= ncc_min)
    if ncc_ratio < 1.0:
        ok = ok & ((1.0 - best) <= ncc_ratio * (1.0 - jnp.maximum(second, -1.0)))

    myy = jnp.clip(cy + boff[:, 0], 0, H - 1)
    mxx = jnp.clip(cx + boff[:, 1], 0, W - 1)
    tgt_geo = jnp.stack(
        [raster.x0 + mxx.astype(jnp.float32) * res, raster.y0 + myy.astype(jnp.float32) * res],
        axis=1,
    )
    return DenseMatches(
        tgt_geo=tgt_geo,
        tgt_ping=raster.ping[myy, mxx],
        tgt_col=raster.col[myy, mxx],
        score=best,
        ok=ok,
    )


@functools.partial(jax.jit, static_argnames=("radius", "min_neighbors", "tol"))
def _smooth_filter_dev(
    kp_geo: jnp.ndarray,  # (K, 2)
    tgt_geo: jnp.ndarray,  # (K, 2)
    ok: jnp.ndarray,  # (K,)
    radius: float,
    min_neighbors: int,
    tol: float,
) -> jnp.ndarray:
    """Local displacement-field consistency: keep matches whose displacement
    agrees (within ``tol``) with the componentwise median displacement of
    accepted neighbors within ``radius``; matches with fewer than
    ``min_neighbors`` neighbors are dropped (no local support).

    One fused device op: the masked per-row median is a sort of the (K, K)
    neighbor-masked displacement matrix — replaces a per-keypoint Python loop
    that serialized the stage at the 2000-kp capacity.
    """
    d = tgt_geo - kp_geo  # (K, 2)
    diff = kp_geo[:, None, :] - kp_geo[None, :, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    K = kp_geo.shape[0]
    eye = jnp.eye(K, dtype=bool)
    nbr = (dist2 <= radius * radius) & ok[None, :] & ~eye
    nn = jnp.sum(nbr, axis=1)  # (K,) accepted-neighbor counts

    big = jnp.asarray(1e9, d.dtype)

    def med(col):
        # masked median: non-neighbors pushed to +big, so after sorting the
        # first nn entries are the neighbor values; numpy's even-count rule
        # (mean of the middle two) replicated exactly
        m = jnp.where(nbr, col[None, :], big)
        s = jnp.sort(m, axis=1)
        lo = jnp.take_along_axis(s, jnp.maximum((nn - 1) // 2, 0)[:, None], axis=1)[:, 0]
        hi = jnp.take_along_axis(s, (nn // 2)[:, None], axis=1)[:, 0]
        return 0.5 * (lo + hi)

    dev = jnp.sqrt((d[:, 0] - med(d[:, 0])) ** 2 + (d[:, 1] - med(d[:, 1])) ** 2)
    return ok & (nn >= min_neighbors) & (dev <= tol)


def _smooth_filter(kp_geo: np.ndarray, tgt_geo: np.ndarray, ok: np.ndarray, cfg: DenseMatchConfig):
    """Host wrapper over :func:`_smooth_filter_dev` (kept for the empty-input
    short-circuit and numpy in/out convenience)."""
    if not np.any(ok):
        return np.zeros_like(np.asarray(ok))
    keep = _smooth_filter_dev(
        jnp.asarray(kp_geo, jnp.float32),
        jnp.asarray(tgt_geo, jnp.float32),
        jnp.asarray(ok),
        radius=float(cfg.smooth_radius),
        min_neighbors=int(cfg.smooth_min_neighbors),
        tol=float(cfg.smooth_tol),
    )
    return np.asarray(keep)


@functools.partial(
    jax.jit,
    static_argnames=(
        "res", "half", "n_ring", "step_cells", "ncc_min", "ncc_ratio", "min_cover",
        "radius", "min_neighbors", "tol",
    ),
)
def _dense_pairs_program(
    rimg, rcnt, rping, rcol,  # (F, H, W) stacked world rasters
    x0s, y0s,  # (F,)
    geo_kps,  # (F, K, 2) keypoint world positions per frame
    kp_valid,  # (F, K) bool
    si, ti,  # (Pn,) int32 source/target frame index per pair
    res: float,
    half: int,
    n_ring: int,
    step_cells: int,
    ncc_min: float,
    ncc_ratio: float,
    min_cover: float,
    radius: float,
    min_neighbors: int,
    tol: float,
):
    """ALL gated pairs' dense correlation + displacement-field filter as ONE
    device program (vmap over the pair axis).  Replaces the per-pair host loop
    that cost one device round trip per pair — the analogue of the kp path's
    ``robust_matching_stacked`` for the automatic profile's default matcher
    (reference per-pair hot loop: FEAmatcher.cpp:79-98)."""

    def one_pair(s, t):
        rs = WorldRaster(rimg[s], rcnt[s], rping[s], rcol[s], x0s[s], y0s[s], res)
        rt = WorldRaster(rimg[t], rcnt[t], rping[t], rcol[t], x0s[t], y0s[t], res)
        geo_kp = geo_kps[s]
        desc_q, ok_q = _raster_patches(rs, geo_kp, half, min_cover)
        dm = _correlate(
            desc_q, ok_q & kp_valid[s], geo_kp, rt,
            half=half, n_ring=n_ring, step_cells=step_cells, ncc_min=ncc_min,
            ncc_ratio=ncc_ratio, min_cover=min_cover,
        )
        keep = _smooth_filter_dev(
            geo_kp, dm.tgt_geo, dm.ok,
            radius=radius, min_neighbors=min_neighbors, tol=tol,
        )
        return dm, keep

    return jax.vmap(one_pair)(si, ti)


def dense_matching_stacked(
    pair_ids,
    img_ids,
    feats_list,
    norm_list,
    geo_list,
    det_cfg: DetectorConfig,
    cfg: DenseMatchConfig,
    mesh=None,
):
    """Whole-survey dense matching: every frame rasterized once at the
    survey-common raster shape, every gated pair correlated + smoothness-
    filtered in ONE stacked dispatch, ONE device->host transfer.

    Same results as per-pair :func:`dense_matching` (parity-tested); requires
    all frames to share the keypoint capacity K (the pipeline pads features to
    the survey max, pipeline.py:_match_pairs).  Returns
    ``{(i, j): (rows_s, rows_t, n)}`` in the corres_kps layout.

    ``mesh``: optional 1-axis mesh — the pair axis is DP-sharded over its
    devices (rasters replicated), mirroring ``robust_matching_stacked``; the
    multi-chip path for the automatic profile's default matcher.
    """
    res = det_cfg.geopatch_res
    F = len(feats_list)
    if len({tuple(g.shape) for g in geo_list}) == 1:
        # same-shape survey: ONE vmapped rasterization program for all
        # frames (the per-frame loop cost a dispatch per frame — measured
        # 0.55 s of the 3 s stacked round at the auto bench point), raster
        # bounds from ONE device reduction + (F, 4) fetch (the full-geo host
        # fetches previously used for sizing cost ~0.7 s/round through the
        # tunnel — see _geo_bounds_batch)
        geo_st = jnp.stack(list(geo_list))
        if not isinstance(norm_list[0], jax.Array):
            # host-resident imagery (frame.host_imagery, eager ndarray or
            # lazy view): ONE stacked upload instead of per-frame transfers
            norm_st = jnp.asarray(np.stack([np.asarray(nm) for nm in norm_list]))
        else:
            norm_st = jnp.stack(list(norm_list))
        # keep f32: x0/y0 must be bit-identical to the per-pair path's
        # f32 `gx.min() - margin` (parity tests pin stacked == per-pair)
        bb = np.asarray(_geo_bounds_batch(geo_st))  # (F, 4) f32
        margin = np.float32(2.0)
        shapes = [
            _shape_from_bounds(bb[k, 0], bb[k, 1], bb[k, 2], bb[k, 3], res, margin)
            for k in range(F)
        ]
        H = max(s[0] for s in shapes)
        W = max(s[1] for s in shapes)
        x0s_np = (bb[:, 0] - margin).astype(np.float32)
        y0s_np = (bb[:, 2] - margin).astype(np.float32)
        rimg, rcnt, rping, rcol = jax.vmap(
            lambda nm, g, x0, y0: _rasterize(nm, g, x0, y0, res, W, H)
        )(norm_st, geo_st, jnp.asarray(x0s_np), jnp.asarray(y0s_np))
        x0s = jnp.asarray(x0s_np)
        y0s = jnp.asarray(y0s_np)
        geo_kps = _geo_kps_batch(geo_st, jnp.stack([f.xy for f in feats_list]))
    else:
        shapes = [raster_shape(g, res) for g in geo_list]
        H = max(s[0] for s in shapes)
        W = max(s[1] for s in shapes)
        rasters = [
            world_raster(nm, g, res, shape=(H, W)) for nm, g in zip(norm_list, geo_list)
        ]
        rimg = jnp.stack([r.img for r in rasters])
        rcnt = jnp.stack([r.cnt for r in rasters])
        rping = jnp.stack([r.ping for r in rasters])
        rcol = jnp.stack([r.col for r in rasters])
        x0s = jnp.asarray([r.x0 for r in rasters], jnp.float32)
        y0s = jnp.asarray([r.y0 for r in rasters], jnp.float32)
        geo_kps = jnp.stack(
            [
                g[
                    jnp.clip(f.xy[:, 1].astype(jnp.int32), 0, g.shape[0] - 1),
                    jnp.clip(f.xy[:, 0].astype(jnp.int32), 0, g.shape[1] - 1),
                ]
                for f, g in zip(feats_list, geo_list)
            ]
        )
    kp_valid = jnp.stack([f.valid for f in feats_list])
    si = jnp.asarray([i for (i, j) in pair_ids], jnp.int32)
    ti = jnp.asarray([j for (i, j) in pair_ids], jnp.int32)

    n_pairs = len(pair_ids)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..padding import pad_to_multiple

        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        # dummy pairs fill the last shard; results sliced off below
        si = pad_to_multiple(si, n_dev)
        ti = pad_to_multiple(ti, n_dev)
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        si, ti = jax.device_put(si, shard), jax.device_put(ti, shard)
        rimg, rcnt, rping, rcol, x0s, y0s, geo_kps, kp_valid = (
            jax.device_put(a, rep)
            for a in (rimg, rcnt, rping, rcol, x0s, y0s, geo_kps, kp_valid)
        )

    n_ring = int(np.ceil(cfg.search_radius / res))
    dm, keep = _dense_pairs_program(
        rimg, rcnt, rping, rcol, x0s, y0s, geo_kps, kp_valid, si, ti,
        res=res, half=det_cfg.geopatch_half, n_ring=n_ring,
        step_cells=cfg.step_cells, ncc_min=cfg.ncc_min, ncc_ratio=cfg.ncc_ratio,
        min_cover=cfg.min_cover, radius=float(cfg.smooth_radius),
        min_neighbors=int(cfg.smooth_min_neighbors), tol=float(cfg.smooth_tol),
    )
    # ONE batched transfer for the whole survey (incl. all frames' kp coords —
    # the per-pair np.asarray(xy) fetch cost a round trip per pair)
    keep_np, ping_np, col_np, xy_np = jax.device_get(
        (keep[:n_pairs], dm.tgt_ping[:n_pairs], dm.tgt_col[:n_pairs],
         jnp.stack([f.xy for f in feats_list]))
    )

    out = {}
    for p, (i, j) in enumerate(pair_ids):
        idx = np.nonzero(keep_np[p])[0]
        n = len(idx)
        xy = xy_np[i]
        rows_s = np.empty((n, 6), np.float64)
        rows_s[:, 0] = img_ids[i]
        rows_s[:, 1] = img_ids[j]
        rows_s[:, 2] = xy[idx, 1]
        rows_s[:, 3] = xy[idx, 0]
        rows_s[:, 4] = np.round(ping_np[p, idx])
        rows_s[:, 5] = np.round(col_np[p, idx])
        rows_t = np.empty((n, 6), np.float64)
        rows_t[:, 0] = img_ids[j]
        rows_t[:, 1] = img_ids[i]
        rows_t[:, 2:4] = rows_s[:, 4:6]
        rows_t[:, 4:6] = rows_s[:, 2:4]
        out[(i, j)] = (rows_s, rows_t, n)
    return out


def dense_matching(
    img_id_s: int,
    img_id_t: int,
    feats_s: DetectedFeatures,
    frame_s_norm: jnp.ndarray,
    geo_s: jnp.ndarray,
    frame_t_norm: jnp.ndarray,
    geo_t: jnp.ndarray,
    det_cfg: DetectorConfig,
    cfg: DenseMatchConfig,
    raster_s: WorldRaster | None = None,
    raster_t: WorldRaster | None = None,
):
    """Match source keypoints into the target frame by dense world correlation.

    Returns ``(rows_s, rows_t, n_matches)`` in the corres_kps layout
    (img_id, ref_id, ping, bin, ref_ping, ref_bin) — drop-in for the keypoint
    matcher's output (FEAmatcher.cpp:37-44).  ``raster_s``/``raster_t`` can be
    passed in to reuse across pairs sharing a frame.
    """
    res = det_cfg.geopatch_res
    xi = jnp.clip(feats_s.xy[:, 0].astype(jnp.int32), 0, geo_s.shape[1] - 1)
    yi = jnp.clip(feats_s.xy[:, 1].astype(jnp.int32), 0, geo_s.shape[0] - 1)
    geo_kp = geo_s[yi, xi]

    if raster_s is None:
        raster_s = world_raster(frame_s_norm, geo_s, res)
    if raster_t is None:
        raster_t = world_raster(frame_t_norm, geo_t, res)
    desc_q, ok_q = _raster_patches(raster_s, geo_kp, det_cfg.geopatch_half, cfg.min_cover)
    n_ring = int(np.ceil(cfg.search_radius / res))
    dm = _correlate(
        desc_q,
        ok_q & feats_s.valid,
        geo_kp,
        raster_t,
        half=det_cfg.geopatch_half,
        n_ring=n_ring,
        step_cells=cfg.step_cells,
        ncc_min=cfg.ncc_min,
        ncc_ratio=cfg.ncc_ratio,
        min_cover=cfg.min_cover,
    )

    kp_geo_np = np.asarray(geo_kp)
    tgt_geo_np = np.asarray(dm.tgt_geo)
    ok_np = np.asarray(dm.ok)
    keep = _smooth_filter(kp_geo_np, tgt_geo_np, ok_np, cfg)

    xy = np.asarray(feats_s.xy)
    ping_t = np.asarray(dm.tgt_ping)
    col_t = np.asarray(dm.tgt_col)
    idx = np.nonzero(keep)[0]
    n = len(idx)
    rows_s = np.empty((n, 6), np.float64)
    rows_s[:, 0] = img_id_s
    rows_s[:, 1] = img_id_t
    rows_s[:, 2] = xy[idx, 1]
    rows_s[:, 3] = xy[idx, 0]
    rows_s[:, 4] = np.round(ping_t[idx])
    rows_s[:, 5] = np.round(col_t[idx])
    rows_t = np.empty((n, 6), np.float64)
    rows_t[:, 0] = img_id_t
    rows_t[:, 1] = img_id_s
    rows_t[:, 2:4] = rows_s[:, 4:6]
    rows_t[:, 4:6] = rows_s[:, 2:4]
    return rows_s, rows_t, n
