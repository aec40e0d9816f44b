"""Bidirectional robust matching with cross-direction consistency merge.

Replaces ``FEAmatcher::RobustMatching`` + ``ConsistentCheck``
(/root/reference/src/core/FEAmatcher.cpp:13-50, 323-439):

* run the geo-gated NN search + SCC in both directions;
* if the two directions' consensus along-track offsets agree within 2.5 px
  (parity-adjusted by the image row-count difference, :341-345), take the union
  of both directions, skipping direction-1 matches whose reverse map points back
  (they would be duplicated by direction 2, :353);
* otherwise keep only the direction with more inliers (:373-405).

Output rows follow the ``corres_kps`` layout
``(img_id, ref_img_id, ping, bin, ref_ping, ref_bin)`` (:37-44) — note the
reference stores (pt.y, pt.x) = (ping, bin) order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MatcherConfig
from ..features.detector import DetectedFeatures
from .geosearch import geo_nn_search
from .scc import scc_filter


class MatchResult(NamedTuple):
    rows_s: np.ndarray  # (M, 6) corres_kps rows for the source frame
    rows_t: np.ndarray  # (M, 6) mirrored rows for the target frame
    n_matches: int
    inliers_1: int
    inliers_2: int
    consistent: bool


def _kp_geo(feats: DetectedFeatures, geo_img: jnp.ndarray) -> jnp.ndarray:
    """Geo position of each keypoint: geo image gathered at integer coords
    (FEAmatcher.cpp:81-82 uses .at<double>(kp.y, kp.x) — truncation, not
    rounding)."""
    xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, geo_img.shape[1] - 1)
    yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, geo_img.shape[0] - 1)
    return geo_img[yi, xi]


def _ring_nn(geo_q, feats_q, geo_r, feats_r, bbox_r, cfg, pflip, mesh):
    """Ring-pass NN search with internal padding of both keypoint capacities
    to a multiple of the mesh size (``ring_geo_nn_search`` shards both sets);
    padded slots are ``valid=False`` so decisions are unchanged."""
    from ..parallel.ring import ring_geo_nn_search

    from ..padding import pad_to_multiple

    n_dev = mesh.shape[mesh.axis_names[0]]
    kq = geo_q.shape[0]
    gq, dq, vq = (pad_to_multiple(a, n_dev)
                  for a in (geo_q, feats_q.desc, feats_q.valid))
    gr, dr, vr = (pad_to_multiple(a, n_dev)
                  for a in (geo_r, feats_r.desc, feats_r.valid))
    out = ring_geo_nn_search(
        gq, dq, vq, gr, dr, vr, bbox_r, cfg, pflip, mesh,
        axis=mesh.axis_names[0],
    )
    if out.corres.shape[0] != kq:
        out = jax.tree_util.tree_map(lambda a: a[:kq], out)
    return out


def robust_matching(
    img_id_s: int,
    img_id_t: int,
    feats_s: DetectedFeatures,
    feats_t: DetectedFeatures,
    geo_s: jnp.ndarray,
    geo_t: jnp.ndarray,
    rows_s: int,
    rows_t: int,
    cfg: MatcherConfig = MatcherConfig(),
    mesh=None,
) -> MatchResult:
    """``mesh``: optional 1-axis mesh — the NN searches run as the ring-pass
    kernel (:func:`..parallel.ring.ring_geo_nn_search`): both keypoint sets
    sharded over the devices, reference blocks rotated with ``ppermute``, the
    (K, K) distance matrix never materialized on one chip.  Identical
    decisions to the single-device search; worth it only when K is large
    (``MatcherConfig.ring_min_kps`` gates it in the pipeline)."""
    geo_kp_s = _kp_geo(feats_s, geo_s)
    geo_kp_t = _kp_geo(feats_t, geo_t)
    bbox_t = jnp.asarray(
        [jnp.min(geo_t[..., 0]), jnp.max(geo_t[..., 0]), jnp.min(geo_t[..., 1]), jnp.max(geo_t[..., 1])]
    )
    bbox_s = jnp.asarray(
        [jnp.min(geo_s[..., 0]), jnp.max(geo_s[..., 0]), jnp.min(geo_s[..., 1]), jnp.max(geo_s[..., 1])]
    )

    pflip = bool(img_id_s % 2 != img_id_t % 2)
    if mesh is not None:
        nn_1 = _ring_nn(geo_kp_s, feats_s, geo_kp_t, feats_t, bbox_t, cfg, pflip, mesh)
        nn_2 = _ring_nn(geo_kp_t, feats_t, geo_kp_s, feats_s, bbox_s, cfg, pflip, mesh)
    else:
        nn_1 = geo_nn_search(geo_kp_s, feats_s.desc, feats_s.valid, geo_kp_t, feats_t.desc, feats_t.valid, bbox_t, cfg, pflip)
        nn_2 = geo_nn_search(geo_kp_t, feats_t.desc, feats_t.valid, geo_kp_s, feats_s.desc, feats_s.valid, bbox_s, cfg, pflip)

    if cfg.cross_check:
        # mutual-NN filter (the reference's commented-out cross-check,
        # FEAmatcher.cpp:407-422) applied before SCC in both directions
        c1j = jnp.clip(nn_1.corres, 0)
        mutual_1 = (nn_1.corres >= 0) & (nn_2.corres[c1j] == jnp.arange(nn_1.corres.shape[0]))
        c2i = jnp.clip(nn_2.corres, 0)
        mutual_2 = (nn_2.corres >= 0) & (nn_1.corres[c2i] == jnp.arange(nn_2.corres.shape[0]))
        nn_1 = nn_1._replace(corres=jnp.where(mutual_1, nn_1.corres, -1))
        nn_2 = nn_2._replace(corres=jnp.where(mutual_2, nn_2.corres, -1))

    parity = jnp.asarray(img_id_s % 2 != img_id_t % 2)
    key = jax.random.PRNGKey(cfg.rng_seed)
    k1, k2 = jax.random.split(key)
    scc_1 = scc_filter(
        feats_s.xy[:, 1], feats_t.xy[:, 1], nn_1.corres, parity, jnp.asarray(float(rows_t)), k1, cfg,
        kp_x_q=feats_s.xy[:, 0], kp_x_r=feats_t.xy[:, 0],
    )
    scc_2 = scc_filter(
        feats_t.xy[:, 1], feats_s.xy[:, 1], nn_2.corres, parity, jnp.asarray(float(rows_s)), k2, cfg,
        kp_x_q=feats_t.xy[:, 0], kp_x_r=feats_s.xy[:, 0],
    )

    # --- consistency merge (ConsistentCheck, FEAmatcher.cpp:323-405) ---
    # one batched device->host transfer (per-scalar pulls cost one RTT each on
    # remote-dispatch setups)
    c1, c2, inl1, inl2, m1, m2, xy_s, xy_t = jax.device_get(
        (
            scc_1.corres, scc_2.corres,
            scc_1.inlier_count, scc_2.inlier_count,
            scc_1.model_x, scc_2.model_x,
            feats_s.xy, feats_t.xy,
        )
    )
    return _merge_directions(
        img_id_s, img_id_t, xy_s, xy_t, c1, c2,
        int(inl1), int(inl2), float(m1), float(m2), rows_s, rows_t, cfg,
    )


def _merge_directions(
    img_id_s, img_id_t, xy_s, xy_t, c1, c2, inl1, inl2, m1, m2,
    rows_s, rows_t, cfg,
) -> MatchResult:
    """Host-side consistency merge of the two directions' SCC outcomes
    (ConsistentCheck, FEAmatcher.cpp:323-405); all arrays are small numpy."""
    img_diff = abs(rows_s - rows_t) if (img_id_s % 2 != img_id_t % 2) else 0.0
    kp_diff = abs(abs(m1 - m2) - img_diff)
    consistent = kp_diff <= cfg.consistency_thres
    if consistent:
        i1 = np.nonzero(c1 >= 0)[0]
        # skip direction-1 matches whose reverse map points back (:353)
        i1 = i1[c2[c1[i1]] != i1]
        j2 = np.nonzero(c2 >= 0)[0]
        src_idx = np.concatenate([i1, c2[j2]])
        tgt_idx = np.concatenate([c1[i1], j2])
    elif inl1 > inl2:
        src_idx = np.nonzero(c1 >= 0)[0]
        tgt_idx = c1[src_idx]
    else:
        tgt_idx = np.nonzero(c2 >= 0)[0]
        src_idx = c2[tgt_idx]

    n = len(src_idx)
    rows_src = np.empty((n, 6), np.float64)
    rows_tgt = np.empty((n, 6), np.float64)
    rows_src[:, 0] = img_id_s
    rows_src[:, 1] = img_id_t
    rows_src[:, 2] = xy_s[src_idx, 1]
    rows_src[:, 3] = xy_s[src_idx, 0]
    rows_src[:, 4] = xy_t[tgt_idx, 1]
    rows_src[:, 5] = xy_t[tgt_idx, 0]
    rows_tgt[:, 0] = img_id_t
    rows_tgt[:, 1] = img_id_s
    rows_tgt[:, 2:4] = rows_src[:, 4:6]
    rows_tgt[:, 4:6] = rows_src[:, 2:4]
    return MatchResult(
        rows_s=rows_src,
        rows_t=rows_tgt,
        n_matches=n,
        inliers_1=inl1,
        inliers_2=inl2,
        consistent=bool(consistent),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stacked_nn_scc(
    kp_geo,  # (F, K, 2) per-frame keypoint geo positions
    desc,    # (F, K, D)
    valid,   # (F, K)
    xy,      # (F, K, 2)
    bboxes,  # (F, 4)
    src,     # (Np,) int32 source frame index per pair
    tgt,     # (Np,) int32 target frame index per pair
    bounds,  # (Np,) per-pair accept bound (parity-dependent for hamming)
    parity,  # (Np,) bool
    n_rows,  # (F,) float32 image row counts
    keys,    # (Np, 2, 2) uint32 PRNG keys, [p, direction]
    cfg: MatcherConfig,
):
    """Both directions of every gated pair's NN search + SCC in ONE dispatch.

    The per-pair host loop of ``robust_matching`` costs one device round trip
    per pair (185 ms/pair measured through the remote-TPU tunnel, PERF.md);
    here the pair axis is a vmapped leading dim — matching cost becomes ~flat
    in pair count, like the stacked LC solver (solvers/lc.py).
    """
    from .geosearch import nn_core

    def one_dir(qi, ri, bd):
        return nn_core(
            kp_geo[qi], desc[qi], valid[qi], kp_geo[ri], desc[ri], valid[ri],
            bboxes[ri], bd, cfg,
        )

    nn1 = jax.vmap(lambda p, b: one_dir(src[p], tgt[p], b))(
        jnp.arange(src.shape[0]), bounds
    )
    nn2 = jax.vmap(lambda p, b: one_dir(tgt[p], src[p], b))(
        jnp.arange(src.shape[0]), bounds
    )
    c1, c2 = nn1.corres, nn2.corres  # (Np, K)

    if cfg.cross_check:
        K = c1.shape[1]
        ar = jnp.arange(K)[None, :]
        m1 = (c1 >= 0) & (
            jnp.take_along_axis(c2, jnp.clip(c1, 0), axis=1) == ar
        )
        m2 = (c2 >= 0) & (
            jnp.take_along_axis(c1, jnp.clip(c2, 0), axis=1) == ar
        )
        c1 = jnp.where(m1, c1, -1)
        c2 = jnp.where(m2, c2, -1)

    def one_scc(p, corres, qi, ri, key):
        return scc_filter(
            xy[qi][:, 1], xy[ri][:, 1], corres, parity[p],
            n_rows[ri], key, cfg,
            kp_x_q=xy[qi][:, 0], kp_x_r=xy[ri][:, 0],
        )

    idx = jnp.arange(src.shape[0])
    scc1 = jax.vmap(lambda p, c, k: one_scc(p, c, src[p], tgt[p], k))(
        idx, c1, keys[:, 0]
    )
    scc2 = jax.vmap(lambda p, c, k: one_scc(p, c, tgt[p], src[p], k))(
        idx, c2, keys[:, 1]
    )
    return scc1, scc2


def robust_matching_stacked(
    pair_ids,              # list of (i, j) frame-index pairs
    img_ids,               # list of per-frame image ids
    feats_list,            # list of DetectedFeatures (same K, D across frames)
    geo_list,              # list of (N, M, 2) geo images
    rows_list,             # list of per-frame row counts
    cfg: MatcherConfig = MatcherConfig(),
    mesh=None,
):
    """Whole-survey robust matching: every gated pair's bidirectional NN + SCC
    batched into one device dispatch + ONE device->host transfer, then the
    (cheap, small) consistency merges in numpy.  Semantics identical to
    per-pair :func:`robust_matching` — same PRNG stream per pair, same merge
    rule.  Requires equal keypoint capacity across frames (the detector pads
    to ``n_features``).  Returns ``{(i, j): MatchResult}``.

    ``mesh``: optional 1-axis :class:`jax.sharding.Mesh` — the gated pairs are
    data-parallel sharded over its devices (the SURVEY §2 DP row's "pairs
    sharded across chips"): per-pair inputs ride ``NamedSharding(P(axis))``,
    frame tensors are replicated (every device gathers into any frame), and
    XLA partitions the vmapped pair axis of the one stacked program.  Results
    are bit-identical to the single-device stacked path.
    """
    if not pair_ids:
        return {}
    F = len(feats_list)
    kp_geo = jnp.stack([
        _kp_geo(feats_list[f], geo_list[f]) for f in range(F)
    ])
    desc = jnp.stack([feats_list[f].desc for f in range(F)])
    valid = jnp.stack([feats_list[f].valid for f in range(F)])
    xy = jnp.stack([feats_list[f].xy for f in range(F)])
    bboxes = jnp.stack([
        jnp.asarray([
            jnp.min(g[..., 0]), jnp.max(g[..., 0]),
            jnp.min(g[..., 1]), jnp.max(g[..., 1]),
        ])
        for g in geo_list
    ])
    src = jnp.asarray([i for (i, j) in pair_ids], jnp.int32)
    tgt = jnp.asarray([j for (i, j) in pair_ids], jnp.int32)
    parity_host = [
        (img_ids[i] % 2) != (img_ids[j] % 2) for (i, j) in pair_ids
    ]
    if cfg.desc_metric == "hamming":
        bounds_host = [
            cfg.orb_dist_bound_cross if p else cfg.orb_dist_bound
            for p in parity_host
        ]
    elif cfg.desc_metric == "ncc":
        bounds_host = [1.0 - cfg.ncc_min] * len(pair_ids)
    else:
        bounds_host = [cfg.sift_dist_bound] * len(pair_ids)
    bounds = jnp.asarray(bounds_host, jnp.float32)
    parity = jnp.asarray(parity_host)
    n_rows = jnp.asarray([float(r) for r in rows_list], jnp.float32)
    # identical PRNG stream to the per-pair path: key = PRNGKey(seed) split
    # into (k1, k2) for every pair
    base = jax.random.PRNGKey(cfg.rng_seed)
    k1, k2 = jax.random.split(base)
    keys = jnp.broadcast_to(
        jnp.stack([k1, k2])[None], (len(pair_ids), 2, 2)
    ).astype(jnp.uint32)

    n_pairs = len(pair_ids)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        from ..padding import pad_to_multiple

        # dummy pairs (frame 0 vs itself) fill the last shard; their results
        # are sliced off before the merge
        src, tgt, bounds, parity, keys = (
            pad_to_multiple(a, n_dev)
            for a in (src, tgt, bounds, parity, keys)
        )
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        src, tgt, bounds, parity, keys = (
            jax.device_put(a, shard) for a in (src, tgt, bounds, parity, keys)
        )
        kp_geo, desc, valid, xy, bboxes, n_rows = (
            jax.device_put(a, rep)
            for a in (kp_geo, desc, valid, xy, bboxes, n_rows)
        )

    scc1, scc2 = _stacked_nn_scc(
        kp_geo, desc, valid, xy, bboxes, src, tgt, bounds, parity, n_rows, keys, cfg
    )
    if mesh is not None and scc1.corres.shape[0] != n_pairs:
        scc1 = jax.tree_util.tree_map(lambda a: a[:n_pairs], scc1)
        scc2 = jax.tree_util.tree_map(lambda a: a[:n_pairs], scc2)
    # ONE transfer for the whole survey
    c1, c2, inl1, inl2, m1, m2, xy_np = jax.device_get(
        (scc1.corres, scc2.corres, scc1.inlier_count, scc2.inlier_count,
         scc1.model_x, scc2.model_x, xy)
    )
    out = {}
    for p, (i, j) in enumerate(pair_ids):
        out[(i, j)] = _merge_directions(
            img_ids[i], img_ids[j], xy_np[i], xy_np[j],
            c1[p], c2[p], int(inl1[p]), int(inl2[p]),
            float(m1[p]), float(m2[p]), rows_list[i], rows_list[j], cfg,
        )
    return out
