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
) -> MatchResult:
    geo_kp_s = _kp_geo(feats_s, geo_s)
    geo_kp_t = _kp_geo(feats_t, geo_t)
    bbox_t = jnp.asarray(
        [jnp.min(geo_t[..., 0]), jnp.max(geo_t[..., 0]), jnp.min(geo_t[..., 1]), jnp.max(geo_t[..., 1])]
    )
    bbox_s = jnp.asarray(
        [jnp.min(geo_s[..., 0]), jnp.max(geo_s[..., 0]), jnp.min(geo_s[..., 1]), jnp.max(geo_s[..., 1])]
    )

    pflip = bool(img_id_s % 2 != img_id_t % 2)
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
    inl1 = int(inl1)
    inl2 = int(inl2)
    img_diff = abs(rows_s - rows_t) if (img_id_s % 2 != img_id_t % 2) else 0.0
    kp_diff = abs(abs(float(m1) - float(m2)) - img_diff)
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
