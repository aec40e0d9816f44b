"""Geo-gated nearest-neighbor descriptor search.

Replaces ``FEAmatcher::GeoNearNeighSearch`` (/root/reference/src/core/
FEAmatcher.cpp:52-321): for each keypoint of the query frame, candidates are the
reference-frame keypoints within an 8 m geo radius (:67,:93); the best SIFT L2
match wins if it passes the 350 distance bound and 0.35 first/second ratio test
(:105-138), with the reference's single-candidate escape hatch (:134-138).

The serial O(K_s * K_t) loop becomes one masked distance-matrix computation:
the descriptor term is a (K, K) matmul on the MXU, the geo gate an elementwise
mask on the VPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatcherConfig

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e9


class NNResult(NamedTuple):
    corres: jnp.ndarray  # (K,) int32 index into ref kps, -1 if none
    n_candidates: jnp.ndarray  # (K,) int32 geo-gated candidate counts
    best_dist: jnp.ndarray  # (K,) float32


@functools.partial(jax.jit, static_argnames=("cfg", "parity_flip"))
def geo_nn_search(
    geo_q: jnp.ndarray,  # (K, 2) query keypoint geo positions
    desc_q: jnp.ndarray,  # (K, D) — 128-d SIFT or 256-d +-1 binary
    valid_q: jnp.ndarray,  # (K,)
    geo_r: jnp.ndarray,  # (Kr, 2) reference keypoint geo positions
    desc_r: jnp.ndarray,  # (Kr, D)
    valid_r: jnp.ndarray,  # (Kr,)
    ref_bbox: jnp.ndarray,  # (4,) x_min, x_max, y_min, y_max of the ref geo image
    cfg: MatcherConfig = MatcherConfig(),
    parity_flip: bool = False,  # opposite-parity images (ORB bound, FEAmatcher.cpp:144-145)
) -> NNResult:
    if cfg.desc_metric == "hamming":
        bound = cfg.orb_dist_bound_cross if parity_flip else cfg.orb_dist_bound
    elif cfg.desc_metric == "ncc":
        bound = 1.0 - cfg.ncc_min
    else:
        bound = cfg.sift_dist_bound
    return nn_core(
        geo_q, desc_q, valid_q, geo_r, desc_r, valid_r, ref_bbox,
        jnp.asarray(bound, jnp.float32), cfg,
    )


def nn_core(
    geo_q, desc_q, valid_q, geo_r, desc_r, valid_r, ref_bbox,
    bound: jnp.ndarray,  # () traced accept bound — vmappable over pair batches
    cfg: MatcherConfig,
) -> NNResult:
    """The matmul-shaped NN search body with a TRACED distance bound; the
    whole-survey stacked matcher (robust.py:robust_matching_stacked) vmaps
    this over the pair axis with per-pair parity-dependent bounds."""
    # geo distance gate
    d2 = jnp.sum((geo_q[:, None, :] - geo_r[None, :, :]) ** 2, axis=-1)  # (K, Kr)
    gate = d2 < cfg.geo_radius**2
    gate &= valid_q[:, None] & valid_r[None, :]
    # query kp must fall inside the ref geo bbox (FEAmatcher.cpp:84)
    in_bbox = (
        (geo_q[:, 0] >= ref_bbox[0])
        & (geo_q[:, 0] <= ref_bbox[1])
        & (geo_q[:, 1] >= ref_bbox[2])
        & (geo_q[:, 1] <= ref_bbox[3])
    )
    gate &= in_bbox[:, None]

    if cfg.desc_metric == "hamming":
        # ORB binary path: Hamming distance from +-1 encodings, one matmul
        from ..features.orb_desc import hamming_matrix

        dist = hamming_matrix(desc_q, desc_r)
    elif cfg.desc_metric == "ncc":
        # geo-patch path: descriptors are mean-free unit vectors, so the dot
        # product IS the normalized cross-correlation; distance = 1 - NCC
        dist = 1.0 - jnp.matmul(desc_q, desc_r.T, precision=_HI)
    else:
        # SIFT L2 distances via the matmul identity
        q2 = jnp.sum(desc_q * desc_q, axis=-1)
        r2 = jnp.sum(desc_r * desc_r, axis=-1)
        cross = jnp.matmul(desc_q, desc_r.T, precision=_HI)
        dist2 = jnp.maximum(q2[:, None] + r2[None, :] - 2.0 * cross, 0.0)
        dist = jnp.sqrt(dist2)
    masked = jnp.where(gate, dist, _BIG)

    # best and second-best over candidates (guard tiny reference sets)
    k = min(2, masked.shape[1])
    neg2, idx2 = jax.lax.top_k(-masked, k)
    best = -neg2[:, 0]
    best_id = idx2[:, 0]
    if cfg.ratio_excl_radius > 0.0:
        # second-best excludes the best's spatial neighborhood (see MatcherConfig)
        best_geo = geo_r[best_id]
        near_best = (
            jnp.sum((geo_r[None, :, :] - best_geo[:, None, :]) ** 2, axis=-1)
            < cfg.ratio_excl_radius**2
        )
        masked2 = jnp.where(near_best, _BIG, masked)
        second = jnp.min(masked2, axis=-1)
    else:
        second = -neg2[:, 1] if k == 2 else jnp.full_like(best, _BIG)
    n_cand = jnp.sum(gate, axis=-1)

    ratio_thr = cfg.ncc_ratio if cfg.desc_metric == "ncc" else cfg.ratio_test
    ratio_ok = best / jnp.maximum(second, 1e-9) <= ratio_thr
    if cfg.desc_metric == "hamming":
        # ORB accept rule (FEAmatcher.cpp:166-175): <= bound, ratio, and a real
        # second-best must exist; single-candidate escape identical
        pass_full = (best <= bound) & ratio_ok & (second < _BIG) & (n_cand >= 1)
        pass_single = (n_cand == 1) & (best <= bound)
    else:
        pass_full = (best < bound) & ratio_ok & (n_cand >= 1)
        pass_single = (n_cand == 1) & (best < bound)
    ok = pass_full | pass_single
    return NNResult(
        corres=jnp.where(ok, best_id, -1).astype(jnp.int32),
        n_candidates=n_cand.astype(jnp.int32),
        best_dist=best,
    )
