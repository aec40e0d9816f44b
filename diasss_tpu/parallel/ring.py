"""Ring-pass correspondence search over a device mesh.

The long-survey scaling story for matching (SURVEY §5 "long-context" row): when
a survey line carries too many keypoints for one chip's HBM — or when the
all-pairs (K_q, K_r) distance matrix is the memory bottleneck — shard BOTH
keypoint sets over the mesh and rotate the reference blocks around the ring
with ``ppermute`` (the ring-attention communication pattern; each step's
(K_q/n, K_r/n) block matmul overlaps with the neighbor transfer on ICI).

Semantics are IDENTICAL to the single-device geo-gated NN search
(:func:`..matching.geosearch.geo_nn_search`, FEAmatcher.cpp:52-321): the
running (best, second-best) merge across blocks reproduces the global top-2,
then the same bound / ratio / single-candidate rules apply
(tests/test_sharding.py asserts bit-equality on an 8-device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MatcherConfig

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e9


def ring_geo_nn_search(
    geo_q: jnp.ndarray,  # (Kq, 2) query keypoint geo positions
    desc_q: jnp.ndarray,  # (Kq, D)
    valid_q: jnp.ndarray,  # (Kq,)
    geo_r: jnp.ndarray,  # (Kr, 2) reference keypoints
    desc_r: jnp.ndarray,  # (Kr, D)
    valid_r: jnp.ndarray,  # (Kr,)
    ref_bbox: jnp.ndarray,  # (4,)
    cfg: MatcherConfig = MatcherConfig(),
    parity_flip: bool = False,
    mesh: Mesh | None = None,
    axis: str = "ring",
):
    """Distributed geo-gated NN search; returns the same ``(corres,
    n_candidates, best_dist)`` triple as ``geo_nn_search``.

    ``Kq`` and ``Kr`` must be divisible by the mesh size (pad with invalid
    slots).  Query blocks stay resident; reference blocks ride the ring.
    """
    from ..matching.geosearch import NNResult

    if mesh is None:
        mesh = Mesh(jax.devices(), (axis,))
    n_dev = mesh.shape[axis]

    if cfg.desc_metric == "hamming":
        bound = cfg.orb_dist_bound_cross if parity_flip else cfg.orb_dist_bound
    elif cfg.desc_metric == "ncc":
        bound = 1.0 - cfg.ncc_min
    else:
        bound = cfg.sift_dist_bound
    ratio_thr = cfg.ncc_ratio if cfg.desc_metric == "ncc" else cfg.ratio_test

    def body(gq, dq, vq, gr, dr, vr, bbox):
        me = jax.lax.axis_index(axis)
        blk = gr.shape[0]
        kq = gq.shape[0]

        in_bbox = (
            (gq[:, 0] >= bbox[0])
            & (gq[:, 0] <= bbox[1])
            & (gq[:, 1] >= bbox[2])
            & (gq[:, 1] <= bbox[3])
        )

        def block_dist(gr_b, dr_b, vr_b):
            d2 = jnp.sum((gq[:, None, :] - gr_b[None, :, :]) ** 2, axis=-1)
            gate = (d2 < cfg.geo_radius**2) & vq[:, None] & vr_b[None, :]
            gate &= in_bbox[:, None]
            if cfg.desc_metric == "hamming":
                from ..features.orb_desc import hamming_matrix

                dist = hamming_matrix(dq, dr_b)
            elif cfg.desc_metric == "ncc":
                dist = 1.0 - jnp.matmul(dq, dr_b.T, precision=_HI)
            else:
                q2 = jnp.sum(dq * dq, axis=-1)
                r2 = jnp.sum(dr_b * dr_b, axis=-1)
                cross = jnp.matmul(dq, dr_b.T, precision=_HI)
                dist = jnp.sqrt(jnp.maximum(q2[:, None] + r2[None, :] - 2.0 * cross, 0.0))
            return jnp.where(gate, dist, _BIG), gate

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, _):
            gr_b, dr_b, vr_b, off, best, second, best_id, ncand = carry
            masked, gate = block_dist(gr_b, dr_b, vr_b)
            k = min(2, blk)
            neg2, idx2 = jax.lax.top_k(-masked, k)
            b1 = -neg2[:, 0]
            i1 = idx2[:, 0] + off
            b2 = -neg2[:, 1] if k == 2 else jnp.full_like(b1, _BIG)
            # merge running top-2 with the block's top-2.  Strict < keeps the
            # earlier (lower global index) winner on ties — matching top_k's
            # first-occurrence rule on the concatenated array, because blocks
            # are visited in ascending offset order modulo the ring start, and
            # equal distances across blocks are resolved toward the earlier
            # VISIT; geo_nn_search resolves toward the earlier INDEX.  For
            # exact parity we therefore prefer the lower global index on ties.
            take = (b1 < best) | ((b1 == best) & (i1 < best_id))
            new_second = jnp.minimum(jnp.where(take, best, b1), jnp.minimum(second, b2))
            new_best = jnp.where(take, b1, best)
            new_best_id = jnp.where(take, i1, best_id)
            ncand = ncand + jnp.sum(gate, axis=-1).astype(jnp.int32)
            nxt = jax.lax.ppermute((gr_b, dr_b, vr_b, off), axis, perm)
            return (*nxt, new_best, new_second, new_best_id, ncand), None

        # device-invariant init values must be marked varying for the scan
        # carry to type-check under shard_map's manual-axes tracking
        vary = lambda x: jax.lax.pcast(x, (axis,), to="varying")
        init = (
            gr,
            dr,
            vr,
            me * blk,
            vary(jnp.full((kq,), _BIG, jnp.float32)),
            vary(jnp.full((kq,), _BIG, jnp.float32)),
            vary(jnp.zeros((kq,), jnp.int32)),
            vary(jnp.zeros((kq,), jnp.int32)),
        )
        carry, _ = jax.lax.scan(step, init, None, length=n_dev)
        best, second, best_id, ncand = carry[4], carry[5], carry[6], carry[7]

        ratio_ok = best / jnp.maximum(second, 1e-9) <= ratio_thr
        if cfg.desc_metric == "hamming":
            pass_full = (best <= bound) & ratio_ok & (second < _BIG) & (ncand >= 1)
            pass_single = (ncand == 1) & (best <= bound)
        else:
            pass_full = (best < bound) & ratio_ok & (ncand >= 1)
            pass_single = (ncand == 1) & (best < bound)
        ok = pass_full | pass_single
        corres = jnp.where(ok, best_id, -1).astype(jnp.int32)
        return corres, ncand, best

    shard = P(axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(shard, shard, shard, shard, shard, shard, P()),
        out_specs=(shard, shard, shard),
    )
    corres, ncand, best = jax.jit(fn)(
        geo_q, desc_q, valid_q, geo_r, desc_r, valid_r, ref_bbox
    )
    return NNResult(corres=corres, n_candidates=ncand, best_dist=best)
