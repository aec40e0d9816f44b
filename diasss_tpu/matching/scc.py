"""Sliding Compatibility Check — vectorized 1000-hypothesis RANSAC.

Replaces the serial SCC loop of ``FEAmatcher::GeoNearNeighSearch``
(FEAmatcher.cpp:185-248): the compatibility model is a single scalar — the
along-track (ping-axis) offset between matched keypoints, with the row index
flipped when the two survey lines run in opposite directions (odd/even image-id
parity, :209-212).  1000 two-sample hypotheses are evaluated for the entire
match set at once (``vmap`` over hypotheses); inliers agree within 2.5 pings.

RNG note: the reference seeds OpenCV's RNG with 1 (:59-60); we use a JAX PRNG
key derived from the configured seed — same determinism guarantee, different
stream (deliberate deviation; the hypothesis space is tiny so the consensus
model is insensitive to the stream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatcherConfig


class SCCResult(NamedTuple):
    corres: jnp.ndarray  # (K,) int32, filtered to the consensus inliers
    inlier_count: jnp.ndarray  # () int32 — scc pair .first (FEAmatcher.cpp:241)
    model_x: jnp.ndarray  # () float32 — scc pair .second


def _row_metric(y_q, y_r, flip: jnp.ndarray, ref_rows: jnp.ndarray):
    """|y_q - y_r| or the parity-flipped |y_q - (ref_rows - y_r + 1)|
    (FEAmatcher.cpp:209-212)."""
    y_ref = jnp.where(flip, ref_rows - y_r + 1.0, y_r)
    return jnp.abs(y_q - y_ref)


@functools.partial(jax.jit, static_argnames=("cfg",))
def scc_filter(
    kp_y_q: jnp.ndarray,  # (K,) query keypoint ping (row) coords
    kp_y_r: jnp.ndarray,  # (Kr,) reference keypoint ping coords
    corres: jnp.ndarray,  # (K,) int32 from geo_nn_search, -1 = unmatched
    parity_flip: jnp.ndarray,  # () bool — img_id%2 != img_id_ref%2
    ref_rows: jnp.ndarray,  # () float — reference image row count
    key: jax.Array,
    cfg: MatcherConfig = MatcherConfig(),
    kp_x_q: jnp.ndarray | None = None,  # (K,) bin (col) coords, scc_mode="xy"
    kp_x_r: jnp.ndarray | None = None,  # (Kr,)
) -> SCCResult:
    K = kp_y_q.shape[0]
    matched = corres >= 0
    y_r_matched = kp_y_r[jnp.clip(corres, 0)]
    x_val = _row_metric(kp_y_q, y_r_matched, parity_flip, ref_rows)  # (K,)

    use_xy = cfg.scc_mode == "xy" and kp_x_q is not None and kp_x_r is not None
    n_samples = 3 if use_xy else cfg.scc_samples  # FEAmatcher.cpp:254 vs :189

    # sample matched ids per hypothesis via categorical over the matched mask
    logits = jnp.where(matched, 0.0, -jnp.inf)
    samples = jax.random.categorical(
        key, logits[None, :], axis=-1, shape=(cfg.scc_max_iters, n_samples)
    )  # (H, S)
    model_x = jnp.mean(x_val[samples], axis=-1)  # (H,)

    # inlier test for every hypothesis x match
    resid = jnp.abs(model_x[:, None] - x_val[None, :])  # (H, K)
    inl = (resid <= cfg.scc_pix_error) & matched[None, :]
    if use_xy:
        # two-axis variant (FEAmatcher.cpp:270-303): the bin-offset model
        y_val = jnp.abs(kp_x_q - kp_x_r[jnp.clip(corres, 0)])  # (K,)
        model_y = jnp.mean(y_val[samples], axis=-1)  # (H,)
        resid_y = jnp.abs(model_y[:, None] - y_val[None, :])
        inl = inl & (resid_y <= cfg.scc_pix_error_y)
    counts = jnp.sum(inl, axis=-1)  # (H,)
    # no matches at all -> categorical produced garbage; force empty result
    any_match = jnp.any(matched)
    counts = jnp.where(any_match, counts, 0)

    best_h = jnp.argmax(counts)  # first max wins, like the strict '<' update
    best_inl = inl[best_h] & matched
    return SCCResult(
        corres=jnp.where(best_inl, corres, -1).astype(jnp.int32),
        inlier_count=counts[best_h].astype(jnp.int32),
        model_x=jnp.where(any_match, model_x[best_h], 0.0),
    )
