"""FAST corner detection as a fused vector op.

Replaces the per-cell ``cv::FAST`` calls of the reference extractor
(ORBextractor.cpp:765-853): segment test on the 16-pixel Bresenham circle of
radius 3, requiring >= 9 contiguous brighter/darker pixels (FAST-9, OpenCV's
``FastFeatureDetector::TYPE_9_16`` that ``cv::FAST`` defaults to).

Instead of looping pixels, we build the 16 circle-shifted images and evaluate
the segment test for the whole image at once — one fused elementwise pipeline
on the VPU.  The corner score is OpenCV's definition: the maximum threshold for
which the pixel remains a corner, computed in closed form from the arc minima.
"""

from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from 12 o'clock (OpenCV order)
CIRCLE = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)
N_CONTIG = 9


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(N, M) -> (N, M, 16) pixel values on the circle around each pixel.

    Rolls wrap at the borders; callers must mask a 3-pixel frame (the detector
    masks a wider edge margin anyway, matching the reference's EDGE_THRESHOLD).
    """
    shifted = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for (dx, dy) in CIRCLE]
    return jnp.stack(shifted, axis=-1)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 corner score map; 0 where the segment test fails.

    Score = max over valid arcs of (min over the arc of |p_i - p|) - threshold
    contribution, i.e. OpenCV's "maximum threshold that keeps it a corner".
    """
    img = img.astype(jnp.float32)
    circ = _circle_stack(img)
    center = img[..., None]
    diff = circ - center  # (N, M, 16)

    # doubled circle for contiguous-arc tests
    d2 = jnp.concatenate([diff, diff], axis=-1)  # (N, M, 32)

    # for each of the 16 arc starts: the minimum of diff (brighter test) and the
    # maximum of diff (darker test) over the 9-long arc
    arc_min = jnp.stack([jnp.min(d2[..., s : s + N_CONTIG], axis=-1) for s in range(16)], -1)
    arc_max = jnp.stack([jnp.max(d2[..., s : s + N_CONTIG], axis=-1) for s in range(16)], -1)

    # brighter corner: some arc with all diffs > t  ->  max_s arc_min > t
    bright = jnp.max(arc_min, axis=-1)
    # darker corner: some arc with all diffs < -t  ->  min_s arc_max < -t
    dark = -jnp.min(arc_max, axis=-1)
    score = jnp.maximum(bright, dark)
    return jnp.where(score > threshold, score, 0.0)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression (cv::FAST nonmaxSuppression=true)."""
    import jax

    local_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= local_max, score, 0.0)
