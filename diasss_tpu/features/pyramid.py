"""Image pyramid + Gaussian blur (ORBextractor.cpp:1115-1140, 1092).

6 levels at scale factor 1.2 (frame.cpp:180), bilinear resize; the 13x13 sigma-2
Gaussian blur applied before descriptor extraction (ORBextractor.cpp:1092) is a
separable depthwise convolution.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(shape, n_levels: int, scale_factor: float) -> List[tuple]:
    """cvRound-compatible level sizes (ORBextractor.cpp:1120)."""
    h, w = shape
    out = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor**lvl)
        # cvRound: round-half-to-even like rint
        out.append((int(np.rint(h * s)), int(np.rint(w * s))))
    return out


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """Successive bilinear resizes (each level from the previous, like the
    reference's ``resize(mvImagePyramid[level-1], ...)``)."""
    img = img.astype(jnp.float32)
    shapes = pyramid_shapes(img.shape, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        levels.append(
            jax.image.resize(levels[-1], shapes[lvl], method="linear", antialias=False)
        )
    return levels


def gaussian_kernel1d(ksize: int, sigma: float) -> jnp.ndarray:
    r = (ksize - 1) / 2
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, ksize: int = 13, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 padding (cv BORDER_REFLECT_101)."""
    k = gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(img.astype(jnp.float32), ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, -1, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x
