"""Dense-NCC correlation accumulation as a Pallas TPU kernel.

The shift-scan formulation (matching/dense.py:_correlate) accumulates the
two q-dependent correlation maps over the k*k patch cells:

    A[t1, t2, kp] = sum_g q[g, kp] * Wvh[t1 + dy_g, t2 + dx_g, kp]
    B[t1, t2, kp] = sum_g q[g, kp] * Wh [t1 + dy_g, t2 + dx_g, kp]

In XLA, each scan step round-trips the (K, T, T) accumulators and window
slices through HBM — measured ~60 MB/step x 289 steps (~430-580 ms at
K=2000, T=43, ~5% of the HBM roof; unrolling with static slices bought only
1.35x).  This kernel keeps one 128-keypoint block's windows AND accumulators
resident in VMEM for all 289 steps: HBM traffic drops to read-once /
write-once, and the FMAs run at VPU rate.

Layout: keypoints ride the LANE (minor) dimension, so the per-step window
shifts are static slices over the two leading dims — no lane rotation.
Accumulation order matches the scan exactly (g ascending), so results are
bit-identical to the XLA fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qcorr_kernel(q_ref, w_ref, a_ref, *, k: int, T_pad: int):
    """q_ref: (G_pad, 128); w_ref: (S_pad, S_pad, 128) VMEM window block;
    a_ref: (T_pad, T_pad, 128) output, used directly as the accumulator
    (a separate temp plus Mosaic's double-buffered blocks overflowed the
    16 MB VMEM budget by 8 KB at the production shape).  A and B run as two
    kernel invocations for the same reason — each holds ONE window array.
    Static unroll over the k*k patch cells; every slice offset is
    trace-time constant."""
    a = jnp.zeros((T_pad, T_pad, 128), jnp.float32)
    for g in range(k * k):
        dy, dx = g // k, g % k
        qg = q_ref[g, :][None, None, :]
        a = a + qg * w_ref[dy : dy + T_pad, dx : dx + T_pad, :]
    a_ref[:, :, :] = a


@functools.partial(jax.jit, static_argnames=("k", "T", "interpret"))
def qcorr_pallas(
    Wvh: jnp.ndarray,  # (K, S, S) v*have windows
    Wh: jnp.ndarray,  # (K, S, S) have windows
    q: jnp.ndarray,  # (K, G) flattened source patches, G = k*k
    k: int,
    T: int,
    interpret: bool = False,
):
    """Returns (A, B): (K, T, T) correlation maps (see module docstring)."""
    K, S, _ = Wvh.shape
    G = k * k
    # Mosaic tiling: lanes (minor dim) in 128s, sublanes (second-to-last) in 8s
    K_pad = -(-K // 128) * 128
    T_pad = -(-T // 8) * 8
    S_pad = max(-(-S // 8) * 8, T_pad + k - 1)
    G_pad = -(-G // 8) * 8

    def pad_to(x, shape):
        return jnp.pad(x, [(0, s - d) for s, d in zip(shape, x.shape)])

    # K -> lanes; zero padding keeps padded keypoints inert
    wvh_t = pad_to(jnp.transpose(Wvh, (1, 2, 0)), (S_pad, S_pad, K_pad))
    wh_t = pad_to(jnp.transpose(Wh, (1, 2, 0)), (S_pad, S_pad, K_pad))
    q_t = pad_to(q.T, (G_pad, K_pad))

    grid = (K_pad // 128,)
    call = pl.pallas_call(
        functools.partial(_qcorr_kernel, k=k, T_pad=T_pad),
        out_shape=jax.ShapeDtypeStruct((T_pad, T_pad, K_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G_pad, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, S_pad, 128), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T_pad, T_pad, 128), lambda j: (0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )
    A = call(q_t, wvh_t)
    B = call(q_t, wh_t)
    A = jnp.transpose(A, (2, 0, 1))[:K, :T, :T]
    B = jnp.transpose(B, (2, 0, 1))[:K, :T, :T]
    return A, B
