"""Micro-benchmark: formulations of the dense NCC search inner loop (TPU).

The automatic pipeline's dense matcher scores every source keypoint's
world-aligned patch (k x k = 17x17) against all candidate offsets (stride-1
extent T x T ~ 43x43) in the target raster — per keypoint, a 2D
cross-correlation.  Current implementation: lax.map over offsets, each step
gathering (K, G) patches from the GLOBAL raster + reducing (matching stage
measured 75 s on the auto bench survey).  Candidates:

A. current: map over offsets, gather from the global raster per offset;
B. local-window: gather each keypoint's (S, S) window ONCE, integral-image
   statistics, map over offsets gathering from the compact windows;
C. depthwise conv: lax.conv_general_dilated with feature_group_count=K on
   the stacked windows (per-keypoint kernels);
D. shift-accumulate: scan over the k*k kernel positions, each step one
   (K, T, T) elementwise FMA on the local windows (pure VPU).

All must produce the same raw correlation scores; this measures wall only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

K = 2000
k = 17  # patch side (geopatch_half=8)
R = 21  # stride-1 offset extent each side (search 10 m / 0.5 m + refine)
T = 2 * R + 1  # 43
S = T + k - 1  # 59: local window side
H = W = 768  # raster dims at the auto bench scale

rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(0, 1, (H, W)), jnp.float32)
q = jnp.asarray(rng.normal(0, 1, (K, k, k)), jnp.float32)
cy = jnp.asarray(rng.integers(R + k, H - R - k, K), jnp.int32)
cx = jnp.asarray(rng.integers(R + k, W - R - k, K), jnp.int32)


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def timeit(name, fn):
    fn()  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s}: {best*1e3:9.1f} ms", flush=True)


# ---- A. current shape: map over offsets, gather from the global raster ----
@jax.jit
def formulation_a():
    qa = q.reshape(K, k * k)
    d = jnp.arange(-(k // 2), k // 2 + 1)

    def score_at(off):
        yy = jnp.clip((cy + off[0])[:, None, None] + d[:, None], 0, H - 1)
        xx = jnp.clip((cx + off[1])[:, None, None] + d[None, :], 0, W - 1)
        v = img[yy, xx].reshape(-1, k * k)
        return jnp.einsum("kg,kg->k", qa, v)

    g = jnp.arange(-R, R + 1, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([oy.ravel(), ox.ravel()], axis=1)
    return jax.lax.map(score_at, offs, batch_size=2)


# ---- local windows (shared by B/C/D) ----
def windows():
    d = jnp.arange(-(S // 2), S // 2 + 1)
    yy = jnp.clip(cy[:, None, None] + d[:, None], 0, H - 1)
    xx = jnp.clip(cx[:, None, None] + d[None, :], 0, W - 1)
    return img[yy, xx]  # (K, S, S)


@jax.jit
def formulation_b():
    Wl = windows()
    qa = q.reshape(K, k * k)
    d = jnp.arange(k)

    def score_at(off):
        # off in [0, T) window coords
        yy = off[0][..., None, None] + d[:, None] if off[0].ndim else off[0] + d[:, None]
        v = jax.vmap(
            lambda w, oy, ox: jax.lax.dynamic_slice(w, (oy, ox), (k, k))
        )(Wl, jnp.broadcast_to(off[0], (K,)), jnp.broadcast_to(off[1], (K,)))
        return jnp.einsum("kg,kg->k", qa, v.reshape(K, k * k))

    g = jnp.arange(T, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([oy.ravel(), ox.ravel()], axis=1)
    return jax.lax.map(score_at, offs, batch_size=2)


@jax.jit
def formulation_c():
    Wl = windows()[None]  # (1, K, S, S): NCHW with K channels
    kern = q[:, None]  # (K, 1, k, k): O=K, I/g=1
    out = jax.lax.conv_general_dilated(
        Wl, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=K,
    )
    return out[0]  # (K, T, T)


@jax.jit
def formulation_d():
    Wl = windows()  # (K, S, S)

    def body(acc, i):
        dy, dx = i // k, i % k
        sl = jax.lax.dynamic_slice(Wl, (0, dy, dx), (K, T, T))
        return acc + q[:, dy, dx][:, None, None] * sl, None

    acc0 = jnp.zeros((K, T, T), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(k * k))
    return acc


print(f"K={K} k={k} T={T} (O={T*T} offsets)  backend={jax.default_backend()}",
      flush=True)
timeit("A map+global", formulation_a)
timeit("B map+windows", formulation_b)
timeit("C depthwise conv", formulation_c)
timeit("D shift-scan", formulation_d)

# cross-check C vs D on a small slice
c = np.asarray(formulation_c())
dd = np.asarray(formulation_d())
print("C vs D max diff:", float(np.abs(c - dd).max()), flush=True)
