"""Measure the stacked-vs-ring matcher crossover (VERDICT r3 item 7).

Hardware reality: this host drives ONE physical TPU chip, so a real
multi-chip ring cannot be timed here.  What CAN be measured, and what sets
``MatcherConfig.ring_min_kps``:

1. single-TPU-chip scaling of the matcher paths at K = 2k/4k/8k — the
   stacked whole-survey dispatch materializes a (pairs, K, K) f32 distance
   tensor (67 MB/pair at 4k, 268 MB/pair at 8k), so its wall and memory
   grow quadratically: the measured knee is where the ring's sharding of
   BOTH keypoint axes becomes necessary rather than optional;
2. the ring's collective overhead on the 8-device CPU mesh (ring vs
   single-device geo_nn_search on identical inputs) — an upper bound on the
   relative ppermute cost (ICI is faster than host shared memory).

Run: JAX_PLATFORMS default (TPU) for part 1; part 2 forces CPU devices.
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

from diasss_tpu.config import MatcherConfig
from diasss_tpu.features.detector import DetectedFeatures
from diasss_tpu.geometry import sonar


def _feats(K, rng, n_pings=512, n_bins=512):
    return DetectedFeatures(
        xy=jnp.asarray(rng.uniform(2, min(n_pings, n_bins) - 2, (K, 2)), jnp.float32),
        response=jnp.zeros(K, jnp.float32),
        angle=jnp.zeros(K, jnp.float32),
        size=jnp.full((K,), 31.0, jnp.float32),
        level=jnp.zeros(K, jnp.int32),
        desc=jnp.asarray(rng.normal(0, 60, (K, 128)), jnp.float32),
        valid=jnp.ones(K, bool),
    )


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    from diasss_tpu.matching.robust import robust_matching, robust_matching_stacked

    rng = np.random.default_rng(0)
    n_pings, n_bins = 512, 512
    gras = np.linspace(5.0, 40.0, n_bins // 2).astype(np.float32)
    dr = np.zeros((n_pings, 6), np.float32)
    dr[:, 3] = np.arange(n_pings) * 0.35
    geo = sonar.geo_image(jnp.asarray(dr[:, 3:5]), jnp.asarray(dr[:, 2]),
                          jnp.asarray(gras), n_bins)
    cfg = MatcherConfig(ratio_test=0.9)
    pair_ids = [(0, 1), (1, 2), (0, 2)]

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")
    for K in (2048, 4096, 8192):
        feats = [_feats(K, rng) for _ in range(3)]
        geos = [geo, geo, geo]

        def run_stacked():
            out = robust_matching_stacked(
                pair_ids, [0, 1, 2], feats, geos, [n_pings] * 3, cfg=cfg
            )
            return out

        def run_perpair():
            outs = {}
            for (i, j) in pair_ids:
                outs[(i, j)] = robust_matching(
                    i, j, feats[i], feats[j], geos[i], geos[j],
                    rows_s=n_pings, rows_t=n_pings, cfg=cfg,
                )
            return outs

        for name, fn in (("stacked", run_stacked), ("perpair", run_perpair)):
            try:
                fn()  # compile
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn()
                    best = min(best, time.perf_counter() - t0)
                mem = 3 * K * K * 4 / 1e6
                print(f"K={K:5d} {name:8s}: {best*1e3:8.1f} ms  "
                      f"(dist-tensor ~{mem:.0f} MB f32 for 3 pairs)", flush=True)
            except Exception as e:  # OOM at large K is a RESULT here
                print(f"K={K:5d} {name:8s}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                      flush=True)


if __name__ == "__main__":
    main()
