"""Multi-chip scaling-efficiency measurement (BASELINE.md: >=80% target).

Measures the sharded loop-closure batch solve and the sharded pose-graph solve
at mesh sizes 1..8.  On this machine the mesh is 8 virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — it validates the sharding
mechanism and measures parallel efficiency of the partitioned computation; on a
real slice the same code rides ICI.

CAVEAT (printed at runtime too): virtual CPU devices share the machine's
physical cores — the XLA CPU backend already multithreads a single device across
them, so "efficiency" here saturates quickly and is NOT a statement about real
multi-chip scaling.  The measurement validates that the sharded program
compiles, runs, and partitions correctly; real efficiency numbers require a
multi-chip slice.

Usage: python scripts/scaling_bench.py [--pings N] [--lc K]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

parser = argparse.ArgumentParser()
parser.add_argument("--pings", type=int, default=512)
parser.add_argument("--lc", type=int, default=1024)
args = parser.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig
from diasss_tpu.geometry import sonar
from diasss_tpu.parallel.shard import make_mesh, sharded_lc_solve

n_pings, n_bins = args.pings, 64
half = n_bins // 2
rng = np.random.default_rng(0)
gras = np.linspace(5.0, 40.0, half).astype(np.float32)
dr_s = np.zeros((n_pings, 6), np.float32)
dr_s[:, 3] = np.arange(n_pings) * 0.35
dr_t = dr_s.copy()
dr_t[:, 4] += 30.0
dr_t[:, 2] = np.pi
alts = np.full((n_pings,), 12.0, np.float32)
geo_s = sonar.geo_image(jnp.asarray(dr_s[:, 3:5]), jnp.asarray(dr_s[:, 2]), jnp.asarray(gras), n_bins)
geo_t = sonar.geo_image(jnp.asarray(dr_t[:, 3:5]), jnp.asarray(dr_t[:, 2]), jnp.asarray(gras), n_bins)

K = args.lc
sr = float(np.sqrt(12.0**2 + 20.0**2))
pairs = np.zeros((K, 7), np.float32)
pairs[:, 0] = rng.integers(1, n_pings - 1, K)
pairs[:, 1] = rng.integers(half + 25, n_bins - 2, K)
pairs[:, 2] = sr
pairs[:, 3] = rng.integers(1, n_pings - 1, K)
pairs[:, 4] = rng.integers(half + 25, n_bins - 2, K)
pairs[:, 5] = sr
valid = np.ones(K, bool)

print("NOTE: virtual CPU mesh — devices share physical cores; this validates the")
print("sharded program, it does not measure real multi-chip scaling (see docstring).")
results = {}
for n_dev in [1, 2, 4, 8]:
    mesh = make_mesh(n_dev)
    cfg = LoopClosureConfig(max_lm_iters=20)

    def run():
        r = sharded_lc_solve(
            mesh,
            jnp.asarray(pairs), jnp.asarray(valid),
            jnp.asarray(dr_s), jnp.asarray(dr_t), geo_s, geo_t,
            jnp.asarray(alts), jnp.asarray(alts), jnp.asarray(gras),
            n_bins=n_bins, kp_cfg=KeypointNoiseConfig(), cfg=cfg,
        )
        jax.block_until_ready(r.quality)
        return r

    run()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    results[n_dev] = K / dt
    base = results[1]
    eff = results[n_dev] / (base * n_dev) * 100
    print(f"devices={n_dev}: {results[n_dev]:,.0f} LC solves/s  "
          f"speedup {results[n_dev]/base:.2f}x  efficiency {eff:.0f}%")
