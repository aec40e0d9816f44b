"""Roofline accounting for the hot paths (VERDICT r1 item 10).

"Speed-of-light" as numbers, not a slogan: for each hot program this script
reports flops + bytes (XLA ``cost_analysis`` for straight-line programs;
analytic per-iteration counts for dynamic-loop solvers, where XLA's static
cost model cannot see trip counts), measures steady-state wall time, and
compares achieved FLOP/s / bandwidth against chip peaks.

Chip peaks used (TPU v5e, public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM,
VPU f32 ~3.2 TFLOP/s (estimate).  Our solver/matcher matmuls run f32 at
``Precision.HIGHEST`` (6 bf16 passes on the MXU), so their practical MXU
ceiling is ~197/6 = 33 TFLOP/s.

Timing note: the remote (axon tunnel) backend neither synchronizes on
``block_until_ready`` nor transfers cheaply, so walls are measured over
``reps`` chained executions forced by fetching ONE scalar reduction, with the
scalar-fetch round-trip measured separately and subtracted.

Usage: python scripts/roofline.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--pings", type=int, default=3000)
parser.add_argument("--kps", type=int, default=2000)
parser.add_argument("--reps", type=int, default=10)
args = parser.parse_args()
if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6  # 6-pass f32 emulation on the MXU
PEAK_HBM = 819e9
PEAK_VPU = 3.2e12  # estimate


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _scalar(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    acc = jnp.float32(0)
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating):
            acc = acc + jnp.nan_to_num(jnp.asarray(l, jnp.float32)).sum()
    return acc


def wall(fn, *a, reps=args.reps):
    s = _scalar(fn(*a))
    float(s)  # warmup + sync
    t0 = time.perf_counter()
    float(_scalar(s))  # scalar round-trip on a ready value
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*a) for _ in range(reps)]
    float(_scalar([_scalar(o) for o in outs]))
    return max((time.perf_counter() - t0 - rtt), 1e-9) / reps


rows = []


def report(name, flops, bytes_, dt, peak_flops, note=""):
    fl = flops / dt
    bw = bytes_ / dt
    rows.append(
        (name, dt * 1e3, flops / 1e9, bytes_ / 1e6, fl / 1e12, bw / 1e9,
         100 * fl / peak_flops, 100 * bw / PEAK_HBM, note)
    )


# --- 1. pose-graph solve: analytic per-CG-matvec roofline ------------------
# (XLA cost_analysis cannot multiply dynamic while_loop trip counts, so the
#  solver is accounted analytically from the measured CG iteration total.)
from diasss_tpu.config import PoseGraphConfig
from diasss_tpu.geometry import se3
from diasss_tpu.solvers.pose_graph import PoseGraph, solve_pose_graph

P = args.pings
rng = np.random.default_rng(0)
# true straight track vs drifted DR: LC factors (from truth) contradict the
# odometry (from DR), so the solver does real LM/CG work
tt = np.zeros((P, 6), np.float32)
tt[:, 3] = np.arange(P) * 0.35
t = tt.copy()
t[:, 4] += np.cumsum(rng.normal(0, 0.02, P)).astype(np.float32)
step = np.diff(t, axis=0).astype(np.float32)
L = 64
lc_i = rng.integers(1, P // 2, L).astype(np.int32)
lc_j = (lc_i + P // 3).astype(np.int32)
lc_rows = np.zeros((L, 6), np.float32)
lc_rows[:, 3:6] = tt[lc_j, 3:6] - tt[lc_i, 3:6]
graph = PoseGraph(
    poses0=se3.from_rodrigues_xyz(jnp.asarray(t)),
    odo_meas=se3.from_rodrigues_xyz(jnp.asarray(step)),
    odo_sigmas=jnp.full((6,), 0.05, jnp.float32),
    lc_i=jnp.asarray(lc_i), lc_j=jnp.asarray(lc_j),
    lc_meas=se3.from_rodrigues_xyz(jnp.asarray(lc_rows)),
    lc_sigmas=jnp.full((L, 6), 0.05, jnp.float32),
    lc_valid=jnp.ones((L,), bool),
)
cfg = PoseGraphConfig()
compiled = jax.jit(lambda g: solve_pose_graph(g, cfg)).lower(graph).compile()
_, info = compiled(graph)
cg_total = float(np.asarray(info.cg_iters_total))
lm_iters = float(np.asarray(info.iterations))
dt = wall(compiled, graph)
F = P - 1 + L
# per matvec: 4 6x6 GEMVs per factor (fwd i,j + transpose i,j) + lam*D term
mv_flops = F * 4 * 72 + P * 72
# per matvec bytes: Ji, Jj re-read (F*2*36*4B) + v/out/D streams (~P*(24*4)B)
mv_bytes = F * 2 * 36 * 4 + P * (36 + 3 * 6) * 4
ai = mv_flops / mv_bytes
report(
    f"pose-graph CG matvec x{cg_total:.0f} (P={P})",
    mv_flops * cg_total, mv_bytes * cg_total, dt, PEAK_F32_HIGHEST,
    f"AI={ai:.2f} fl/B -> HBM-bound ceiling {PEAK_HBM*ai/1e12:.2f} TF/s; "
    f"{lm_iters:.0f} LM iters; linearization/preconditioner excluded",
)

# --- 2. matcher masked-matmul NN (the MXU path; straight-line program) -----
from diasss_tpu.config import MatcherConfig
from diasss_tpu.matching.geosearch import geo_nn_search

K = args.kps
geo_q = jnp.asarray(rng.uniform(0, 100, (K, 2)), jnp.float32)
geo_r = jnp.asarray(rng.uniform(0, 100, (K, 2)), jnp.float32)
desc_q = jnp.asarray(rng.standard_normal((K, 128)), jnp.float32)
desc_r = jnp.asarray(rng.standard_normal((K, 128)), jnp.float32)
vq = jnp.ones((K,), bool)
bbox = jnp.asarray([0.0, 100.0, 0.0, 100.0], jnp.float32)
mcfg = MatcherConfig()
f = jax.jit(lambda *a: geo_nn_search(*a, cfg=mcfg))
compiled = f.lower(geo_q, desc_q, vq, geo_r, desc_r, vq, bbox).compile()
fl, by = cost(compiled)
dt = wall(compiled, geo_q, desc_q, vq, geo_r, desc_r, vq, bbox)
report(f"geo_nn_search {K}x{K}x128", fl, by, dt, PEAK_F32_HIGHEST,
       "XLA cost_analysis; one (K,128)x(128,K) f32 HIGHEST matmul + masked reductions")

# --- 3. FAST Pallas kernel (VPU pipeline; XLA cost model can't see inside
#        the custom call, so flops/bytes are analytic: read + write once) ---
H, W = 4992, 1280
img = jnp.asarray(rng.rayleigh(20, (H, W)), jnp.float32)
if jax.default_backend() == "tpu":
    from diasss_tpu.features.fast_pallas import fast_score_pallas

    g = jax.jit(lambda x: fast_score_pallas(x, 12.0))
else:
    from diasss_tpu.features.fast import fast_score

    g = jax.jit(lambda x: fast_score(x, 12.0))
dt = wall(g, img)
an_bytes = H * W * 4 * 2
# per pixel: 16 circle diffs + win9 log-tree (16 lanes x 4 stages x 2 op kinds)
# + 2x15 final combines + select
an_flops = H * W * (16 + 16 * 4 * 2 + 31)
report(f"FAST-9 score {H}x{W}", an_flops, an_bytes, dt, PEAK_VPU,
       "VPU elementwise; flops/bytes analytic; %peak vs VPU estimate")

print(f"\nbackend={jax.default_backend()}  peaks: {PEAK_BF16/1e12:.0f} TF bf16 MXU, "
      f"{PEAK_F32_HIGHEST/1e12:.1f} TF f32-HIGHEST, {PEAK_VPU/1e12:.1f} TF VPU est, "
      f"{PEAK_HBM/1e9:.0f} GB/s HBM\n")
print(f"{'program':42s} {'ms':>8s} {'GFLOP':>8s} {'MB':>9s} {'TF/s':>6s} "
      f"{'GB/s':>7s} {'%peak':>6s} {'%HBM':>5s}")
for (name, ms, gf, mb, tf, gbs, pfl, phbm, note) in rows:
    print(f"{name:42s} {ms:8.2f} {gf:8.2f} {mb:9.1f} {tf:6.3f} {gbs:7.1f} "
          f"{pfl:6.1f} {phbm:5.1f}  {note}")
