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
if cg_total > 0:
    # per matvec: 4 6x6 GEMVs per factor (fwd i,j + transpose i,j) + lam*D
    mv_flops = F * 4 * 72 + P * 72
    # per matvec bytes: Ji, Jj re-read + v/out/D streams
    mv_bytes = F * 2 * 36 * 4 + P * (36 + 3 * 6) * 4
    ai = mv_flops / mv_bytes
    report(
        f"pose-graph CG matvec x{cg_total:.0f} (P={P})",
        mv_flops * cg_total, mv_bytes * cg_total, dt, PEAK_F32_HIGHEST,
        f"AI={ai:.2f} fl/B -> HBM-bound ceiling {PEAK_HBM*ai/1e12:.2f} TF/s; "
        f"{lm_iters:.0f} LM iters; linearization/preconditioner excluded",
    )
else:
    # TPU-auto resolves to the zero-CG direct Woodbury step (round 4+):
    # price the per-trial multi-RHS chain solve (R = 6L+1 Woodbury cols)
    Rd = 6 * L + 1
    tr_flops = P * (6 * 72 * Rd + 2600)
    tr_bytes = P * 6 * Rd * 4 * 6
    report(
        f"pose-graph direct solve (P={P}, L={L})",
        tr_flops * lm_iters, tr_bytes * lm_iters, dt, PEAK_F32_HIGHEST,
        f"{lm_iters:.0f} zero-CG direct trials; flops=per-trial CR multi-RHS "
        "(R=6L+1) analytic; level-latency bound (see CR rows)",
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

# --- 4. direct-step multi-RHS chain factorization (round-5 rows: the
#        dominant cost of the zero-CG direct solvers).  CR is log2(P) levels
#        of narrow (n_odd, 6, 6/R) batched ops — analytic flops/bytes ------
from diasss_tpu.solvers.tridiag import (
    chain_factor,
    chain_solve,
    solve_block_tridiag_multi,
    thomas_block_tridiag_multi,
)

multi = (solve_block_tridiag_multi if jax.default_backend() == "tpu"
         else thomas_block_tridiag_multi)
Pba, Rba = 4200, 3 * 512 + 1  # bench full-BA shape (K_pad=512 Woodbury cols)
A = rng.standard_normal((Pba, 6, 6)).astype(np.float32)
Dch = jnp.asarray(A @ A.transpose(0, 2, 1) + 8 * np.eye(6, dtype=np.float32))
Uch = jnp.asarray(0.3 * rng.standard_normal((Pba - 1, 6, 6)).astype(np.float32))
Bch = jnp.asarray(rng.standard_normal((Pba, 6, Rba)).astype(np.float32))
cr = jax.jit(multi).lower(Dch, Uch, Bch).compile()
dt = wall(cr, Dch, Uch, Bch)
# per odd block per level: ~6 R-wide (6,6)@(6,R) GEMMs + 6x6 algebra;
# total odd blocks over all levels ~= P
an_flops = Pba * (6 * 72 * Rba + 2600)
an_bytes = Pba * 6 * Rba * 4 * 6  # ~6 (n_odd, 6, R) streams per level chain
report(f"CR multi-RHS chain P={Pba} R={Rba}", an_flops, an_bytes, dt,
       PEAK_F32_HIGHEST,
       "direct-BA step's solve; narrow 6-row levels -> level-latency bound, "
       "far from both roofs (why 'chain' GEMM refactor did not win: its "
       "(S,m,m) inversion costs what the levels save)")

# SPIKE per-device local piece at an 8-way partition of the same chain
# (the distributed direct step; boundary all_gather is O(n*R) floats and
# hardware-gated here — one physical chip)
Bloc = Pba // 8
crl = jax.jit(multi).lower(Dch[:Bloc], Uch[:Bloc - 1], Bch[:Bloc]).compile()
dt = wall(crl, Dch[:Bloc], Uch[:Bloc - 1], Bch[:Bloc])
report(f"SPIKE local chain B={Bloc} R={Rba}", an_flops / 8, an_bytes / 8, dt,
       PEAK_F32_HIGHEST,
       "per-device piece of the mesh direct step (+12 spike cols not "
       "counted); boundary exchange analytic: 8*2*(6*(R+12))*4B ~ "
       f"{8*2*6*(Rba+12)*4/1e6:.1f} MB all_gather per trial, ICI-gated")

# --- 5. dense matcher: stacked shift-scan program + Pallas q-corr kernel ---
if jax.default_backend() == "tpu":
    from diasss_tpu.matching.dense_pallas import qcorr_pallas

    Kd, kd, n_ring, sstep = 2000, 17, 20, 2
    Rr = n_ring + sstep - 1
    Td = 2 * Rr + 1
    Sd = Td + kd - 1
    Wvh = jnp.asarray(rng.random((6, Kd, Sd, Sd)).astype(np.float32))
    Whv = jnp.asarray((rng.random((6, Kd, Sd, Sd)) > 0.1).astype(np.float32))
    qd = jnp.asarray(rng.random((6, Kd, kd * kd)).astype(np.float32))
    kern = jax.jit(lambda a, b, c: jax.vmap(
        lambda x, y, z: qcorr_pallas(x, y, z, kd, Td))(a, b, c))
    dt = wall(kern, Wvh, Whv, qd)
    kf = 6 * 2 * (kd * kd) * 2 * Kd * Td * Td  # 2 maps x 2 flops x K x T^2 x k^2
    kb = 6 * (2 * Kd * Sd * Sd + 2 * Kd * Td * Td + Kd * kd * kd) * 4  # r/w once
    report(f"Pallas q-corr 6x(K={Kd},T={Td})", kf, kb, dt, PEAK_VPU,
           "VMEM-resident k^2-step accumulation; %peak vs VPU estimate — "
           "VPU-bound, the windows/maps stream once")

# --- 6. dense matcher: the full stacked 6-pair program (auto round 0) ------
from diasss_tpu.config import DenseMatchConfig, DetectorConfig
from diasss_tpu.matching import dense as dense_mod

Hd, Wd = 320, 320
det = DetectorConfig()
dmc = DenseMatchConfig()
imgs6 = jnp.asarray(rng.random((4, Hd, Wd)).astype(np.float32) * 255)
cnts6 = jnp.asarray((rng.random((4, Hd, Wd)) > 0.2).astype(np.float32))
ping6 = jnp.zeros((4, Hd, Wd), jnp.float32)
col6 = jnp.zeros((4, Hd, Wd), jnp.float32)
x0s6 = jnp.zeros((4,), jnp.float32)
y0s6 = jnp.zeros((4,), jnp.float32)
geo_k6 = jnp.asarray(rng.uniform(10, 140, (4, 2000, 2)).astype(np.float32))
kv6 = jnp.ones((4, 2000), bool)
si6 = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
ti6 = jnp.asarray([1, 2, 3, 2, 3, 3], jnp.int32)
prog = jax.jit(lambda *a: dense_mod._dense_pairs_program(
    *a, res=det.geopatch_res, half=det.geopatch_half, n_ring=20,
    step_cells=dmc.step_cells, ncc_min=dmc.ncc_min, ncc_ratio=dmc.ncc_ratio,
    min_cover=dmc.min_cover, radius=float(dmc.smooth_radius),
    min_neighbors=int(dmc.smooth_min_neighbors), tol=float(dmc.smooth_tol)))
compiled = prog.lower(imgs6, cnts6, ping6, col6, x0s6, y0s6, geo_k6, kv6,
                      si6, ti6).compile()
fl, by = cost(compiled)
dt = wall(compiled, imgs6, cnts6, ping6, col6, x0s6, y0s6, geo_k6, kv6,
          si6, ti6)
report("dense stacked 6-pair program nr=20", fl, by, dt, PEAK_VPU,
       "XLA cost_analysis (excl. Pallas custom-call flops); window slices + "
       "integral images + kernel + smooth filter — slice/gather bound")

# --- 7. 12k-pose direct solve latency floor --------------------------------
# the 12k bench solve is ~30 trials x ~28 ms; each trial's CR chain solve is
# log2(P) levels of narrow batched ops whose cost barely moves with R.
if jax.default_backend() == "tpu":
    P12 = 12288
    A = rng.standard_normal((P12, 6, 6)).astype(np.float32)
    D12 = jnp.asarray(A @ A.transpose(0, 2, 1) + 8 * np.eye(6, dtype=np.float32))
    U12 = jnp.asarray(0.3 * rng.standard_normal((P12 - 1, 6, 6)).astype(np.float32))
    for R12 in (1, 385):
        B12 = jnp.asarray(rng.standard_normal((P12, 6, R12)).astype(np.float32))
        c12 = jax.jit(multi).lower(D12, U12, B12).compile()
        dt = wall(c12, D12, U12, B12)
        lv = int(np.ceil(np.log2(P12)))
        report(f"CR chain P={P12} R={R12}", Pba * 0 + P12 * (6 * 72 * R12 + 2600),
               P12 * 6 * R12 * 4 * 6, dt, PEAK_F32_HIGHEST,
               f"{lv} down + {lv} up levels -> ~{dt*1e3/(2*lv):.2f} ms/level; "
               "R-invariance = level-latency floor of the 12k direct trial")

print(f"\nbackend={jax.default_backend()}  peaks: {PEAK_BF16/1e12:.0f} TF bf16 MXU, "
      f"{PEAK_F32_HIGHEST/1e12:.1f} TF f32-HIGHEST, {PEAK_VPU/1e12:.1f} TF VPU est, "
      f"{PEAK_HBM/1e9:.0f} GB/s HBM\n")
print(f"{'program':42s} {'ms':>8s} {'GFLOP':>8s} {'MB':>9s} {'TF/s':>6s} "
      f"{'GB/s':>7s} {'%peak':>6s} {'%HBM':>5s}")
for (name, ms, gf, mb, tf, gbs, pfl, phbm, note) in rows:
    print(f"{name:42s} {ms:8.2f} {gf:8.2f} {mb:9.1f} {tf:6.3f} {gbs:7.1f} "
          f"{pfl:6.1f} {phbm:5.1f}  {note}")
