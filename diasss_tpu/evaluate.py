"""Annotation-based evaluation — the reference's quantitative metrics, batched.

Implements both evaluator options of ``Optimizer::EvaluateByAnnos{,All}``
(/root/reference/src/core/optimizer.cpp:1216-1886):

* **eval_1** (landmark geo-consistency, :1383-1496 / :1764-1883): for every
  annotated keypoint pair, the geo distance between the two projections of the
  same landmark under DR poses vs estimated poses; reports the improved
  fraction ("Metric Statics") and average |x| / |y| / norm distances.
* **eval_2** (triangulated consistency, :1285-1380 / :1581-1762): triangulate
  the landmark from both observations under DR and estimated poses; report
  range and plane residual errors.

Plus a ground-truth ATE (available for synthetic surveys — the reference's
bundled data has no GT trajectory, SURVEY §6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import KeypointNoiseConfig, LoopClosureConfig
from .geometry import se3, sonar


class Eval1Result(NamedTuple):
    improved_pct: float  # "Metric Statics" (optimizer.cpp:1865-1868)
    n_pairs: int
    avg_x_dr: float
    avg_x_est: float
    avg_y_dr: float
    avg_y_est: float
    avg_norm_dr: float
    avg_norm_est: float
    ini_dists: np.ndarray  # per-pair (dr_lm_dist_*.txt)
    fnl_dists: np.ndarray  # per-pair (est_lm_dist_*.txt)


_E0 = np.zeros(0)


class Eval2Result(NamedTuple):
    range_improved_pct: float
    plane_improved_pct: float
    n_pairs: int
    avg_range_dr: float
    avg_range_est: float
    avg_plane_dr: float
    avg_plane_est: float
    # per-correspondence error columns — the reference writes these per pair
    # as result/pr_errors/{dr,est}_{range,plane}_e_<i>.txt (optimizer.cpp:1605-1612)
    range_dr_e: np.ndarray = _E0
    range_est_e: np.ndarray = _E0
    plane_dr_e: np.ndarray = _E0
    plane_est_e: np.ndarray = _E0


def eval_landmark_consistency(
    pairs: np.ndarray,  # (K, 7) valid kps-pair rows for one frame pair
    geo_s: jnp.ndarray,
    geo_t: jnp.ndarray,
    gras_s: jnp.ndarray,
    gras_t: jnp.ndarray,
    est_s: se3.Pose3,  # (Ns,) estimated poses of the source frame
    est_t: se3.Pose3,  # (Nt,)
    n_bins: int,
) -> Eval1Result:
    """eval_1: DR geo-projection distance vs estimated-pose projection distance."""
    if len(pairs) == 0:
        nan = float("nan")
        z = np.zeros(0)
        return Eval1Result(nan, 0, nan, nan, nan, nan, nan, nan, z, z)

    p = jnp.asarray(pairs)
    id_s = p[:, 0].astype(jnp.int32)
    bin_s = p[:, 1].astype(jnp.int32)
    id_t = p[:, 3].astype(jnp.int32)
    bin_t = p[:, 4].astype(jnp.int32)

    g_s = geo_s[id_s, bin_s]
    g_t = geo_t[id_t, bin_t]
    ini_xy = g_s - g_t
    ini = jnp.linalg.norm(ini_xy, axis=-1)

    from .geometry import so3

    pose_s = est_s[id_s]
    pose_t = est_t[id_t]
    proj_s = sonar.project_landmark_geo(pose_s.t[:, :2], so3.yaw(pose_s.R), bin_s, gras_s, n_bins)
    proj_t = sonar.project_landmark_geo(pose_t.t[:, :2], so3.yaw(pose_t.R), bin_t, gras_t, n_bins)
    fnl_xy = proj_s - proj_t
    fnl = jnp.linalg.norm(fnl_xy, axis=-1)

    # one batched transfer (per-array np.asarray costs one tunnel RTT each)
    ini_np, fnl_np, ini_xy_np, fnl_xy_np = jax.device_get(
        (ini, fnl, ini_xy, fnl_xy)
    )
    n = len(ini_np)
    return Eval1Result(
        improved_pct=float((ini_np > fnl_np).mean() * 100.0),
        n_pairs=n,
        avg_x_dr=float(np.abs(ini_xy_np[:, 0]).mean()),
        avg_x_est=float(np.abs(fnl_xy_np[:, 0]).mean()),
        avg_y_dr=float(np.abs(ini_xy_np[:, 1]).mean()),
        avg_y_est=float(np.abs(fnl_xy_np[:, 1]).mean()),
        avg_norm_dr=float(ini_np.mean()),
        avg_norm_est=float(fnl_np.mean()),
        ini_dists=ini_np,
        fnl_dists=fnl_np,
    )


def eval_triangulated_consistency(
    pairs: np.ndarray,
    dr_s: jnp.ndarray,
    dr_t: jnp.ndarray,
    geo_s: jnp.ndarray,
    geo_t: jnp.ndarray,
    alts_s: jnp.ndarray,
    alts_t: jnp.ndarray,
    est_s: se3.Pose3,
    est_t: se3.Pose3,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    lc_cfg: LoopClosureConfig = LoopClosureConfig(),
) -> Eval2Result:
    """eval_2: triangulated landmark range/plane residuals, DR vs estimated."""
    from .solvers.triangulate import triangulate_batch

    if len(pairs) == 0:
        nan = float("nan")
        return Eval2Result(nan, nan, 0, nan, nan, nan, nan)

    p = jnp.asarray(pairs)
    id_s = p[:, 0].astype(jnp.int32)
    bin_s = p[:, 1].astype(jnp.int32)
    id_t = p[:, 3].astype(jnp.int32)
    bin_t = p[:, 4].astype(jnp.int32)
    sr_s, sr_t = p[:, 2], p[:, 5]
    K = p.shape[0]

    Tp_s_dr = se3.from_rodrigues_xyz(dr_s[id_s])
    Tp_t_dr = se3.from_rodrigues_xyz(dr_t[id_t])
    Ts = se3.identity((K,), p.dtype)

    x_bar = 0.5 * (geo_s[id_s, bin_s, 0] + geo_t[id_t, bin_t, 0])
    y_bar = 0.5 * (geo_s[id_s, bin_s, 1] + geo_t[id_t, bin_t, 1])
    z_bar = 0.5 * ((dr_s[id_s, 5] - alts_s[id_s]) + (dr_t[id_t, 5] - alts_t[id_t]))
    L0 = jnp.stack([x_bar, y_bar, z_bar], axis=-1)

    def errors(Tp_s, Tp_t):
        lm = triangulate_batch(Tp_s, Tp_t, Ts, Ts, sr_s, sr_t, L0, kp_cfg, lc_cfg, True)
        l_s = se3.transform_to(Tp_s, lm)
        l_t = se3.transform_to(Tp_t, lm)
        range_e = 0.5 * (
            jnp.abs(jnp.linalg.norm(l_s, axis=-1) - sr_s)
            + jnp.abs(jnp.linalg.norm(l_t, axis=-1) - sr_t)
        )
        plane_e = 0.5 * (jnp.abs(l_s[:, 0]) + jnp.abs(l_t[:, 0]))
        return jax.device_get((range_e, plane_e))  # one batched transfer

    r_dr, p_dr = errors(Tp_s_dr, Tp_t_dr)
    r_est, p_est = errors(est_s[id_s], est_t[id_t])

    return Eval2Result(
        range_improved_pct=float((r_dr > r_est).mean() * 100.0),
        plane_improved_pct=float((p_dr > p_est).mean() * 100.0),
        n_pairs=int(K),
        avg_range_dr=float(r_dr.mean()),
        avg_range_est=float(r_est.mean()),
        avg_plane_dr=float(p_dr.mean()),
        avg_plane_est=float(p_est.mean()),
        range_dr_e=r_dr,
        range_est_e=r_est,
        plane_dr_e=p_dr,
        plane_est_e=p_est,
    )


@jax.jit
def _ate_device(est_t, gt_rows):
    # one program: the op-by-op Rodrigues chain cost ~10 dispatches
    gt = se3.from_rodrigues_xyz(gt_rows)
    d = est_t - gt.t
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1)))


def trajectory_ate(est: se3.Pose3, gt_rows: np.ndarray) -> float:
    """RMSE of translation error vs ground truth (no alignment — the gauge is
    fixed at the first pose, matching how the reference anchors its graph)."""
    return float(_ate_device(est.t, jnp.asarray(gt_rows, jnp.float32)))


@jax.jit
def _ate_pair_device(dr_t, est_t, gt_rows):
    gt = se3.from_rodrigues_xyz(gt_rows)

    def rmse(t):
        d = t - gt.t
        return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1)))

    return rmse(dr_t), rmse(est_t)


def trajectory_ate_pair(dr_t: jnp.ndarray, est: se3.Pose3,
                        gt_rows: np.ndarray) -> tuple:
    """``(ate_dr, ate_est)`` in ONE device program and ONE fetch.

    The previous form cost three tunnel round trips per run: a full DR-rows
    device->host fetch, then one scalar fetch per :func:`trajectory_ate`
    call (pipeline evaluation stage, ~0.15 s at the 3k bench point —
    PERF round 5).  ``dr_t`` is the (P, 3) DR translation column, taken
    directly from the device-resident ``Keyframe.dr_poses`` rows."""
    a, b = jax.device_get(
        _ate_pair_device(dr_t, est.t, jnp.asarray(gt_rows, jnp.float32))
    )
    return float(a), float(b)


def eval_landmark_consistency_stacked(
    pairs_cat: np.ndarray,  # (K, 7) concatenated valid rows of all frame pairs
    src_frame: np.ndarray,  # (K,) source frame index per row
    tgt_frame: np.ndarray,  # (K,) target frame index per row
    blocks: list,  # [(key, start, stop)] slices into the K rows per frame pair
    geo_all: jnp.ndarray,  # (F, N, M, 2)
    gras_all: jnp.ndarray,  # (F, G)
    est_poses: se3.Pose3,  # (P,) global solved poses
    frame_offsets: np.ndarray,  # (F,) global pose offset of each frame
    n_bins: int,
):
    """eval_1 for every frame pair in ONE device dispatch (same math as
    :func:`eval_landmark_consistency`, gathers over stacked frame tensors)."""
    from .geometry import so3

    if len(pairs_cat) == 0:
        return {key: eval_landmark_consistency(np.zeros((0, 7)), None, None, None, None, None, None, n_bins) for key, _, _ in blocks}

    p = jnp.asarray(pairs_cat)
    sf = jnp.asarray(src_frame)
    tf = jnp.asarray(tgt_frame)
    id_s = p[:, 0].astype(jnp.int32)
    bin_s = p[:, 1].astype(jnp.int32)
    id_t = p[:, 3].astype(jnp.int32)
    bin_t = p[:, 4].astype(jnp.int32)

    g_s = geo_all[sf, id_s, bin_s]
    g_t = geo_all[tf, id_t, bin_t]
    ini_xy = g_s - g_t
    ini = jnp.linalg.norm(ini_xy, axis=-1)

    off = jnp.asarray(frame_offsets)
    pose_s = est_poses[off[sf] + id_s]
    pose_t = est_poses[off[tf] + id_t]
    proj_s = _project_rows(pose_s, bin_s, gras_all, sf, n_bins)
    proj_t = _project_rows(pose_t, bin_t, gras_all, tf, n_bins)
    fnl_xy = proj_s - proj_t
    fnl = jnp.linalg.norm(fnl_xy, axis=-1)

    ini_np, fnl_np, ini_xy_np, fnl_xy_np = jax.device_get(
        (ini, fnl, ini_xy, fnl_xy)
    )  # one batched transfer

    out = {}
    for key, a, b in blocks:
        if b <= a:
            nan = float("nan")
            out[key] = Eval1Result(nan, 0, nan, nan, nan, nan, nan, nan, np.zeros(0), np.zeros(0))
            continue
        i_sl = ini_np[a:b]
        f_sl = fnl_np[a:b]
        ixy = ini_xy_np[a:b]
        fxy = fnl_xy_np[a:b]
        out[key] = Eval1Result(
            improved_pct=float((i_sl > f_sl).mean() * 100.0),
            n_pairs=int(b - a),
            avg_x_dr=float(np.abs(ixy[:, 0]).mean()),
            avg_x_est=float(np.abs(fxy[:, 0]).mean()),
            avg_y_dr=float(np.abs(ixy[:, 1]).mean()),
            avg_y_est=float(np.abs(fxy[:, 1]).mean()),
            avg_norm_dr=float(i_sl.mean()),
            avg_norm_est=float(f_sl.mean()),
            ini_dists=i_sl,
            fnl_dists=f_sl,
        )
    return out


def _project_rows(pose: se3.Pose3, col, gras_all, frame_idx, n_bins: int):
    """project_landmark_geo with a per-row ground-range table gather."""
    from .geometry import so3

    half = n_bins // 2
    g_idx = jnp.clip(jnp.abs(col - half), 0, gras_all.shape[1] - 1)
    gr = gras_all[frame_idx, g_idx]
    yaw = so3.yaw(pose.R)
    port_side = col < half
    ang = jnp.where(port_side, yaw + jnp.pi / 2 - jnp.pi, yaw - jnp.pi / 2 - jnp.pi)
    x = pose.t[:, 0] + gr * jnp.cos(ang)
    y = pose.t[:, 1] + gr * jnp.sin(ang)
    return jnp.stack([x, y], axis=-1)


def eval_triangulated_consistency_stacked(
    pairs_cat: np.ndarray,  # (K, 7) concatenated valid rows
    src_frame: np.ndarray,
    tgt_frame: np.ndarray,
    blocks: list,  # [(key, start, stop)]
    dr_all: jnp.ndarray,  # (F, N, 6)
    geo_all: jnp.ndarray,  # (F, N, M, 2)
    alts_all: jnp.ndarray,  # (F, N)
    est_poses: se3.Pose3,  # (P,)
    frame_offsets: np.ndarray,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    lc_cfg: LoopClosureConfig = LoopClosureConfig(),
):
    """eval_2 for every frame pair in one batched triangulation run."""
    from .solvers.triangulate import triangulate_batch

    if len(pairs_cat) == 0:
        nan = float("nan")
        return {key: Eval2Result(nan, nan, 0, nan, nan, nan, nan) for key, _, _ in blocks}

    p = jnp.asarray(pairs_cat)
    sf = jnp.asarray(src_frame)
    tf = jnp.asarray(tgt_frame)
    id_s = p[:, 0].astype(jnp.int32)
    bin_s = p[:, 1].astype(jnp.int32)
    id_t = p[:, 3].astype(jnp.int32)
    bin_t = p[:, 4].astype(jnp.int32)
    sr_s, sr_t = p[:, 2], p[:, 5]
    K = p.shape[0]

    row_s = dr_all[sf, id_s]
    row_t = dr_all[tf, id_t]
    Tp_s_dr = se3.from_rodrigues_xyz(row_s)
    Tp_t_dr = se3.from_rodrigues_xyz(row_t)
    Ts = se3.identity((K,), p.dtype)

    g_s = geo_all[sf, id_s, bin_s]
    g_t = geo_all[tf, id_t, bin_t]
    z_bar = 0.5 * ((row_s[:, 5] - alts_all[sf, id_s]) + (row_t[:, 5] - alts_all[tf, id_t]))
    L0 = jnp.concatenate([0.5 * (g_s + g_t), z_bar[:, None]], axis=1)

    off = jnp.asarray(frame_offsets)
    est_s = est_poses[off[sf] + id_s]
    est_t = est_poses[off[tf] + id_t]

    def errors(Tp_s, Tp_t):
        lm = triangulate_batch(Tp_s, Tp_t, Ts, Ts, sr_s, sr_t, L0, kp_cfg, lc_cfg, True)
        l_s = se3.transform_to(Tp_s, lm)
        l_t = se3.transform_to(Tp_t, lm)
        range_e = 0.5 * (
            jnp.abs(jnp.linalg.norm(l_s, axis=-1) - sr_s)
            + jnp.abs(jnp.linalg.norm(l_t, axis=-1) - sr_t)
        )
        plane_e = 0.5 * (jnp.abs(l_s[:, 0]) + jnp.abs(l_t[:, 0]))
        return jax.device_get((range_e, plane_e))  # one batched transfer

    r_dr, p_dr = errors(Tp_s_dr, Tp_t_dr)
    r_est, p_est = errors(est_s, est_t)

    out = {}
    for key, a, b in blocks:
        if b <= a:
            nan = float("nan")
            out[key] = Eval2Result(nan, nan, 0, nan, nan, nan, nan)
            continue
        out[key] = Eval2Result(
            range_improved_pct=float((r_dr[a:b] > r_est[a:b]).mean() * 100.0),
            plane_improved_pct=float((p_dr[a:b] > p_est[a:b]).mean() * 100.0),
            n_pairs=int(b - a),
            avg_range_dr=float(r_dr[a:b].mean()),
            avg_range_est=float(r_est[a:b].mean()),
            avg_plane_dr=float(p_dr[a:b].mean()),
            avg_plane_est=float(p_est[a:b].mean()),
            range_dr_e=r_dr[a:b],
            range_est_e=r_est[a:b],
            plane_dr_e=p_dr[a:b],
            plane_est_e=p_est[a:b],
        )
    return out
