"""Experiment: does drift-compensated re-matching rescue the automatic path?

Pass 1: detect -> match (geo gate centered on DR positions) -> full BA.
Pass 2: recompute every frame's geo image from the PASS-1 ESTIMATED poses,
re-match with the re-centered (and tighter) geo gate, re-solve warm-started.

Measures per pass: match count, match precision (vs ground-truth geo), ATE.
"""

import sys, os, dataclasses, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from diasss_tpu.config import DetectorConfig, MatcherConfig, PipelineConfig, PoseGraphConfig, FullBAConfig
from diasss_tpu.features import detect_features
from diasss_tpu.frame import build_keyframe
from diasss_tpu.geometry import se3, sonar
from diasss_tpu.matching import robust_matching
from diasss_tpu.pairs import get_kps_pairs, KpsPairs
from diasss_tpu.solvers.full_ba import build_ba_problem, solve_full_ba
from diasss_tpu.evaluate import trajectory_ate
from diasss_tpu.synthetic import make_survey


def match_all(frames, feats, geo_list, pair_ids, mcfg):
    corres = {i: [] for i in range(len(frames))}
    stats = []
    for (i, j) in pair_ids:
        m = robust_matching(
            frames[i].img_id, frames[j].img_id, feats[i], feats[j],
            geo_list[i], geo_list[j],
            rows_s=frames[i].raw.shape[0], rows_t=frames[j].raw.shape[0], cfg=mcfg,
        )
        if m.n_matches:
            corres[i].append(m.rows_s)
        stats.append((i, j, m.n_matches))
    return corres, stats


def precision(survey, rows_by_pair, n_bins=512):
    gt_geo = [
        sonar.geo_image(
            jnp.asarray(l.gt_poses[:, 3:5], jnp.float32),
            jnp.asarray(l.gt_poses[:, 2], jnp.float32),
            jnp.asarray(l.ground_ranges, jnp.float32), n_bins,
        )
        for l in survey.lines
    ]
    good = tot = 0
    for (i, rows_list) in rows_by_pair.items():
        for rows in rows_list:
            for row in rows:
                j = int(row[1])
                ps, bs, pt, bt = int(row[2]), int(row[3]), int(row[4]), int(row[5])
                g1 = np.asarray(gt_geo[i][ps, bs])
                g2 = np.asarray(gt_geo[j][pt, bt])
                tot += 1
                good += np.linalg.norm(g1 - g2) < 3.0
    return (good / tot if tot else float("nan")), tot


def assemble(frames, corres, pair_ids, geo_disc, geo_list):
    raw_pairs = {}
    for (i, j) in pair_ids:
        rows = np.concatenate(corres[i], axis=0) if corres[i] else np.zeros((0, 6))
        rows = rows[rows[:, 1] == frames[j].img_id] if len(rows) else rows
        kp = get_kps_pairs(
            rows, frames[j].img_id,
            np.asarray(frames[i].altitudes), np.asarray(frames[i].ground_ranges),
            np.asarray(frames[j].altitudes), np.asarray(frames[j].ground_ranges),
            use_anno=False, nadir_threshold=20, capacity=None,
        )
        raw_pairs[(i, j)] = kp
    cap = max([1] + [kp.pairs.shape[0] for kp in raw_pairs.values()])
    out = {}
    for key, kp in raw_pairs.items():
        padded = np.zeros((cap, 7), np.float32)
        padded[: kp.pairs.shape[0]] = kp.pairs
        valid = np.zeros(cap, bool)
        valid[: kp.valid.shape[0]] = kp.valid
        out[key] = KpsPairs(padded, valid)
    return out


def solve(frames, kps_pairs, pair_ids, pg_cfg, geo_disc, init_poses=None, geo_list=None):
    ba_cfg = FullBAConfig(max_geo_discrepancy=geo_disc)
    fr = frames
    if geo_list is not None:
        fr = [f._replace(geo=g) for f, g in zip(frames, geo_list)]
    prob = build_ba_problem(fr, kps_pairs, pair_ids, ba_cfg, pg_cfg, None)
    if init_poses is not None:
        prob = prob._replace(poses0=init_poses)
    poses, lms, info = solve_full_ba(prob, ba_cfg, PipelineConfig().kp_noise)
    n_used = int(np.asarray(prob.kp_valid).sum())
    return poses, n_used


def main():
    n_bins = 512
    survey = make_survey(
        n_lines=4, n_pings=400, n_bins=n_bins, n_landmarks=150,
        n_tie_lines=1, seed=3, drift_xy=0.008,
    )
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    gt_all = np.concatenate([l.gt_poses for l in survey.lines])
    dr_all = se3.from_rodrigues_xyz(jnp.asarray(np.concatenate([l.dr_poses for l in survey.lines]), jnp.float32))
    ate_dr = trajectory_ate(dr_all, gt_all)
    print(f"ATE DR: {ate_dr:.3f}")

    pair_ids = [(i, j) for i in range(len(frames)) for j in range(i + 1, len(frames))]
    # keep only overlapping pairs (adjacent mains + tie crossings)
    from diasss_tpu.geometry.sonar import bbox_iou_overlap
    pair_ids = [
        (i, j) for (i, j) in pair_ids
        if float(bbox_iou_overlap(frames[i].geo, frames[j].geo)) > 0.1
    ]
    print("pairs:", pair_ids)

    dcfg = DetectorConfig(n_features=800, desc_size_scale=8.0 / 31.0)
    t0 = time.time()
    feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
    print(f"detect: {time.time()-t0:.1f}s")

    mcfg = MatcherConfig(
        ratio_excl_radius=2.0, ratio_test=0.6, sift_dist_bound=450.0,
        cross_check=True, scc_mode="xy",
    )
    pg_cfg = PoseGraphConfig(use_anno=False, init_noise_xyz=0.0, init_noise_rpy_deg=0.0)

    geo_list = [f.geo for f in frames]
    poses = None
    for it in range(3):
        radius = 8.0 if it == 0 else 3.0
        disc = 4.0 if it == 0 else 2.0
        mc = dataclasses.replace(mcfg, geo_radius=radius)
        corres, stats = match_all(frames, feats, geo_list, pair_ids, mc)
        prec, tot = precision(survey, corres, n_bins)
        kps_pairs = assemble(frames, corres, pair_ids, disc, geo_list)
        poses, n_used = solve(frames, kps_pairs, pair_ids, pg_cfg, disc, init_poses=poses, geo_list=geo_list)
        ate = trajectory_ate(poses, gt_all)
        print(f"pass {it}: matches={tot} precision={prec:.2%} used_in_ba={n_used} ATE={ate:.3f}")
        # recompute geo from estimated poses
        est_rows = np.asarray(se3.to_rpyxyz(poses))
        off = 0
        geo_list = []
        for f in frames:
            n = f.dr_poses.shape[0]
            seg = est_rows[off : off + n]
            off += n
            geo_list.append(
                sonar.geo_image(
                    jnp.asarray(seg[:, 3:5], jnp.float32),
                    jnp.asarray(seg[:, 2], jnp.float32),
                    f.ground_ranges, n_bins,
                )
            )


if __name__ == "__main__":
    main()
