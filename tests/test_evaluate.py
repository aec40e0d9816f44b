"""Evaluator (C18) and trajectory-writer (C17) tests."""

import jax.numpy as jnp
import numpy as np

from diasss_tpu.evaluate import (
    eval_landmark_consistency,
    eval_landmark_consistency_stacked,
    trajectory_ate,
)
from diasss_tpu.geometry import se3, sonar
from diasss_tpu.trajectory import load_poses_rpy, save_poses_quat, save_poses_rpy


def scene(n_pings=40, n_bins=64):
    half = n_bins // 2
    gras = np.linspace(5, 40, half).astype(np.float32)
    rows = np.zeros((n_pings, 6), np.float32)
    rows[:, 3] = np.arange(n_pings)
    geo = sonar.geo_image(jnp.asarray(rows[:, 3:5]), jnp.asarray(rows[:, 2]), jnp.asarray(gras), n_bins)
    poses = se3.from_rodrigues_xyz(jnp.asarray(rows))
    return rows, gras, geo, poses, n_bins


class TestEval1:
    def test_perfect_poses_reproduce_geo(self):
        """With est == DR, the projection must equal the geo image -> fnl == ini."""
        rows, gras, geo, poses, n_bins = scene()
        pairs = np.asarray([[5, 40, 20.0, 9, 45, 21.0, 0]], np.float32)
        r = eval_landmark_consistency(
            pairs, geo, geo, jnp.asarray(gras), jnp.asarray(gras), poses, poses, n_bins
        )
        np.testing.assert_allclose(r.ini_dists, r.fnl_dists, atol=1e-3)

    def test_corrected_pose_improves(self):
        """Shifting the target pose toward the source projection reduces fnl."""
        rows, gras, geo, poses, n_bins = scene()
        rows2 = rows.copy()
        rows2[:, 4] += 2.0  # DR offset in y
        geo2 = sonar.geo_image(jnp.asarray(rows2[:, 3:5]), jnp.asarray(rows2[:, 2]), jnp.asarray(gras), n_bins)
        pairs = np.asarray([[5, 40, 20.0, 5, 40, 20.0, 0]], np.float32)
        # estimated poses = corrected (back at truth)
        est2 = se3.from_rodrigues_xyz(jnp.asarray(rows))
        r = eval_landmark_consistency(
            pairs, geo, geo2, jnp.asarray(gras), jnp.asarray(gras),
            poses, est2, n_bins,
        )
        assert r.fnl_dists[0] < r.ini_dists[0]
        assert r.improved_pct == 100.0

    def test_stacked_matches_per_pair(self):
        rows, gras, geo, poses, n_bins = scene()
        pairs = np.asarray(
            [[5, 40, 20.0, 9, 45, 21.0, 0], [7, 50, 22.0, 11, 41, 20.5, 0]], np.float32
        )
        ref = eval_landmark_consistency(
            pairs, geo, geo, jnp.asarray(gras), jnp.asarray(gras), poses, poses, n_bins
        )
        stacked = eval_landmark_consistency_stacked(
            pairs,
            np.zeros(2, np.int32),
            np.zeros(2, np.int32),
            [((0, 0), 0, 2)],
            jnp.stack([geo]),
            jnp.stack([jnp.asarray(gras)]),
            poses,
            np.asarray([0]),
            n_bins,
        )[(0, 0)]
        np.testing.assert_allclose(stacked.ini_dists, ref.ini_dists, atol=1e-4)
        np.testing.assert_allclose(stacked.fnl_dists, ref.fnl_dists, atol=1e-4)


class TestTrajectoryIO:
    def test_rpy_roundtrip(self, tmp_path, rng):
        rows = jnp.asarray(rng.normal(size=(10, 6)) * 0.3, jnp.float32)
        poses = se3.from_rodrigues_xyz(rows)
        p = str(tmp_path / "poses.txt")
        save_poses_rpy(p, poses)
        back = load_poses_rpy(p)
        # rpy output convention: rebuilding Rz Ry Rx from the dumped angles
        # must reproduce the rotation
        from diasss_tpu.geometry import so3

        R2 = np.asarray(so3.exp(jnp.zeros((10, 3))))  # placeholder shape
        for i in range(10):
            r, pch, y = back[i, :3]
            Rz = np.array([[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]])
            Ry = np.array([[np.cos(pch), 0, np.sin(pch)], [0, 1, 0], [-np.sin(pch), 0, np.cos(pch)]])
            Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]])
            np.testing.assert_allclose(Rz @ Ry @ Rx, np.asarray(poses.R[i]), atol=1e-5)
        np.testing.assert_allclose(back[:, 3:], np.asarray(poses.t), atol=1e-6)

    def test_quat_format(self, tmp_path, rng):
        rows = jnp.asarray(rng.normal(size=(4, 6)) * 0.3, jnp.float32)
        poses = se3.from_rodrigues_xyz(rows)
        p = str(tmp_path / "poses.txt")
        save_poses_quat(p, poses)
        data = np.loadtxt(p)
        assert data.shape == (4, 7)
        # qx qy qz qw tx ty tz with unit quaternion
        np.testing.assert_allclose(np.linalg.norm(data[:, :4], axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(data[:, 4:], np.asarray(poses.t), atol=1e-6)


class TestATE:
    def test_zero_for_identical(self, rng):
        rows = rng.normal(size=(20, 6)) * 0.2
        poses = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        assert trajectory_ate(poses, rows) < 1e-5

    def test_known_offset(self, rng):
        rows = rng.normal(size=(20, 6)) * 0.2
        poses = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
        shifted = se3.Pose3(poses.R, poses.t + jnp.asarray([3.0, 4.0, 0.0]))
        np.testing.assert_allclose(trajectory_ate(shifted, rows), 5.0, rtol=1e-5)


class TestATEPair:
    def test_matches_individual_calls(self, rng):
        """trajectory_ate_pair (one program + one fetch — round-5
        continuation) equals two trajectory_ate calls bit-for-bit."""
        from diasss_tpu.evaluate import trajectory_ate_pair

        gt = rng.normal(size=(30, 6)) * 0.2
        dr_rows = gt + rng.normal(size=(30, 6)) * 0.05
        est_rows = gt + rng.normal(size=(30, 6)) * 0.01
        dr = se3.from_rodrigues_xyz(jnp.asarray(dr_rows, jnp.float32))
        est = se3.from_rodrigues_xyz(jnp.asarray(est_rows, jnp.float32))
        ate_dr, ate_est = trajectory_ate_pair(
            jnp.asarray(dr_rows[:, 3:6], jnp.float32), est, gt
        )
        assert ate_dr == trajectory_ate(dr, gt)
        assert ate_est == trajectory_ate(est, gt)
        assert ate_est < ate_dr  # the tighter trajectory scores lower
