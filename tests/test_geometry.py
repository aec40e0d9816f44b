"""Geometry core tests: SO(3)/SE(3) round trips, GTSAM conventions, sonar model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.geometry import se3, so3, sonar


def random_w(rng, n=32, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # restrict to |w| < pi: exp is not injective beyond the principal domain
        w = random_w(rng, scale=0.8)
        w = jnp.clip(w, -1.7, 1.7)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_exp_small_angle(self, rng):
        w = random_w(rng, scale=1e-6)
        R = so3.exp(w)
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(so3.hat(w)), atol=1e-8)

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        w = jnp.asarray(axis * (np.pi - 1e-4), jnp.float32)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)

    def test_orthonormal(self, rng):
        R = so3.exp(random_w(rng))
        eye = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(eye, R.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_rpy_convention(self, rng):
        """R == Rz(yaw) Ry(pitch) Rx(roll) for extracted rpy."""
        R = so3.exp(random_w(rng, scale=0.5))
        r, p, y = [np.asarray(a) for a in jnp.moveaxis(so3.rpy(R), -1, 0)]

        def rot_z(a):
            return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

        def rot_y(a):
            return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

        def rot_x(a):
            return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

        for i in range(R.shape[0]):
            np.testing.assert_allclose(rot_z(y[i]) @ rot_y(p[i]) @ rot_x(r[i]), np.asarray(R[i]), atol=1e-5)

    def test_quaternion_roundtrip(self, rng):
        R = so3.exp(random_w(rng))
        q = np.asarray(so3.to_quaternion(R))
        # rebuild rotation from quaternion
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        R2 = np.stack(
            [
                np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
                np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
                np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
            ],
            axis=-2,
        )
        np.testing.assert_allclose(np.asarray(R), R2, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.8, jnp.float32)
        # keep the rotation part inside the principal domain (see SO3 test)
        xi = xi.at[:, :3].set(jnp.clip(xi[:, :3], -1.7, 1.7))
        xi2 = se3.logmap(se3.expmap(xi))
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=3e-5)

    def test_compose_inverse(self, rng):
        a = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        b = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        ab = se3.compose(a, b)
        b2 = se3.compose(se3.inverse(a), ab)
        np.testing.assert_allclose(np.asarray(b.R), np.asarray(b2.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.t), np.asarray(b2.t), atol=1e-5)

    def test_between(self, rng):
        a = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        b = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        d = se3.between(a, b)
        b2 = se3.compose(a, d)
        np.testing.assert_allclose(np.asarray(b.t), np.asarray(b2.t), atol=1e-5)

    def test_transform_roundtrip(self, rng):
        a = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        p = jnp.asarray(rng.normal(size=(8, 3)) * 10, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(se3.transform_from(a, se3.transform_to(a, p))), np.asarray(p), atol=1e-4
        )

    def test_retract_local_inverse(self, rng):
        a = se3.expmap(jnp.asarray(rng.normal(size=(8, 6)), jnp.float32))
        xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.3, jnp.float32)
        b = se3.retract(a, xi)
        np.testing.assert_allclose(np.asarray(se3.local(a, b)), np.asarray(xi), atol=1e-5)

    def test_from_rodrigues_xyz(self, rng):
        rows = jnp.asarray(rng.normal(size=(5, 6)), jnp.float32)
        pose = se3.from_rodrigues_xyz(rows)
        np.testing.assert_allclose(np.asarray(pose.R), np.asarray(so3.exp(rows[:, :3])), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pose.t), np.asarray(rows[:, 3:]), atol=1e-6)


class TestSonar:
    def test_slant_range(self):
        sr = sonar.slant_range(jnp.asarray(3.0), jnp.asarray(4.0))
        assert float(sr) == pytest.approx(5.0)

    def test_ground_range_index_symmetry(self):
        n_bins = 10
        cols = jnp.arange(n_bins)
        idx = np.asarray(sonar.ground_range_index(cols, n_bins))
        # starboard: 0,1,2,3,4 at cols 5..9 ; port mirrors (clamped at col 0)
        np.testing.assert_array_equal(idx[5:], [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(idx[:5], [4, 4, 3, 2, 1])  # col0 clamped 5->4

    def test_geo_image_matches_reference_loops(self, rng):
        """Vectorized geo image == direct transcription of frame.cpp:134-152."""
        n_pings, n_bins = 7, 12
        half = n_bins // 2
        pose = rng.normal(size=(n_pings, 6))
        grange = np.abs(rng.normal(size=(half,))) * 30
        geo = np.asarray(
            sonar.geo_image(
                jnp.asarray(pose[:, 3:5], jnp.float32),
                jnp.asarray(pose[:, 2], jnp.float32),
                jnp.asarray(grange, jnp.float32),
                n_bins,
            )
        )
        # reference loops (frame.cpp:134-152) with the OOB port read clamped
        ref = np.zeros((n_pings, n_bins, 2))
        for i in range(n_pings):
            count = 0
            for j in range(half, n_bins):
                ref[i, j, 0] = pose[i, 3] + grange[count] * np.cos(pose[i, 2] + np.pi / 2)
                ref[i, j, 1] = pose[i, 4] + grange[count] * np.sin(pose[i, 2] + np.pi / 2)
                count += 1
            for j in range(0, half):
                g = grange[min(count, half - 1)]  # clamp reference's OOB read
                ref[i, j, 0] = pose[i, 3] + g * np.cos(pose[i, 2] - np.pi / 2)
                ref[i, j, 1] = pose[i, 4] + g * np.sin(pose[i, 2] - np.pi / 2)
                count -= 1
        np.testing.assert_allclose(geo, ref, atol=1e-4)

    def test_bbox_iou(self):
        a = jnp.asarray(np.stack(np.meshgrid(np.linspace(0, 10, 5), np.linspace(0, 10, 5)), -1))
        b = a + 5.0
        iou = float(sonar.bbox_iou_overlap(a, b))
        # boxes 10x10 overlapping 5x5: 25 / (100+100-25)
        assert iou == pytest.approx(25.0 / 175.0, rel=1e-5)
        c = a + 20.0
        assert float(sonar.bbox_iou_overlap(a, c)) == 0.0

    def test_nadir_mask(self):
        keep = sonar.nadir_mask(jnp.asarray([100, 510]), jnp.asarray([100, 100]), 512, 512)
        np.testing.assert_array_equal(np.asarray(keep), [True, False])
