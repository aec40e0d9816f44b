"""Feature pipeline tests: FAST semantics, pyramid, orientation, SIFT invariances."""

import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.config import DetectorConfig
from diasss_tpu.features.detector import detect_features, features_per_level
from diasss_tpu.features.fast import fast_score, nms3
from diasss_tpu.features.orient import ic_angles
from diasss_tpu.features.pyramid import build_pyramid, gaussian_blur, pyramid_shapes
from diasss_tpu.features.sift import sift_descriptors


def corner_image(n=64, val=200.0):
    """A bright square on dark background: strong corners at its vertices."""
    img = np.full((n, n), 30.0)
    img[20:44, 20:44] = val
    return jnp.asarray(img)


class TestFast:
    def test_detects_square_corners(self):
        score = nms3(fast_score(corner_image(), 12.0))
        ys, xs = np.nonzero(np.asarray(score) > 0)
        pts = set(zip(ys.tolist(), xs.tolist()))
        # corners of the square must respond (within 2 px)
        for cy, cx in [(20, 20), (20, 43), (43, 20), (43, 43)]:
            assert any(abs(y - cy) <= 2 and abs(x - cx) <= 2 for (y, x) in pts), (cy, cx)

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        assert float(jnp.sum(fast_score(img, 7.0))) == 0.0

    def test_edge_not_corner(self):
        """A straight edge has 8-contiguous arcs at most — below FAST-9."""
        img = np.full((64, 64), 30.0)
        img[:, 32:] = 200.0
        score = fast_score(jnp.asarray(img), 12.0)
        inner = np.asarray(score)[10:-10, 10:-10]
        assert (inner > 0).sum() == 0

    def test_threshold_monotone(self):
        img = corner_image()
        s_lo = np.asarray(fast_score(img, 7.0)) > 0
        s_hi = np.asarray(fast_score(img, 50.0)) > 0
        assert (s_hi & ~s_lo).sum() == 0  # corners at high t are a subset


class TestPyramid:
    def test_shapes(self):
        shapes = pyramid_shapes((480, 640), 6, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        levels = build_pyramid(jnp.zeros((480, 640)), 6, 1.2)
        assert [l.shape for l in levels] == shapes

    def test_blur_preserves_mean(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)))
        out = gaussian_blur(img)
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 1.0


class TestOrientation:
    def test_gradient_direction(self):
        """Intensity increasing along +x -> centroid to the right -> angle ~ 0."""
        n = 64
        img = jnp.asarray(np.tile(np.arange(n, dtype=np.float64), (n, 1)))
        ang = ic_angles(img, jnp.asarray([[32, 32]]))
        assert abs(float(ang[0])) < 0.1

        img_y = jnp.asarray(np.tile(np.arange(n, dtype=np.float64)[:, None], (1, n)))
        ang_y = ic_angles(img_y, jnp.asarray([[32, 32]]))
        assert abs(float(ang_y[0]) - np.pi / 2) < 0.1


class TestSift:
    def _blob_image(self, n=96):
        rng = np.random.default_rng(1)
        img = rng.uniform(20, 40, (n, n))
        ys, xs = np.mgrid[:n, :n]
        img += 180 * np.exp(-(((ys - 48) ** 2) + (xs - 40) ** 2) / 40.0)
        img += 120 * np.exp(-(((ys - 30) ** 2) + (xs - 60) ** 2) / 25.0)
        return img

    def test_shape_and_range(self):
        img = jnp.asarray(self._blob_image())
        kp = jnp.asarray([[48.0, 48.0], [40.0, 30.0]])
        d = sift_descriptors(img, kp, jnp.zeros(2), jnp.full(2, 31.0))
        assert d.shape == (2, 128)
        norms = np.linalg.norm(np.asarray(d), axis=1)
        np.testing.assert_allclose(norms, 512.0, rtol=0.05)
        assert float(jnp.min(d)) >= 0.0

    def test_rotation_covariance(self):
        """Descriptor with angle pre-rotated matches descriptor of rotated image."""
        img = self._blob_image()
        from scipy.ndimage import rotate

        rot = rotate(img, 90, reshape=False, order=1)
        d0 = sift_descriptors(jnp.asarray(img), jnp.asarray([[40.0, 48.0]]), jnp.zeros(1), jnp.full(1, 31.0))
        # locate the dominant blob after rotation and sample with the
        # compensating angle (-pi/2 for scipy's rotate(90) in array coords);
        # the descriptor must reproduce up to resampling error
        iy, ix = np.unravel_index(np.argmax(rot), rot.shape)
        d1 = sift_descriptors(
            jnp.asarray(rot), jnp.asarray([[float(ix), float(iy)]]), jnp.asarray([-np.pi / 2]), jnp.full(1, 31.0)
        )
        # cosine similarity high (not exact: resampling + grid effects)
        c0, c1 = np.asarray(d0[0]), np.asarray(d1[0])
        cos = c0 @ c1 / (np.linalg.norm(c0) * np.linalg.norm(c1))
        assert cos > 0.85, cos

    def test_distinct_points_distinct_descriptors(self):
        img = jnp.asarray(self._blob_image())
        kp = jnp.asarray([[48.0, 48.0], [60.0, 30.0]])
        d = sift_descriptors(img, kp, jnp.zeros(2), jnp.full(2, 31.0))
        c = np.asarray(d)
        cos = c[0] @ c[1] / (np.linalg.norm(c[0]) * np.linalg.norm(c[1]))
        assert cos < 0.95


class TestDetector:
    def test_per_level_distribution(self):
        ks = features_per_level(2000, 6, 1.2)
        assert sum(ks) == 2000
        assert ks[0] > ks[1] > ks[2]

    def test_detect_on_synthetic_echoes(self):
        rng = np.random.default_rng(0)
        img = rng.rayleigh(20.0, (400, 256))
        # bright blobs well inside the valid (non-masked) region
        for (y, x) in [(200, 120), (180, 180), (220, 60), (160, 130)]:
            ys, xs = np.mgrid[y - 3 : y + 4, x - 3 : x + 4]
            img[y - 3 : y + 4, x - 3 : x + 4] += 150 * np.exp(
                -((ys - y) ** 2 + (xs - x) ** 2) / 4.0
            )
        norm = jnp.asarray(np.clip(img / img.max() * 255, 0, 255))
        feats = detect_features(norm, None, DetectorConfig(n_features=500))
        v = np.asarray(feats.valid)
        assert v.sum() > 4
        xy = np.asarray(feats.xy[v])
        # each blob must attract at least one keypoint within 4 px
        for (y, x) in [(200, 120), (180, 180), (220, 60)]:
            d = np.min(np.hypot(xy[:, 0] - x, xy[:, 1] - y))
            assert d <= 4.0, (x, y, d)


class TestFastPallas:
    def test_matches_xla_in_interpret_mode(self):
        """Pallas kernel (interpreter) must reproduce the XLA scores exactly."""
        from diasss_tpu.features.fast_pallas import fast_score_pallas

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (96, 256)), jnp.float32)
        x = np.asarray(fast_score(img, 12.0))[8:-8, 8:-8]
        p = np.asarray(fast_score_pallas(img, 12.0, tile=32, interpret=True))[8:-8, 8:-8]
        np.testing.assert_allclose(p, x, atol=1e-4)


class TestOrbDescriptor:
    def test_shape_and_binary(self):
        from diasss_tpu.features.orb_desc import orb_descriptors

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (96, 96)), jnp.float32)
        kp = jnp.asarray([[48.0, 48.0], [30.0, 60.0]])
        d = orb_descriptors(img, kp, jnp.zeros(2), jnp.full(2, 31.0))
        assert d.shape == (2, 256)
        assert set(np.unique(np.asarray(d))) <= {-1.0, 1.0}

    def test_rotation_steering(self):
        """Rotating the image and compensating the angle reproduces most bits."""
        from scipy.ndimage import rotate as ndrotate

        from diasss_tpu.features.orb_desc import orb_descriptors

        rng = np.random.default_rng(1)
        img = rng.uniform(20, 40, (97, 97))
        ys, xs = np.mgrid[:97, :97]
        img += 150 * np.exp(-((ys - 48) ** 2 + (xs - 40) ** 2) / 60.0)
        rot = ndrotate(img, 90, reshape=False, order=1)
        d0 = orb_descriptors(jnp.asarray(img, jnp.float32), jnp.asarray([[40.0, 48.0]]), jnp.zeros(1), jnp.full(1, 31.0))
        iy, ix = np.unravel_index(np.argmax(rot), rot.shape)
        d1 = orb_descriptors(jnp.asarray(rot, jnp.float32), jnp.asarray([[float(ix), float(iy)]]), jnp.asarray([-np.pi / 2]), jnp.full(1, 31.0))
        agree = float((np.asarray(d0[0]) == np.asarray(d1[0])).mean())
        assert agree > 0.8, agree

    def test_hamming_matrix(self):
        from diasss_tpu.features.orb_desc import hamming_matrix

        a = jnp.asarray([[1.0, -1, 1, -1]])
        b = jnp.asarray([[1.0, -1, 1, -1], [-1, 1, -1, 1], [1.0, 1, 1, 1]])
        h = np.asarray(hamming_matrix(a, b))
        np.testing.assert_allclose(h, [[0, 4, 2]])

    def test_end_to_end_orb_matching(self):
        """Detector with descriptor="orb" + hamming matcher produces matches."""
        from diasss_tpu.config import DetectorConfig, MatcherConfig
        from diasss_tpu.frame import build_keyframe
        from diasss_tpu.matching.robust import robust_matching
        from diasss_tpu.synthetic import make_survey

        survey = make_survey(n_lines=2, n_pings=400, n_bins=512, n_landmarks=100, seed=11)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        dcfg = DetectorConfig(n_features=600, descriptor="orb", desc_size_scale=8.0 / 31.0)
        feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
        assert feats[0].desc.shape[1] == 256
        mcfg = MatcherConfig(desc_metric="hamming", ratio_excl_radius=2.0, ratio_test=0.8,
                             orb_dist_bound=110.0, orb_dist_bound_cross=110.0)
        res = robust_matching(0, 1, feats[0], feats[1], frames[0].geo, frames[1].geo, 400, 400, mcfg)
        assert res.n_matches >= 1, res


class TestStackedDetectorParity:
    """The single-program stacked layout must return bit-identical valid
    keypoints/descriptors to the per-level layout (detector.py docstring)."""

    def test_stacked_equals_per_level(self):
        rng = np.random.default_rng(3)
        img = rng.rayleigh(20.0, (401, 250))  # odd sizes: pyramid rounding paths
        for (y, x) in [(200, 120), (120, 180), (300, 60), (60, 130), (350, 200)]:
            ys, xs = np.mgrid[y - 3 : y + 4, x - 3 : x + 4]
            img[y - 3 : y + 4, x - 3 : x + 4] += 150 * np.exp(
                -((ys - y) ** 2 + (xs - x) ** 2) / 4.0
            )
        norm = jnp.asarray(np.clip(img / img.max() * 255, 0, 255))
        cfg = DetectorConfig(n_features=400)
        a = detect_features(norm, None, cfg, stacked=True)
        b = detect_features(norm, None, cfg, stacked=False)
        va, vb = np.asarray(a.valid), np.asarray(b.valid)
        np.testing.assert_array_equal(va, vb)
        for f in ("xy", "response", "angle", "size", "level"):
            fa = np.asarray(getattr(a, f))[va]
            fb = np.asarray(getattr(b, f))[vb]
            np.testing.assert_array_equal(fa, fb, err_msg=f)
        # descriptors: the SIFT einsum's batch dim differs (k_max vs k_level),
        # so XLA tiles the S=1024 contraction differently -> float-tolerance
        # equality, not bit equality (desc values are OpenCV-scaled to ~512)
        np.testing.assert_allclose(
            np.asarray(a.desc)[va], np.asarray(b.desc)[vb], rtol=0, atol=5e-3,
            err_msg="desc",
        )
