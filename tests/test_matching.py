"""Matcher tests: geo-gated NN unit behavior, SCC consensus, full integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.config import DetectorConfig, MatcherConfig
from diasss_tpu.matching.geosearch import geo_nn_search
from diasss_tpu.matching.robust import robust_matching
from diasss_tpu.matching.scc import scc_filter


def mk_desc(rng, n):
    d = rng.normal(size=(n, 128)).astype(np.float32)
    d = np.abs(d)
    d = d / np.linalg.norm(d, axis=1, keepdims=True) * 512
    return d


class TestGeoNN:
    def test_matches_nearest_descriptor_within_radius(self, rng):
        desc_r = mk_desc(rng, 4)
        desc_q = desc_r[[2]] + rng.normal(size=(1, 128)).astype(np.float32) * 2
        geo_r = jnp.asarray([[0.0, 0], [5, 0], [10, 0], [100, 0]], jnp.float32)
        geo_q = jnp.asarray([[6.0, 0]], jnp.float32)  # radius 8 covers kps 0..2
        bbox = jnp.asarray([-10.0, 200, -10, 10])
        res = geo_nn_search(
            geo_q, jnp.asarray(desc_q), jnp.ones(1, bool),
            geo_r, jnp.asarray(desc_r), jnp.ones(4, bool), bbox,
        )
        assert int(res.corres[0]) == 2
        assert int(res.n_candidates[0]) == 3

    def test_ratio_test_rejects_ambiguous(self):
        """Two candidates equidistant from the query (ratio 1) must be rejected."""
        q = np.full((1, 128), 40.0, np.float32)
        e = np.zeros((1, 128), np.float32)
        e[0, 0] = 100.0
        desc_r = np.concatenate([q + e, q - e])  # both at L2 distance 100
        geo_r = jnp.asarray([[0.0, 0], [1, 0]], jnp.float32)
        geo_q = jnp.asarray([[0.5, 0]], jnp.float32)
        bbox = jnp.asarray([-10.0, 10, -10, 10])
        res = geo_nn_search(
            geo_q, jnp.asarray(q), jnp.ones(1, bool),
            geo_r, jnp.asarray(desc_r), jnp.ones(2, bool), bbox,
        )
        assert int(res.corres[0]) == -1  # ratio 1 >> 0.35

    def test_single_candidate_escape(self, rng):
        """candidate.size()==1 && best<bound accepts regardless of ratio
        (FEAmatcher.cpp:134-138)."""
        desc_r = mk_desc(rng, 2)
        desc_q = desc_r[[0]] + 1.0
        geo_r = jnp.asarray([[0.0, 0], [50, 0]], jnp.float32)
        geo_q = jnp.asarray([[1.0, 0]], jnp.float32)  # only kp 0 within 8 m
        bbox = jnp.asarray([-10.0, 100, -10, 10])
        res = geo_nn_search(
            geo_q, jnp.asarray(desc_q), jnp.ones(1, bool),
            geo_r, jnp.asarray(desc_r), jnp.ones(2, bool), bbox,
        )
        assert int(res.corres[0]) == 0

    def test_bbox_gate(self, rng):
        desc = mk_desc(rng, 1)
        geo_r = jnp.asarray([[0.0, 0]], jnp.float32)
        geo_q = jnp.asarray([[0.0, 0]], jnp.float32)
        bbox = jnp.asarray([10.0, 20, 10, 20])  # query outside
        res = geo_nn_search(
            geo_q, jnp.asarray(desc), jnp.ones(1, bool),
            geo_r, jnp.asarray(desc), jnp.ones(1, bool), bbox,
        )
        assert int(res.corres[0]) == -1


class TestSCC:
    def test_consensus_kills_outliers(self):
        K = 40
        rng = np.random.default_rng(0)
        y_q = jnp.asarray(np.arange(K, dtype=np.float32) * 10)
        # true model: ref rows shifted by +7; 8 outliers with wild offsets
        y_r = np.arange(K, dtype=np.float32) * 10 + 7
        out_idx = rng.choice(K, 8, replace=False)
        y_r[out_idx] += rng.uniform(50, 200, 8)
        corres = jnp.arange(K, dtype=jnp.int32)  # identity matching
        res = scc_filter(
            y_q, jnp.asarray(y_r), corres, jnp.asarray(False), jnp.asarray(1000.0),
            jax.random.PRNGKey(0),
        )
        kept = np.asarray(res.corres) >= 0
        assert kept.sum() == K - 8
        assert not kept[out_idx].any()
        assert abs(float(res.model_x) - 7.0) < 2.5

    def test_parity_flip_model(self):
        """Opposite-direction lines: metric uses rows - y + 1 (FEAmatcher.cpp:210)."""
        K = 20
        rows_ref = 500.0
        y_q = jnp.asarray(np.arange(K, dtype=np.float32) * 5 + 100)
        y_r = rows_ref - (np.arange(K) * 5.0 + 100) + 1 - 3  # flipped with offset 3
        res = scc_filter(
            y_q, jnp.asarray(y_r, jnp.float32), jnp.arange(K, dtype=jnp.int32),
            jnp.asarray(True), jnp.asarray(rows_ref), jax.random.PRNGKey(1),
        )
        assert int(res.inlier_count) == K
        assert abs(float(res.model_x) - 3.0) < 2.5

    def test_empty_matches(self):
        res = scc_filter(
            jnp.zeros(4), jnp.zeros(4), jnp.full(4, -1, jnp.int32),
            jnp.asarray(False), jnp.asarray(10.0), jax.random.PRNGKey(0),
        )
        assert int(res.inlier_count) == 0
        assert (np.asarray(res.corres) == -1).all()


class TestIntegration:
    @pytest.mark.slow
    def test_detect_and_match_synthetic_pair(self):
        """Full detect->match on two overlapping synthetic lines: matched
        keypoints must mostly correspond to the same physical landmark."""
        from diasss_tpu.features import detect_features
        from diasss_tpu.frame import build_keyframe
        from diasss_tpu.synthetic import make_survey

        survey = make_survey(n_lines=2, n_pings=500, n_bins=512, n_landmarks=120, seed=11)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        # tuned-for-speckle config: smaller descriptor windows than the
        # reference's kp.size=31 inheritance, exclusion-radius ratio test
        # (see MatcherConfig.ratio_excl_radius / DetectorConfig.desc_size_scale)
        cfg = DetectorConfig(n_features=800, desc_size_scale=8.0 / 31.0)
        feats = [detect_features(f.norm, f.mask, cfg) for f in frames]
        n_valid = [int(np.asarray(f.valid).sum()) for f in feats]
        assert min(n_valid) > 20, n_valid

        res = robust_matching(
            0, 1, feats[0], feats[1], frames[0].geo, frames[1].geo,
            rows_s=500, rows_t=500,
            cfg=MatcherConfig(ratio_excl_radius=2.0, ratio_test=0.6, sift_dist_bound=450.0),
        )
        assert res.n_matches >= 3, res

        # verify matches against ground truth: the geo positions (computed from
        # *ground truth* poses) of matched pixels must be close
        from diasss_tpu.geometry import sonar

        gt_geo = [
            sonar.geo_image(
                jnp.asarray(l.gt_poses[:, 3:5], jnp.float32),
                jnp.asarray(l.gt_poses[:, 2], jnp.float32),
                jnp.asarray(l.ground_ranges, jnp.float32),
                512,
            )
            for l in survey.lines
        ]
        good = 0
        for row in res.rows_s:
            ps, bs, pt, bt = int(row[2]), int(row[3]), int(row[4]), int(row[5])
            g1 = np.asarray(gt_geo[0][ps, bs])
            g2 = np.asarray(gt_geo[1][pt, bt])
            if np.linalg.norm(g1 - g2) < 3.0:
                good += 1
        precision = good / res.n_matches
        assert precision >= 0.5, (precision, res.n_matches)


class TestSCCxy:
    def test_two_axis_consensus(self):
        """scc_mode="xy": inliers must agree on BOTH ping and bin offsets."""
        K = 30
        rng = np.random.default_rng(3)
        y_q = jnp.asarray(np.arange(K, dtype=np.float32) * 8)
        x_q = jnp.asarray(np.arange(K, dtype=np.float32) * 4 + 100)
        y_r = np.arange(K, dtype=np.float32) * 8 + 5  # ping offset 5
        x_r = np.arange(K, dtype=np.float32) * 4 + 100 + 9  # bin offset 9
        bad = rng.choice(K, 6, replace=False)
        x_r[bad] += 200.0  # bin outliers (ping still consistent)
        from diasss_tpu.matching.scc import scc_filter

        cfg = MatcherConfig(scc_mode="xy")
        res = scc_filter(
            y_q, jnp.asarray(y_r), jnp.arange(K, dtype=jnp.int32),
            jnp.asarray(False), jnp.asarray(1000.0), jax.random.PRNGKey(0), cfg,
            kp_x_q=x_q, kp_x_r=jnp.asarray(x_r),
        )
        kept = np.asarray(res.corres) >= 0
        assert kept.sum() == K - 6
        assert not kept[bad].any()

    def test_x_mode_ignores_bin_outliers(self):
        """Default single-axis mode must NOT reject bin-offset outliers
        (reference parity: the shipped SCC only models the ping axis)."""
        K = 30
        y_q = jnp.asarray(np.arange(K, dtype=np.float32) * 8)
        x_q = jnp.asarray(np.arange(K, dtype=np.float32) * 4)
        y_r = np.arange(K, dtype=np.float32) * 8 + 5
        x_r = np.arange(K, dtype=np.float32) * 4
        x_r[:6] += 200.0
        from diasss_tpu.matching.scc import scc_filter

        res = scc_filter(
            y_q, jnp.asarray(y_r), jnp.arange(K, dtype=jnp.int32),
            jnp.asarray(False), jnp.asarray(1000.0), jax.random.PRNGKey(0),
            MatcherConfig(), kp_x_q=x_q, kp_x_r=jnp.asarray(x_r),
        )
        assert (np.asarray(res.corres) >= 0).sum() == K


class TestStackedMatching:
    """Whole-survey stacked matcher (robust_matching_stacked): identical
    results to the per-pair robust_matching on every gated pair."""

    def _fake_feats(self, rng, K=128, D=64, lo=0.0, hi=60.0):
        from diasss_tpu.features.detector import DetectedFeatures

        xy = rng.uniform(10, 400, (K, 2)).astype(np.float32)
        desc = (rng.normal(0, 1, (K, D)) * 60).astype(np.float32)
        valid = rng.uniform(size=K) > 0.1
        return DetectedFeatures(
            xy=jnp.asarray(xy),
            response=jnp.zeros(K, jnp.float32),
            angle=jnp.zeros(K, jnp.float32),
            size=jnp.full((K,), 31.0, jnp.float32),
            level=jnp.zeros(K, jnp.int32),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
        )

    @pytest.mark.parametrize("cfg_kw", [
        dict(ratio_test=0.9, sift_dist_bound=500.0),
        dict(ratio_test=0.9, sift_dist_bound=500.0, cross_check=True),
        dict(ratio_test=0.9, sift_dist_bound=500.0, scc_mode="xy"),
    ])
    def test_matches_per_pair_path(self, cfg_kw):
        from diasss_tpu.geometry import sonar
        from diasss_tpu.matching.robust import robust_matching, robust_matching_stacked

        rng = np.random.default_rng(3)
        n_pings, n_bins = 420, 64
        gras = np.linspace(5.0, 20.0, n_bins // 2).astype(np.float32)
        frames_geo = []
        rows_list = []
        feats = []
        img_ids = [0, 1, 2]
        for f in range(3):
            dr = np.zeros((n_pings, 6), np.float32)
            dr[:, 3] = np.arange(n_pings) * 0.12
            dr[:, 4] = 8.0 * f
            dr[:, 2] = np.pi * (f % 2)
            geo = sonar.geo_image(
                jnp.asarray(dr[:, 3:5]), jnp.asarray(dr[:, 2]), jnp.asarray(gras), n_bins
            )
            frames_geo.append(geo)
            rows_list.append(n_pings)
            feats.append(self._fake_feats(rng))
        # plant shared descriptors across frames so real matches exist
        for (i, j) in [(0, 1), (1, 2), (0, 2)]:
            qi = rng.choice(128, 30, replace=False)
            feats[j] = feats[j]._replace(
                desc=feats[j].desc.at[qi].set(feats[i].desc[qi] + 1.0),
                xy=feats[j].xy.at[qi].set(feats[i].xy[qi] + 2.0),
            )
        pair_ids = [(0, 1), (0, 2), (1, 2)]
        cfg = MatcherConfig(**cfg_kw)
        stacked = robust_matching_stacked(
            pair_ids, img_ids, feats, frames_geo, rows_list, cfg
        )
        for (i, j) in pair_ids:
            ref = robust_matching(
                img_ids[i], img_ids[j], feats[i], feats[j],
                frames_geo[i], frames_geo[j],
                rows_s=rows_list[i], rows_t=rows_list[j], cfg=cfg,
            )
            out = stacked[(i, j)]
            assert out.n_matches == ref.n_matches, (i, j)
            np.testing.assert_array_equal(out.rows_s, ref.rows_s)
            np.testing.assert_array_equal(out.rows_t, ref.rows_t)
            assert out.consistent == ref.consistent
