"""Dense world-correlation matcher (matching/dense.py) + the automatic profile.

The dense matcher is the beyond-reference correspondence search: source
keypoint geo-patches slid over the target frame's world raster (NCC), verified
by local displacement-field consistency.  Yield must not depend on cross-pass
detector repeatability, and precision (checked against ground-truth geo
projections) must stay near 1 — the property that lets the automatic full-BA
trust detected matches.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.config import DenseMatchConfig, DetectorConfig, automatic_config
from diasss_tpu.features import detect_features
from diasss_tpu.frame import build_keyframe
from diasss_tpu.geometry import sonar
from diasss_tpu.matching.dense import dense_matching, world_raster
from diasss_tpu.synthetic import make_survey


@pytest.fixture(scope="module")
def drifting_survey():
    survey = make_survey(
        n_lines=2, n_pings=700, n_bins=512, n_landmarks=200,
        n_tie_lines=1, seed=5, drift_xy=0.006,
    )
    frames = [
        build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]
    return survey, frames


def _gt_geo(survey, n_bins=512):
    return [
        sonar.geo_image(
            jnp.asarray(l.gt_poses[:, 3:5], jnp.float32),
            jnp.asarray(l.gt_poses[:, 2], jnp.float32),
            jnp.asarray(l.ground_ranges, jnp.float32),
            n_bins,
        )
        for l in survey.lines
    ]


class TestDenseMatching:
    def test_yield_and_precision(self, drifting_survey):
        """Parallel opposite-heading pair: high yield, ~100% precision."""
        survey, frames = drifting_survey
        dcfg = DetectorConfig(descriptor="geo_patch", n_features=1200)
        feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
        cfg = DenseMatchConfig(search_radius=10.0)
        rows_s, rows_t, n = dense_matching(
            0, 1, feats[0], frames[0].norm, frames[0].geo,
            frames[1].norm, frames[1].geo, dcfg, cfg,
        )
        assert n >= 10, n
        gt_geo = _gt_geo(survey)
        good = 0
        for row in rows_s:
            g1 = np.asarray(gt_geo[0][int(row[2]), int(row[3])])
            g2 = np.asarray(gt_geo[1][int(row[4]), int(row[5])])
            good += np.linalg.norm(g1 - g2) < 3.0
        # >= 0.8: a coherent wrong cluster can pass the local smoothness filter
        # (it is self-consistent); the BA's geo-discrepancy gate + Huber IRLS
        # absorb that downstream (see TestAutomaticPipeline)
        assert good / n >= 0.8, (good, n)
        # mirrored rows swap the frames
        assert np.allclose(rows_t[:, 2:4], rows_s[:, 4:6])
        assert np.allclose(rows_t[:, 4:6], rows_s[:, 2:4])

    def test_crossing_pair(self, drifting_survey):
        """Perpendicular tie-line pair — impossible for image-space SIFT
        matching (rotation between views), natural for world-aligned NCC."""
        survey, frames = drifting_survey
        dcfg = DetectorConfig(descriptor="geo_patch", n_features=1200)
        feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
        cfg = DenseMatchConfig(search_radius=10.0)
        rows_s, _, n = dense_matching(
            0, 2, feats[0], frames[0].norm, frames[0].geo,
            frames[2].norm, frames[2].geo, dcfg, cfg,
        )
        assert n >= 3, n
        gt_geo = _gt_geo(survey)
        good = 0
        for row in rows_s:
            g1 = np.asarray(gt_geo[0][int(row[2]), int(row[3])])
            g2 = np.asarray(gt_geo[2][int(row[4]), int(row[5])])
            good += np.linalg.norm(g1 - g2) < 3.0
        assert good / n >= 0.8, (good, n)

    def test_world_raster_roundtrip(self, drifting_survey):
        """Raster provenance maps world cells back to waterfall coordinates."""
        _, frames = drifting_survey
        r = world_raster(frames[0].norm, frames[0].geo, 0.5)
        cnt = np.asarray(r.cnt)
        assert cnt.max() >= 1
        # a filled cell's (ping, col) must geo-project back into that cell
        yy, xx = np.nonzero(cnt > 0)
        k = len(yy) // 2
        ping = int(round(float(r.ping[yy[k], xx[k]])))
        col = int(round(float(r.col[yy[k], xx[k]])))
        g = np.asarray(frames[0].geo[ping, col])
        assert abs(g[0] - (r.x0 + xx[k] * r.res)) < 3 * r.res
        assert abs(g[1] - (r.y0 + yy[k] * r.res)) < 3 * r.res


class TestDenseMatchingStacked:
    def test_parity_with_per_pair(self, drifting_survey):
        """The stacked whole-survey dispatch must reproduce the per-pair path
        exactly when the per-pair path uses the same survey-common raster
        shape (the only intended difference is dispatch structure)."""
        from diasss_tpu.matching.dense import (
            dense_matching_stacked,
            raster_shape,
        )

        survey, frames = drifting_survey
        dcfg = DetectorConfig(descriptor="geo_patch", n_features=1200)
        feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
        cfg = DenseMatchConfig(search_radius=10.0)
        pair_ids = [(0, 1), (0, 2), (1, 2)]
        geos = [f.geo for f in frames]
        res = dcfg.geopatch_res
        shapes = [raster_shape(g, res) for g in geos]
        H = max(s[0] for s in shapes)
        W = max(s[1] for s in shapes)
        rasters = [
            world_raster(f.norm, g, res, shape=(H, W)) for f, g in zip(frames, geos)
        ]
        stacked = dense_matching_stacked(
            pair_ids, [f.img_id for f in frames], feats,
            [f.norm for f in frames], geos, dcfg, cfg,
        )
        for (i, j) in pair_ids:
            rows_s, rows_t, n = dense_matching(
                frames[i].img_id, frames[j].img_id, feats[i],
                frames[i].norm, geos[i], frames[j].norm, geos[j], dcfg, cfg,
                raster_s=rasters[i], raster_t=rasters[j],
            )
            st_s, st_t, st_n = stacked[(i, j)]
            assert st_n == n, (i, j, st_n, n)
            np.testing.assert_allclose(st_s, rows_s)
            np.testing.assert_allclose(st_t, rows_t)


class TestAutomaticPipeline:
    def test_automatic_profile_improves_ate(self, drifting_survey):
        """The fully-automatic profile (zero annotations) must substantially
        beat dead reckoning on a drifting survey with a tie line."""
        from diasss_tpu.pipeline import run_slam

        survey, frames = drifting_survey
        cfg = automatic_config(drift_budget=6.0)
        cfg = dataclasses.replace(
            cfg,
            detector=dataclasses.replace(
                cfg.detector, n_features=1200
            ),
            rematch_iters=1,
        )
        res = run_slam(
            frames, cfg,
            gt_rows_list=[l.gt_poses for l in survey.lines],
            run_eval2=False,
        )
        assert res.n_lc_accepted >= 10
        assert res.ate_est < 0.6 * res.ate_dr, (res.ate_dr, res.ate_est)


class TestGeoPatchDescriptors:
    def test_heading_invariance(self, drifting_survey):
        """The same world point seen from two opposite-heading passes must
        produce strongly correlated geo-patch descriptors (the property
        image-space descriptors lack on sonar geometry)."""
        from diasss_tpu.features.geopatch import geo_patch_descriptors

        survey, frames = drifting_survey
        gt_geo = _gt_geo(survey)
        # pick a world point imaged by both line 0 and line 1 using annotations
        annos = survey.lines[0].annos
        rows = annos[annos[:, 1] == 1]
        assert len(rows) > 0
        ping_s, bin_s, ping_t, bin_t = rows[0, 2:6].astype(int)
        xy_s = jnp.asarray([[bin_s, ping_s]], jnp.float32)
        xy_t = jnp.asarray([[bin_t, ping_t]], jnp.float32)
        # compute patches against GROUND TRUTH geo (no drift offset)
        d_s, ok_s = geo_patch_descriptors(frames[0].norm, gt_geo[0], xy_s)
        d_t, ok_t = geo_patch_descriptors(frames[1].norm, gt_geo[1], xy_t)
        assert bool(ok_s[0]) and bool(ok_t[0])
        ncc = float(jnp.dot(d_s[0], d_t[0]))
        assert ncc > 0.3, ncc


class TestSmoothFilter:
    """The vectorized device smoothness filter must replicate the per-keypoint
    median-of-neighbors loop it replaced (componentwise median, even-count
    averaging, min-neighbor support rule)."""

    @staticmethod
    def _reference_loop(kp_geo, tgt_geo, ok, radius, min_neighbors, tol):
        d = tgt_geo - kp_geo
        idx = np.nonzero(ok)[0]
        if len(idx) == 0:
            return np.zeros_like(ok)
        P = kp_geo[idx]
        D = d[idx]
        dist = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=-1)
        nbr = (dist <= radius) & ~np.eye(len(idx), dtype=bool)
        keep = np.zeros(len(idx), bool)
        for a in range(len(idx)):
            nn = np.nonzero(nbr[a])[0]
            if len(nn) < min_neighbors:
                continue
            med = np.median(D[nn], axis=0)
            keep[a] = np.linalg.norm(D[a] - med) <= tol
        out = np.zeros_like(ok)
        out[idx[keep]] = True
        return out

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_loop(self, seed):
        from diasss_tpu.matching.dense import _smooth_filter

        rng = np.random.default_rng(seed)
        K = 200
        kp_geo = rng.uniform(0, 100, (K, 2)).astype(np.float32)
        # smooth displacement field + a few gross outliers
        disp = np.stack(
            [0.02 * kp_geo[:, 0], -0.015 * kp_geo[:, 1]], axis=1
        ).astype(np.float32)
        out_idx = rng.choice(K, 20, replace=False)
        disp[out_idx] += rng.uniform(-8, 8, (20, 2)).astype(np.float32)
        tgt_geo = kp_geo + disp
        ok = rng.uniform(size=K) > 0.25
        cfg = DenseMatchConfig(smooth_radius=20.0, smooth_min_neighbors=2, smooth_tol=1.5)
        got = _smooth_filter(kp_geo, tgt_geo, ok, cfg)
        want = self._reference_loop(kp_geo, tgt_geo, ok, 20.0, 2, 1.5)
        np.testing.assert_array_equal(got, want)

    def test_empty(self):
        from diasss_tpu.matching.dense import _smooth_filter

        ok = np.zeros(8, bool)
        got = _smooth_filter(np.zeros((8, 2)), np.zeros((8, 2)), ok, DenseMatchConfig())
        assert not got.any()


class TestDenseMatchingMesh:
    def test_mesh_matches_single_device(self, drifting_survey):
        """DP-sharded pair axis (dense_matching_stacked(mesh=...)): identical
        rows to the single-device stacked dispatch; 3 pairs on 8 devices
        exercises the dummy-pair padding."""
        import jax

        from diasss_tpu.matching.dense import dense_matching_stacked
        from diasss_tpu.parallel.shard import make_mesh

        assert len(jax.devices()) >= 8
        survey, frames = drifting_survey
        dcfg = DetectorConfig(descriptor="geo_patch", n_features=1200)
        feats = [detect_features(f.norm, f.mask, dcfg) for f in frames]
        cfg = DenseMatchConfig(search_radius=10.0)
        pair_ids = [(0, 1), (0, 2), (1, 2)]
        geos = [f.geo for f in frames]
        args = (pair_ids, [f.img_id for f in frames], feats,
                [f.norm for f in frames], geos, dcfg, cfg)
        ref = dense_matching_stacked(*args)
        out = dense_matching_stacked(*args, mesh=make_mesh(8))
        total = 0
        for key in pair_ids:
            assert out[key][2] == ref[key][2], key
            np.testing.assert_allclose(out[key][0], ref[key][0])
            np.testing.assert_allclose(out[key][1], ref[key][1])
            total += ref[key][2]
        assert total > 20


def test_qcorr_pallas_matches_scan():
    """The Pallas correlation kernel (TPU path of _correlate) must agree with
    the XLA scan fallback — interpret mode on CPU, same accumulation order."""
    import jax
    import jax.numpy as jnp

    from diasss_tpu.matching.dense_pallas import qcorr_pallas

    K, k, T = 70, 17, 43
    S = T + k - 1
    rng = np.random.default_rng(3)
    Wv = jnp.asarray(rng.normal(0, 1, (K, S, S)), jnp.float32)
    Wh = jnp.asarray((rng.uniform(size=(K, S, S)) > 0.1).astype(np.float32))
    Wvh = Wv * Wh
    q = jnp.asarray(rng.normal(0, 1, (K, k * k)), jnp.float32)

    def scan_ref():
        qr = q.reshape(K, k, k)

        def body(acc, i):
            dy, dx = i // k, i % k
            sh = jax.lax.dynamic_slice(Wh, (0, dy, dx), (K, T, T))
            sv = jax.lax.dynamic_slice(Wvh, (0, dy, dx), (K, T, T))
            qi = qr[:, dy, dx][:, None, None]
            return (acc[0] + qi * sv, acc[1] + qi * sh), None

        z = jnp.zeros((K, T, T), jnp.float32)
        (A, B), _ = jax.lax.scan(body, (z, z), jnp.arange(k * k))
        return A, B

    A0, B0 = scan_ref()
    A1, B1 = qcorr_pallas(Wvh, Wh, q, k, T, interpret=True)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B0), atol=2e-5)


class TestAdaptiveRematch:
    """Round-5 re-match planning (pipeline._rematch_plan): after the first
    solve the search extent shrinks to the measured residual, and iteration
    stops once a solve moves nothing (VERDICT r4 item 1)."""

    def test_extent_shrinks_and_mechanism_equals_fixed_radius(self, drifting_survey):
        from diasss_tpu.pipeline import run_slam

        survey, frames = drifting_survey
        gt = [l.gt_poses for l in survey.lines]
        cfg = automatic_config(drift_budget=6.0)
        cfg = dataclasses.replace(
            cfg,
            detector=dataclasses.replace(cfg.detector, n_features=1200),
            rematch_iters=1,
        )
        res = run_slam(frames, cfg, gt_rows_list=gt, run_eval2=False)
        cells = res.timings.get("rematch_r1_ring_cells")
        assert cells is not None  # extent counter recorded
        full_cells = int(np.ceil(cfg.rematch_geo_radius / cfg.detector.geopatch_res))
        # on this drifting survey the post-solve residual is well under the
        # full re-match radius: the adaptive extent must actually shrink
        assert cells < full_cells, (cells, full_cells)

        # mechanism equality: a fixed-radius run at the recorded bucketed
        # radius reproduces the adaptive run exactly (the measured radius is
        # the ONLY thing the adaptive path changes)
        fixed = dataclasses.replace(
            cfg,
            rematch_adaptive=False,
            rematch_geo_radius=cells * cfg.detector.geopatch_res,
        )
        res_f = run_slam(frames, fixed, gt_rows_list=gt, run_eval2=False)
        np.testing.assert_allclose(
            np.asarray(res.poses.t), np.asarray(res_f.poses.t), rtol=0, atol=0
        )
        assert res.ate_est == res_f.ate_est

    def test_residual_floor_stops_rematch(self, drifting_survey):
        """Once the measured residual q95 reaches the quantization floor
        (both endpoints are raster-cell centers), further rounds chase raster
        noise: re-matching must stop and skip the remaining rounds."""
        from diasss_tpu.pipeline import run_slam

        survey, frames = drifting_survey
        cfg = automatic_config(drift_budget=6.0)
        cfg = dataclasses.replace(
            cfg,
            detector=dataclasses.replace(cfg.detector, n_features=1200),
            rematch_iters=3,
        )
        res = run_slam(frames, cfg,
                       gt_rows_list=[l.gt_poses for l in survey.lines],
                       run_eval2=False)
        # the first compensated re-match brings the residual to the floor on
        # this survey; at least one of the 3 requested rounds must be skipped
        assert res.timings.get("rematch_converged_rounds", 0) >= 1
        rounds_ran = res.timings["match_stacked_pairs"] // len(res.pair_ids)
        assert rounds_ran < 4
        # and accuracy does not pay for the skip
        assert res.ate_est < 0.6 * res.ate_dr, (res.ate_dr, res.ate_est)

    def test_rematch_plan_unit(self):
        """_rematch_plan branch logic on synthetic inputs: pose-delta stop,
        residual-floor stop, and the bucketed extent shrink."""
        from diasss_tpu.config import PipelineConfig
        from diasss_tpu.geometry import se3
        from diasss_tpu.pairs import KpsPairs
        from diasss_tpu.pipeline import _rematch_plan

        cfg = dataclasses.replace(
            PipelineConfig(), rematch_geo_radius=6.0, rematch_adaptive=True
        )
        res = cfg.detector.geopatch_res
        P = 16
        poses = se3.identity((P,), jnp.float32)

        # pose-delta stop: identical consecutive solves -> matches cannot change
        t_prev = np.asarray(poses.t)
        stop, _, _, _, _ = _rematch_plan(poses, t_prev, {}, [], [], cfg)
        assert stop

        # adaptive shrink: a geo field whose matches disagree by ~2 m must
        # shrink the extent to the 8-cell bucket (2*1.5 + 1 = 4 m), not the
        # full 12 cells
        N, M = 8, 8
        g0 = np.zeros((N, M, 2), np.float32)
        g0[..., 0] = np.arange(M)[None, :]
        g1 = g0 + np.asarray([2.0, 0.0], np.float32)  # uniform 2 m discrepancy
        rows = np.zeros((32, 7), np.float32)
        rows[:, 0] = rows[:, 3] = np.arange(32) % N
        rows[:, 1] = rows[:, 4] = np.arange(32) % M
        kp = KpsPairs(rows, np.ones(32, bool))
        stop, radius, cells, _, saturated = _rematch_plan(
            poses, None, {(0, 1): kp}, [(0, 1)],
            [jnp.asarray(g0), jnp.asarray(g1)], cfg,
        )
        assert not stop
        assert cells == 8 and radius == 8 * res, (cells, radius)
        assert not saturated

        # budget saturation: a discrepancy needing more extent than the cap
        # must flag the mission as out of drift budget
        g1s = g0 + np.asarray([8.0, 0.0], np.float32)
        stop, radius, cells, _, saturated = _rematch_plan(
            poses, None, {(0, 1): kp}, [(0, 1)],
            [jnp.asarray(g0), jnp.asarray(g1s)], cfg,
        )
        assert not stop and saturated
        assert cells == int(np.ceil(cfg.rematch_geo_radius / res))

        # residual-floor stop: sub-cell discrepancy -> stop
        g1f = g0 + np.asarray([0.3, 0.0], np.float32)
        stop, _, _, _, _ = _rematch_plan(
            poses, None, {(0, 1): kp}, [(0, 1)],
            [jnp.asarray(g0), jnp.asarray(g1f)], cfg,
        )
        assert stop


class TestLatticeCorrelation:
    """Round-5 lattice q-correlation: computing the k*k-step accumulation
    only on the stride-s decision lattice (parity planes) plus a per-winner
    gather refinement must reproduce the full stride-1 path's decisions."""

    def _inputs(self, drifting_survey, n_ring=8, K=256):
        from diasss_tpu.matching.dense import _raster_patches

        survey, frames = drifting_survey
        dcfg = DetectorConfig(descriptor="geo_patch", n_features=K)
        feats = detect_features(frames[0].norm, frames[0].mask, dcfg)
        rs = world_raster(frames[0].norm, frames[0].geo, dcfg.geopatch_res)
        rt = world_raster(frames[1].norm, frames[1].geo, dcfg.geopatch_res)
        g = np.asarray(frames[0].geo)
        xy = np.asarray(feats.xy).astype(int)
        geo_kp = jnp.asarray(
            g[np.clip(xy[:, 1], 0, g.shape[0] - 1),
              np.clip(xy[:, 0], 0, g.shape[1] - 1)]
        )
        desc_q, ok_q = _raster_patches(rs, geo_kp, dcfg.geopatch_half, 0.6)
        return desc_q, ok_q & feats.valid, geo_kp, rt, dcfg

    @pytest.mark.parametrize("step", [2, 3])
    def test_lattice_matches_full_path(self, drifting_survey, step):
        from diasss_tpu.matching.dense import _correlate

        desc_q, okq, geo_kp, rt, dcfg = self._inputs(drifting_survey, K=256)
        kw = dict(half=dcfg.geopatch_half, n_ring=6 if step == 3 else 8,
                  step_cells=step, ncc_min=0.35, ncc_ratio=1.0, min_cover=0.6)
        full = _correlate(desc_q, okq, geo_kp, rt, lattice=False, **kw)
        latt = _correlate(desc_q, okq, geo_kp, rt, lattice=True, **kw)
        # identical decisions (positions + acceptance); scores agree to the
        # recomputation tolerance (refinement values are freshly accumulated
        # on the lattice path instead of indexed from the full map)
        np.testing.assert_array_equal(np.asarray(full.ok), np.asarray(latt.ok))
        np.testing.assert_array_equal(
            np.asarray(full.tgt_geo), np.asarray(latt.tgt_geo)
        )
        np.testing.assert_allclose(
            np.asarray(full.score), np.asarray(latt.score), rtol=0, atol=1e-5
        )


class TestWindowSlices:
    def test_equals_element_clip_gather(self):
        """_window_slices (edge-padded dynamic slices) must reproduce the
        element-clip fancy gather exactly for every center within +-ext of
        the raster — including centers slightly OUTSIDE it (drifted
        predictions near the swath edge)."""
        from diasss_tpu.matching.dense import _window_slices

        rng = np.random.default_rng(3)
        H, W, ext = 40, 52, 7
        size = 2 * ext + 1
        img = jnp.asarray(rng.random((H, W), np.float32))
        cnt = jnp.asarray((rng.random((H, W)) > 0.3).astype(np.float32))
        cy = jnp.asarray(rng.integers(-ext, H + ext, 64).astype(np.int32))
        cx = jnp.asarray(rng.integers(-ext, W + ext, 64).astype(np.int32))
        vw, cw = _window_slices(img, cnt, cy, cx, ext, size)
        d = np.arange(-ext, ext + 1)
        yy = np.clip(np.asarray(cy)[:, None, None] + d[:, None], 0, H - 1)
        xx = np.clip(np.asarray(cx)[:, None, None] + d[None, :], 0, W - 1)
        np.testing.assert_array_equal(np.asarray(vw), np.asarray(img)[yy, xx])
        np.testing.assert_array_equal(np.asarray(cw), np.asarray(cnt)[yy, xx])
