"""Batched loop-closure solver tests on a controlled synthetic two-line scenario."""

import jax.numpy as jnp
import numpy as np

from diasss_tpu.config import KeypointNoiseConfig, LoopClosureConfig
from diasss_tpu.geometry import sonar
from diasss_tpu.solvers.lc import loop_closing_tfs


def build_scene(dr_err=(0.0, 2.0)):
    """Two reciprocal survey lines over a flat floor 12 m below, one landmark.

    Source line: poses along +x at y=0, yaw 0 (starboard looks +y).
    Target line: poses along -x at y=2g, yaw pi (starboard looks -y).
    Landmark at (2, g, -12) is seen by ping 2 of both lines at ground range g.
    The target line's DR is offset by ``dr_err = (along_track_x, cross_track_y)``
    from ground truth; slant-range measurements come from ground truth.

    Physics note (matches the reference's behavior): cross-track (y) error is
    absorbed by the landmark's free depth (the two range spheres always intersect
    after a small z slide), so a single correspondence cannot correct it — the
    quality gate (optimizer.cpp:884-896) rejects such pairs.  Along-track (x)
    error makes the two tight zero-plane constraints conflict, forcing the target
    pose to move — this is the drift component SSS loop closures actually fix.
    """
    n_pings, n_bins = 5, 16
    half = n_bins // 2
    alt = 12.0
    k = 5  # ground-range table index of the landmark
    g = 5.0 + k  # gr[k] = 5 + k
    gras = np.asarray([5.0 + i for i in range(half)], np.float32)

    dr_s = np.zeros((n_pings, 6), np.float32)
    dr_s[:, 3] = np.arange(n_pings)  # x = ping index
    gt_t = np.zeros((n_pings, 6), np.float32)
    gt_t[:, 2] = np.pi  # yaw pi (reciprocal line)
    gt_t[:, 3] = 4 - np.arange(n_pings)  # x descending
    gt_t[:, 4] = 2 * g
    dr_t = gt_t.copy()
    dr_t[:, 3] += dr_err[0]
    dr_t[:, 4] += dr_err[1]

    alts = np.full((n_pings,), alt, np.float32)
    sr = float(np.sqrt(alt * alt + g * g))

    geo_s = sonar.geo_image(jnp.asarray(dr_s[:, 3:5]), jnp.asarray(dr_s[:, 2]), jnp.asarray(gras), n_bins)
    geo_t = sonar.geo_image(jnp.asarray(dr_t[:, 3:5]), jnp.asarray(dr_t[:, 2]), jnp.asarray(gras), n_bins)

    # both lines observe the landmark from ping 2, starboard column half+k
    pair = np.asarray([2, half + k, sr, 2, half + k, sr, -12.0], np.float32)
    pairs = jnp.asarray(pair)[None, :]
    valid = jnp.asarray([True])
    return dict(
        pairs=pairs,
        valid=valid,
        dr_s=jnp.asarray(dr_s),
        dr_t=jnp.asarray(dr_t),
        geo_s=geo_s,
        geo_t=geo_t,
        alts_s=jnp.asarray(alts),
        alts_t=jnp.asarray(alts),
        gras_t=jnp.asarray(gras),
        n_bins=n_bins,
        gt_t=gt_t,
    )


class TestLoopClosingTFs:
    def test_measurement_consistency_at_solution(self):
        scene = build_scene()
        gt_t = scene.pop("gt_t")
        res = loop_closing_tfs(**scene, kp_cfg=KeypointNoiseConfig(), cfg=LoopClosureConfig())
        # solver satisfies the sonar measurements (range + plane residuals ~ 0)
        assert float(res.est_range_e[0]) < 0.05
        assert float(res.est_plane_e[0]) < 0.05
        # all outputs finite
        for name, v in res._asdict().items():
            arr = np.asarray(jnp.concatenate([jnp.ravel(x) for x in (v if not hasattr(v, "R") else (v.R, v.t))])) if hasattr(v, "R") else np.asarray(v)
            assert np.all(np.isfinite(arr)), name
        # marginal variances positive
        assert np.all(np.asarray(res.variance6) > 0)

    def test_pulls_target_toward_truth(self):
        # along-track DR error: the plane-constraint conflict must pull X2 back
        scene = build_scene(dr_err=(2.0, 0.0))
        gt_t = scene.pop("gt_t")
        res = loop_closing_tfs(**scene, kp_cfg=KeypointNoiseConfig(), cfg=LoopClosureConfig())
        # relative pose implied target position vs truth
        dr_s = np.asarray(scene["dr_s"])
        # rel = Tp_s^-1 * X2_est (unflipped); implied target translation:
        src_t = dr_s[2, 3:6]
        rel_t = np.asarray(res.rel_pose.t[0])
        # source yaw=0, identity rotation: implied target position = src + rel_t
        implied = src_t + rel_t
        gt_pos = gt_t[2, 3:6]
        dr_pos = np.asarray(scene["dr_t"])[2, 3:6]
        err_est = np.linalg.norm(implied - gt_pos)
        err_dr = np.linalg.norm(dr_pos - gt_pos)
        assert err_est < err_dr, (err_est, err_dr)
        # quality gate: geo-consistency must improve by > 2x (accept gate > 0)
        assert float(res.quality[0]) > 0.0

    def test_exact_dr_is_stable(self):
        """With zero DR error the solver must not corrupt the relative pose."""
        scene = build_scene(dr_err=(0.0, 0.0))
        gt_t = scene.pop("gt_t")
        res = loop_closing_tfs(**scene, kp_cfg=KeypointNoiseConfig(), cfg=LoopClosureConfig())
        dr_s = np.asarray(scene["dr_s"])
        rel_t = np.asarray(res.rel_pose.t[0])
        implied = dr_s[2, 3:6] + rel_t
        np.testing.assert_allclose(implied, gt_t[2, 3:6], atol=0.2)

    def test_compass_flip_path(self):
        """Reciprocal-line target (|yaw| = pi > 2pi/3) exercises the flip guard;
        outputs must stay finite and measurement-consistent."""
        scene = build_scene(dr_err=(0.5, 1.0))
        scene.pop("gt_t")
        res = loop_closing_tfs(**scene, kp_cfg=KeypointNoiseConfig(), cfg=LoopClosureConfig())
        assert np.isfinite(float(res.quality[0]))
        assert float(res.est_range_e[0]) < 0.1
