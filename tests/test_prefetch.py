"""Pipeline-parallel (PP) loading: correctness + measured overlap.

The reference's stage chain is strictly serial (diasss2.cpp:76-101); the PP
layer (parallel/prefetch.py) overlaps host IO of line k+1 with device work of
line k.  Correctness = identical outputs to the eager path; overlap = wall
clock strictly below the serial host+device sum on simulated-slow stages.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diasss_tpu.parallel.prefetch import (
    build_keyframes_pipelined,
    load_keyframes_pipelined,
    prefetch_iter,
)
from diasss_tpu.synthetic import make_survey


def _line_args(survey):
    return [
        (l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
        for l in survey.lines
    ]


class TestPrefetchIter:
    def test_order_and_completeness(self):
        out = list(prefetch_iter([lambda i=i: i for i in range(17)], depth=3))
        assert out == list(range(17))

    def test_exception_propagates(self):
        def boom():
            raise ValueError("io failed")

        thunks = [lambda: 1, boom, lambda: 3]
        with pytest.raises(ValueError, match="io failed"):
            list(prefetch_iter(thunks, depth=2))

    def test_overlap_hides_consumer_latency(self):
        """Producer (sleep 60 ms/item) and consumer (sleep 60 ms/item) overlap:
        pipelined wall must be well below the 2x serial sum."""
        n, d = 6, 0.06

        def thunk():
            time.sleep(d)
            return 1

        t0 = time.perf_counter()
        for _ in prefetch_iter([thunk] * n, depth=2):
            time.sleep(d)  # simulated device-dispatch/consume work
        wall = time.perf_counter() - t0
        serial = 2 * n * d
        assert wall < 0.8 * serial, (wall, serial)


class TestPipelinedBuild:
    def test_matches_eager_keyframes(self):
        from diasss_tpu.frame import build_keyframe

        survey = make_survey(n_lines=3, n_pings=120, n_bins=128, n_landmarks=20, seed=3)
        args = _line_args(survey)
        frames_p, feats_p = build_keyframes_pipelined([lambda a=a: a for a in args])
        assert feats_p is None
        frames_e = [build_keyframe(*a) for a in args]
        for fp, fe in zip(frames_p, frames_e):
            assert fp.img_id == fe.img_id
            np.testing.assert_array_equal(np.asarray(fp.norm), np.asarray(fe.norm))
            np.testing.assert_array_equal(np.asarray(fp.mask), np.asarray(fe.mask))
            np.testing.assert_allclose(np.asarray(fp.geo), np.asarray(fe.geo))

    def test_matches_eager_features(self):
        from diasss_tpu.config import DetectorConfig
        from diasss_tpu.features import detect_features
        from diasss_tpu.frame import build_keyframe

        survey = make_survey(n_lines=2, n_pings=200, n_bins=128, n_landmarks=30, seed=5)
        args = _line_args(survey)
        cfg = DetectorConfig(n_features=64)
        frames_p, feats_p = build_keyframes_pipelined(
            [lambda a=a: a for a in args], detector_cfg=cfg
        )
        for fp, a in zip(feats_p, args):
            fe = detect_features(build_keyframe(*a).norm, build_keyframe(*a).mask, cfg)
            np.testing.assert_array_equal(np.asarray(fp.xy), np.asarray(fe.xy))
            np.testing.assert_array_equal(np.asarray(fp.valid), np.asarray(fe.valid))


class TestPipelinedFolderLoad:
    def test_matches_eager_load(self, tmp_path):
        from diasss_tpu.io.loader import load_input_data, save_survey

        survey = make_survey(n_lines=3, n_pings=100, n_bins=64, n_landmarks=10, seed=1)
        folders = save_survey(survey, str(tmp_path))
        frames, feats, timings = load_keyframes_pipelined(
            folders["image"], folders["pose"], folders["altitude"],
            folders["groundrange"], folders["annotation"],
        )
        assert feats is None
        assert timings["load_pipelined_wall"] > 0
        data = load_input_data(
            folders["image"], folders["pose"], folders["altitude"],
            folders["groundrange"], folders["annotation"],
        )
        assert len(frames) == len(data.images) == 3
        for k, f in enumerate(frames):
            np.testing.assert_allclose(np.asarray(f.raw), data.images[k], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(f.dr_poses), data.poses[k], rtol=1e-6)
            np.testing.assert_array_equal(f.annos, data.annotations[k])


class TestOnlineStream:
    def test_run_stream_matches_add_frame(self):
        from diasss_tpu.config import PipelineConfig
        from diasss_tpu.frame import build_keyframe
        from diasss_tpu.online import OnlineSlam

        survey = make_survey(n_lines=3, n_pings=150, n_bins=512, n_landmarks=40, seed=7)
        args = _line_args(survey)

        seq = OnlineSlam(PipelineConfig())
        for a in args:
            poses_seq = seq.add_frame(build_keyframe(*a))

        stream = OnlineSlam(PipelineConfig())
        for poses_str in stream.run_stream([lambda a=a: a for a in args]):
            pass

        np.testing.assert_allclose(
            np.asarray(poses_seq.t), np.asarray(poses_str.t), atol=1e-5
        )
        assert stream.state.n_lc == seq.state.n_lc
