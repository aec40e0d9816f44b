"""IO tests: OpenCV-XML roundtrip, cv2 cross-validation, native/python parity."""

import os

import numpy as np
import pytest

from diasss_tpu.io.opencv_xml import read_matrix, write_matrix


class TestOpenCVXML:
    def test_roundtrip_float(self, tmp_path, rng):
        m = rng.normal(size=(17, 9))
        p = str(tmp_path / "m.xml")
        write_matrix(p, "ct_img", m)
        m2 = read_matrix(p, "ct_img")
        np.testing.assert_allclose(m, m2, rtol=1e-15)
        assert m2.dtype == np.float64

    def test_roundtrip_int(self, tmp_path, rng):
        m = rng.integers(-1000, 120000000, size=(5, 7)).astype(np.int64)
        p = str(tmp_path / "a.xml")
        write_matrix(p, "anno_kps", m)
        m2 = read_matrix(p, "anno_kps")
        np.testing.assert_array_equal(m, m2.astype(np.int64))

    def test_cv2_reads_our_files(self, tmp_path, rng):
        """Files we write must be readable by OpenCV itself (format parity)."""
        cv2 = pytest.importorskip("cv2")
        m = rng.normal(size=(11, 4))
        p = str(tmp_path / "m.xml")
        write_matrix(p, "ct_img", m)
        fs = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
        got = fs.getNode("ct_img").mat()
        fs.release()
        np.testing.assert_allclose(m, got, rtol=1e-12)

    def test_we_read_cv2_files(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        m = rng.normal(size=(6, 8))
        p = str(tmp_path / "m.xml")
        fs = cv2.FileStorage(p, cv2.FILE_STORAGE_WRITE)
        fs.write("auv_pose", m)
        fs.release()
        got = read_matrix(p, "auv_pose")
        np.testing.assert_allclose(m, got, rtol=1e-12)

    def test_missing_key_raises(self, tmp_path, rng):
        p = str(tmp_path / "m.xml")
        write_matrix(p, "ct_img", rng.normal(size=(2, 2)))
        with pytest.raises(KeyError):
            read_matrix(p, "nope")


class TestNative:
    def test_native_matches_python(self, tmp_path, rng):
        from diasss_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        m = rng.normal(size=(40, 33))
        p = str(tmp_path / "m.xml")
        write_matrix(p, "ct_img", m)
        np.testing.assert_allclose(native.read_matrix(p, "ct_img"), m, rtol=1e-12)

        a = rng.normal(size=(25,))
        tp = str(tmp_path / "alt.txt")
        with open(tp, "w") as f:
            for v in a:
                f.write(f"{v:.9f}\n")
        np.testing.assert_allclose(native.read_txt_column(tp), a, atol=1e-8)

    def test_native_int_matrix(self, tmp_path, rng):
        from diasss_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        m = rng.integers(0, 1 << 30, size=(9, 7)).astype(np.int64)
        p = str(tmp_path / "a.xml")
        write_matrix(p, "anno_kps", m)
        np.testing.assert_array_equal(native.read_matrix(p, "anno_kps").astype(np.int64), m)


class TestSurveyRoundtrip:
    def test_save_load_survey(self, tmp_path):
        from diasss_tpu.io import load_input_data, save_survey
        from diasss_tpu.synthetic import make_survey

        survey = make_survey(n_lines=2, n_pings=60, n_bins=64, n_landmarks=5)
        folders = save_survey(survey, str(tmp_path))
        data = load_input_data(
            folders["image"], folders["pose"], folders["altitude"],
            folders["groundrange"], folders["annotation"],
        )
        assert len(data.images) == 2
        np.testing.assert_allclose(data.images[0], survey.lines[0].image, rtol=1e-12)
        np.testing.assert_allclose(data.poses[1], survey.lines[1].dr_poses, rtol=1e-12)
        np.testing.assert_allclose(data.altitudes[0], survey.lines[0].altitudes, atol=1e-8)
