"""GetKpsPairs (C10) semantics: target selection, nadir gate, slant ranges,
depth scaling, padding."""

import numpy as np

from diasss_tpu.pairs import get_kps_pairs


def make_inputs():
    alts = np.full(100, 12.0)
    gras = 5.0 + 0.1 * np.arange(256)  # G = 256 -> n_bins = 512
    return alts, gras


class TestGetKpsPairs:
    def test_selects_target_and_computes_slant(self):
        alts, gras = make_inputs()
        rows = np.asarray(
            [
                # (id_s, id_t, ping_s, bin_s, ping_t, bin_t, depth*1e5)
                [0, 1, 10, 300, 20, 310, 1200000],
                [0, 2, 11, 300, 21, 310, 1200000],  # different target -> dropped
            ],
            np.int64,
        )
        kp = get_kps_pairs(rows, 1, alts, gras, alts, gras, use_anno=True)
        assert kp.valid.sum() == 1
        row = kp.pairs[0]
        # slant range: sqrt(alt^2 + gras[|300-256|]^2) (optimizer.cpp:616-619)
        g = gras[300 - 256]
        np.testing.assert_allclose(row[2], np.sqrt(12.0**2 + g * g), rtol=1e-5)
        # depth scaled by 1e5 (optimizer.cpp:622)
        np.testing.assert_allclose(row[6], 12.0, rtol=1e-6)

    def test_nadir_gate(self):
        alts, gras = make_inputs()
        rows = np.asarray(
            [
                [0, 1, 10, 256 + 10, 20, 400, 0],  # source 10 bins from nadir -> dropped
                [0, 1, 10, 400, 20, 256 - 5, 0],  # target 5 bins from nadir -> dropped
                [0, 1, 10, 400, 20, 300, 0],  # both >= 20 away -> kept
            ],
            np.int64,
        )
        kp = get_kps_pairs(rows, 1, alts, gras, alts, gras, use_anno=True, nadir_threshold=20)
        assert kp.valid.sum() == 1
        assert kp.pairs[0][1] == 400

    def test_port_side_symmetry(self):
        """Port bins index the table by |bin - G| (optimizer.cpp:616)."""
        alts, gras = make_inputs()
        rows = np.asarray([[0, 1, 10, 256 - 44, 20, 256 + 44, 0]], np.int64)
        kp = get_kps_pairs(rows, 1, alts, gras, alts, gras, use_anno=True)
        assert kp.valid.sum() == 1
        np.testing.assert_allclose(kp.pairs[0][2], kp.pairs[0][5], rtol=1e-6)

    def test_detected_rows_no_depth(self):
        alts, gras = make_inputs()
        rows = np.asarray([[0.0, 1.0, 10.4, 400.7, 20.1, 300.9]], np.float64)
        kp = get_kps_pairs(rows, 1, alts, gras, alts, gras, use_anno=False)
        assert kp.valid.sum() == 1
        assert kp.pairs[0][6] == 0.0
        # coordinates truncated to int like the reference cast (optimizer.cpp:596-598)
        assert kp.pairs[0][0] == 10.0
        assert kp.pairs[0][1] == 400.0

    def test_out_of_range_ping_dropped(self):
        alts, gras = make_inputs()
        rows = np.asarray([[0, 1, 150, 400, 20, 300, 0]], np.int64)  # ping 150 >= 100
        kp = get_kps_pairs(rows, 1, alts, gras, alts, gras, use_anno=True)
        assert kp.valid.sum() == 0

    def test_empty_and_padding(self):
        alts, gras = make_inputs()
        kp = get_kps_pairs(np.zeros((0, 7)), 1, alts, gras, alts, gras, use_anno=True, capacity=8)
        assert kp.pairs.shape == (8, 7)
        assert kp.valid.sum() == 0
