"""Sequence-parallel solver tests (parallel/seq.py) on the 8-device CPU mesh.

The pose chain is block-partitioned across devices (O(P/n) pose memory per
device, boundary-pose halo exchange); these tests pin equivalence with the
single-device solvers — same nonlinear fixed point up to CG/LM tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.config import FullBAConfig, KeypointNoiseConfig, PipelineConfig, PoseGraphConfig
from diasss_tpu.geometry import se3
from diasss_tpu.parallel.seq import seq_full_ba_solve, seq_pose_graph_solve
from diasss_tpu.parallel.shard import make_mesh
from diasss_tpu.solvers.pose_graph import build_chain_graph, solve_pose_graph


def _chain_problem(n=100, seed=1, n_lc_step=7):
    """Chain with LC factors spanning device blocks; P deliberately NOT a
    multiple of 8 to exercise the padding path."""
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, 6))
    rows[:, 2] = 0.002 * rng.normal(size=n)
    rows[:, 3] = np.arange(n) * 0.5
    rows[:, 4] = 0.05 * rng.normal(size=n)
    gt = se3.from_rodrigues_xyz(jnp.asarray(rows, jnp.float32))
    lc_i = np.arange(2, n - 40, n_lc_step, dtype=np.int32)
    lc_j = (lc_i + 31).astype(np.int32)  # crosses block boundaries
    meas = se3.between(gt[jnp.asarray(lc_i)], gt[jnp.asarray(lc_j)])
    return build_chain_graph(
        [rows], lc_i=lc_i, lc_j=lc_j, lc_meas=meas,
        lc_sigmas=np.full((len(lc_i), 6), 0.05, np.float32),
        lc_valid=np.ones(len(lc_i), bool),
        noise_key=jax.random.PRNGKey(2),
    )


class TestSeqPoseGraph:
    def test_matches_single_device(self):
        assert len(jax.devices()) >= 8
        g = _chain_problem()
        cfg = PoseGraphConfig(max_gn_iters=10)
        poses_ref, info_ref = solve_pose_graph(g, cfg)
        mesh = make_mesh(8)
        poses_sp, info_sp = seq_pose_graph_solve(mesh, g, cfg)
        assert poses_sp.t.shape == poses_ref.t.shape
        np.testing.assert_allclose(np.asarray(poses_sp.t), np.asarray(poses_ref.t), atol=2e-3)
        # both reach (essentially) the same optimum
        assert abs(float(info_sp.error) - float(info_ref.error)) < 1e-2 * max(
            float(info_ref.error), 1.0
        )

    def test_improves_over_initialization(self):
        g = _chain_problem(n=64, seed=3)
        mesh = make_mesh(8)
        poses, info = seq_pose_graph_solve(mesh, g, PoseGraphConfig(max_gn_iters=8))
        assert float(info.error) < 0.5 * float(info.error0)

    def test_gauge_pose_held_fixed(self):
        g = _chain_problem(n=48, seed=4)
        mesh = make_mesh(8)
        poses, _ = seq_pose_graph_solve(mesh, g, PoseGraphConfig(max_gn_iters=5))
        np.testing.assert_array_equal(np.asarray(poses.t[0]), np.asarray(g.poses0.t[0]))
        np.testing.assert_array_equal(np.asarray(poses.R[0]), np.asarray(g.poses0.R[0]))

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_mesh_size_invariance(self, n_dev):
        """The fixed point must not depend on the block partition."""
        g = _chain_problem(n=72, seed=5)
        cfg = PoseGraphConfig(max_gn_iters=8)
        ref, _ = seq_pose_graph_solve(make_mesh(2), g, cfg)
        out, _ = seq_pose_graph_solve(make_mesh(n_dev), g, cfg)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), atol=2e-3)

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_direct_matches_single_device_direct(self, n_dev):
        """The distributed EXACT direct step (SPIKE chain factorization +
        replicated LC Woodbury) reaches the single-device direct solver's
        fixed point at 2/4/8 devices — the zero-CG path now exists on the
        mesh (VERDICT r3 item 2)."""
        g = _chain_problem()
        cfg = PoseGraphConfig(max_gn_iters=10, preconditioner="direct")
        poses_ref, info_ref = solve_pose_graph(g, cfg)
        poses_sp, info_sp = seq_pose_graph_solve(make_mesh(n_dev), g, cfg)
        # zero CG iterations by construction (unified direct convention)
        assert int(info_sp.cg_iters_total) == 0
        np.testing.assert_allclose(
            np.asarray(poses_sp.t), np.asarray(poses_ref.t), atol=2e-3
        )
        assert abs(float(info_sp.error) - float(info_ref.error)) < 1e-2 * max(
            float(info_ref.error), 1.0
        )


class TestSeqFullBA:
    @pytest.fixture(scope="class")
    def ba_problem(self):
        from diasss_tpu.frame import build_keyframe
        from diasss_tpu.pairs import get_kps_pairs
        from diasss_tpu.pipeline import _overlap_pairs
        from diasss_tpu.solvers.full_ba import build_ba_problem
        from diasss_tpu.synthetic import make_survey

        survey = make_survey(n_lines=2, n_pings=120, n_bins=256, n_landmarks=40,
                             n_tie_lines=1, seed=3)
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        pair_ids = _overlap_pairs(frames, 0.1)
        kps = {
            k: get_kps_pairs(
                frames[k[0]].annos, frames[k[1]].img_id,
                np.asarray(frames[k[0]].altitudes), np.asarray(frames[k[0]].ground_ranges),
                np.asarray(frames[k[1]].altitudes), np.asarray(frames[k[1]].ground_ranges),
                use_anno=True,
            )
            for k in pair_ids
        }
        ba = FullBAConfig(max_iters=12)
        return build_ba_problem(frames, kps, pair_ids, ba, PipelineConfig().pose_graph, None), ba

    def test_matches_single_device(self, ba_problem):
        from diasss_tpu.solvers.full_ba import solve_full_ba

        prob, ba = ba_problem
        kp_cfg = KeypointNoiseConfig()
        poses_ref, lms_ref, info_ref = solve_full_ba(prob, ba, kp_cfg)
        mesh = make_mesh(8)
        poses_sp, lms_sp, info_sp = seq_full_ba_solve(mesh, prob, ba, kp_cfg)
        assert poses_sp.t.shape == poses_ref.t.shape
        assert lms_sp.shape == lms_ref.shape
        np.testing.assert_allclose(np.asarray(poses_sp.t), np.asarray(poses_ref.t), atol=3e-3)
        assert abs(float(info_sp.error) - float(info_ref.error)) < 1e-2 * max(
            float(info_ref.error), 1.0
        )

    def test_landmarks_near_single_device(self, ba_problem):
        from diasss_tpu.solvers.full_ba import solve_full_ba

        prob, ba = ba_problem
        kp_cfg = KeypointNoiseConfig()
        _, lms_ref, _ = solve_full_ba(prob, ba, kp_cfg)
        _, lms_sp, _ = seq_full_ba_solve(make_mesh(8), prob, ba, kp_cfg)
        valid = np.asarray(prob.kp_valid)
        np.testing.assert_allclose(
            np.asarray(lms_sp)[valid], np.asarray(lms_ref)[valid], atol=5e-2
        )

    @pytest.mark.parametrize("n_dev", [2, 4])
    def test_mesh_size_invariance(self, ba_problem, n_dev):
        """Owner-aligned routing differs per mesh size; the fixed point must not."""
        from diasss_tpu.solvers.full_ba import solve_full_ba

        prob, ba = ba_problem
        kp_cfg = KeypointNoiseConfig()
        poses_ref, lms_ref, _ = solve_full_ba(prob, ba, kp_cfg)
        poses_sp, lms_sp, _ = seq_full_ba_solve(make_mesh(n_dev), prob, ba, kp_cfg)
        np.testing.assert_allclose(np.asarray(poses_sp.t), np.asarray(poses_ref.t), atol=3e-3)
        valid = np.asarray(prob.kp_valid)
        np.testing.assert_allclose(
            np.asarray(lms_sp)[valid], np.asarray(lms_ref)[valid], atol=5e-2
        )

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_direct_matches_single_device_direct(self, ba_problem, n_dev):
        """The distributed direct Woodbury step of the Schur-reduced system
        (SPIKE chain factorization + all-gathered landmark coupling columns)
        reaches the single-device direct fixed point — zero CG on the mesh
        (VERDICT r3 items 1+2 composed)."""
        import dataclasses

        from diasss_tpu.solvers.full_ba import solve_full_ba

        prob, ba = ba_problem
        ba_d = dataclasses.replace(ba, preconditioner="direct")
        kp_cfg = KeypointNoiseConfig()
        poses_ref, lms_ref, info_ref = solve_full_ba(prob, ba_d, kp_cfg)
        poses_sp, lms_sp, info_sp = seq_full_ba_solve(make_mesh(n_dev), prob, ba_d, kp_cfg)
        assert int(info_sp.cg_iters_total) == 0
        np.testing.assert_allclose(
            np.asarray(poses_sp.t), np.asarray(poses_ref.t), atol=3e-3
        )
        valid = np.asarray(prob.kp_valid)
        np.testing.assert_allclose(
            np.asarray(lms_sp)[valid], np.asarray(lms_ref)[valid], atol=5e-2
        )
        assert abs(float(info_sp.error) - float(info_ref.error)) < 1e-2 * max(
            float(info_ref.error), 1.0
        )


class TestReshardLayoutSimulation:
    """The owner-align build derives routing tables from a HOST simulation of
    reshard_rows' row placement (multihost-safe); pin sim == device layout."""

    @pytest.mark.parametrize("seed,k,n_dev", [(0, 257, 8), (1, 64, 4), (2, 500, 8)])
    def test_simulation_matches_device_reshard(self, seed, k, n_dev):
        from diasss_tpu.parallel.alltoall import reshard_rows
        from diasss_tpu.parallel.seq import _simulate_reshard_layout

        rng = np.random.default_rng(seed)
        dest = rng.integers(0, n_dev, k).astype(np.int32)
        valid = rng.random(k) > 0.15
        capacity = int(max(1, np.bincount(dest[valid], minlength=n_dev).max()))
        mesh = make_mesh(n_dev)
        keys = jnp.arange(k, dtype=jnp.int32)
        out, vout, dropped = reshard_rows(
            mesh, {"key": keys}, jnp.asarray(dest), jnp.asarray(valid),
            capacity=capacity,
        )
        assert dropped == 0
        out_orig = _simulate_reshard_layout(dest, valid, n_dev, capacity)
        got_keys = np.asarray(out["key"])
        got_valid = np.asarray(vout)
        np.testing.assert_array_equal(got_valid, out_orig >= 0)
        np.testing.assert_array_equal(got_keys[got_valid], out_orig[out_orig >= 0])
