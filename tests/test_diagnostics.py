"""Diagnostics: finiteness walker + determinism report + solver determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from diasss_tpu.diagnostics import check_finite, determinism_report


class TestCheckFinite:
    def test_clean_tree(self):
        tree = {"a": jnp.ones(4), "b": (jnp.zeros(2), np.arange(3))}
        assert check_finite(tree) == []

    def test_flags_nan_and_inf(self):
        tree = {"a": jnp.asarray([1.0, np.nan]), "b": jnp.asarray([np.inf])}
        bad = check_finite(tree)
        assert len(bad) == 2
        assert any("'a'" in s for s in bad)


class TestDeterminism:
    def test_jitted_solver_is_deterministic(self):
        """The pose-graph solve must be bitwise repeatable (SURVEY §5 race row)."""
        import sys

        sys.path.insert(0, "tests")
        from test_pose_graph import _no_lc, make_chain

        from diasss_tpu.config import PoseGraphConfig
        from diasss_tpu.solvers.pose_graph import build_chain_graph, solve_pose_graph

        g = build_chain_graph([make_chain(50)], **_no_lc(), noise_key=jax.random.PRNGKey(0))

        def run():
            poses, info = solve_pose_graph(g, PoseGraphConfig(max_gn_iters=5))
            return poses.t, info.error

        rep = determinism_report(run)
        assert rep["deterministic"], rep

    def test_detects_nondeterminism(self):
        state = {"k": 0}

        def impure():
            state["k"] += 1
            return jnp.asarray(float(state["k"]))

        rep = determinism_report(impure)
        assert not rep["deterministic"]
