"""CLI end-to-end test: the full user surface on a tiny generated dataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # generate a small dataset in the reference layout
    r = subprocess.run(
        [sys.executable, "-m", "diasss_tpu.synthetic", str(tmp_path / "ds"), "2", "150", "512"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr

    out = tmp_path / "out"
    args = [
        sys.executable, "-m", "diasss_tpu.cli",
        "--image", str(tmp_path / "ds/img-xml"),
        "--pose", str(tmp_path / "ds/pose-xml"),
        "--altitude", str(tmp_path / "ds/altitude"),
        "--groundrange", str(tmp_path / "ds/groundrange"),
        "--annotation", str(tmp_path / "ds/annos-xml"),
        "--gt", str(tmp_path / "ds/gt-poses"),
        "--out", str(out),
        "--metrics", str(tmp_path / "metrics.json"),
        "--cpu", "--no-eval2",
    ]
    r = subprocess.run(args, cwd=repo, env=env, capture_output=True, text=True, timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ATE DR/EST" in r.stdout

    metrics = json.loads((tmp_path / "metrics.json").read_text())
    assert metrics["n_frames"] == 2
    assert np.isfinite(metrics["solve_error"])

    # trajectory dumps exist with the right shapes
    est = np.loadtxt(out / "est_poses_all.txt")
    assert est.shape == (300, 6)
    quat = np.loadtxt(out / "est_poses.txt")  # 2-frame run -> pairwise format too
    assert quat.shape == (300, 7)
    # reference text artifacts
    assert (out / "annotated_kps.txt").exists()
    assert (out / "ini_lm_errors.txt").exists()


def test_cli_mesh(tmp_path):
    """--mesh N routes global solves + stacked matching through an N-device
    mesh (8 virtual CPU devices via conftest's XLA_FLAGS)."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "diasss_tpu.synthetic", str(tmp_path / "ds"), "2", "150", "512"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr
    args = [
        sys.executable, "-m", "diasss_tpu.cli",
        "--image", str(tmp_path / "ds/img-xml"),
        "--pose", str(tmp_path / "ds/pose-xml"),
        "--altitude", str(tmp_path / "ds/altitude"),
        "--groundrange", str(tmp_path / "ds/groundrange"),
        "--annotation", str(tmp_path / "ds/annos-xml"),
        "--gt", str(tmp_path / "ds/gt-poses"),
        "--mesh", "8", "--cpu", "--no-eval2",
    ]
    r = subprocess.run(args, cwd=repo, env=env, capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ATE DR/EST" in r.stdout


def test_compile_cache_helper(tmp_path):
    """enable_compile_cache points JAX at the given dir; an unwritable
    location degrades to uncached compiles instead of raising."""
    import jax

    from diasss_tpu.cache import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla_cache")
        assert enable_compile_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # a path under a FILE cannot be created -> graceful empty return
        blocker = tmp_path / "blocker"
        blocker.write_text("x")
        assert enable_compile_cache(str(blocker / "sub")) == ""
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
