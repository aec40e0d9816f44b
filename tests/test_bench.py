"""bench.py smoke tests — the driver's scoreboard entry point must not break.

The real bench runs at 3k/12k/full-BA/auto scales on TPU; these run the same
code paths at toy scale on CPU so a refactor that breaks the bench harness
(not the engine) is caught by CI rather than by a lost round of numbers.
"""

import dataclasses
import json

import numpy as np


def test_bench_run_annotation_path():
    import bench

    r = bench.run(n_lines=2, n_pings=100, n_bins=256, n_landmarks=15,
                  n_passes=1, with_gt=True)
    assert r["pings_per_sec"] > 0
    assert len(r["walls"]) == 1
    assert 0 < r["timings_sum_frac"] <= 1.05
    assert np.isfinite(r["ate_est"]) and np.isfinite(r["ate_dr"])
    # explicit preprocessing/upload stages present (profile sums to wall)
    assert "keyframes_host" in r["timings"]
    assert "upload" in r["timings"]
    # counters must not pollute the coverage fraction
    t_only = {k: v for k, v in r["timings"].items()
              if not (k.endswith("_pairs") or k.endswith("_devices")
                      or k.endswith("_solves") or k.endswith("_cells")
                      or k.endswith("_rounds"))}
    assert abs(sum(t_only.values()) / r["wall"] - r["timings_sum_frac"]) < 1e-9
    # everything the JSON line carries must serialize
    json.dumps({k: v for k, v in r.items() if k != "timings"}, default=float)


def test_bench_run_full_ba_and_auto_paths():
    import bench
    from diasss_tpu.config import PipelineConfig, automatic_config

    ba_cfg = dataclasses.replace(PipelineConfig(), min_overlap=0.1,
                                 estimator="full_ba")
    r = bench.run(n_lines=2, n_pings=100, n_bins=256, n_landmarks=15,
                  n_tie_lines=1, n_passes=1, cfg=ba_cfg, with_gt=True)
    assert r["pings_per_sec"] > 0 and np.isfinite(r["ate_est"])

    r2 = bench.run(n_lines=2, n_pings=100, n_bins=256, n_landmarks=20,
                   n_tie_lines=1, n_passes=1, cfg=automatic_config(),
                   with_gt=True, drift_xy=0.006, seed=7)
    assert r2["pings_per_sec"] > 0
    assert "matching" in r2["timings"] and "detect" in r2["timings"]


def test_reference_stream_proxy_positive():
    import bench

    v = bench.reference_stream_proxy(300)
    assert v > 0


def test_reference_auto_proxy_runs():
    """The detected-pipeline CPU proxy (vs_baseline_auto denominator) must
    produce a positive rate on a small survey, or None without opencv."""
    import bench
    from diasss_tpu.synthetic import make_survey

    s = make_survey(n_lines=2, n_pings=120, n_bins=256, n_landmarks=30, seed=1)
    r, n = bench.reference_auto_proxy(s, 1, 240)
    assert (r is None and n is None) or (r > 0 and n >= 0)
