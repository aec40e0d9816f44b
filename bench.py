"""Benchmark: end-to-end SLAM throughput in pings/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured span: keyframe preprocessing (normalize/mask/geo) + batched loop-closure
mini-solves + global pose-graph LM, on a standard synthetic survey (5 lines x 600
pings x 512 bins, annotation-driven — the test_demo-equivalent configuration,
BASELINE.json config 1/3).  Warmup run first so compile time is excluded; the
reported number is steady-state throughput.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); its estimation
core streams every ping through two ``isam.update()`` calls on a growing graph,
single-threaded CPU (optimizer.cpp:264-268).  We use a nominal 100 pings/sec for
that pipeline as the comparison denominator — a deliberately generous estimate
for a ~3000-ping survey with relinearization.
"""

import json
import time

REFERENCE_BASELINE_PINGS_PER_SEC = 100.0


def run(n_lines=5, n_pings=600, n_bins=512, n_landmarks=60):
    from diasss_tpu.config import PipelineConfig
    from diasss_tpu.frame import build_keyframe
    from diasss_tpu.pipeline import run_slam
    from diasss_tpu.synthetic import make_survey

    survey = make_survey(n_lines=n_lines, n_pings=n_pings, n_bins=n_bins, n_landmarks=n_landmarks)
    total_pings = sum(len(l.dr_poses) for l in survey.lines)

    def one_pass():
        t0 = time.perf_counter()
        frames = [
            build_keyframe(l.img_id, l.image, l.dr_poses, l.altitudes, l.ground_ranges, l.annos)
            for l in survey.lines
        ]
        result = run_slam(frames, PipelineConfig(), run_eval2=False)
        return time.perf_counter() - t0, result

    # warmup (compile)
    _, result = one_pass()
    # measured pass
    dt, result = one_pass()
    return total_pings / dt, result, dt


def main():
    value, result, dt = run()
    print(
        json.dumps(
            {
                "metric": "slam_pings_per_sec",
                "value": round(value, 2),
                "unit": "pings/s",
                "vs_baseline": round(value / REFERENCE_BASELINE_PINGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
