"""Second batched TPU session for round 4 (one tunnel acquisition):

1. micro_dense formulations on the real chip (documents why shift-scan won);
2. the auto bench entry with the rewritten dense matcher (A/B against the
   75 s matching stage measured pre-rewrite);
3. one final full bench.main() so PERF carries a post-rewrite record.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diasss_tpu.cache import enable_compile_cache

enable_compile_cache()

import jax

print(f"devices: {jax.devices()}", flush=True)

print("=== matcher scaling / ring part 1 (single chip) ===", flush=True)
here0 = os.path.dirname(os.path.abspath(__file__))
src0 = open(os.path.join(here0, "ring_crossover.py")).read()
src0 = src0.replace(
    "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
    repr(os.path.dirname(here0)),
)
exec(compile(src0, "ring_crossover.py", "exec"), {"__name__": "__main__"})

print("=== micro_dense (TPU) ===", flush=True)
here = os.path.dirname(os.path.abspath(__file__))
src = open(os.path.join(here, "micro_dense.py")).read()
src = src.replace(
    "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
    repr(os.path.dirname(here)),
)
exec(compile(src, "micro_dense.py", "exec"), {"__name__": "micro"})

print("=== auto bench entry (rewritten dense matcher) ===", flush=True)
import bench
from diasss_tpu.config import automatic_config

t0 = time.perf_counter()
rauto = bench.run(n_lines=3, n_pings=400, n_tie_lines=1, n_landmarks=200,
                  n_passes=2, cfg=automatic_config(), with_gt=True,
                  drift_xy=0.006, seed=7)
print(f"auto: {rauto['pings_per_sec']:.1f} pings/s  "
      f"ate {rauto['ate_dr']:.2f}->{rauto['ate_est']:.2f}  "
      f"(total incl compile {time.perf_counter()-t0:.0f}s)", flush=True)
print(f"  timings {dict((k, round(v, 3)) for k, v in rauto['timings'].items())}",
      flush=True)

print("=== full bench.main ===", flush=True)
bench.main()
print("ALL DONE", flush=True)
