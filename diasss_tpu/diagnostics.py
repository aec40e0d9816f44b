"""Numerical health + determinism diagnostics (SURVEY §5 race/failure rows).

The reference's only self-checks are inline index warnings and its LC quality
gate.  Here the equivalents are:

* :func:`check_finite` — walk a result pytree for NaN/Inf (the ``jax_debug_nans``
  analogue usable on production results),
* :func:`determinism_report` — run a jitted computation twice and compare
  bitwise; XLA compilations are deterministic per (platform, shapes), so any
  mismatch indicates nondeterministic inputs or an unstable reduction order,
* the LC quality gate (solvers/lc.py) remains the numerical-robustness gate
  matching the reference's accept/reject semantics.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def check_finite(tree: Any, name: str = "result") -> List[str]:
    """Return a list of paths in the pytree containing non-finite values."""
    bad: List[str] = []
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        try:
            arr = np.asarray(leaf)
        except Exception:
            continue
        if arr.dtype.kind in "fc" and not np.all(np.isfinite(arr)):
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")
    return bad


def determinism_report(fn, *args, runs: int = 2) -> Dict[str, Any]:
    """Run ``fn(*args)`` ``runs`` times; report max bitwise deviation per leaf."""
    outs = [jax.tree_util.tree_map(np.asarray, fn(*args)) for _ in range(runs)]
    ref = outs[0]
    report: Dict[str, Any] = {"deterministic": True, "max_abs_dev": 0.0}
    for other in outs[1:]:
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(other),
        ):
            a = np.asarray(a)
            b = np.asarray(b)
            if a.dtype.kind in "fc":
                dev = float(np.max(np.abs(a - b))) if a.size else 0.0
                if dev > 0:
                    report["deterministic"] = False
                    report["max_abs_dev"] = max(report["max_abs_dev"], dev)
            elif not np.array_equal(a, b):
                report["deterministic"] = False
    return report
