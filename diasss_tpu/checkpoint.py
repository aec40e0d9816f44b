"""Checkpoint / resume for pipeline and solver state (SURVEY §5).

The reference has no checkpointing (its incremental iSAM2 state is implicit and
lost on exit).  Here every expensive stage's output is a plain pytree of arrays,
so snapshots are trivial: an ``.npz`` per stage with a manifest.  ``run_slam``
callers can persist loop-closure results and the solved trajectory and resume
evaluation/reporting without re-solving.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from .geometry import se3
from .solvers.lc import LCResult


def save_lc_results(path: str, lc: Dict[tuple, LCResult]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    manifest = []
    for (i, j), res in lc.items():
        key = f"{i}_{j}"
        manifest.append([i, j])
        arrays[f"{key}_rel_R"] = np.asarray(res.rel_pose.R)
        arrays[f"{key}_rel_t"] = np.asarray(res.rel_pose.t)
        for field in LCResult._fields:
            if field == "rel_pose":
                continue
            arrays[f"{key}_{field}"] = np.asarray(getattr(res, field))
    np.savez_compressed(path, manifest=np.asarray(manifest), **arrays)


def load_lc_results(path: str) -> Dict[tuple, LCResult]:
    import jax.numpy as jnp

    data = np.load(path)
    out: Dict[tuple, LCResult] = {}
    for i, j in data["manifest"]:
        key = f"{i}_{j}"
        kwargs = {
            "rel_pose": se3.Pose3(jnp.asarray(data[f"{key}_rel_R"]), jnp.asarray(data[f"{key}_rel_t"]))
        }
        for field in LCResult._fields:
            if field == "rel_pose":
                continue
            kwargs[field] = jnp.asarray(data[f"{key}_{field}"])
        out[(int(i), int(j))] = LCResult(**kwargs)
    return out


def save_trajectory_state(path: str, poses: se3.Pose3, frame_slices, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        R=np.asarray(poses.R),
        t=np.asarray(poses.t),
        slices=np.asarray([[s.start, s.stop] for s in frame_slices]),
        meta=json.dumps(meta or {}),
    )


def load_trajectory_state(path: str):
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    poses = se3.Pose3(jnp.asarray(data["R"]), jnp.asarray(data["t"]))
    slices = [slice(int(a), int(b)) for a, b in data["slices"]]
    meta = json.loads(str(data["meta"]))
    return poses, slices, meta
