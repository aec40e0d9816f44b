"""Checkpoint / resume for pipeline and solver state (SURVEY §5).

The reference has no checkpointing (its incremental iSAM2 state is implicit and
lost on exit).  Here every expensive stage's output is a plain pytree of arrays,
so snapshots are trivial: an ``.npz`` per stage with a manifest.  ``run_slam``
callers can persist loop-closure results and the solved trajectory and resume
evaluation/reporting without re-solving.

Mid-solve checkpointing: both big solvers expose their full LM state — current
iterate (poses [+ landmarks]), damping ``lam``, iteration count — so an
interrupted optimization RESUMES instead of restarting.
:func:`solve_pose_graph_checkpointed` / :func:`solve_full_ba_checkpointed` run
the solver in bounded chunks (``chunk`` LM iterations per device dispatch),
snapshot the state between chunks, and on restart continue from the snapshot:
kill the process after any chunk and the rerun reaches the same optimum having
paid only the remaining iterations (tests/test_checkpoint.py).
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


# ---------------------------------------------------------------------------
# Mid-solve checkpoint / resume (module docstring)
# ---------------------------------------------------------------------------


def save_solver_state(path: str, poses: se3.Pose3, lam, iterations: int,
                      landmarks=None, meta: dict | None = None,
                      stall: int = 0) -> None:
    """Snapshot a solver's full LM state (iterate + damping + progress +
    stall-exit counter — carrying ``stall`` keeps the 2-trial stall exit
    identical across chunk boundaries)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = dict(
        R=np.asarray(poses.R), t=np.asarray(poses.t),
        lam=np.asarray(lam, np.float64),
        iterations=np.asarray(int(iterations), np.int64),
        stall=np.asarray(int(stall), np.int64),
        meta=json.dumps(meta or {}),
    )
    if landmarks is not None:
        arrays["landmarks"] = np.asarray(landmarks)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)  # atomic: a kill mid-write never corrupts the snapshot


def load_solver_state(path: str):
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    poses = se3.Pose3(jnp.asarray(data["R"]), jnp.asarray(data["t"]))
    lms = jnp.asarray(data["landmarks"]) if "landmarks" in data else None
    return dict(
        poses=poses, lam=float(data["lam"]), iterations=int(data["iterations"]),
        stall=int(data["stall"]) if "stall" in data else 0,
        landmarks=lms, meta=json.loads(str(data["meta"])),
    )


def _chunked(total_iters: int, chunk: int):
    done = 0
    while done < total_iters:
        yield min(chunk, total_iters - done)
        done += chunk


def solve_pose_graph_checkpointed(graph, cfg=None, path: str = "solver_ckpt.npz",
                                  chunk: int = 5):
    """:func:`..solvers.pose_graph.solve_pose_graph` in resumable chunks.

    Same fixed point as the one-shot solve (the LM loop is merely split at
    chunk boundaries; iterate + lam carry over exactly).  If ``path`` exists,
    resumes from it; deletes it on convergence.  Returns (poses, info).
    """
    import dataclasses

    from .config import PoseGraphConfig
    from .solvers.pose_graph import solve_pose_graph

    cfg = cfg or PoseGraphConfig()
    done = 0
    lam = None
    stall = 0
    if os.path.exists(path):
        st = load_solver_state(path)
        graph = graph._replace(poses0=st["poses"])
        lam, done, stall = st["lam"], st["iterations"], st["stall"]
    info = None
    for n in _chunked(cfg.max_gn_iters - done, chunk):
        if stall >= 2:
            break
        ccfg = dataclasses.replace(cfg, max_gn_iters=n)
        poses, info = solve_pose_graph(graph, ccfg, lam0=lam, stall0=stall)
        done += int(np.asarray(info.iterations))
        lam = float(np.asarray(info.lam))
        stall = int(np.asarray(info.stall))
        graph = graph._replace(poses0=poses)
        save_solver_state(path, poses, lam, done, stall=stall,
                          meta={"error": float(np.asarray(info.error))})
        if int(np.asarray(info.iterations)) < n:  # converged inside the chunk
            break
    if info is None:
        # resumed at an already-converged/stalled snapshot (stall >= 2 or all
        # iterations done): run a zero-iteration solve so callers still get a
        # consistent SolveInfo (error of the snapshot iterate) instead of None
        ccfg = dataclasses.replace(cfg, max_gn_iters=0)
        _, info = solve_pose_graph(graph, ccfg, lam0=lam, stall0=stall)
    if os.path.exists(path):
        os.remove(path)
    return graph.poses0, info


def solve_full_ba_checkpointed(prob, cfg, kp_cfg, path: str = "ba_ckpt.npz",
                               chunk: int = 5):
    """:func:`..solvers.full_ba.solve_full_ba` in resumable chunks (poses +
    landmarks + lam snapshotted).  Returns (poses, landmarks, info)."""
    import dataclasses

    from .solvers.full_ba import solve_full_ba

    done = 0
    lam = None
    stall = 0
    if os.path.exists(path):
        st = load_solver_state(path)
        prob = prob._replace(poses0=st["poses"], lm0=st["landmarks"])
        lam, done, stall = st["lam"], st["iterations"], st["stall"]
    info = None
    lms = prob.lm0
    for n in _chunked(cfg.max_iters - done, chunk):
        if stall >= 2:
            break
        ccfg = dataclasses.replace(cfg, max_iters=n)
        poses, lms, info = solve_full_ba(prob, ccfg, kp_cfg, lam0=lam, stall0=stall)
        done += int(np.asarray(info.iterations))
        lam = float(np.asarray(info.lam))
        stall = int(np.asarray(info.stall))
        prob = prob._replace(poses0=poses, lm0=lms)
        save_solver_state(path, poses, lam, done, landmarks=lms, stall=stall,
                          meta={"error": float(np.asarray(info.error))})
        if int(np.asarray(info.iterations)) < n:
            break
    if info is None:
        # resumed at an already-converged/stalled snapshot — see
        # solve_pose_graph_checkpointed
        ccfg = dataclasses.replace(cfg, max_iters=0)
        _, lms, info = solve_full_ba(prob, ccfg, kp_cfg, lam0=lam, stall0=stall)
    if os.path.exists(path):
        os.remove(path)
    return prob.poses0, lms, info
