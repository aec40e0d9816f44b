"""Elastic failure recovery: heartbeat-gated chunked solves that survive
device loss (SURVEY §5 failure-detection/elastic-recovery row).

The reference has no analogue — its iSAM2 state is implicit, single-process,
and lost on any failure (/root/reference/src/core/optimizer.cpp:146-276 is the
stream it would have to restart from scratch).  Here the sequence-parallel
solver's state is explicit (pose iterate + LM damping), so recovery is a
mesh rebuild plus a warm restart:

1. the solve runs in bounded chunks (``chunk`` LM iterations per dispatch);
2. between chunks a liveness probe decides which devices are still healthy —
   by default :func:`..parallel.distributed.heartbeat` over the current mesh
   (a psum of ones: any hung/dead participant stalls or miscounts it); tests
   inject probes that drop devices deliberately;
3. on a shrink the mesh is rebuilt from the survivors and the solve CONTINUES
   from the carried state — the pose chain re-partitions to the new block
   size automatically (the SP solver pads per device count), trading a
   recompile for not losing the optimization;
4. with ``path`` set, every chunk boundary also snapshots to disk
   (:func:`..checkpoint.save_solver_state`), so the same state survives full
   process loss (kill-and-resume, like the single-device checkpointed solve).

Same fixed point as the uninterrupted solve: LM iterate and damping carry
over exactly; only the chunk boundaries (and the device count) differ.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PoseGraphConfig
from ..solvers.pose_graph import PoseGraph, SolveInfo
from .seq import seq_pose_graph_solve
from .shard import make_mesh


# device sets whose heartbeat HUNG (not errored): {key: chunks to skip}.
# A hung collective cannot be cancelled — its daemon thread still occupies
# the participating devices — so immediately re-probing the same set would
# stack another hung collective on them every chunk.  Exponential backoff
# bounds the number of concurrently-wedged probe threads to O(log(chunks)).
# Keys are STABLE device identities (platform, process_index, id), not
# ``id(device)`` — CPython object ids are reused after GC, so a long-lived
# process could otherwise inherit a stale backoff for a fresh device list.
_hang_backoff: dict = {}
_HANG_BACKOFF_CAP = 64  # prune oldest entries beyond this (insertion order)


def _device_set_key(devices: list) -> tuple:
    return tuple(
        (getattr(d, "platform", ""), getattr(d, "process_index", 0), d.id)
        for d in devices
    )


def heartbeat_probe(chunk_idx: int, devices: list, retries: int = 1,
                    timeout_s: float = 30.0) -> list:
    """Default liveness probe: run the mesh heartbeat over the candidate
    devices; return them all if it counts them all.  A CLEAN collective
    error is retried (``retries`` extra attempts) before any shrink — a
    single transient error must not serialize the rest of the solve
    (ADVICE r2).  A dead multi-host peer usually surfaces as a collective
    that HANGS rather than errors, so each attempt runs under a
    ``timeout_s`` watchdog (daemon worker thread).  A hang is NOT retried —
    the abandoned attempt is still executing its collective, and a retry
    would stack a second hung collective on the same devices — and the hung
    device set enters an exponential re-probe backoff (1, 2, 4, ... chunk
    boundaries) so re-grow attempts stay bounded.  Only after failure does
    the probe fall back to this process's LOCAL devices (the survivors a
    single controller can still drive; the failure carries no information
    about WHICH remote device died).

    Caveat (real multi-host hardware): the runtime cannot cancel a
    dispatched collective, so the abandoned attempt may keep this process's
    local devices busy until the distributed runtime tears the operation
    down; if the local mesh wedges behind it, the ``path``-based snapshot
    (written at every chunk boundary) is the recovery layer — a restarted
    process resumes from it (tests/test_recovery.py, test_multihost.py)."""
    import threading

    from jax.sharding import Mesh

    from .distributed import heartbeat

    key = _device_set_key(devices)
    left = _hang_backoff.get(key)
    if left is not None and left.get("skip", 0) > 0:
        left["skip"] -= 1
        return left["fallback"]

    def attempt() -> Optional[bool]:
        result = {}

        def work():
            try:
                mesh = Mesh(np.asarray(devices), ("data",))
                result["ok"] = int(heartbeat(mesh)) == len(devices)
            except Exception:  # collective failure
                result["ok"] = False

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout_s)
        return result.get("ok")  # None -> timed out (hung peer)

    hung = False
    for _ in range(max(retries, 0) + 1):
        ok = attempt()
        if ok:
            _hang_backoff.pop(key, None)
            return devices
        if ok is None:  # hang: do NOT stack another collective on these devices
            hung = True
            break
    local = [d for d in devices if d.process_index == jax.process_index()]
    if not local or len(local) == len(devices):
        # single-process mesh (or no local survivors): a failing heartbeat
        # over purely local devices carries no partition information — fall
        # back to the one device the controller can always drive
        local = devices[:1]
    if hung:
        prev = _hang_backoff.get(key, {"period": 1})
        period = min(prev.get("period", 1) * 2, 64)
        _hang_backoff.pop(key, None)  # re-insert -> newest in insertion order
        _hang_backoff[key] = {"skip": period - 1, "period": period,
                              "fallback": local}
        while len(_hang_backoff) > _HANG_BACKOFF_CAP:
            _hang_backoff.pop(next(iter(_hang_backoff)))
    return local


def elastic_seq_pose_graph_solve(
    graph: PoseGraph,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    chunk: int = 5,
    devices: Optional[list] = None,
    probe: Optional[Callable[[int, list], list]] = heartbeat_probe,
    path: Optional[str] = None,
):
    """Sequence-parallel pose-graph solve that survives device loss.

    Returns ``(poses, info, events)`` where ``events`` records every mesh
    resize — shrink OR re-grow — as ``(chunk_idx, n_before, n_after)``.  The
    probe is handed the FULL original device list at every chunk boundary, so
    devices that recover after a transient failure are re-admitted (the mesh
    re-grows) instead of staying excluded for the rest of the solve.
    """
    from .. import checkpoint as ckpt

    all_devices = list(devices if devices is not None else jax.devices())
    devices = all_devices
    done = 0
    lam = None
    stall = 0
    poses0 = graph.poses0
    if path and os.path.exists(path):
        st = ckpt.load_solver_state(path)
        poses0, lam, done, stall = (
            st["poses"], st["lam"], st["iterations"], st["stall"]
        )

    events: List[tuple] = []
    info = None
    chunk_idx = 0
    while done < cfg.max_gn_iters:
        if probe is not None:
            alive = probe(chunk_idx, all_devices)
            if len(alive) != len(devices):
                events.append((chunk_idx, len(devices), len(alive)))
                devices = list(alive)
        if stall >= 2:
            break
        mesh = make_mesh(len(devices), devices=devices)
        n_it = min(chunk, cfg.max_gn_iters - done)
        ccfg = dataclasses.replace(cfg, max_gn_iters=n_it)
        poses, info = seq_pose_graph_solve(
            mesh, graph._replace(poses0=poses0), ccfg, lam0=lam, stall0=stall
        )
        done += int(np.asarray(info.iterations))
        lam = float(np.asarray(info.lam))
        stall = int(np.asarray(info.stall))
        # detach from the (possibly shrinking) mesh: the next chunk's mesh may
        # have fewer devices than this result's sharding (multi-process safe:
        # a cross-host shard is gathered, not np.asarray'd)
        from .seq import to_host

        poses0 = jax.tree_util.tree_map(lambda x: jnp.asarray(to_host(x)), poses)
        if path:
            ckpt.save_solver_state(path, poses0, lam, done, stall=stall,
                                   meta={"error": float(np.asarray(info.error))})
        if int(np.asarray(info.iterations)) < n_it:  # converged inside the chunk
            break
        chunk_idx += 1
    if info is None:
        # resumed at an already-converged/stalled snapshot: zero-iteration
        # solve for a consistent SolveInfo (see checkpoint.py drivers)
        mesh = make_mesh(len(devices), devices=devices)
        ccfg = dataclasses.replace(cfg, max_gn_iters=0)
        _, info = seq_pose_graph_solve(
            mesh, graph._replace(poses0=poses0), ccfg, lam0=lam, stall0=stall
        )
    if path and os.path.exists(path):
        os.remove(path)
    return poses0, info, events
