"""Multi-host execution entry points (SURVEY §2/§5 distributed rows).

The reference is a single CPU process; multi-host capability here is new
capability with reference-equivalent semantics.  Design (the "How to Scale Your
Model" recipe): one process per host joins via :func:`initialize`; the global
device set forms one mesh; frames/correspondence batches shard by their leading
axis across the whole mesh (DP), pose-chain factor arrays shard for SP, and
XLA places the collectives — psum-style gradient reductions ride ICI within a
slice and DCN across hosts.

The multi-process path is exercised for real on this machine by
:mod:`.multihost_check` (two OS processes, Gloo collectives on CPU, one global
8-device mesh, sequence-parallel solve across the process boundary — run by
``tests/test_multihost.py``); a pod run only needs the standard coordinator
environment (or explicit arguments) and the same code rides ICI/DCN.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host runtime (``jax.distributed.initialize`` wrapper).

    With no arguments, relies on the standard cluster environment
    (JAX_COORDINATOR_ADDRESS / TPU metadata).  Safe to call once per process
    before any computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data") -> "jax.sharding.Mesh":
    """Mesh over every device of every participating process."""
    from jax.sharding import Mesh

    return Mesh(jax.devices(), (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0


def heartbeat(mesh: "jax.sharding.Mesh", axis: str = "data") -> int:
    """Liveness check over the mesh (SURVEY §5 failure-detection row).

    Runs one tiny all-reduce: every device contributes 1 and the psum must
    equal the mesh size.  On a healthy slice this returns almost instantly; a
    dead or partitioned host never reaches the collective, so callers should
    run this under their own wall-clock timeout (e.g. in a watchdog thread)
    and treat a hang or a short count as peer failure.  Returns the number of
    devices that participated.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .seq import shard_map

    ones = jnp.ones((mesh.devices.size,), jnp.int32)

    @jax.jit
    def count(x):
        return shard_map(
            lambda s: jax.lax.psum(jnp.sum(s), axis),
            mesh=mesh, in_specs=P(axis), out_specs=P(),
        )(x)

    return int(count(ones))


def replica_divergence(tree) -> float:
    """Max absolute deviation between per-device copies of logically-replicated
    arrays (SURVEY §5 cross-host value-assertion row — the race-detection
    analogue for SPMD).

    During a sharded solve the pose chain and solver scalars are replicated:
    every device is supposed to hold bit-identical copies.  This walks the
    pytree, and for every ``jax.Array`` whose sharding replicates data across
    >1 addressable device, pulls each device's buffer and compares them.  Any
    nonzero return means replicas diverged (nondeterministic reduction order,
    host-dependent input, or a hardware fault).  Non-replicated (sharded-only)
    leaves contribute nothing.  Cross-process divergence additionally needs a
    collective compare on a pod; per-host this covers all local devices.
    """
    import numpy as np

    worst = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        try:
            shards = leaf.addressable_shards
        except Exception:
            continue
        # group shards by the index window they cover; >1 device per window
        # means that window is replicated
        by_window: dict = {}
        for s in shards:
            by_window.setdefault(str(s.index), []).append(s)
        for group in by_window.values():
            if len(group) < 2:
                continue
            ref = np.asarray(group[0].data)
            if ref.dtype.kind not in "fciu":
                continue
            for other in group[1:]:
                d = np.asarray(other.data)
                if ref.size:
                    worst = max(worst, float(np.max(np.abs(ref.astype(np.float64) - d.astype(np.float64)))))
    return worst
