"""Multi-host execution entry points (SURVEY §2/§5 distributed rows).

The reference is a single CPU process; multi-host capability here is new
capability with reference-equivalent semantics.  Design (the "How to Scale Your
Model" recipe): one process per host joins via :func:`initialize`; the global
device set forms one mesh; frames/correspondence batches shard by their leading
axis across the whole mesh (DP), pose-chain factor arrays shard for SP, and
XLA places the collectives — psum-style gradient reductions ride ICI within a
slice and DCN across hosts.

This machine exposes a single chip, so multi-host paths cannot be exercised
here; they are structured so a pod run only needs the standard coordinator
environment (or explicit arguments).
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
