"""Owner-aligned resharding via ``lax.all_to_all`` (SURVEY §2 collectives row).

The sequence-parallel full BA shards the correspondence axis by arrival order,
so every CG matvec gathers pose entries with an O(P) ``all_gather``
(seq.py docstring).  Re-sharding each correspondence onto the device that OWNS
its source-pose block makes those gathers local — the classic all_to_all
resharding step (MoE dispatch / sequence-sharding reshard in transformer
stacks; here the "experts" are pose blocks).

:func:`reshard_rows` is that step as a reusable primitive: rows of a sharded
tree move to the device given by ``dest``, with a static per-destination
``capacity`` (shapes must be static under jit; overflow rows are dropped and
reported via the returned counts so callers can size capacity).

Communication: ONE ``all_to_all`` of the (n, capacity, row) send buffer per
leaf — on a real slice this rides ICI as a single balanced shuffle instead of
n broadcast/psum rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .seq import shard_map


@functools.partial(jax.jit, static_argnames=("mesh", "capacity", "axis"))
def _reshard_run(tree, dest, valid, mesh: Mesh, capacity: int, axis: str):
    n = mesh.devices.size

    def blk(tree_blk, dest_blk, valid_blk):
        kb = dest_blk.shape[0]
        dest_blk = jnp.where(valid_blk, dest_blk, n)  # invalid -> dump bucket
        order = jnp.argsort(dest_blk, stable=True)
        d_sorted = dest_blk[order]
        idx = jnp.arange(kb)
        is_start = jnp.concatenate([jnp.ones(1, bool), d_sorted[1:] != d_sorted[:-1]])
        block_start = lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
        rank = idx - block_start
        overflow = rank >= capacity
        slot = jnp.where(overflow | (d_sorted >= n), capacity, rank)
        dgt = jnp.where(d_sorted >= n, n, d_sorted)  # row n = invalid dump

        sent = jax.ops.segment_sum(
            (~overflow & (d_sorted < n)).astype(jnp.int32), dgt, n + 1
        )[:n]
        dropped = jax.ops.segment_sum(
            (overflow & (d_sorted < n)).astype(jnp.int32), dgt, n + 1
        )[:n]

        def scatter(x):
            rows = x[order]
            buf = jnp.zeros((n + 1, capacity + 1, *x.shape[1:]), x.dtype)
            buf = buf.at[dgt, slot].set(rows)
            return buf[:n, :capacity]

        send = jax.tree_util.tree_map(scatter, tree_blk)
        # overflow is in SORTED order; unsort it before combining with the
        # original-order validity (scatter permutes its input by `order`)
        overflow_orig = jnp.zeros((kb,), bool).at[order].set(overflow)
        vsend = scatter(valid_blk & ~overflow_orig)

        recv = jax.tree_util.tree_map(
            lambda b: lax.all_to_all(b, axis, split_axis=0, concat_axis=0, tiled=True),
            send,
        )
        vrecv = lax.all_to_all(vsend, axis, split_axis=0, concat_axis=0, tiled=True)
        out = jax.tree_util.tree_map(
            lambda b: b.reshape((n * capacity, *b.shape[2:])), recv
        )
        return out, vrecv.reshape((n * capacity,)), sent, lax.psum(dropped, axis)

    fn = shard_map(
        blk,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_rep=False,
    )
    return fn(tree, dest, valid)


def reshard_rows(mesh: Mesh, tree, dest, valid=None, capacity: int | None = None,
                 axis: str = "data"):
    """Move each row of ``tree`` (leading axis sharded over ``mesh``) to the
    device ``dest[k]`` (global device index).

    Returns ``(tree_out, valid_out, dropped_total)``: per-device buffers of
    ``n * capacity`` rows (mesh-sharded leading axis of size
    ``n_devices * n * capacity`` globally), a validity mask, and the total
    number of rows dropped for exceeding ``capacity`` on some (src, dst) lane
    (0 when capacity is large enough).  ``capacity`` defaults to the balanced
    size ``ceil(K / n^2) * 2``.
    """
    n = mesh.devices.size
    k = int(dest.shape[0])
    if valid is None:
        valid = jnp.ones((k,), bool)
    if capacity is None:
        capacity = max(1, int(np.ceil(k / (n * n))) * 2)
    pad = (-k) % n
    if pad:
        from ..padding import pad_rows, pad_rows_tree

        tree = pad_rows_tree(tree, k + pad)
        dest = pad_rows(dest, k + pad)
        valid = pad_rows(valid, k + pad)
    out, vout, sent, dropped = _reshard_run(tree, dest, valid, mesh, int(capacity), axis)
    return out, vout, int(np.asarray(dropped).sum())
