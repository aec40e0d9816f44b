"""Sharded solver execution over a JAX device mesh.

Parallelism map (SURVEY §2 "Parallelism & distributed-communication inventory"):

* **DP over correspondences** — the loop-closure mini-solves are embarrassingly
  parallel (the reference runs them serially, optimizer.cpp:690-965); we shard
  the correspondence batch axis across the mesh.  No collectives are needed in
  the solve itself; each device owns a slab of independent 9-dof problems.
* **SP over the pose chain** — the global pose-graph linear algebra is factor-wise
  (gather -> 6x6 GEMMs -> segment-sum).  Sharding the factor arrays across the
  mesh makes every CG matvec a local contraction followed by an XLA-inserted
  all-reduce (psum) of the scattered gradient segments: the classic data-parallel
  reduction pattern riding ICI.

Everything uses ``jax.jit`` with explicit ``NamedSharding`` constraints — XLA
chooses the collectives (the "How to Scale Your Model" recipe: pick a mesh,
annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import KeypointNoiseConfig, LoopClosureConfig, PoseGraphConfig



def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def _shard_leading(mesh: Mesh, tree, axis: str = "data"):
    """Place every array in ``tree`` with its leading dim sharded over the mesh."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def sharded_lc_solve(
    mesh: Mesh,
    pairs: jnp.ndarray,
    valid: jnp.ndarray,
    dr_s,
    dr_t,
    geo_s,
    geo_t,
    alts_s,
    alts_t,
    gras_t,
    n_bins: int,
    kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig(),
    cfg: LoopClosureConfig = LoopClosureConfig(),
):
    """Loop-closure batch sharded over the mesh's data axis.

    ``pairs``/``valid`` leading dim must be divisible by the mesh size; frame
    tensors are replicated (each device needs random access into its slab's
    pings).
    """
    from ..solvers.lc import loop_closing_tfs

    pairs_s, valid_s = _shard_leading(mesh, (pairs, valid))
    rep = NamedSharding(mesh, P())
    frame_args = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), (dr_s, dr_t, geo_s, geo_t, alts_s, alts_t, gras_t)
    )
    return loop_closing_tfs(
        pairs_s, valid_s, *frame_args, n_bins=n_bins, kp_cfg=kp_cfg, cfg=cfg
    )


def sharded_pose_graph_solve(mesh: Mesh, graph, cfg: PoseGraphConfig = PoseGraphConfig()):
    """Pose-graph LM with loop-closure factor arrays sharded over the mesh.

    The chain factors' (P-1)-sized Jacobian batches and the LC factor batch are
    the large per-iteration tensors; sharding their leading dims makes the
    linearization data-parallel, with segment-sum gradients all-reduced by XLA.
    """
    from ..solvers.pose_graph import solve_pose_graph

    # pad the LC factor batch to a mesh multiple (padded slots are invalid)
    n_dev = mesh.devices.size
    n_lc = graph.lc_i.shape[0]
    pad = (-n_lc) % n_dev
    if pad:
        graph = graph._replace(
            lc_i=jnp.concatenate([graph.lc_i, jnp.zeros(pad, graph.lc_i.dtype)]),
            lc_j=jnp.concatenate([graph.lc_j, jnp.zeros(pad, graph.lc_j.dtype)]),
            lc_meas=jax.tree_util.tree_map(
                lambda a: jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad, *a.shape[1:]))]),
                graph.lc_meas,
            ),
            lc_sigmas=jnp.concatenate([graph.lc_sigmas, jnp.ones((pad, 6), graph.lc_sigmas.dtype)]),
            lc_valid=jnp.concatenate([graph.lc_valid, jnp.zeros(pad, bool)]),
        )
    lc_sharded = _shard_leading(
        mesh, (graph.lc_i, graph.lc_j, graph.lc_meas, graph.lc_sigmas, graph.lc_valid)
    )
    rep = NamedSharding(mesh, P())
    graph = graph._replace(
        poses0=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), graph.poses0),
        odo_meas=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), graph.odo_meas),
        odo_sigmas=jax.device_put(graph.odo_sigmas, rep),
        lc_i=lc_sharded[0],
        lc_j=lc_sharded[1],
        lc_meas=lc_sharded[2],
        lc_sigmas=lc_sharded[3],
        lc_valid=lc_sharded[4],
    )
    return solve_pose_graph(graph, cfg)
