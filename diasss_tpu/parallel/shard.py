"""Sharded solver execution over a JAX device mesh.

Parallelism map (SURVEY §2 "Parallelism & distributed-communication inventory"):

* **DP over correspondences** — the loop-closure mini-solves are embarrassingly
  parallel (the reference runs them serially, optimizer.cpp:690-965); we shard
  the correspondence batch axis across the mesh.  No collectives are needed in
  the solve itself; each device owns a slab of independent 9-dof problems.
* **DP over the loop-closure factor arrays** of the global solves — a local
  contraction followed by an XLA-inserted all-reduce (psum) of the scattered
  gradient segments; the pose system itself stays replicated here.  TRUE
  sequence parallelism over the pose chain (every O(P) tensor O(P/n)+halo per
  device) lives in :mod:`.seq`.

Everything uses ``jax.jit`` with explicit ``NamedSharding`` constraints — XLA
chooses the collectives (the "How to Scale Your Model" recipe: pick a mesh,
annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import KeypointNoiseConfig, LoopClosureConfig, PoseGraphConfig



def make_mesh(n_devices: int | None = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
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


def sharded_full_ba_solve(mesh: Mesh, prob, ba_cfg=None, kp_cfg: KeypointNoiseConfig = KeypointNoiseConfig()):
    """Joint bundle adjustment (solvers/full_ba.py) sharded over the mesh.

    The dominant axis is the correspondence batch K (one landmark per
    correspondence): every per-landmark quantity — the sss-factor Jacobian
    batches, the 3x3 landmark Hessian blocks and their Cholesky factors, the
    Schur cross terms H_pl — is K-leading and therefore embarrassingly
    data-parallel.  Sharding K makes each LM trial's linearization and each CG
    matvec a local contraction followed by an XLA-inserted psum of the
    segment-sum scatters into the (replicated) P-sized pose system.  The pose
    chain itself (odometry factors, PCG state, tridiag preconditioner) stays
    replicated — it is O(P) small next to O(K) and serial-ish anyway.

    ``prob`` is a BAProblem (build_ba_problem already pads K to a power of two,
    so any power-of-two mesh divides it; we re-pad defensively otherwise).
    """
    from ..config import FullBAConfig
    from ..solvers.full_ba import solve_full_ba

    ba_cfg = ba_cfg or FullBAConfig()
    n_dev = mesh.devices.size
    K = prob.kp_i.shape[0]
    pad = (-K) % n_dev
    if pad:
        zpad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)]
        )
        prob = prob._replace(
            kp_i=zpad(prob.kp_i, 0),
            kp_j=zpad(prob.kp_j, 0),
            kp_sr_s=zpad(prob.kp_sr_s, 1.0),
            kp_sr_t=zpad(prob.kp_sr_t, 1.0),
            kp_valid=zpad(prob.kp_valid, False),
            lm0=zpad(prob.lm0, 0.0),
            lm_prior=zpad(prob.lm_prior, 0.0),
        )
    kp_sharded = _shard_leading(
        mesh,
        (prob.kp_i, prob.kp_j, prob.kp_sr_s, prob.kp_sr_t, prob.kp_valid, prob.lm0, prob.lm_prior),
    )
    rep = NamedSharding(mesh, P())
    prob = prob._replace(
        poses0=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), prob.poses0),
        odo_meas=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), prob.odo_meas),
        odo_sigmas=jax.device_put(prob.odo_sigmas, rep),
        kp_i=kp_sharded[0],
        kp_j=kp_sharded[1],
        kp_sr_s=kp_sharded[2],
        kp_sr_t=kp_sharded[3],
        kp_valid=kp_sharded[4],
        lm0=kp_sharded[5],
        lm_prior=kp_sharded[6],
        lm_prior_sigmas=jax.device_put(prob.lm_prior_sigmas, rep),
    )
    return solve_full_ba(prob, ba_cfg, kp_cfg)


def sharded_pose_graph_solve(mesh: Mesh, graph, cfg: PoseGraphConfig = PoseGraphConfig()):
    """Pose-graph LM with the LOOP-CLOSURE factor arrays sharded over the mesh.

    Only the LC batch's leading dim is sharded; the pose chain (poses,
    odometry measurements, and therefore the chain Jacobians XLA derives from
    them) is REPLICATED on every device — per-device memory for the pose
    system is O(P).  This is the light-weight variant for surveys that fit a
    chip; for the true sequence-parallel partition (every O(P) tensor
    O(P/n)+halo per device) use :func:`..parallel.seq.seq_pose_graph_solve`.
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
