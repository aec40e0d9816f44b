"""Multi-chip scale-out: device meshes and sharded solver steps."""

from .ring import ring_geo_nn_search
from .shard import (
    make_mesh,
    sharded_full_ba_solve,
    sharded_lc_solve,
    sharded_pose_graph_solve,
)

__all__ = [
    "make_mesh",
    "ring_geo_nn_search",
    "sharded_full_ba_solve",
    "sharded_lc_solve",
    "sharded_pose_graph_solve",
]
