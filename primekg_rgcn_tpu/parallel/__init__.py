from primekg_rgcn_tpu.parallel.mesh import make_mesh
from primekg_rgcn_tpu.parallel.edge_shard import (
    shard_rel_graph,
    rgcn_layer_edge_sharded,
    build_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "shard_rel_graph",
    "rgcn_layer_edge_sharded",
    "build_sharded_train_step",
]
