from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment, materialize_relation_weights
from primekg_rgcn_tpu.ops.rgcn_dense import rgcn_layer_dense
from primekg_rgcn_tpu.ops.distmult import distmult_score, distmult_score_all_tails

__all__ = [
    "rgcn_layer_segment",
    "rgcn_layer_dense",
    "materialize_relation_weights",
    "distmult_score",
    "distmult_score_all_tails",
]
