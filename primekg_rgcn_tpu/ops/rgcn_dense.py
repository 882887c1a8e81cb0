"""Dense einsum oracle for the relation-typed graph convolution.

This is the correctness reference for every optimized implementation in this
framework. It spells out, in dense linear algebra, the exact semantics of the
layer the reference delegates to PyG's RGCNConv (reference:
src/models/rgcn.py:72-85; parameter-count decomposition documented in
guide/MODEL_ARCHITECTURE.md of the reference):

    h_i' = W_root h_i + b + sum_r (1/|N_r(i)|) * sum_{j in N_r(i)} W_r h_j

where N_r(i) are in-neighbors of i under relation r, the mean is per-relation,
and nodes with zero in-degree under r receive zero from that relation. With
basis decomposition, W_r = sum_b a_{rb} V_b.

Only suitable for small graphs (materializes R dense [N, N] adjacencies).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def rgcn_layer_dense(
    layer_params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    rel: jnp.ndarray,
    num_nodes: int,
    num_relations: int,
) -> jnp.ndarray:
    """Dense-oracle relation-typed graph convolution.

    Args:
        layer_params: {"w_rel": [R, Din, Dout]} or
            {"basis": [B, Din, Dout], "coef": [R, B]}, plus
            "w_root": [Din, Dout], "bias": [Dout].
        x: [N, Din] node features.
        src / dst / rel: int[E] COO edges (no padding; messages flow src->dst).
    """
    from primekg_rgcn_tpu.ops.rgcn_segment import materialize_relation_weights

    w_rel = materialize_relation_weights(layer_params)  # [R, Din, Dout]
    w_root = layer_params["w_root"]
    bias = layer_params["bias"]

    n = num_nodes
    out = x @ w_root + bias[None, :]
    for r in range(num_relations):
        mask = rel == r
        # Dense adjacency A[i, j] = 1 if edge j->i with relation r.
        a = jnp.zeros((n, n), dtype=x.dtype)
        a = a.at[dst, src].add(jnp.where(mask, 1.0, 0.0).astype(x.dtype))
        deg = a.sum(axis=1, keepdims=True)
        a = jnp.where(deg > 0, a / jnp.maximum(deg, 1.0), 0.0)
        out = out + a @ (x @ w_rel[r])
    return out
