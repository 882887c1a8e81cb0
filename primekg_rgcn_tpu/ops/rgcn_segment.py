"""Production relation-typed graph convolution: XLA gather + sorted segment-sum.

TPU-first design notes (vs. the reference's PyG RGCNConv, reference:
src/models/rgcn.py:72-85):

- **Transform-first**: node features are transformed per relation
  (``x @ W_r``, an MXU matmul over all nodes) *before* gathering, which costs
  O(R * N * Din * Dout) FLOPs instead of the O(E * Din * Dout) a per-edge
  transform would — 18x fewer on PrimeKG (E/N ≈ 54). Mathematically identical
  to PyG's aggregate-then-transform because the mean is linear.
- **Static shapes**: edges arrive relation-bucketed, dst-sorted and padded
  (see data/graph.py). Sentinel edges gather the all-zero dummy row and
  scatter into the dummy segment, so padding contributes exactly zero.
- **Sorted segments**: ``segment_sum(..., indices_are_sorted=True)`` lets XLA
  use a contiguous scatter-add instead of atomic-style updates.
- Mean normalization multiplies the aggregate by a precomputed
  ``1/in-degree`` table (N multiplies instead of E).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from primekg_rgcn_tpu.data.graph import RelGraph


def materialize_relation_weights(layer_params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Return [R, Din, Dout] relation weights, expanding basis decomposition.

    Basis decomposition (W_r = sum_b a_{rb} V_b) follows the semantics of the
    reference's ``num_bases`` plumbing (reference: src/models/rgcn.py:58,76,84,
    src/train.py:686-691).
    """
    if "w_rel" in layer_params:
        return layer_params["w_rel"]
    return jnp.einsum(
        "rb,bio->rio", layer_params["coef"], layer_params["basis"]
    )


def rgcn_layer_segment(
    layer_params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    graph: RelGraph,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Relation-typed mean-aggregated graph convolution over a RelGraph.

    Args:
        layer_params: see ops/rgcn_dense.py docstring for the schema.
        x: [N, Din] node features (without the dummy row).
        graph: static-shape relation-bucketed graph.

    Returns:
        [N, Dout] updated node features.
    """
    n = graph.num_nodes
    w_rel = materialize_relation_weights(layer_params).astype(compute_dtype)
    w_root = layer_params["w_root"].astype(compute_dtype)
    bias = layer_params["bias"]

    xc = x.astype(compute_dtype)
    # Dummy row (index n) is zero: sentinel edges contribute nothing.
    x_pad = jnp.concatenate([xc, jnp.zeros((1, xc.shape[1]), dtype=xc.dtype)], axis=0)

    agg = jnp.zeros((n + 1, w_rel.shape[-1]), dtype=jnp.float32)
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        if e == s:
            continue
        xw = x_pad @ w_rel[r]  # [N+1, Dout] on the MXU
        msg = jnp.take(xw, graph.src[s:e], axis=0)  # [Er_pad, Dout]
        part = jax.ops.segment_sum(
            msg.astype(jnp.float32),
            graph.dst[s:e],
            num_segments=n + 1,
            indices_are_sorted=True,
        )
        agg = agg + part * graph.inv_in_deg[r][:, None]

    out = agg[:n].astype(compute_dtype) + xc @ w_root + bias[None, :].astype(compute_dtype)
    return out.astype(jnp.float32)
