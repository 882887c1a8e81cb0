"""Static-shape relation-bucketed graph format.

The reference feeds PyG a ragged ``edge_index [2, E]`` + ``edge_type [E]`` pair
(reference: src/preprocess.py:256-261) and lets RGCNConv mask per relation at
runtime (reference: src/models/rgcn.py:123-128). That is hostile to XLA: every
graph would retrace, and per-relation masking wastes work.

Here edges are bucketed by relation and sorted by destination node **on the
host, once**; each bucket is padded to a static capacity with sentinel edges
that point at a dummy node row (index ``num_nodes``) whose features are zero
and whose aggregation output is dropped. Every jitted computation therefore
sees fixed shapes, padding contributes exactly zero to both the aggregation
numerator and the degree normalization, and per-relation segment-sums run on
contiguous, pre-sorted index ranges.

Mean-normalization storage has two modes:
- "dense": a float32[R, N+1] reciprocal in-degree table, multiplied into the
  aggregate (N multiplies). Right when R*N is small (PrimeKG: 3 x 31K).
- "edge": per-edge reciprocal-degree scales aligned with the (src, dst) and
  transpose orders, multiplied into the messages. O(E) storage instead of
  O(R*N) — at the 10M-node / 50-relation RMAT scale the dense table would be
  2 GB of HBM and transfer for no information the edges don't already carry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RelGraph:
    """Relation-bucketed, destination-sorted, statically padded graph.

    Attributes:
        src: int32[E_pad] source node ids; padding slots hold ``num_nodes``.
        dst: int32[E_pad] destination node ids, non-decreasing within each
            relation bucket; padding slots hold ``num_nodes``.
        t_src: int32[E_pad] the same edges re-sorted by *source* within each
            bucket (the transpose graph). The VJP of gather+segment-sum over
            (src, dst) is exactly gather+segment-sum over (t_dst, t_src), so
            precomputing the transpose turns the backward pass's slow unsorted
            scatter-add into another fast sorted segment-sum.
        t_dst: int32[E_pad] destinations in t_src order.
        inv_in_deg: float32[R, num_nodes + 1] reciprocal per-relation
            in-degree ("dense" mode; empty [0, 0] array in "edge" mode).
            Zero where the degree is zero and on the dummy row.
        edge_scale / t_edge_scale: float32[E_pad] per-edge reciprocal degree
            of the edge's destination under its relation ("edge" mode; empty
            [0] arrays in "dense" mode). Zero on padding slots.
        rel_offsets: static (R+1,) tuple of bucket start offsets into src/dst.
        num_nodes / num_relations / num_edges: static graph sizes
            (``num_edges`` counts real, unpadded edges).
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    t_src: jnp.ndarray
    t_dst: jnp.ndarray
    inv_in_deg: jnp.ndarray
    edge_scale: jnp.ndarray
    t_edge_scale: jnp.ndarray
    rel_offsets: Tuple[int, ...]
    num_nodes: int
    num_relations: int
    num_edges: int

    # -- pytree protocol (arrays are leaves; sizes are static aux data) ------
    def tree_flatten(self):
        leaves = (self.src, self.dst, self.t_src, self.t_dst,
                  self.inv_in_deg, self.edge_scale, self.t_edge_scale)
        aux = (self.rel_offsets, self.num_nodes, self.num_relations,
               self.num_edges)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (src, dst, t_src, t_dst, inv_in_deg, edge_scale,
         t_edge_scale) = leaves
        rel_offsets, num_nodes, num_relations, num_edges = aux
        return cls(src, dst, t_src, t_dst, inv_in_deg, edge_scale,
                   t_edge_scale, rel_offsets, num_nodes, num_relations,
                   num_edges)

    # -- convenience ---------------------------------------------------------
    @property
    def norm_mode(self) -> str:
        return "edge" if self.edge_scale.shape[0] > 0 else "dense"

    @property
    def padded_num_edges(self) -> int:
        return int(self.src.shape[0])

    def bucket_slice(self, r: int) -> Tuple[int, int]:
        return self.rel_offsets[r], self.rel_offsets[r + 1]

    def bucket_sizes(self) -> Tuple[int, ...]:
        return tuple(
            self.rel_offsets[r + 1] - self.rel_offsets[r]
            for r in range(self.num_relations)
        )


def _pick_norm(norm: str, num_relations: int, num_nodes: int,
               total_pad: int) -> str:
    if norm != "auto":
        return norm
    dense_size = num_relations * (num_nodes + 1)
    return "edge" if dense_size > 4 * total_pad else "dense"


def build_rel_graph(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    num_nodes: int,
    num_relations: int,
    *,
    bucket_pad_multiple: int = 512,
    bucket_capacities: Optional[Tuple[int, ...]] = None,
    use_native: str = "auto",
    norm: str = "auto",
) -> RelGraph:
    """Build a RelGraph from raw COO edge arrays (host-side, runs once).

    Invalid edges (node id out of range) are dropped, matching the defensive
    filtering the reference applies at every load site (reference:
    src/train.py:571-591, src/evaluate.py:752-769).

    Args:
        bucket_pad_multiple: each relation bucket is padded up to a multiple of
            this, so minor edge-count changes don't force recompilation.
        bucket_capacities: optional explicit per-relation capacities (must be
            >= actual bucket sizes); use to share one compiled program across
            graphs of slightly different sizes.
        use_native: "auto" (C++ builder for graphs above ~1M edges when the
            toolchain is available), "always", or "never". Both paths produce
            bit-identical output (stable counting/radix sorts).
        norm: "dense", "edge", or "auto" (see module docstring).
    """
    src = np.asarray(src, dtype=np.int64).ravel()
    dst = np.asarray(dst, dtype=np.int64).ravel()
    rel = np.asarray(rel, dtype=np.int64).ravel()
    if not (src.shape == dst.shape == rel.shape):
        raise ValueError(
            f"edge array shapes differ: {src.shape}, {dst.shape}, {rel.shape}")

    valid = (src >= 0) & (src < num_nodes) & (dst >= 0) & (dst < num_nodes)
    valid &= (rel >= 0) & (rel < num_relations)
    src, dst, rel = src[valid], dst[valid], rel[valid]
    num_edges = int(src.shape[0])

    counts = np.bincount(rel, minlength=num_relations)
    if bucket_capacities is None:
        caps = [
            max(_round_up(int(c), bucket_pad_multiple), bucket_pad_multiple)
            for c in counts
        ]
    else:
        caps = list(bucket_capacities)
        if len(caps) != num_relations:
            raise ValueError(
                "bucket_capacities length must equal num_relations")
        for r, (cap, c) in enumerate(zip(caps, counts)):
            if cap < c:
                raise ValueError(
                    f"bucket_capacities[{r}]={cap} < actual bucket size {c}")

    total = int(sum(caps))
    norm_mode = _pick_norm(norm, num_relations, num_nodes, total)
    offsets = [0]
    for c in caps:
        offsets.append(offsets[-1] + int(c))

    if use_native == "always" or (use_native == "auto"
                                  and num_edges >= 1_000_000):
        from primekg_rgcn_tpu import native

        built = native.build_rel_graph_native(
            src, dst, rel, num_nodes, num_relations, np.asarray(caps),
            norm_mode=norm_mode)
        if built is not None:
            return RelGraph(
                src=jnp.asarray(built["src_pad"]),
                dst=jnp.asarray(built["dst_pad"]),
                t_src=jnp.asarray(built["t_src_pad"]),
                t_dst=jnp.asarray(built["t_dst_pad"]),
                inv_in_deg=jnp.asarray(built["inv_deg"]),
                edge_scale=jnp.asarray(built["edge_scale"]),
                t_edge_scale=jnp.asarray(built["t_edge_scale"]),
                rel_offsets=tuple(offsets),
                num_nodes=int(num_nodes),
                num_relations=int(num_relations),
                num_edges=num_edges,
            )
        if use_native == "always":
            raise RuntimeError("native graph builder unavailable")

    # Sort by (relation, dst) so each bucket is contiguous and dst-sorted.
    order = np.lexsort((dst, rel))
    src, dst, rel = src[order], dst[order], rel[order]

    sentinel = num_nodes
    src_pad = np.full(total, sentinel, dtype=np.int32)
    dst_pad = np.full(total, sentinel, dtype=np.int32)
    t_src_pad = np.full(total, sentinel, dtype=np.int32)
    t_dst_pad = np.full(total, sentinel, dtype=np.int32)
    if norm_mode == "dense":
        inv_deg = np.zeros((num_relations, num_nodes + 1), dtype=np.float32)
        edge_scale = np.zeros((0,), np.float32)
        t_edge_scale = np.zeros((0,), np.float32)
    else:
        inv_deg = np.zeros((0, 0), dtype=np.float32)
        edge_scale = np.zeros(total, np.float32)
        t_edge_scale = np.zeros(total, np.float32)

    in_start = 0
    for r in range(num_relations):
        c = int(counts[r])
        start = offsets[r]
        bsrc = src[in_start : in_start + c]
        bdst = dst[in_start : in_start + c]
        src_pad[start : start + c] = bsrc
        dst_pad[start : start + c] = bdst
        # Transpose bucket: same edges sorted by source node.
        t_order = np.argsort(bsrc, kind="stable")
        t_src_pad[start : start + c] = bsrc[t_order]
        t_dst_pad[start : start + c] = bdst[t_order]

        deg = np.bincount(bdst, minlength=num_nodes + 1)
        if norm_mode == "dense":
            nz = deg > 0
            inv_deg[r, nz] = 1.0 / deg[nz]
            inv_deg[r, sentinel] = 0.0
        else:
            inv = np.zeros(num_nodes + 1, np.float32)
            nz = deg > 0
            inv[nz] = 1.0 / deg[nz]
            inv[sentinel] = 0.0
            edge_scale[start : start + c] = inv[bdst]
            t_edge_scale[start : start + c] = inv[bdst[t_order]]
        in_start += c

    return RelGraph(
        src=jnp.asarray(src_pad),
        dst=jnp.asarray(dst_pad),
        t_src=jnp.asarray(t_src_pad),
        t_dst=jnp.asarray(t_dst_pad),
        inv_in_deg=jnp.asarray(inv_deg),
        edge_scale=jnp.asarray(edge_scale),
        t_edge_scale=jnp.asarray(t_edge_scale),
        rel_offsets=tuple(offsets),
        num_nodes=int(num_nodes),
        num_relations=int(num_relations),
        num_edges=num_edges,
    )


def edge_arrays_from_graph(graph: RelGraph) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recover real (src, dst, rel) COO arrays from a RelGraph (host-side)."""
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    outs, outd, outr = [], [], []
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        bucket_src = src[s:e]
        bucket_dst = dst[s:e]
        real = bucket_src < graph.num_nodes
        outs.append(bucket_src[real])
        outd.append(bucket_dst[real])
        outr.append(np.full(int(real.sum()), r, dtype=np.int64))
    return (
        np.concatenate(outs).astype(np.int64),
        np.concatenate(outd).astype(np.int64),
        np.concatenate(outr),
    )
