"""Batch-restricted final RGCN layer: aggregate only the rows the loss reads.

The reference's training step encodes the ENTIRE graph to score one batch
(reference: src/models/rgcn.py:300-331, src/train.py:247-347): the final
layer's output is materialized for all N nodes although the BCE loss only
reads the ~4K rows belonging to the batch's heads/tails/negatives. Restricting
the final layer to exactly those rows is mathematically identical (unused
output rows carry zero cotangent, so forward values AND parameter gradients
are unchanged) and deletes ~75-80% of that layer's gather/aggregation work in
both directions — the single largest algorithmic win available on the
training step after the Pallas segment-sum kernel (docs/KERNELS.md).

TPU-native construction — everything static-shaped and compiler-friendly:

- Each batch node's in-edges per relation are a CONTIGUOUS range of the
  dst-sorted bucket (CSR ``rowptr`` precomputed once on the host). The
  dynamic edge subset is enumerated into a STATIC ``e_cap`` buffer.
- No ``searchsorted`` (pathological on TPU: measured 25 ms for 262K
  queries). Segment ids and per-edge offsets come from three
  scatter-delta + ``cumsum`` passes over the static buffer — O(e_cap)
  vectorized int ops.
- Per-node ranges are padded to a multiple of ``group`` (G) with sentinel
  edges, so a free ``reshape(-1, G, D).sum(1)`` pre-reduction shrinks the
  sorted segment-sum G-fold before XLA sees it.
- Batch duplicates (positives reappearing in corrupted negatives) are
  deduplicated by a stable sort; duplicate rows copy their first
  occurrence's output via a ``cummax`` index trick.
- The static buffer can overflow only for pathologically hub-heavy batches;
  a ``lax.cond`` falls back to the exact full-graph layer in that case, so
  the op is exact for EVERY batch while the fast path compiles for the
  typical one. ``e_cap`` is sized by simulating the negative sampler on the
  real degree table at plan-build time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.ops.rgcn_segment import (
    build_layer_agg_ops,
    materialize_relation_weights,
    rgcn_layer_segment,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FinalLayerPlan:
    """Static schedule for the batch-restricted final layer.

    Attributes:
        rowptr: per-relation int32[N + 1] CSR offsets into the relation's
            dst-sorted bucket (``rowptr[v]`` = first in-edge of node v).
        e_cap: per-relation static capacity of the edge enumeration buffer
            (multiple of ``group``).
        group: sentinel-padding granularity G; every batch node's range is
            padded to a multiple of G so a reshape pre-reduction shrinks the
            segment-sum G-fold.
    """

    rowptr: Tuple[jnp.ndarray, ...]
    e_cap: Tuple[int, ...]
    group: int

    def tree_flatten(self):
        return tuple(self.rowptr), (self.e_cap, self.group)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        e_cap, group = aux
        return cls(tuple(leaves), e_cap, group)


def plan_final_layer(
    graph: RelGraph,
    train_edges: np.ndarray,
    batch_size: int,
    num_neg_samples: int = 1,
    *,
    group: int = 8,
    safety: float = 1.3,
    sims: int = 64,
    seed: int = 0,
) -> FinalLayerPlan:
    """Build the restricted-layer schedule for a given batch shape.

    ``e_cap`` is sized empirically: simulate ``sims`` batches with the exact
    negative-sampler composition (positive endpoints are degree-biased;
    corrupted entities are uniform — reference: src/train.py:43-97), take the
    per-relation max in-edge total and multiply by ``safety``. The lax.cond
    fallback in :func:`final_layer_restricted` keeps correctness for any
    batch beyond the cap.
    """
    n = graph.num_nodes
    dst_host = np.asarray(graph.dst)
    rowptrs = []
    degs = []
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        rp = np.searchsorted(dst_host[s:e], np.arange(n + 1)).astype(np.int32)
        rowptrs.append(rp)
        degs.append(np.diff(rp))

    rng = np.random.default_rng(seed)
    b = batch_size
    k = max(int(num_neg_samples), 1)
    maxima = np.zeros(graph.num_relations, dtype=np.int64)
    for _ in range(max(int(sims), 1)):
        bi = rng.integers(0, max(len(train_edges), 1), b)
        h = train_edges[bi, 0].astype(np.int64)
        t = train_edges[bi, 1].astype(np.int64)
        nh = np.repeat(h, k)
        nt = np.repeat(t, k)
        coin = rng.random(b * k) < 0.5
        ent = rng.integers(0, n, b * k)
        nh = np.where(coin, ent, nh)
        nt = np.where(~coin, ent, nt)
        uniq = np.unique(np.concatenate([h, t, nh, nt]))
        for r in range(graph.num_relations):
            d = degs[r][uniq]
            padded = ((d + group - 1) // group) * group
            maxima[r] = max(maxima[r], int(padded.sum()))
    e_cap = []
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        cap = int(maxima[r] * safety) + group
        cap = min(-(-cap // group) * group, -(-(e - s) // group) * group)
        e_cap.append(max(cap, group))
    return FinalLayerPlan(
        rowptr=tuple(jnp.asarray(rp) for rp in rowptrs),
        e_cap=tuple(e_cap),
        group=int(group),
    )


# Measured break-even on v5e: the restricted path loses at edge/capacity
# ratio 3.5 (north-star PrimeKG, 26.6 vs 24.9 ms/step) and wins 1.71x at
# ratio 7.4 (full PrimeKG, 128 vs 220 ms/step); 6x splits the two points.
AUTO_EDGE_RATIO = 6.0


def resolve_final_plan(
    graph: RelGraph,
    train_edges: np.ndarray,
    batch_size: int,
    num_neg_samples: int,
    *,
    seed: int = 0,
    mode="auto",
):
    """Return a :class:`FinalLayerPlan` or None per the config tri-state.

    ``mode``: "auto"/None — build the plan and keep it only when the graph's
    edge count is >= ``AUTO_EDGE_RATIO`` x the plan's static capacity (the
    regime where restriction is a measured win); "on"/True — always;
    "off"/False — never.
    """
    if mode in (False, "off"):
        return None
    plan = plan_final_layer(graph, np.asarray(train_edges, np.int64),
                            batch_size, num_neg_samples, seed=seed)
    if mode in (True, "on"):
        return plan
    if graph.num_edges >= AUTO_EDGE_RATIO * sum(plan.e_cap):
        return plan
    return None


def _delta_cumsum(values: jnp.ndarray, offsets: jnp.ndarray,
                  e_cap: int) -> jnp.ndarray:
    """Return a[j] = values[i(j)] where i(j) is the last i with
    offsets[i] <= j, without per-row gathers: scatter the first-difference of
    ``values`` at ``offsets`` and prefix-sum. Duplicate offsets (empty
    ranges) collapse correctly because their deltas accumulate in one slot.
    """
    deltas = jnp.diff(values, prepend=values.dtype.type(0))
    marks = jnp.zeros(e_cap + 1, values.dtype)
    marks = marks.at[jnp.minimum(offsets, e_cap)].add(deltas)
    return jnp.cumsum(marks)[:e_cap]


def final_layer_restricted(
    layer_params: Dict[str, jnp.ndarray],
    h1_pad: jnp.ndarray,
    graph: RelGraph,
    plan: FinalLayerPlan,
    nodes: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Final-layer output rows for ``nodes`` only (duplicates allowed).

    Args:
        layer_params: the final RGCN layer's parameter dict.
        h1_pad: [N + 1, Din] post-activation/dropout features with the zero
            dummy row appended (sentinel edges aggregate nothing).
        nodes: int32[B] node ids (the batch's heads/tails/negatives).

    Returns:
        [B, Dout] float32 — bit-comparable to
        ``rgcn_layer_segment(layer_params, h1, graph)[nodes]`` up to
        summation order.
    """
    n = graph.num_nodes
    b = nodes.shape[0]
    g = plan.group
    w_rel = materialize_relation_weights(layer_params).astype(compute_dtype)
    w_root = layer_params["w_root"].astype(compute_dtype)
    bias = layer_params["bias"].astype(compute_dtype)
    edge_norm = graph.norm_mode == "edge"
    h1c = h1_pad.astype(compute_dtype)

    perm = jnp.argsort(nodes, stable=True)
    ns = jnp.take(nodes, perm, axis=0)
    is_dup = jnp.concatenate(
        [jnp.zeros((1,), bool), ns[1:] == ns[:-1]])

    # Light per-relation range metadata (B-sized ops) — enough to decide
    # fast-path feasibility before committing to either cond branch.
    metas = []
    ok = jnp.asarray(True)
    for r in range(graph.num_relations):
        rp = plan.rowptr[r]
        start = jnp.take(rp, ns, axis=0)
        deg = jnp.where(is_dup, 0, jnp.take(rp, ns + 1, axis=0) - start)
        deg_g = ((deg + g - 1) // g) * g
        off = jnp.cumsum(deg_g) - deg_g  # exclusive
        total = off[-1] + deg_g[-1]
        metas.append((start, deg, off))
        ok = jnp.logical_and(ok, total <= plan.e_cap[r])

    # lax.cond branches must receive every traced value as an explicit
    # operand (closure-captured tracers break the cond lowering under vjp).
    # ``graph`` and ``plan`` stay closure-captured: their arrays are
    # trace-time constants at every call site (closed over by the jitted
    # step), and the full branch's custom-VJP machinery requires concrete
    # index arrays. The fallback's custom-VJP agg ops are BUILT here, outside
    # the branches (creating one inside a cond branch leaks branch tracers
    # into the cond lowering under vjp), and only CALLED inside.
    fallback_ops = build_layer_agg_ops(graph, compute_dtype=compute_dtype)
    operands = (h1c, ns, is_dup, metas, layer_params, w_rel, w_root, bias)

    def fast(ops):
        h1c, ns, is_dup, metas, layer_params, w_rel, w_root, bias = ops
        out = jnp.take(h1c, ns, axis=0) @ w_root + bias[None, :]
        for r in range(graph.num_relations):
            e_cap = plan.e_cap[r]
            bs, be = graph.bucket_slice(r)
            if be == bs:
                continue
            start, deg, off = metas[r]
            j = jnp.arange(e_cap, dtype=jnp.int32)
            # Batch slot of row j, its bucket edge id, and its valid limit —
            # all via scatter-delta cumsums (no searchsorted, no row gathers).
            seg = _delta_cumsum(jnp.arange(1, b + 1, dtype=jnp.int32), off,
                                e_cap) - 1
            base = _delta_cumsum(start - off, off, e_cap)
            lim = _delta_cumsum(off + deg, off, e_cap)
            eid = jnp.clip(base + j, 0, be - bs - 1)
            valid = j < lim
            src_ids = jnp.where(
                valid, jnp.take(graph.src[bs:be], eid, axis=0), n)
            msg = jnp.take(h1c, src_ids, axis=0)
            if edge_norm:
                scale = jnp.where(
                    valid,
                    jnp.take(graph.edge_scale[bs:be], eid, axis=0),
                    0.0).astype(compute_dtype)
                msg = msg * scale[:, None]
            grp = msg.reshape(e_cap // g, g, msg.shape[1]).sum(axis=1)
            agg = jax.ops.segment_sum(
                grp, seg[::g], num_segments=b, indices_are_sorted=True)
            if not edge_norm:
                inv = jnp.take(graph.inv_in_deg[r], ns, axis=0)
                agg = agg * inv[:, None].astype(compute_dtype)
            out = out + agg @ w_rel[r]
        return out.astype(jnp.float32)

    def full(ops):
        h1c, ns, is_dup, metas, layer_params, w_rel, w_root, bias = ops
        h2 = rgcn_layer_segment(
            layer_params, h1c[:n].astype(jnp.float32), graph,
            compute_dtype=compute_dtype, agg_ops=fallback_ops)
        return jnp.take(h2, ns, axis=0)

    out_sorted = jax.lax.cond(ok, fast, full, operands)

    # Duplicates copy their first occurrence's row; unsort to input order.
    first_idx = jax.lax.cummax(
        jnp.where(is_dup, 0, jnp.arange(b, dtype=jnp.int32)), axis=0)
    out_sorted = jnp.take(out_sorted, first_idx, axis=0)
    inv = jnp.argsort(perm, stable=True)
    return jnp.take(out_sorted, inv, axis=0)
