"""Edge-partitioned multi-chip RGCN execution (shard_map + psum).

Scaling design (greenfield vs. the single-device reference; SURVEY.md §2.4):

- Every relation bucket is split into ``n_devices`` contiguous chunks
  (contiguity preserves dst-sortedness inside each chunk), so each device owns
  an equal, statically-shaped edge partition with identical local bucket
  offsets — one compiled program for all devices.
- Inside ``shard_map`` each device computes its **partial** per-node
  aggregation with a local sorted segment-sum, then a single ``lax.psum`` per
  layer combines partials over the mesh axis (ICI). Mean normalization is
  linear, so normalizing local partials before the psum is exact.
- Candidate triple batches are data-parallel along the same axis; gradients
  are combined with one psum of the per-device loss-sum gradients divided by
  the global example count (exact masked-mean gradient).
- Parameters and node features are replicated: at PrimeKG scale the feature
  matrix is ~16 MB, far below HBM; the node-sharded + halo-exchange variant
  for 10M-node graphs is the planned extension (BASELINE.json config 5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.ops.rgcn_segment import materialize_relation_weights
from primekg_rgcn_tpu.ops.distmult import distmult_score
from primekg_rgcn_tpu.train.neg_sampling import bce_stats, candidate_batch


class ShardedGraph(NamedTuple):
    """Device-major edge shards.

    src/dst: int32[n_devices, E_local] (dst-sorted within each local bucket);
    t_src/t_dst: the same local edges src-sorted (transpose graph, for the
    fast sorted backward — see ops/rgcn_segment.py); local_offsets: static
    per-device relation bucket offsets (identical across devices);
    inv_in_deg replicated.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    t_src: jnp.ndarray
    t_dst: jnp.ndarray
    inv_in_deg: jnp.ndarray
    local_offsets: Tuple[int, ...]
    num_nodes: int
    num_relations: int
    # Optional per-relation (fwd, bwd) Pallas ScheduleArrays, device-major
    # stacked; None entries fall back to the XLA segment-sum. See
    # shard_rel_graph(pallas=True).
    sched: object = None
    # norm_mode="edge" graphs: per-edge reciprocal-degree scales in local
    # (src, dst) and local transpose order, float32[n_devices, E_local]
    # (None for dense-norm graphs). The scales carry the GLOBAL degrees, so
    # normalized local partials still psum exactly.
    scale: object = None
    t_scale: object = None


def shard_rel_graph(graph: RelGraph, n_devices: int,
                    *, pallas: bool = False) -> ShardedGraph:
    """Repartition a RelGraph into equal per-device edge shards (host-side).

    pallas=True additionally precomputes, per relation bucket and per device,
    the run-compaction kernel schedules for BOTH edge orders (dst-sorted
    forward, src-sorted transpose backward), padded to common shapes across
    devices and stacked device-major. Inside shard_map the index arrays are
    traced, so the schedule cannot be derived there — precomputing it host
    side from the concrete partition is what lets the sharded path use the
    Pallas kernel at all (the alternative is the ~2.5-3x slower XLA scatter).
    Buckets whose runs are too short to compact (avg in-degree ~1 on any
    device) get no schedule and keep the XLA path, matching the
    single-device auto heuristic.
    """
    from primekg_rgcn_tpu.ops.pallas.segment_sum import (
        SEG_K, build_schedule_arrays, stack_schedules)

    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    edge_norm = graph.norm_mode == "edge"
    if edge_norm:
        g_scale = np.asarray(graph.edge_scale)
    sentinel = graph.num_nodes
    n_seg = graph.num_nodes + 1
    align = SEG_K * n_devices if pallas else n_devices

    per_dev = [([], [], [], [], [], []) for _ in range(n_devices)]
    local_offsets = [0]
    sched = [] if pallas else None
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        cap = e - s
        cap_pad = -(-cap // align) * align if cap else 0
        loc = cap_pad // n_devices
        bsrc = np.full(cap_pad, sentinel, np.int32)
        bdst = np.full(cap_pad, sentinel, np.int32)
        bsrc[:cap] = src[s:e]
        bdst[:cap] = dst[s:e]
        if edge_norm:
            # Scales ride with their edges; sentinel/extra pad rows get 0
            # (graph-level padding inside [0, cap) is already 0).
            bscale = np.zeros(cap_pad, np.float32)
            bscale[:cap] = g_scale[s:e]
        fwd_s, bwd_s = [], []
        for d in range(n_devices):
            ls = bsrc[d * loc:(d + 1) * loc]
            ld = bdst[d * loc:(d + 1) * loc]
            t_order = np.argsort(ls, kind="stable")
            per_dev[d][0].append(ls)
            per_dev[d][1].append(ld)
            per_dev[d][2].append(ls[t_order])
            per_dev[d][3].append(ld[t_order])
            if edge_norm:
                lscale = bscale[d * loc:(d + 1) * loc]
                per_dev[d][4].append(lscale)
                # The LOCAL transpose order differs from the global bucket's
                # t_edge_scale order — re-derive it from the local chunk.
                per_dev[d][5].append(lscale[t_order])
            if pallas and loc:
                fwd_s.append(build_schedule_arrays(ld, n_seg))
                bwd_s.append(build_schedule_arrays(ls[t_order], n_seg))
        if pallas:
            compactable = loc > 0 and all(
                int(sc.n_runs.max()) <= 256 for sc in fwd_s + bwd_s)
            sched.append((stack_schedules(fwd_s, n_seg),
                          stack_schedules(bwd_s, n_seg))
                         if compactable else None)
        local_offsets.append(local_offsets[-1] + loc)

    stack = lambda i: jnp.asarray(
        np.stack([np.concatenate(per_dev[d][i]) for d in range(n_devices)]))
    return ShardedGraph(
        src=stack(0),
        dst=stack(1),
        t_src=stack(2),
        t_dst=stack(3),
        inv_in_deg=graph.inv_in_deg,
        local_offsets=tuple(local_offsets),
        num_nodes=graph.num_nodes,
        num_relations=graph.num_relations,
        sched=tuple(sched) if pallas else None,
        scale=stack(4) if edge_norm else None,
        t_scale=stack(5) if edge_norm else None,
    )


def rgcn_layer_edge_sharded(
    layer_params,
    x: jnp.ndarray,
    local_edges: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    sg: ShardedGraph,
    axis_name: str,
    local_sched=None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """One RGCN layer over this device's edge shard; exact via one psum.

    Must run inside shard_map. ``local_edges`` is this device's
    (src, dst, t_src, t_dst) [E_local] slices. Uses the same fused
    transpose-graph aggregation and per-layer ordering as the single-device
    path (ops/rgcn_segment.py); mean normalization commutes with both the
    relation transform and the psum because all three are linear.
    ``local_sched`` (per-relation (fwd, bwd) ScheduleArrays local views)
    routes the aggregation through the Pallas run-compaction kernel.
    ``compute_dtype=bfloat16`` runs the matmuls, aggregations AND the
    psum in bf16 — on a pod that halves the dominant ICI payload (the
    stacked [R, N, D] partial-aggregate all-reduce); the accumulator
    returns to float32 at the layer boundary like the single-device path.
    """
    from primekg_rgcn_tpu.ops.rgcn_segment import make_gather_segment_sum

    # 4-tuple: dense-norm graph; 6-tuple: edge-norm graph — the per-edge
    # reciprocal-degree scales (global degrees) ride in the shard.
    local_scale = local_tscale = None
    if len(local_edges) == 6:
        (local_src, local_dst, local_tsrc, local_tdst,
         local_scale, local_tscale) = local_edges
    else:
        local_src, local_dst, local_tsrc, local_tdst = local_edges
    n = sg.num_nodes
    w_rel = materialize_relation_weights(layer_params).astype(compute_dtype)
    din, dout = w_rel.shape[1], w_rel.shape[2]
    xc = x.astype(compute_dtype)
    x_pad = jnp.concatenate([xc, jnp.zeros((1, xc.shape[1]), xc.dtype)],
                            axis=0)

    out = xc @ layer_params["w_root"].astype(compute_dtype) \
        + layer_params["bias"].astype(compute_dtype)[None, :]
    aggregate_first = din <= dout
    mxu_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                 else jnp.float32)
    partials = []
    for r in range(sg.num_relations):
        s, e = sg.local_offsets[r], sg.local_offsets[r + 1]
        if e == s:
            partials.append(None)
            continue
        r_sched = local_sched[r] if local_sched is not None else None
        agg_op = make_gather_segment_sum(
            local_src[s:e], local_dst[s:e],
            local_tsrc[s:e], local_tdst[s:e], n + 1,
            mxu_dtype=mxu_dtype,
            scale=None if local_scale is None else local_scale[s:e],
            t_scale=None if local_tscale is None else local_tscale[s:e],
            sched=None if r_sched is None else r_sched[0],
            t_sched=None if r_sched is None else r_sched[1])
        if local_scale is None:
            inv_deg = sg.inv_in_deg[r][:n, None].astype(compute_dtype)
        else:
            inv_deg = None  # mean norm already applied per message
        if aggregate_first:
            p = agg_op(x_pad).astype(compute_dtype)[:n]
            partials.append(p if inv_deg is None else p * inv_deg)
        else:
            p = agg_op(x_pad @ w_rel[r]).astype(compute_dtype)[:n]
            partials.append(p if inv_deg is None else p * inv_deg)

    if aggregate_first:
        # psum the [R, N, Din] normalized partial aggregates in one
        # collective, then transform.
        stacked = jnp.stack([p for p in partials if p is not None])
        stacked = jax.lax.psum(stacked, axis_name)
        i = 0
        for r in range(sg.num_relations):
            if partials[r] is None:
                continue
            out = out + stacked[i] @ w_rel[r]
            i += 1
    else:
        total = jnp.zeros((n, dout), xc.dtype)
        for p in partials:
            if p is not None:
                total = total + p
        out = out + jax.lax.psum(total, axis_name)
    return out.astype(jnp.float32)


def _sharded_encoder(params, local_edges, sg: ShardedGraph,
                     cfg: ModelConfig, axis_name: str, dropout_rng=None,
                     train: bool = False, local_sched=None):
    cdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
           else jnp.float32)
    x = params["encoder"]["node_emb"]
    x = rgcn_layer_edge_sharded(params["encoder"]["conv1"], x, local_edges,
                                sg, axis_name, local_sched=local_sched,
                                compute_dtype=cdt)
    x = jax.nn.relu(x)
    if train and cfg.dropout > 0.0 and dropout_rng is not None:
        keep = 1.0 - cfg.dropout
        # Same key on every device -> identical mask (params are replicated).
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = rgcn_layer_edge_sharded(params["encoder"]["conv2"], x, local_edges,
                                sg, axis_name, local_sched=local_sched,
                                compute_dtype=cdt)
    return x


def build_sharded_train_step(
    mesh: Mesh,
    sg: ShardedGraph,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    *,
    axis_name: str = "data",
    accum_steps: int = 1,
):
    """Compile one data+edge-parallel training update.

    Returns ``step(state, batch, key) -> (state, (loss, acc))`` where
    ``batch`` is a replicated [B, 4] int32 array of (head, tail, rel, mask)
    rows; B must divide evenly by the mesh size (pad with mask=0 rows).

    ``accum_steps > 1`` enables gradient accumulation with the reference's
    semantics (micro-batch mean losses averaged over the group, reference:
    src/train.py:303): ``batch`` is then [accum, B, 4] and ONE optimizer
    update runs after a ``lax.scan`` over the micro-batches — the whole
    group stays in one compiled program, so accumulation costs no extra
    dispatches or collectives beyond the per-micro grads psum.
    """
    n_dev = mesh.devices.size
    accum = max(int(accum_steps), 1)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis_name), P(axis_name),
                       P(None, axis_name), P(), P()),
             out_specs=(P(), P(), (P(), P())),
             check_vma=True)
    def _step(params, opt_state, edge_shard, sched_shard, batch_shard, key,
              dropout_key):
        # Device-major global arrays [n_dev, ...] arrive as [1, ...] local
        # views inside shard_map; squeeze the leading device axis.
        local_edges = tuple(a[0] for a in edge_shard)
        local_sched = jax.tree_util.tree_map(lambda a: a[0], sched_shard)
        batches = batch_shard[:, 0]  # [accum, B/n, 4]

        # Differentiate w.r.t. the VARYING params (promoted once, outside
        # the loss): grads then stay per-device and are combined with ONE
        # flat psum per update below. The earlier pattern (pcast inside the
        # loss, letting AD's transpose psum the cotangents) was exact too
        # but emitted one collective PER PARAMETER LEAF per micro-batch —
        # collectives are latency-bound on ICI, and ~12 small all-reduces
        # cost far more than one fused 8 MB one.
        pv = jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, axis_name, to="varying"), params)

        def loss_sums(p, batch, k_neg, k_drop):
            # Fold the device index into the sampling key so negatives differ
            # across shards.
            dev_key = jax.random.fold_in(k_neg,
                                         jax.lax.axis_index(axis_name))
            heads, tails, rels, labels, weights = candidate_batch(
                dev_key, batch[:, 0], batch[:, 1], batch[:, 2], sg.num_nodes,
                train_cfg.num_neg_samples, mask=batch[:, 3])

            node_emb = _sharded_encoder(p, local_edges, sg, model_cfg,
                                        axis_name, dropout_rng=k_drop,
                                        train=True, local_sched=local_sched)
            he = jnp.take(node_emb, heads, axis=0)
            te = jnp.take(node_emb, tails, axis=0)
            re = jnp.take(p["decoder"]["rel_emb"], rels, axis=0)
            if model_cfg.decoder_dropout > 0.0:
                keep = 1.0 - model_cfg.decoder_dropout
                dk = jax.random.fold_in(k_drop,
                                        jax.lax.axis_index(axis_name) + 1)
                m = jax.random.bernoulli(dk, keep, re.shape)
                re = jnp.where(m, re / keep, 0.0)
            scores = distmult_score(he, te, re)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum, (correct, count)

        def micro(carry, inp):
            grad_acc, stats = carry
            batch, i = inp
            k_n = jax.random.fold_in(key, i)
            k_d = jax.random.fold_in(dropout_key, i)
            (loss_sum, (correct, count)), grads = jax.value_and_grad(
                loss_sums, has_aux=True)(pv, batch, k_n, k_d)
            # One fused [3] psum for the scalars; the per-micro masked-mean
            # normalization needs this micro's GLOBAL count. Gradients stay
            # device-local in the accumulator (psum is linear, so one
            # all-reduce after the scan combines everything exactly).
            trio = jax.lax.psum(jnp.stack([loss_sum, correct, count]),
                                axis_name)
            # grads are device-varying; promote the (replicated) count
            # before mixing (check_vma).
            tc = jax.lax.pcast(jnp.maximum(trio[2], 1.0), axis_name,
                               to="varying")
            grad_acc = jax.tree_util.tree_map(
                lambda a, g: a + g / tc, grad_acc, grads)
            return (grad_acc, stats + trio), None

        zero = jax.tree_util.tree_map(lambda a: a * 0, pv)
        (grad_acc, stats), _ = jax.lax.scan(
            micro, (zero, jnp.zeros((3,))),
            (batches, jnp.arange(accum)))
        # ONE flat all-reduce combines the per-device accumulated gradients;
        # average over the micro group (reference scales each loss by
        # 1/accumulation_steps before backward).
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(grad_acc)
        grads = unravel(jax.lax.psum(flat, axis_name))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        loss = stats[0] / jnp.maximum(stats[2], 1.0)
        acc = stats[1] / jnp.maximum(stats[2], 1.0)
        return params, opt_state, (loss, acc)

    edge_sharding = NamedSharding(mesh, P(axis_name))
    edge_arrays = tuple(
        jax.device_put(a, edge_sharding)
        for a in (sg.src, sg.dst, sg.t_src, sg.t_dst)
        + ((sg.scale, sg.t_scale) if sg.scale is not None else ()))
    sched_arrays = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), edge_sharding), sg.sched)

    # Graph arrays enter the jit as ARGUMENTS, not closure captures:
    # captured device arrays become lowering-time constants — duplicated
    # during XLA compilation (an OOM at config-5 scale: 7.6 GB of captured
    # constants ballooned past 130 GB host RSS) and re-staged through the
    # hosted tunnel every step (the measured ~400 ms/step S(1)-copy
    # pathology first seen on the sampled path's CSR tables).
    @jax.jit
    def _jit_step(params, opt_state, edge_arrs, sched_arrs, batch, key):
        k_neg, k_drop = jax.random.split(key)
        b = batch.shape[1]
        batch_dm = batch.reshape(accum, n_dev, b // n_dev, 4)
        return _step(params, opt_state, edge_arrs, sched_arrs, batch_dm,
                     k_neg, k_drop)

    def step(params, opt_state, batch, key):
        # batch arrives [B, 4] (or [accum, B, 4] when accumulating).
        if batch.ndim == 2:
            batch = batch[None]
        params, opt_state, (loss, acc) = _jit_step(
            params, opt_state, edge_arrays, sched_arrays, batch, key)
        return params, opt_state, (loss, acc)

    return step


def build_sharded_forward(
    mesh: Mesh,
    sg: ShardedGraph,
    model_cfg: ModelConfig,
    *,
    axis_name: str = "data",
):
    """Jitted replicated-output full-graph encode over the edge-sharded graph."""

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis_name), P(axis_name)),
             out_specs=P(), check_vma=True)
    def _encode(params, edge_shard, sched_shard):
        # shard_map presents the [n_dev, E_local] device-major arrays as
        # [1, E_local] local views; squeeze the leading device axis.
        local_sched = jax.tree_util.tree_map(lambda a: a[0], sched_shard)
        return _sharded_encoder(params, tuple(a[0] for a in edge_shard), sg,
                                model_cfg, axis_name, train=False,
                                local_sched=local_sched)

    edge_sharding = NamedSharding(mesh, P(axis_name))
    edge_arrays = tuple(
        jax.device_put(a, edge_sharding)
        for a in (sg.src, sg.dst, sg.t_src, sg.t_dst)
        + ((sg.scale, sg.t_scale) if sg.scale is not None else ()))
    sched_arrays = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), edge_sharding), sg.sched)

    # Arrays as jit ARGUMENTS (see build_sharded_train_step).
    _jit_encode = jax.jit(lambda p, ea, sa: _encode(p, ea, sa))

    def encode(params):
        return _jit_encode(params, edge_arrays, sched_arrays)

    return encode
