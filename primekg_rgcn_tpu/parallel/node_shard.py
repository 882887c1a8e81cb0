"""Node-sharded multi-chip RGCN with overlap-structured halo exchange.

The memory-scaling companion to ``edge_shard.py`` (which replicates node
features and psums partial aggregates — right at PrimeKG scale, impossible at
10M nodes). Here (BASELINE.json config 5):

- Nodes are partitioned contiguously across the mesh axis; device d owns
  feature rows [d*Nloc, (d+1)*Nloc).
- Edges live with their **destination's** owner, so aggregation writes are
  purely local — no psum over node features at all.
- The only communication is the **halo exchange**: before aggregating, each
  device ships the feature rows its peers' edges need (precomputed, deduped,
  statically padded request lists) through ONE ``lax.all_to_all`` per layer,
  riding ICI. Per-device traffic is O(halo) — the boundary cut — instead of
  O(N) for replication.
- **Overlap structure**: every device's edges are pre-split into a
  LOCAL-source group (both endpoints owned here) and a HALO-source group.
  The local group's aggregation has no data dependency on the collective,
  so XLA's async scheduler can run the all_to_all underneath it; only the
  (typically much smaller) halo group waits for the exchange. A fully
  Pallas-fused variant with explicit ``make_async_remote_copy`` double
  buffering is the planned next step (the remote-DMA primitive is already
  validated in interpret mode, tests/test_node_shard.py).
- Every index (edge endpoints remapped into local/halo tables, serve lists,
  per-device degree tables) is computed once on the host and stored
  device-major, so the shard_map body is pure gathers + one collective +
  sorted segment-sums.

The backward pass differentiates through the collective (the transpose of
all_to_all is all_to_all) and the local gathers automatically.
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
from primekg_rgcn_tpu.data.graph import RelGraph, edge_arrays_from_graph
from primekg_rgcn_tpu.ops.rgcn_segment import materialize_relation_weights
from primekg_rgcn_tpu.ops.distmult import distmult_score
from primekg_rgcn_tpu.train.loop import TrainState
from primekg_rgcn_tpu.train.neg_sampling import bce_stats, candidate_batch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class NodeShardedGraph(NamedTuple):
    """Device-major node partition + halo metadata.

    n_loc: rows per device (last device padded).
    Local-source group (aggregation independent of the halo exchange):
        src_local: int32[n, E_l] indices into [x_local (n_loc) | zero (1)].
        dst_local: int32[n, E_l] local destination rows (sentinel = n_loc).
        offsets_local: static per-relation offsets along E_l.
    Halo-source group (waits for the exchange):
        src_halo: int32[n, E_h] indices into the received halo table
            [halo rows (n*P) | zero sentinel (1)].
        dst_halo: int32[n, E_h] local destination rows (sentinel = n_loc).
        offsets_halo: static per-relation offsets along E_h.
    inv_deg: float32[n, R, n_loc + 1] local reciprocal in-degrees (over both
        groups; normalization is linear so it applies to the summed partials).
    serve: int32[n, n, P] local row ids each device serves to each peer
        (sentinel-padded with n_loc -> zero row).
    halo_width: P (per peer-pair request capacity).
    """

    src_local: jnp.ndarray
    dst_local: jnp.ndarray
    src_halo: jnp.ndarray
    dst_halo: jnp.ndarray
    t_src_local: jnp.ndarray
    t_dst_local: jnp.ndarray
    t_src_halo: jnp.ndarray
    t_dst_halo: jnp.ndarray
    inv_deg: jnp.ndarray
    serve: jnp.ndarray
    offsets_local: Tuple[int, ...]
    offsets_halo: Tuple[int, ...]
    n_loc: int
    halo_width: int
    num_nodes: int
    num_relations: int
    n_devices: int
    uniform_caps: bool
    # Optional Pallas kernel schedules (pallas=True): {"local": ..., "halo":
    # ...}, each a per-relation tuple of (fwd, bwd) device-major
    # ScheduleArrays or None. See parallel/edge_shard.py for the pattern.
    sched: object = None


def partition_nodes(graph: RelGraph, n_devices: int,
                    *, pad_multiple: int = 256,
                    uniform_caps: bool = None,
                    pallas: bool = False) -> NodeShardedGraph:
    """Host-side partitioner (runs once per graph/mesh shape).

    ``uniform_caps`` pads every relation bucket to the same capacity so the
    layer can run a ``lax.scan`` over relations (O(1) memory in R — see
    ``_scan_accumulate``). Default: on when num_relations >= 16, where the
    unrolled loop's backward would otherwise materialize R stacked
    [n_loc, D] cotangents (a measured 260 GB allocation at the
    50-relation/10M-node config-5 scale) and near-uniform buckets make the
    padding cheap; off for few-relation skewed graphs (PrimeKG's 3-30
    relations span 1.2K..800K-edge buckets, where uniform padding would
    nearly double the edge work).
    """
    n = n_devices
    if uniform_caps is None:
        uniform_caps = graph.num_relations >= 16
    if pallas:
        # Kernel chunks are SEG_K=512 edges; per-relation caps must align.
        from primekg_rgcn_tpu.ops.pallas.segment_sum import SEG_K

        pad_multiple = max(pad_multiple, SEG_K)
    num_nodes = graph.num_nodes
    r_count = graph.num_relations
    n_loc = -(-num_nodes // n)

    src_g, dst_g, rel_g = edge_arrays_from_graph(graph)
    owner_dst = dst_g // n_loc

    # Per-device edge lists sorted by (rel, dst), split by source locality.
    per_dev = []
    counts_l = np.zeros((n, r_count), np.int64)
    counts_h = np.zeros((n, r_count), np.int64)
    for d in range(n):
        mask = owner_dst == d
        s, t, r = src_g[mask], dst_g[mask], rel_g[mask]
        # One combined-key sort instead of lexsort's two stable passes
        # (r < R, t < num_nodes, so r*num_nodes + t is collision-free).
        order = np.argsort(r.astype(np.int64) * num_nodes + t,
                           kind="stable")
        s, t, r = s[order], t[order], r[order]
        is_local = s // n_loc == d
        per_dev.append(((s[is_local], t[is_local], r[is_local]),
                        (s[~is_local], t[~is_local], r[~is_local])))
        counts_l[d] = np.bincount(r[is_local], minlength=r_count)
        counts_h[d] = np.bincount(r[~is_local], minlength=r_count)

    def _caps(counts):
        caps = [max(_round_up(int(counts[:, r].max()), pad_multiple),
                    pad_multiple) for r in range(r_count)]
        if uniform_caps:
            caps = [max(caps)] * r_count
        offsets = [0]
        for c in caps:
            offsets.append(offsets[-1] + c)
        return offsets

    offs_l = _caps(counts_l)
    offs_h = _caps(counts_h)
    e_l, e_h = offs_l[-1], offs_h[-1]

    # Halo requests: req[d][o] = sorted unique global ids d needs from o.
    req = [[np.zeros(0, np.int64) for _ in range(n)] for _ in range(n)]
    for d in range(n):
        remote = per_dev[d][1][0]
        for o in range(n):
            req[d][o] = np.unique(remote[remote // n_loc == o])
    halo_p = max(max((len(req[d][o]) for o in range(n)), default=0)
                 for d in range(n))
    halo_p = max(_round_up(max(halo_p, 1), 8), 8)

    src_local = np.full((n, e_l), n_loc, np.int32)   # sentinel -> zero row
    dst_local = np.full((n, e_l), n_loc, np.int32)
    src_halo = np.full((n, e_h), n * halo_p, np.int32)  # halo-table sentinel
    dst_halo = np.full((n, e_h), n_loc, np.int32)
    inv_deg = np.zeros((n, r_count, n_loc + 1), np.float32)
    serve = np.full((n, n, halo_p), n_loc, np.int32)

    for d in range(n):
        (ls, lt, lr), (hs, ht, hr) = per_dev[d]
        # Vectorized gid -> halo-slot map (a python dict would cost one
        # lookup per remote edge — ~30M at the 100M-edge config-5 scale).
        req_cat = np.concatenate([req[d][o] for o in range(n)]) \
            if any(len(req[d][o]) for o in range(n)) else np.zeros(0, np.int64)
        pos_cat = np.concatenate(
            [o * halo_p + np.arange(len(req[d][o]), dtype=np.int64)
             for o in range(n)]) if len(req_cat) else np.zeros(0, np.int64)
        order = np.argsort(req_cat, kind="stable")
        req_sorted, pos_sorted = req_cat[order], pos_cat[order]

        # Edges are (rel, dst)-sorted, so per-relation buckets are slices
        # found by ONE searchsorted over the relation column — the earlier
        # per-relation boolean masks rescanned the full edge list R times
        # (2*R*E/n element ops; the partitioner's dominant cost at the
        # 100M-edge scale).
        bl = np.searchsorted(lr, np.arange(r_count + 1))
        bh = np.searchsorted(hr, np.arange(r_count + 1))
        halo_slot_all = (pos_sorted[np.searchsorted(req_sorted, hs)]
                         .astype(np.int32) if len(hs) else
                         np.zeros(0, np.int32))

        for r in range(r_count):
            a, bnd = int(bl[r]), int(bl[r + 1])
            c = bnd - a
            off = offs_l[r]
            src_local[d, off:off + c] = ls[a:bnd] - d * n_loc
            dst_local[d, off:off + c] = lt[a:bnd] - d * n_loc

            ah, bndh = int(bh[r]), int(bh[r + 1])
            ch = bndh - ah
            offh = offs_h[r]
            if ch:
                src_halo[d, offh:offh + ch] = halo_slot_all[ah:bndh]
            dst_halo[d, offh:offh + ch] = ht[ah:bndh] - d * n_loc

            deg = np.bincount(lt[a:bnd] - d * n_loc, minlength=n_loc + 1) \
                + np.bincount(ht[ah:bndh] - d * n_loc, minlength=n_loc + 1)
            nz = deg > 0
            inv_deg[d, r, nz] = 1.0 / deg[nz]
            inv_deg[d, r, n_loc] = 0.0
        for o in range(n):
            ids = req[d][o]
            serve[o, d, : len(ids)] = ids - o * n_loc

    # Per-(device, relation, group) transpose edge order (sorted by SOURCE):
    # the layer backward routes output-row cotangents back to source rows as
    # a SORTED segment-sum instead of a scatter (same trick as
    # ops/rgcn_segment.py, here per shard). Sentinel sources are the max
    # table index so they sort to the end and land on the dummy row.
    # Start from copies (sentinel tails are already in place and sorted
    # last by construction), then argsort only each bucket's REAL prefix —
    # sorting the sentinel padding too costs cap/real extra comparisons,
    # several-x on skew-padded buckets.
    t_src_local = src_local.copy()
    t_dst_local = dst_local.copy()
    t_src_halo = src_halo.copy()
    t_dst_halo = dst_halo.copy()
    for d in range(n):
        for r in range(r_count):
            for (S, D_, TS, TD, offs, cnts) in (
                    (src_local, dst_local, t_src_local, t_dst_local, offs_l,
                     counts_l),
                    (src_halo, dst_halo, t_src_halo, t_dst_halo, offs_h,
                     counts_h)):
                a = offs[r]
                c = int(cnts[d, r])
                if c == 0:
                    continue
                order = np.argsort(S[d, a:a + c], kind="stable")
                TS[d, a:a + c] = S[d, a:a + c][order]
                TD[d, a:a + c] = D_[d, a:a + c][order]

    sched = None
    if pallas:
        from primekg_rgcn_tpu.ops.pallas.segment_sum import (
            build_schedule_arrays,
            stack_schedules,
        )

        def group_sched(seg_fwd, seg_bwd, offs, n_fwd, n_bwd):
            """Per-relation (fwd, bwd) stacked device-major schedules; None
            where the bucket is empty or too run-sparse to compact."""
            per_rel = []
            for r in range(r_count):
                a, b = offs[r], offs[r + 1]
                if b == a:
                    per_rel.append(None)
                    continue
                fwd = [build_schedule_arrays(seg_fwd[d, a:b], n_fwd)
                       for d in range(n)]
                bwd = [build_schedule_arrays(seg_bwd[d, a:b], n_bwd)
                       for d in range(n)]
                ok = all(int(s.n_runs.max()) <= 256 for s in fwd + bwd)
                per_rel.append((stack_schedules(fwd, n_fwd),
                                stack_schedules(bwd, n_bwd)) if ok else None)
            return tuple(per_rel)

        def group_sched_stacked(seg_fwd, seg_bwd, offs, n_fwd, n_bwd):
            """Scan-path variant: ONE (fwd, bwd) pair whose fields carry a
            leading [n_devices, R] so ``lax.scan`` can slice a relation per
            step. All (device, relation) schedules are padded to common
            rows/n_pairs (uniform caps guarantee a common chunk count).
            Returns None (whole group falls back to XLA) if any bucket is
            too run-sparse to compact — the scan body is one program for
            every relation, so the choice cannot vary per relation."""
            cap = offs[1] - offs[0]
            if cap == 0:
                return None

            def build(seg, n_seg):
                per = [build_schedule_arrays(seg[d, offs[r]:offs[r + 1]],
                                             n_seg)
                       for d in range(n) for r in range(r_count)]
                if any(int(sc.n_runs.max()) > 256 for sc in per):
                    return None
                flat = stack_schedules(per, n_seg)
                return type(flat)(*[
                    a.reshape((n, r_count) + a.shape[1:]) for a in flat])

            fwd = build(seg_fwd, n_fwd)
            bwd = build(seg_bwd, n_bwd)
            return (fwd, bwd) if fwd is not None and bwd is not None else None

        gs = group_sched_stacked if uniform_caps else group_sched
        sched = {
            "local": gs(dst_local, t_src_local, offs_l,
                        n_loc + 1, n_loc + 1),
            # Halo backward scatters into the received-halo table, whose
            # height differs from the local rows (t_num_segments).
            "halo": gs(dst_halo, t_src_halo, offs_h,
                       n_loc + 1, n * halo_p + 1),
        }

    return NodeShardedGraph(
        src_local=jnp.asarray(src_local),
        dst_local=jnp.asarray(dst_local),
        src_halo=jnp.asarray(src_halo),
        dst_halo=jnp.asarray(dst_halo),
        t_src_local=jnp.asarray(t_src_local),
        t_dst_local=jnp.asarray(t_dst_local),
        t_src_halo=jnp.asarray(t_src_halo),
        t_dst_halo=jnp.asarray(t_dst_halo),
        inv_deg=jnp.asarray(inv_deg),
        serve=jnp.asarray(serve),
        offsets_local=tuple(offs_l),
        offsets_halo=tuple(offs_h),
        n_loc=n_loc,
        halo_width=halo_p,
        num_nodes=num_nodes,
        num_relations=r_count,
        n_devices=n,
        uniform_caps=bool(uniform_caps),
        sched=sched,
    )


def _seg_from_sched(tbl, ids, sched_r, n_seg):
    """Gather rows of ``tbl`` at ``ids`` and segment-sum them through a
    prebuilt kernel schedule (ops/pallas/segment_sum.py), lane-padding the
    table so the message stream is written once at its final width."""
    from primekg_rgcn_tpu.ops.pallas.segment_sum import (
        segment_sum_from_schedule,
    )

    d = tbl.shape[1]
    pad = (-d) % 64
    if pad:
        tbl = jnp.pad(tbl, ((0, 0), (0, pad)))
    msg = jnp.take(tbl, ids, axis=0)
    return segment_sum_from_schedule(msg, sched_r, n_seg)[:, :d]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _scan_accumulate(n_loc, aggregate_first, table, srcs, dsts, t_srcs,
                     t_dsts, invs, w_all, sched_fwd, sched_bwd):
    """sum_r norm(segment_sum_r(table)) @ W_r as a lax.scan over relations.

    O(1) memory in R in BOTH directions: the forward's carry is the single
    [n_loc, Dout] accumulator, and the custom backward runs its own scan
    (recomputing each relation's partial, routing cotangents to source rows
    through the precomputed per-shard transpose edge order as a SORTED
    segment-sum). Without this, reverse-mode over an unrolled relation loop
    materializes all R per-relation d_table cotangents before summing — a
    measured 260 GB allocation at config-5 scale (R=50, n_loc=1.25M,
    Dout=128, 8 devices).

    Shapes: table [rows, Din] (rows = local or halo table incl. dummy);
    srcs/dsts/t_srcs/t_dsts int32[R, cap]; invs [R, n_loc];
    w_all [R, Din, Dout].
    """

    def body(carry, xs):
        src_r, dst_r, _ts, _td, inv_r, w_r, sf_r, _sb_r = xs
        tbl = table if aggregate_first else table @ w_r
        if sf_r is None:
            part = jax.ops.segment_sum(
                jnp.take(tbl, src_r, axis=0), dst_r,
                num_segments=n_loc + 1, indices_are_sorted=True)[:n_loc]
        else:
            part = _seg_from_sched(tbl, src_r, sf_r, n_loc + 1)[:n_loc]
        if aggregate_first:
            return carry + (part * inv_r[:, None]) @ w_r, None
        return carry + part * inv_r[:, None], None

    # Seed the carry from `table` so it carries the same varying-manual-axes
    # set under check_vma=True shard_maps (a plain zeros carry is unvarying
    # and fails the scan carry type check).
    out0 = jnp.zeros((n_loc, w_all.shape[2]), table.dtype) \
        + (table.ravel()[0] * 0)
    out, _ = jax.lax.scan(body, out0,
                          (srcs, dsts, t_srcs, t_dsts, invs, w_all,
                           sched_fwd, sched_bwd))
    return out


def _scan_acc_fwd(n_loc, aggregate_first, table, srcs, dsts, t_srcs, t_dsts,
                  invs, w_all, sched_fwd, sched_bwd):
    out = _scan_accumulate(n_loc, aggregate_first, table, srcs, dsts,
                           t_srcs, t_dsts, invs, w_all, sched_fwd, sched_bwd)
    return out, (table, srcs, dsts, t_srcs, t_dsts, invs, w_all,
                 sched_fwd, sched_bwd)


def _scan_acc_bwd(n_loc, aggregate_first, res, g):
    table, srcs, dsts, t_srcs, t_dsts, invs, w_all, sched_fwd, sched_bwd = res
    rows = table.shape[0]

    def body(d_table, xs):
        src_r, dst_r, ts_r, td_r, inv_r, w_r, sf_r, sb_r = xs

        def agg_fwd(tbl):
            if sf_r is None:
                return jax.ops.segment_sum(
                    jnp.take(tbl, src_r, axis=0), dst_r,
                    num_segments=n_loc + 1,
                    indices_are_sorted=True)[:n_loc]
            return _seg_from_sched(tbl, src_r, sf_r, n_loc + 1)[:n_loc]

        def agg_bwd(gv):
            if sb_r is None:
                return jax.ops.segment_sum(
                    jnp.take(gv, td_r, axis=0), ts_r,
                    num_segments=rows, indices_are_sorted=True)
            return _seg_from_sched(gv, td_r, sb_r, rows)

        if aggregate_first:
            part = agg_fwd(table)
            gw = g @ w_r.T                              # [n_loc, Din]
            dw_r = (part * inv_r[:, None]).T @ g
            d_inv_r = jnp.sum(part * gw, axis=1)
            gv_pad = jnp.concatenate(
                [gw * inv_r[:, None],
                 jnp.zeros((1, gw.shape[1]), gw.dtype)], axis=0)
            d_table = d_table + agg_bwd(gv_pad)
        else:
            part = agg_fwd(table @ w_r)
            d_inv_r = jnp.sum(part * g, axis=1)
            gv_pad = jnp.concatenate(
                [g * inv_r[:, None],
                 jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
            d_tw = agg_bwd(gv_pad)
            dw_r = table.T @ d_tw
            d_table = d_table + d_tw @ w_r.T
        return d_table, (dw_r, d_inv_r)

    d_table, (dws, dinvs) = jax.lax.scan(
        body, table * 0,  # zeros with table's varying axes (see fwd carry)
        (srcs, dsts, t_srcs, t_dsts, invs, w_all, sched_fwd, sched_bwd))
    f0 = jax.dtypes.float0
    z = lambda a: np.zeros(a.shape, f0)  # noqa: E731
    zs = lambda t: jax.tree_util.tree_map(z, t)  # noqa: E731
    return (d_table, z(srcs), z(dsts), z(t_srcs), z(t_dsts), dinvs, dws,
            zs(sched_fwd), zs(sched_bwd))


_scan_accumulate.defvjp(_scan_acc_fwd, _scan_acc_bwd)


def node_sharded_layer(layer_params, x_loc: jnp.ndarray,
                       sg: NodeShardedGraph, local: dict,
                       axis_name: str, *, halo_impl: str = "xla",
                       compute_dtype: jnp.dtype = jnp.float32
                       ) -> jnp.ndarray:
    """One RGCN layer over this device's node shard (inside shard_map).

    Issues the halo all_to_all FIRST, aggregates the local-source edge group
    (independent of the collective, so the scheduler can overlap them), and
    only then consumes the received halo rows for the halo-source group.
    ``compute_dtype=bfloat16`` additionally halves the halo-exchange ICI
    payload (the serve rows ship in bf16); the accumulator returns to
    float32 at the layer boundary, matching the single-device path.
    """
    n_loc = sg.n_loc
    w_rel = materialize_relation_weights(layer_params).astype(compute_dtype)
    din, dout = w_rel.shape[1], w_rel.shape[2]
    x_loc = x_loc.astype(compute_dtype)
    x_pad = jnp.concatenate(
        [x_loc, jnp.zeros((1, x_loc.shape[1]), x_loc.dtype)], axis=0)

    # 1) start the exchange
    send = jnp.take(x_pad, local["serve"], axis=0)        # [n, P, D]
    if halo_impl == "pallas":
        from primekg_rgcn_tpu.ops.pallas.halo import pallas_halo_exchange

        recv = pallas_halo_exchange(send, axis_name)
    else:
        recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                                  concat_axis=0, tiled=True)

    aggregate_first = din <= dout
    out = x_loc @ layer_params["w_root"].astype(compute_dtype) \
        + layer_params["bias"].astype(compute_dtype)[None, :]

    def accumulate_scan(out, table, src, dst, t_src, t_dst, offsets,
                        scheds=None):
        """Uniform-cap path: lax.scan over relations (O(1) memory in R).
        ``scheds`` is the stacked (fwd, bwd) ScheduleArrays pair whose
        fields lead with the relation axis (sliced one relation per scan
        step)."""
        r_count = sg.num_relations
        cap = offsets[1] - offsets[0]
        sf, sb = scheds if scheds is not None else (None, None)
        return out + _scan_accumulate(
            n_loc, aggregate_first, table,
            src.reshape(r_count, cap), dst.reshape(r_count, cap),
            t_src.reshape(r_count, cap), t_dst.reshape(r_count, cap),
            local["inv_deg"][:, :n_loc].astype(compute_dtype), w_rel, sf, sb)

    def accumulate(out, table, src, dst, t_src, t_dst, offsets,
                   sched_group=None):
        """Fold one edge group's per-relation partials straight into `out`.

        Normalization and the relation transform are linear, so the local
        and halo groups can be scaled/transformed and accumulated
        independently: (l + h)*inv @ W == l*inv @ W + h*inv @ W. Folding
        immediately keeps peak memory at ONE [n_loc, D] partial instead of
        R of them — at config-5 scale (R=50, n_loc=1.25M) the stacked-parts
        variant allocated 16 GB/device and OOM'd.

        Each relation runs the transpose-graph custom-VJP aggregation
        (ops/rgcn_segment.py): the backward routes output-row cotangents
        back to SOURCE rows through the per-shard src-sorted edge order as
        a sorted segment-sum — XLA's generic transpose of the gather is an
        unsorted scatter-add, the slowest op on TPU. For the halo group the
        gather table (received halo rows) differs from the scatter target
        (local rows), so the backward's segment count is the table height
        (t_num_segments).
        """
        from primekg_rgcn_tpu.ops.rgcn_segment import make_gather_segment_sum

        rows = table.shape[0]
        for r in range(sg.num_relations):
            s, e = offsets[r], offsets[r + 1]
            if e == s:
                continue
            r_sched = sched_group[r] if sched_group is not None else None
            agg_op = make_gather_segment_sum(
                src[s:e], dst[s:e], t_src[s:e], t_dst[s:e], n_loc + 1,
                t_num_segments=rows,
                sched=None if r_sched is None else r_sched[0],
                t_sched=None if r_sched is None else r_sched[1])
            inv = local["inv_deg"][r][:n_loc, None].astype(compute_dtype)

            # jax.checkpoint per relation: without it autodiff saves every
            # relation's normalized partial as the matmul residual — R x
            # [n_loc, D] buffers. Rematerializing trades one extra
            # aggregation per relation in the backward for O(1) residual
            # memory. The op is PREBUILT outside and only CALLED inside the
            # rematerialized function (creating a custom_vjp under an inner
            # trace leaks tracers; calling one is fine).
            def one_rel(table, inv_r, w_r, _op=agg_op):
                if aggregate_first:
                    return (_op(table)[:n_loc] * inv_r) @ w_r
                return _op(table @ w_r)[:n_loc] * inv_r

            out = out + jax.checkpoint(one_rel)(table, inv, w_rel[r])
        return out

    # 2) local-source aggregation: no dependency on `recv`, so the
    #    collective overlaps with this entire phase.
    # 3) halo-source aggregation (waits for the collective).
    halo_table = None
    if sg.uniform_caps:
        lsched = local.get("sched") or {}
        out = accumulate_scan(out, x_pad, local["src_local"],
                              local["dst_local"], local["t_src_local"],
                              local["t_dst_local"], sg.offsets_local,
                              lsched.get("local"))
        halo_table = jnp.concatenate(
            [recv.reshape(-1, x_loc.shape[1]),
             jnp.zeros((1, x_loc.shape[1]), x_loc.dtype)], axis=0)
        out = accumulate_scan(out, halo_table, local["src_halo"],
                              local["dst_halo"], local["t_src_halo"],
                              local["t_dst_halo"], sg.offsets_halo,
                              lsched.get("halo"))
        return out.astype(jnp.float32)
    lsched = local.get("sched") or {}
    out = accumulate(out, x_pad, local["src_local"], local["dst_local"],
                     local["t_src_local"], local["t_dst_local"],
                     sg.offsets_local, lsched.get("local"))
    halo_table = jnp.concatenate(
        [recv.reshape(-1, x_loc.shape[1]),
         jnp.zeros((1, x_loc.shape[1]), x_loc.dtype)], axis=0)
    out = accumulate(out, halo_table, local["src_halo"], local["dst_halo"],
                     local["t_src_halo"], local["t_dst_halo"],
                     sg.offsets_halo, lsched.get("halo"))
    return out.astype(jnp.float32)


def _sharded_encoder(params, sg: NodeShardedGraph, local: dict,
                     cfg: ModelConfig, axis_name: str, *, train=False,
                     dropout_rng=None, my_index=None, halo_impl="xla"):
    cdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
           else jnp.float32)
    enc = params["encoder"]
    # Local slice of the (replicated) embedding table.
    start = my_index * sg.n_loc
    emb_pad = jnp.concatenate(
        [enc["node_emb"],
         jnp.zeros((sg.n_loc * sg.n_devices - cfg.num_nodes,
                    cfg.embedding_dim))], axis=0)
    x = jax.lax.dynamic_slice_in_dim(emb_pad, start, sg.n_loc, axis=0)
    x = node_sharded_layer(enc["conv1"], x, sg, local, axis_name,
                           halo_impl=halo_impl, compute_dtype=cdt)
    x = jax.nn.relu(x)
    if train and cfg.dropout > 0.0 and dropout_rng is not None:
        keep = 1.0 - cfg.dropout
        k = jax.random.fold_in(dropout_rng, my_index)
        mask = jax.random.bernoulli(k, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = node_sharded_layer(enc["conv2"], x, sg, local, axis_name,
                           halo_impl=halo_impl, compute_dtype=cdt)
    return x


def _local_arrays(sg: NodeShardedGraph):
    return {"src_local": sg.src_local, "dst_local": sg.dst_local,
            "src_halo": sg.src_halo, "dst_halo": sg.dst_halo,
            "t_src_local": sg.t_src_local, "t_dst_local": sg.t_dst_local,
            "t_src_halo": sg.t_src_halo, "t_dst_halo": sg.t_dst_halo,
            "inv_deg": sg.inv_deg, "serve": sg.serve,
            "sched": sg.sched}


def build_node_sharded_forward(mesh: Mesh, sg: NodeShardedGraph,
                               model_cfg: ModelConfig, *,
                               axis_name: str = "data",
                               halo_impl: str = "xla",
                               gather: bool = True):
    """Jitted full-graph encode.

    gather=True returns the replicated [N, hidden] output (for parity tests
    and small-N inference). gather=False returns the device-major
    [n_dev, n_loc, hidden] jax.Array still sharded over the mesh axis — the
    input contract of evaluate/sharded_ranking.build_sharded_eval_from_sharded,
    keeping the encode->rank/score pipeline O(N/n) memory per device end to
    end (no device ever materializes the full table).

    halo_impl: "xla" (lax.all_to_all) or "pallas" (remote-DMA kernel,
    ops/pallas/halo.py).
    """

    # check_vma stays on for the XLA collective path; the Pallas halo kernel
    # trips a JAX interpret-mode discharge bug under the checker ("branches
    # of cond produced mismatched varying manual axes ... as a temporary
    # workaround pass check_vma=False"), so only that variant opts out.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name)), out_specs=P(axis_name),
             check_vma=(halo_impl != "pallas"))
    def _encode(params, local_arrays):
        local = jax.tree_util.tree_map(lambda a: a[0], local_arrays)
        my = jax.lax.axis_index(axis_name)
        x = _sharded_encoder(params, sg, local, model_cfg, axis_name,
                             my_index=my, halo_impl=halo_impl)
        return x[None]  # [1, n_loc, H] -> concatenated over devices

    local_arrays = _local_arrays(sg)

    # Partition arrays enter the jit as ARGUMENTS, not closure captures:
    # captured device arrays become lowering-time constants (duplicated
    # during XLA compilation — an OOM at config-5 scale) and are re-staged
    # through the hosted tunnel every call.
    @jax.jit
    def _jit_encode(params, arrs):
        out = _encode(params, arrs)  # [n, n_loc, H]
        if not gather:
            return out
        return out.reshape(-1, out.shape[-1])[: sg.num_nodes]

    def encode(params):
        return _jit_encode(params, local_arrays)

    return encode


def build_node_sharded_train_step(
    mesh: Mesh,
    sg: NodeShardedGraph,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    *,
    axis_name: str = "data",
    halo_impl: str = "xla",
):
    """Jitted training update over the node-sharded graph.

    ``batch`` is a [B, 4] (head, tail, rel, mask) array, **split** across the
    mesh axis (B must divide by the device count; pad with mask=0 rows) —
    each device samples negatives for and scores only its B/n slice, so
    decoder/scoring work scales 1/n instead of being replicated. Candidate
    endpoint embeddings for ALL devices' requests are assembled with one
    all_gather of the id lists plus one psum of owner-masked local rows
    (O(B*(1+k)*H) traffic total), so no device ever materializes the full
    embedding matrix.

    ``halo_impl="pallas"`` routes BOTH passes' halo exchanges through the
    overlapped remote-DMA kernel (its transpose is the same exchange on the
    cotangents, ops/pallas/halo.py); check_vma is relaxed only then, as in
    build_node_sharded_forward — and with the checker off, the pcast
    varying-promotions below are skipped too (their AD transpose emits a
    vma-asserting psum that cannot typecheck on empty-vma cotangents;
    without vma tracking the grads come back per-device anyway, which is
    exactly what the manual flat psum expects).
    """
    n_dev = mesh.devices.size
    use_vma = halo_impl != "pallas"

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis_name), P(axis_name), P(), P()),
             out_specs=(P(), P(), (P(), P())),
             check_vma=use_vma)
    def _step(params, opt_state, local_arrays, batch_shard, key, drop_key):
        local = jax.tree_util.tree_map(lambda a: a[0], local_arrays)
        batch = batch_shard[0]  # [B/n, 4]
        my = jax.lax.axis_index(axis_name)
        # Differentiate w.r.t. the varying params; ONE flat psum combines
        # the per-device gradients below (one collective instead of one per
        # parameter leaf via the pcast transpose — see edge_shard.py).
        pv = params if not use_vma else jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, axis_name, to="varying"), params)

        def loss_sums(p):
            # Per-device batch slice + per-device key -> distinct negatives.
            dev_key = jax.random.fold_in(key, my)
            heads, tails, rels, labels, weights = candidate_batch(
                dev_key, batch[:, 0], batch[:, 1], batch[:, 2], sg.num_nodes,
                train_cfg.num_neg_samples, mask=batch[:, 3])

            x = _sharded_encoder(p, sg, local, model_cfg, axis_name,
                                 train=True, dropout_rng=drop_key,
                                 my_index=my, halo_impl=halo_impl)
            x_pad = jnp.concatenate(
                [x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)

            def fetch(ids):
                # Assemble endpoint rows for EVERY device's request list:
                # all_gather the ids, serve owner-masked local rows, psum.
                all_ids = jax.lax.all_gather(ids, axis_name)   # [n, C]
                owner = all_ids // sg.n_loc
                loc = jnp.where(owner == my, all_ids - my * sg.n_loc,
                                sg.n_loc)
                rows = jnp.take(x_pad, loc, axis=0)            # [n, C, H]
                full = jax.lax.psum(rows, axis_name)
                if use_vma:
                    full = jax.lax.pcast(full, axis_name, to="varying")
                return full[my]                                # my [C, H]

            he, te = fetch(heads), fetch(tails)
            re = jnp.take(p["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(he, te, re)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum, (correct, count)

        (loss_sum, (correct, count)), grads = jax.value_and_grad(
            loss_sums, has_aux=True)(pv)
        from jax.flatten_util import ravel_pytree

        trio = jax.lax.psum(jnp.stack([loss_sum, correct, count]),
                            axis_name)
        total_count = jnp.maximum(trio[2], 1.0)
        flat, unravel = ravel_pytree(grads)
        grads = jax.tree_util.tree_map(
            lambda g: g / total_count,
            unravel(jax.lax.psum(flat, axis_name)))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (trio[0] / total_count,
                                   trio[1] / total_count)

    sharded = jax.tree_util.tree_map(
        lambda v: jax.device_put(jnp.asarray(v),
                                 NamedSharding(mesh, P(axis_name))),
        _local_arrays(sg))

    # Arrays as jit ARGUMENTS (see build_node_sharded_forward).
    @jax.jit
    def _jit_step(state: TrainState, arrs, batch, key):
        k_neg, k_drop = jax.random.split(key)
        b = batch.shape[0]
        batch_dm = batch.reshape(n_dev, b // n_dev, 4)
        params, opt_state, (loss, acc) = _step(
            state.params, state.opt_state, arrs, batch_dm, k_neg, k_drop)
        return TrainState(params, opt_state, state.step + 1), (loss, acc)

    def step(state: TrainState, batch, key):
        return _jit_step(state, sharded, batch, key)

    return step
