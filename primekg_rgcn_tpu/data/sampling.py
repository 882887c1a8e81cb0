"""Mini-batch neighbor sampling (fanout) for large-graph training.

The reference has no sampler — its README lists "mini-batch sampling for
large graphs" as not implemented (reference: README.md:624-627,
guide/MODEL_ARCHITECTURE.md:241) and its encoder always runs full-graph.
This module adds the capability TPU-first (BASELINE.json config 4: fanout
15/10 on full PrimeKG):

- The graph's dst-sorted buckets double as per-relation CSR; a one-time host
  pass derives row starts/counts per node.
- Sampling is **on-device and fully vectorized**: for a [M] frontier and
  fanout f, neighbor picks are ``col[row_start[v] + idx]`` gathers, where
  idx is either uniform-with-replacement (unbiased mean estimator, "uniform"
  mode) or the first min(deg, f) neighbors ("truncate" mode — deterministic,
  and exactly equal to full-graph aggregation when f >= max degree, which is
  the correctness anchor the tests pin).
- **Static-capacity frontier dedup.** A raw 2-layer frontier explodes
  multiplicatively (a 4,096-seed batch at fanout 15/10 x 3 relations is
  ~5.8M raw slots) while the number of DISTINCT nodes is bounded by
  min(raw, N+1) — hub repetition makes the gap enormous on power-law
  graphs. Each layer's frontier is deduplicated on device with
  ``jnp.unique(..., size=cap, fill_value=N)`` (sort-based, static shape);
  every pick is remapped to its unique row via the inverse indices. The
  embedding gather and all intermediate feature tensors then scale with
  unique-node counts (<= N+1) instead of raw slot counts — the fix that
  took the sampled step from 0.42x to >1x of the full-batch baseline.
- Everything is statically shaped: capacities are compile-time constants;
  invalid slots point at the sentinel id ``num_nodes`` whose features are
  zero and whose count weight is zero.

- **Two pick-tensor layouts.** Per-relation [R, M, f] picks (below) suit
  graphs where most (node, relation) pairs have edges; relation-SPARSE
  graphs (full PrimeKG: ~1.2 in-edges per (node, relation) pair over 30
  relations) use the COMBINED layout — a single per-node budget sampled
  from the merged (dst, rel)-sorted neighborhood, relation tags per slot,
  and importance weights that keep the per-relation-mean estimator
  unbiased. Per-(node, relation) reduction + one [M, R*Din] @ [R*Din,
  Dout] MXU matmul (three selectable reduction structures — see
  _block_aggregate_combined). train.sampled.resolve_sampler picks the
  layout automatically.
- **Sort-exposing dedup.** Both layouts' per-layer dedup keeps the sort
  permutation so every dynamic gather's backward runs as a SORTED
  segment-sum (custom VJPs below) instead of XLA's unsorted scatter-add
  transpose; saturated frontiers (raw slots >= N+1) skip table
  construction entirely (identity over the node space).

A sampled 2-layer step touches O(unique(B * f^2)) embedding rows instead of
O(E) — which is what makes 100M-edge graphs trainable. Measured on the
30-relation full-PrimeKG stand-in (v5e, batch 1024, fanout 15/10): naive
per-relation layout 2,970 ms/step -> combined layout + sorted-backward
dedup 446 ms. Note the honest scale analysis: at 129K nodes a 4,096-seed
2-hop batch SATURATES the graph (every static frontier hits the N+1
capacity ceiling), so full-batch training (136 ms/step there) stays the
right default — sampling's win begins where full-batch stops fitting
(config-5 scale, 10M+ nodes).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.data.graph import RelGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class CsrCache(NamedTuple):
    """Per-relation CSR over destination nodes (device arrays).

    row_start[r][v], row_count[r][v]: slice of the relation's src column
    array holding v's in-neighbors; col[r]: the src ids (dst-sorted bucket).
    Row num_nodes (sentinel) has count 0.
    """

    row_start: Tuple[jnp.ndarray, ...]
    row_count: Tuple[jnp.ndarray, ...]
    col: Tuple[jnp.ndarray, ...]
    num_nodes: int
    num_relations: int


def build_csr_cache(graph: RelGraph) -> CsrCache:
    """Host-side, once per graph: derive CSR row tables from sorted buckets."""
    starts, counts, cols = [], [], []
    dst_h = np.asarray(graph.dst)
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        bucket = dst_h[s:e]
        n = graph.num_nodes
        row_start = np.searchsorted(bucket, np.arange(n + 1)).astype(np.int32)
        row_count = np.zeros(n + 1, np.int32)
        row_count[:n] = np.searchsorted(bucket, np.arange(1, n + 1)) - row_start[:n]
        starts.append(jnp.asarray(row_start))
        counts.append(jnp.asarray(row_count))
        cols.append(graph.src[s:e])
    return CsrCache(tuple(starts), tuple(counts), tuple(cols),
                    graph.num_nodes, graph.num_relations)


class SampledBlock(NamedTuple):
    """One message-passing layer over a sampled bipartite block.

    For an output frontier of M nodes and fanout f per relation, with the
    input frontier DEDUPLICATED to a static capacity ``m_in``:
    src_local: int32[R, M, f] rows of the deduped input table holding each
        pick (sentinel picks map to the zero row automatically — the
        sentinel id is itself a table entry).
    self_idx: int32[M] row of the deduped input table holding each output
        node's own features (for the root/self transform).
    out_ids: int32[M] global node ids of the output frontier (sentinel =
        num_nodes; used to zero bias leakage on padded rows).
    inv_cnt: float32[R, M] reciprocal of the number of valid samples.
    m_out / m_in: static frontier sizes (m_in = input table capacity).
    """

    src_local: jnp.ndarray
    self_idx: jnp.ndarray
    out_ids: jnp.ndarray
    inv_cnt: jnp.ndarray
    sort_perm: jnp.ndarray
    sort_uid: jnp.ndarray
    m_out: int
    m_in: int


class SampledBatch(NamedTuple):
    """Input to a sampled encoder pass.

    frontier: int32[M0] deduped global node ids feeding the embedding table
        (sentinel slots hold num_nodes).
    blocks: innermost-first list; blocks[-1] outputs the seed-table rows.
    seed_gather: int32[num_seeds] rows of the top-level (deduped seed)
        table holding each original seed, in seed order.
    """

    frontier: jnp.ndarray
    blocks: Tuple[SampledBlock, ...]
    seed_gather: jnp.ndarray


def _unique_cap(raw_len: int, num_nodes: int) -> int:
    """Static dedup capacity: distinct ids can't exceed N+1 (incl sentinel)."""
    return min(_round_up(raw_len, 64), _round_up(num_nodes + 1, 64))


def _sorted_unique(raw: jnp.ndarray, cap: int, n: int):
    """``jnp.unique(size=cap, fill_value=n)`` that also EXPOSES its sort.

    Returns (uniq [cap], inv [L], perm [L], uid [L]): ``perm`` is the
    argsort of ``raw`` and ``uid`` the dense unique rank of each sorted
    element. Keeping them lets the dedup gather's backward run as a SORTED
    segment-sum over cotangents in sorted order (see :func:`dedup_gather`)
    instead of the unsorted scatter-add XLA emits for a gather transpose —
    the scatter measured ~200 ms on the 4.3M-slot full-PrimeKG inner layer.
    Never truncates: cap >= min(L, N+1) >= #distinct by construction.
    """
    perm = jnp.argsort(raw, stable=True)
    srt = jnp.take(raw, perm, axis=0)
    if cap >= _round_up(n + 1, 64) and int(raw.shape[0]) >= n + 1:
        # SATURATED frontier (raw slots >= N+1, the capacity ceiling): the
        # dedup table degenerates to the identity over the whole node space,
        # so both construction scatters vanish — inv is raw itself and the
        # backward's segment ids are the sorted global ids. This is exactly
        # the expensive case (big L), where the two scatters measured
        # ~42 ms EACH at 5.3M slots on v5e; the small-L case below keeps
        # the compact table.
        uniq = jnp.minimum(jnp.arange(cap, dtype=raw.dtype), n)
        return uniq, raw, perm.astype(jnp.int32), srt.astype(jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), srt[1:] != srt[:-1]])
    uid = (jnp.cumsum(is_new) - 1).astype(jnp.int32)
    uniq = jnp.full((cap,), n, raw.dtype).at[uid].set(srt)
    inv = jnp.zeros(raw.shape, jnp.int32).at[perm].set(uid)
    return uniq, inv, perm.astype(jnp.int32), uid


@jax.custom_vjp
def dedup_gather(x, inv, perm, uid):
    """``x[inv]`` whose transpose is a sorted segment-sum, not a scatter.

    (inv, perm, uid) come from :func:`_sorted_unique` on the raw id stream:
    cotangents reordered by ``perm`` arrive grouped by destination row
    ``uid``, so the backward is gather + ``segment_sum(indices_are_sorted)``
    — the same trick ops/rgcn_segment.py plays with the static transpose
    graph, available here even though the index stream is batch-dynamic.
    """
    return jnp.take(x, inv, axis=0)


def _dedup_gather_fwd(x, inv, perm, uid):
    return jnp.take(x, inv, axis=0), (perm, uid, x.shape[0], inv.shape)


# XLA's scatter-add costs ~8 ns/update into VMEM-resident targets but
# ~200 ns/update once the target spills to HBM scale (measured v5e: 1.9 s
# for 9.8M x 64 rows into [10M, 64], sorted-or-not). Above this row count
# the dense-output Pallas kernel (ops/pallas/segment_sum.py) takes over.
_DENSE_SEG_MIN_SEGMENTS = 1 << 18


def _sorted_accumulate(gp, ids, num_segments):
    """Sorted segment-sum that picks its lowering by target size."""
    if num_segments >= _DENSE_SEG_MIN_SEGMENTS:
        from primekg_rgcn_tpu.ops.pallas.segment_sum import \
            dense_sorted_segment_sum

        return dense_sorted_segment_sum(gp, ids, num_segments).astype(
            gp.dtype)
    return jax.ops.segment_sum(gp, ids, num_segments=num_segments,
                               indices_are_sorted=True)


def _dedup_gather_bwd(res, g):
    perm, uid, m_in, inv_shape = res
    gp = jnp.take(g, perm, axis=0)
    dx = _sorted_accumulate(gp, uid, m_in)
    f0 = jax.dtypes.float0
    return (dx, np.zeros(inv_shape, f0), np.zeros(perm.shape, f0),
            np.zeros(uid.shape, f0))


dedup_gather.defvjp(_dedup_gather_fwd, _dedup_gather_bwd)


@jax.custom_vjp
def table_gather_sorted(table, ids):
    """``table[ids]`` for SORTED (ascending, sentinel-padded) unique ids.

    Used for the layer-0 embedding gather of the deduped frontier: the
    backward becomes one sorted segment-sum into the table instead of a
    scatter-add over up-to-N rows.
    """
    return jnp.take(table, ids, axis=0)


def _tg_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _tg_bwd(res, g):
    ids, rows = res
    dt = _sorted_accumulate(g, ids, rows)
    return dt, np.zeros(ids.shape, jax.dtypes.float0)


table_gather_sorted.defvjp(_tg_fwd, _tg_bwd)


@jax.custom_vjp
def rowwise_rel_sum(msg, rtag, ends):
    """Per-(node, relation) slot sums: [M, F, D] -> [M, R, D].

    Requires each row's relation tags ascending (the sampler guarantees
    it). Forward = cumsum along the slot axis + gather at each relation's
    end position + adjacent difference — O(M*F*D) streaming, no scatter
    and no [M, F, R] broadcast (a one-hot einsum streamed ~40 GB / 150 ms
    at full-PrimeKG scale; a flat (node*R+rel) segment-sum with ~1 row per
    segment lowered even worse, 1.2 s). Backward is exact and trivial:
    every slot's cotangent IS its relation's row, d_msg[m, f] =
    g[m, rtag[m, f]] — one gather.

    Args: msg [M, F, D] (weighted messages); rtag int32 [M, F] ascending
    per row; ends int32 [M, R] with ends[m, r] = #slots with tag <= r.
    """
    m, f, d = msg.shape
    r = ends.shape[1]
    s = jnp.cumsum(msg, axis=1)
    s = jnp.concatenate([jnp.zeros_like(s[:, :1]), s], axis=1)
    # Flat ROW gather instead of take_along_axis: the latter broadcasts the
    # index over D and lowers to M*R*D single-element gathers (~1 s at
    # full-PrimeKG scale); this is one [M*R] row gather of D-wide rows.
    flat = (jnp.arange(m, dtype=jnp.int32)[:, None] * (f + 1)
            + ends).reshape(-1)
    csum = jnp.take(s.reshape(m * (f + 1), d), flat, axis=0).reshape(m, r, d)
    return jnp.diff(csum, axis=1,
                    prepend=jnp.zeros_like(csum[:, :1]))


def _rrs_fwd(msg, rtag, ends):
    return rowwise_rel_sum(msg, rtag, ends), (rtag, ends.shape)


def _rrs_bwd(res, g):
    rtag, ends_shape = res
    m, r, d = g.shape
    f = rtag.shape[1]
    flat = (jnp.arange(m, dtype=jnp.int32)[:, None] * r + rtag).reshape(-1)
    d_msg = jnp.take(g.reshape(m * r, d), flat, axis=0).reshape(m, f, d)
    f0 = jax.dtypes.float0
    return d_msg, np.zeros(rtag.shape, f0), np.zeros(ends_shape, f0)


rowwise_rel_sum.defvjp(_rrs_fwd, _rrs_bwd)


def _pick_chunks(m: int, target: int = 8192) -> int:
    """Largest divisor of m giving chunks of roughly ``target`` rows."""
    best = 1
    for nc in range(1, 65):
        if m % nc == 0 and m // nc >= target:
            best = nc
    return best


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def chunked_rel_apply(n_chunks, rows3, rtag, slot_w, ends, w_all):
    """sum_r (per-(node, rel) weighted slot sums) @ W_r, chunked over nodes.

    Computes ``rowwise_rel_sum(rows3 * slot_w) reshaped @ W_flat`` as a
    lax.scan over node chunks with a MANUAL backward, so the [M, F, D]
    weighted-message, [M, F+1, D] cumsum, and [M, R, D] per-relation
    buffers exist only at chunk granularity and autodiff saves NO
    full-size residuals. Needed because the hosted TPU backend
    host-offloads buffers once a program's live set approaches ~8-10 GB —
    the unchunked full-PrimeKG sampled step spent ~0.9 s/step in host
    transport (profiled: S(1) copy-starts + ConcatBitcast slicing).

    Args: rows3 [M, F, D] gathered input rows (UNweighted); rtag int32
    [M, F] ascending per row; slot_w [M, F]; ends int32 [M, R];
    w_all [R, D, H]. Returns [M, H].
    """
    m = rows3.shape[0]
    r, d, h = w_all.shape
    w_flat = w_all.reshape(r * d, h)
    c = m // n_chunks

    def body(_, xs):
        rows_c, rtag_c, w_c, ends_c = xs
        msg = rows_c * w_c[..., None]
        agg = rowwise_rel_sum(msg, rtag_c, ends_c)        # [C, R, D]
        return None, agg.reshape(c, r * d) @ w_flat

    _, out = jax.lax.scan(
        body, None,
        (rows3.reshape(n_chunks, c, *rows3.shape[1:]),
         rtag.reshape(n_chunks, c, -1), slot_w.reshape(n_chunks, c, -1),
         ends.reshape(n_chunks, c, -1)))
    return out.reshape(m, h)


def _cra_fwd(n_chunks, rows3, rtag, slot_w, ends, w_all):
    out = chunked_rel_apply(n_chunks, rows3, rtag, slot_w, ends, w_all)
    return out, (rows3, rtag, slot_w, ends, w_all)


def _cra_bwd(n_chunks, res, g):
    rows3, rtag, slot_w, ends, w_all = res
    m, f, d = rows3.shape
    r, _, h = w_all.shape
    c = m // n_chunks
    w_flat = w_all.reshape(r * d, h)
    row_ix = jnp.arange(c, dtype=jnp.int32)[:, None]

    def body(dw_acc, xs):
        rows_c, rtag_c, w_c, ends_c, g_c = xs
        # Recompute the chunk's per-relation sums for dW.
        msg = rows_c * w_c[..., None]
        agg = rowwise_rel_sum(msg, rtag_c, ends_c).reshape(c, r * d)
        dw_acc = dw_acc + agg.T @ g_c
        # d_agg[m] = g[m] @ W^T; each slot's cotangent is its relation's
        # row of d_agg (flat row gather, not take_along_axis).
        d_agg = (g_c @ w_flat.T).reshape(c, r, d)
        flat = (row_ix * r + rtag_c).reshape(-1)
        d_msg = jnp.take(d_agg.reshape(c * r, d), flat,
                         axis=0).reshape(c, f, d)
        d_rows = d_msg * w_c[..., None]
        d_w = jnp.sum(d_msg * rows_c, axis=2)
        return dw_acc, (d_rows, d_w)

    dw, (d_rows, d_slotw) = jax.lax.scan(
        body, jnp.zeros((r * d, h), g.dtype),
        (rows3.reshape(n_chunks, c, f, d), rtag.reshape(n_chunks, c, f),
         slot_w.reshape(n_chunks, c, f), ends.reshape(n_chunks, c, -1),
         g.reshape(n_chunks, c, h)))
    f0 = jax.dtypes.float0
    return (d_rows.reshape(m, f, d), np.zeros(rtag.shape, f0),
            d_slotw.reshape(m, f), np.zeros(ends.shape, f0),
            dw.reshape(r, d, h))


chunked_rel_apply.defvjp(_cra_fwd, _cra_bwd)


def _sample_layer(key, csr: CsrCache, frontier: jnp.ndarray, fanout: int,
                  mode: str) -> Tuple[jax.Array, jnp.ndarray, SampledBlock]:
    """Expand one layer: returns (key, new_frontier (deduped), block)."""
    m = frontier.shape[0]
    n = csr.num_nodes
    r_count = csr.num_relations
    picks_flat = []
    inv_cnt = []
    for r in range(r_count):
        start = jnp.take(csr.row_start[r], frontier)
        count = jnp.take(csr.row_count[r], frontier)
        if mode == "uniform":
            key, k = jax.random.split(key)
            u = jax.random.uniform(k, (m, fanout))
            idx = jnp.floor(u * count[:, None]).astype(jnp.int32)
            valid = (count > 0)[:, None] & jnp.ones((m, fanout), bool)
            n_valid = jnp.where(count > 0, fanout, 0)
        else:  # truncate: first min(deg, f) neighbors
            idx = jnp.broadcast_to(jnp.arange(fanout, dtype=jnp.int32),
                                   (m, fanout))
            valid = idx < count[:, None]
            n_valid = jnp.minimum(count, fanout)
        pos = start[:, None] + jnp.minimum(idx, jnp.maximum(count[:, None] - 1, 0))
        picks = jnp.take(csr.col[r], pos)           # [M, f] global ids
        picks = jnp.where(valid, picks, n)
        picks_flat.append(picks.reshape(-1))
        inv_cnt.append(jnp.where(n_valid > 0, 1.0 / n_valid, 0.0))

    raw = jnp.concatenate([frontier] + picks_flat)   # [M * (1 + R*f)]
    cap = _unique_cap(int(raw.shape[0]), n)
    uniq, inv, perm, uid = _sorted_unique(raw, cap, n)
    block = SampledBlock(
        src_local=inv[m:].reshape(r_count, m, fanout),
        self_idx=inv[:m],
        out_ids=frontier,
        inv_cnt=jnp.stack(inv_cnt),           # [R, M]
        sort_perm=perm,
        sort_uid=uid,
        m_out=m,
        m_in=cap,
    )
    return key, uniq, block


def sample_batch(key: jax.Array, csr: CsrCache, seeds: jnp.ndarray,
                 fanouts: Sequence[int], *, mode: str = "uniform"
                 ) -> SampledBatch:
    """Sample an L-layer computation block for ``seeds``.

    fanouts are outermost-first (e.g. [15, 10] samples 15 in-neighbors per
    relation for the output layer and 10 for the layer below, mirroring the
    config in BASELINE.json). Jit-safe for fixed seed count.
    """
    if mode not in ("uniform", "truncate"):
        raise ValueError(
            f"per-relation layout supports mode 'uniform' or 'truncate', "
            f"got {mode!r} ('block' needs the combined layout — its "
            f"contiguous windows ride the merged CSR)")
    seeds = seeds.astype(jnp.int32)
    cap0 = _unique_cap(int(seeds.shape[0]), csr.num_nodes)
    frontier, seed_gather = jnp.unique(
        seeds, return_inverse=True, size=cap0, fill_value=csr.num_nodes)
    seed_gather = seed_gather.astype(jnp.int32)
    blocks: List[SampledBlock] = []
    for f in fanouts:
        key, frontier, block = _sample_layer(key, csr, frontier, int(f), mode)
        blocks.append(block)
    return SampledBatch(frontier=frontier, blocks=tuple(reversed(blocks)),
                        seed_gather=seed_gather)


def block_aggregate(layer_params, x_in: jnp.ndarray, block: SampledBlock,
                    materialize_fn, compute_dtype=None) -> jnp.ndarray:
    """Apply one RGCN layer over a sampled block.

    x_in: [M_in, Din] deduped input-table features (sentinel rows zero) —
    or, for an identity block, the RAW [N, Din] embedding table (then
    ``compute_dtype`` says what to convert gathered rows to; converting
    the whole table first would materialize an [N, D] copy every step).
    Returns [M_out, Dout].
    """
    if isinstance(block, CombinedBlock):
        return _block_aggregate_combined(layer_params, x_in, block,
                                         materialize_fn,
                                         compute_dtype=compute_dtype)
    w_rel = materialize_fn(layer_params).astype(x_in.dtype)  # [R, Din, Dout]
    w_root = layer_params["w_root"].astype(x_in.dtype)
    bias = layer_params["bias"].astype(x_in.dtype)
    r_count, m, fanout = block.src_local.shape
    # ONE dedup gather over the whole raw id stream (self rows + all
    # relations' picks) so the backward is a single sorted segment-sum.
    inv_all = jnp.concatenate(
        [block.self_idx, block.src_local.reshape(-1)])
    rows = dedup_gather(x_in, inv_all, block.sort_perm, block.sort_uid)
    out = rows[:m] @ w_root + bias[None, :]
    for r in range(r_count):
        nbr = rows[m + r * m * fanout: m + (r + 1) * m * fanout]
        nbr = nbr.reshape(m, fanout, x_in.shape[1])       # [M, f, Din]
        mean = nbr.sum(axis=1) * block.inv_cnt[r][:, None]
        out = out + mean @ w_rel[r]
    return out


# -- combined-neighborhood layout (relation-sparse graphs) --------------------
#
# The per-relation [R, M, f] pick tensor above is right for graphs where most
# (node, relation) pairs have edges (the 3-relation north-star subgraph). On
# relation-SPARSE graphs it explodes: full PrimeKG averages ~1.2 in-edges per
# (node, relation) pair across 30 relations, so fanout 15/10 materializes
# R*f = 300-450 mostly-sentinel slots per node — a measured 58M-row gather
# per step (2,970 ms, 0.03x baseline). The combined layout samples a single
# per-node budget from the node's MERGED in-neighborhood (all relations),
# tags each slot with its relation, and carries an importance weight that
# keeps the per-relation-mean estimator unbiased:
#
#   mean_r(v) = (1/deg_r) sum_{e in r} x_src
#   uniform pick over deg_total edges hits relation r w.p. deg_r/deg_total
#   => weight per slot of relation r: deg_total / (F * deg_r)      (uniform)
#      or 1/deg_r over the first min(deg_total, F) edges           (truncate;
#      exactly the full-graph layer when F >= max total in-degree).
#
# Aggregation runs on the MXU via one-hot relation einsums instead of R
# masked passes: agg[m,r,d] = sum_f onehot[m,f,r] * msg[m,f,d], then
# out = einsum(agg, W[r,d,h]) — two batched matmuls, no [M*R, D] scatter.


class CombinedCsr(NamedTuple):
    """(dst, rel)-sorted merged CSR with degree annotations.

    Two interchangeable degree layouts, picked by scale (``slim``):

    - **fat** (default at small/medium N*R): rel int32[E]; deg_rel_flat
      float16[(N + 1) * R] in-degree of (node, rel) flattened node-major;
      edge_deg empty. Word-width gathers — the fastest layout when the
      table fits (measured: the slim layout's sub-word gathers cost the
      sampled-full config ~15% step time, bench_report.json).
    - **slim** (auto at config-5 scale): ONE int32[E, 2] record per edge,
      ``packed[:, 0] = src id``, ``packed[:, 1] = rel << 16 | f16-bits of
      the edge's (dst, rel) in-degree``. The pick phase then runs ONE
      8-byte row gather per slot instead of three element gathers
      (col + rel + edge_deg) — gathers are descriptor-count-bound on TPU,
      so this is a 3x -> 1x pass reduction at config-5 scale (9.6M slots).
      Falls back to separate rel int32[E] + edge_deg float32[E] arrays
      when R > 32767 or a (dst, rel) in-degree overflows float16.

    row_start: int32[N + 2] offsets into col/rel (row N is the empty
    sentinel row). col: int32[E] source ids (empty when ``packed`` carries
    them). deg_total: int32[N + 1].
    """

    row_start: jnp.ndarray
    col: jnp.ndarray
    rel: jnp.ndarray
    edge_deg: jnp.ndarray
    deg_total: jnp.ndarray
    num_nodes: int
    num_relations: int
    avg_present_relations: float
    deg_rel_flat: jnp.ndarray = None
    packed: jnp.ndarray = None


# The fat [(N+1) * R] degree table is kept below this size; beyond it the
# per-edge slim layout wins on memory (config-5: 1 GB vs 200 MB).
SLIM_TABLE_BYTES = 128 * 2**20

def _window_pad(e: int) -> int:
    """Sentinel rows appended to the packed record table: >= 128 so
    block-mode window fetches (ops/pallas/window_fetch.py) can over-read a
    full 64-record granule past the last row, plus alignment filler so the
    padded table is an exact multiple of 64 records = 128 words (the
    aligned-pair fetch views it as [G, 128] int32 rows)."""
    return 128 + (-e) % 64


# Records per aligned granule (= 128 int32 lanes / 2 words per record).
GRANULE = 64


def packed_is_pairs(packed) -> bool:
    """True when a packed record table is in granule-pairs form
    (int32[G, 128], see :func:`build_combined_csr` ``window_pairs``)."""
    return (packed is not None and packed.ndim == 2
            and packed.shape[1] == 2 * GRANULE)


def csr_to_pairs_form(ccsr: "CombinedCsr") -> "CombinedCsr":
    """Convert an already-built row-form packed CSR to granule-pairs form.

    One host round-trip of the packed table (free when it is still a
    numpy-backed array; one download+upload when device-resident) — used
    by the step builders when ``mode="block"`` meets a CSR that was built
    without ``window_pairs=True``. No-op for fat/unpacked/pairs CSRs.
    """
    p = ccsr.packed
    if p is None or not p.shape[0] or packed_is_pairs(p):
        return ccsr
    pr = np.asarray(p).reshape(-1, 2 * GRANULE)
    return ccsr._replace(packed=jnp.asarray(pr))


# Backward-compat floor used in tests; the real pad is _window_pad(E).
WINDOW_PAD = 128


def build_combined_csr(graph: RelGraph, *, slim: bool = None,
                       window_pairs: bool = False) -> CombinedCsr:
    """Host-side, once per graph: merged (dst, rel)-sorted CSR.

    ``slim`` switches the degree layout (see :class:`CombinedCsr`);
    ``None`` auto-selects: slim only when the fat table would exceed
    ``SLIM_TABLE_BYTES`` — the config-5 memory savings are irrelevant at
    129K nodes and its sub-word gathers cost measurable step time there
    (VERDICT r2 item 5).

    ``window_pairs`` stores the packed record table in GRANULE-PAIRS form
    (int32[G, 128]: 64 (src, meta) records per row — the same bytes,
    reshaped HERE on the host where it is a free view) instead of row
    form (int32[Ep, 2]). Block-mode window fetches need the [G, 128]
    view, and deriving it on-device is not safe: XLA implements the
    narrow-dim reshape of a [100M, 2] table by first copying it into the
    lane-padded (8, 128)-tiled layout — a 51.2 GB allocation that OOMs
    the 16 GB chip at compile time (measured, config-5 block bench).
    Row form remains the layout for per-slot gathers (uniform/truncate).
    """
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    n, r_count = graph.num_nodes, graph.num_relations
    if slim is None:
        slim = (n + 1) * r_count * 2 > SLIM_TABLE_BYTES
    order = np.lexsort((rel, dst))
    col = src[order].astype(np.int32)
    rel_s = rel[order].astype(np.int32)
    d = dst[order]
    row_start = np.searchsorted(d, np.arange(n + 2)).astype(np.int32)
    deg_total = np.diff(row_start).astype(np.int32)
    # Per-edge (dst, rel) degree via run lengths — the CSR is (dst, rel)-
    # sorted so equal pairs are contiguous; O(E) host memory, no [N * R]
    # bincount table. float16 is exact for run lengths < 2048 and <= 0.05%
    # off up to 65504 — but OVERFLOWS to inf beyond (a power-law hub's
    # importance weight would silently become 0), so graphs with such hubs
    # keep float32.
    e = d.shape[0]
    edge_deg = np.zeros(0, np.float16)
    deg_rel_flat = np.zeros(0, np.float16)
    packed = np.zeros((0, 2), np.int32)
    if e:
        key64 = d.astype(np.int64) * r_count + rel_s
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(key64)) + 1, [e]])
        lens = np.diff(starts)
        deg_dtype = np.float16 if lens.max() < 60000 else np.float32
        if slim:
            deg_edge = np.repeat(lens, lens).astype(deg_dtype)
            if r_count <= 32767 and deg_dtype == np.float16:
                meta = ((rel_s.astype(np.int32) << 16)
                        | deg_edge.view(np.uint16).astype(np.int32))
                packed = np.stack([col, meta], axis=1)
                # _window_pad sentinel records (src = sentinel node, last
                # relation, zero degree => weight 0) let block-mode window
                # fetches over-read past the last row without bounds
                # checks and round the table to whole 64-record granules;
                # true edge count stays row_start[-1].
                pad = np.empty((_window_pad(e), 2), np.int32)
                pad[:, 0] = n  # sentinel node id (embedding row n is 0)
                pad[:, 1] = (r_count - 1) << 16
                packed = np.concatenate([packed, pad])
                if window_pairs:
                    packed = packed.reshape(-1, 2 * GRANULE)
                col = np.zeros(0, np.int32)
                rel_s = np.zeros(0, np.int32)
            else:
                edge_deg = deg_edge
        else:
            deg_rel_flat = np.zeros((n + 1) * r_count, deg_dtype)
            deg_rel_flat[key64[starts[:-1]]] = lens.astype(deg_dtype)
        # distinct (dst, rel) pairs per node = runs per node.
        present = float(
            np.bincount(d[starts[:-1]], minlength=n + 1).mean())
    else:
        present = 0.0
    rel_dtype = (np.int8 if r_count <= 127 else np.int32) if slim \
        else np.int32
    if packed.shape[0]:
        rel_dtype = np.int32  # rel array is empty; dtype is moot
    return CombinedCsr(
        row_start=jnp.asarray(row_start), col=jnp.asarray(col),
        rel=jnp.asarray(rel_s.astype(rel_dtype)),
        edge_deg=jnp.asarray(edge_deg),
        deg_total=jnp.asarray(deg_total), num_nodes=n,
        num_relations=r_count, avg_present_relations=present,
        deg_rel_flat=jnp.asarray(deg_rel_flat),
        packed=jnp.asarray(packed))


class CombinedBlock(NamedTuple):
    """One sampled layer in the combined layout.

    src_local: int32[M, F] deduped-input-table rows; rel_tag: int32[M, F];
    slot_w: float32[M, F] importance weights (0 on invalid slots);
    self_idx/out_ids/m_out/m_in: as in SampledBlock.

    ``ident=True`` marks a NEAR-SATURATED innermost block (raw pick slots
    >= IDENT_FRACTION of the node space): src_local/self_idx hold GLOBAL
    node ids, m_in == num_nodes, and the aggregation gathers straight from
    the embedding TABLE (out-of-range sentinel ids fill zero) instead of a
    deduplicated frontier table. At config-5 scale (10M nodes, budget 48,
    4,096 seeds) the raw stream is ~9.8M slots — 98% of the node space —
    so the dedup table bought nothing while costing a [9.8M, D] gather +
    materialization (2.5 GB) plus the unique construction on every step.
    sort_perm/sort_uid still carry the argsort of the raw id stream: the
    backward remains ONE sorted segment-sum, now directly into table rows.
    """

    src_local: jnp.ndarray
    rel_tag: jnp.ndarray
    slot_w: jnp.ndarray
    self_idx: jnp.ndarray
    out_ids: jnp.ndarray
    sort_perm: jnp.ndarray
    sort_uid: jnp.ndarray
    m_out: int
    m_in: int
    ident: bool = False
    tags_sorted: bool = True


def _combined_agg_impl() -> str:
    """The per-(node, relation) reduction structure (see
    _block_aggregate_combined). Read in both the sampler (whether the
    per-row tag sort is needed at all) and the aggregation."""
    import os

    return os.environ.get("PRIMEKG_COMBINED_AGG", "einsum")


# Innermost-layer frontiers whose raw slot count reaches this fraction of
# the node space skip dedup entirely (see CombinedBlock.ident). History:
# the original 0.5 default reasoned that identity costs <= 2x the minimal
# table rows in backward segment-sum length; round-5 measured the dedup
# construction far costlier than that bound (8/5 dedup 949 ms vs 284 ms
# identity at 0.34 x N) and moved the default to 0.3, the lowest then-
# measured win point. The round-5 CROSSOVER SWEEP (bench/suite.py
# bench_ident_sweep, config-5 graph, batch in {64..1024} so raw spans
# 0.02-0.32 x N, both regimes timed at every point) pinned the boundary:
# dedup costs ~286 ns/slot (near-constant), identity ~75 ns/slot plus a
# ~65 ms node-space term (dense table update + [N]-shaped streams), so
# identity wins everywhere above the measured crossing raw = 0.026 x N
# (e.g. 88 vs 120 ms at 0.04; dedup's only win was 64 vs 76 ms at 0.02).
# Both cost terms are per-slot/per-node linear (fit residuals < 5%), so
# the FRACTION is scale-invariant in N. Default 0.03 = the measured
# crossover rounded up. Tunable via PRIMEKG_IDENT_FRACTION.
def _ident_fraction() -> float:
    return float(os.environ.get("PRIMEKG_IDENT_FRACTION", "0.03"))


IDENT_FRACTION = 0.03


def parse_sample_mode(mode: str):
    """Split a sampling-mode string into (base, n_windows).

    ``"block"`` is 1 window; ``"blockN"`` (e.g. ``"block4"``) is N
    independent aligned sub-windows of F/N records each per node — same
    total budget and fetch bytes, ~N× better per-step relation coverage
    (one merged-CSR window's picks are consecutive (dst, rel)-sorted
    records, which over-samples one relation run per step; the measured
    cost was −0.05 Hits@10, docs/KERNELS.md Round 4). Each sub-window is
    an independent unbiased draw of the F/N-block estimator, so averaging
    them (weights divided by N) stays unbiased at any N.
    """
    if mode.startswith("block") and mode != "block":
        try:
            n = int(mode[len("block"):])
        except ValueError:
            raise ValueError(f"unknown sampling mode {mode!r}")
        if n < 1:
            raise ValueError(f"block window count must be >= 1: {mode!r}")
        return "block", n
    return mode, 1


def _window_fetch_enabled() -> bool:
    """Block-mode contiguous-DMA pick fetch (auto: on except CPU, where
    the interpreted kernel is slower than the plain gather; tests force it
    with PRIMEKG_WINDOW_FETCH=1 to exercise the integrated path)."""
    env = os.environ.get("PRIMEKG_WINDOW_FETCH", "auto")
    if env in ("0", "off"):
        return False
    if env in ("1", "pallas"):
        return True
    return jax.default_backend() != "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ident_pick_gather(out_dtype, table, ids, perm, srt):
    """``table[ids]`` for GLOBAL node ids (sentinel ``num_nodes`` -> 0 row).

    The identity-mode analogue of :func:`dedup_gather` + the layer-0 table
    gather fused into one: ids index the raw embedding table directly;
    out-of-range sentinel slots fill zero. (perm, srt) = argsort of ids and
    the sorted ids — the backward is one sorted segment-sum into the table
    (sentinel segments drop out of range).

    ``out_dtype`` folds the compute-dtype conversion INTO the op: the
    forward emits (and the backward receives) compute-dtype rows, so a
    bf16 step's [L, D] cotangent stream is half the bytes of the f32 one
    the outside-convert structure would transpose back. The backward
    accumulates in f32 regardless — a lax.scan over sorted chunks
    scatter-adding into the f32 table cotangent (the carry aliases
    in-place under XLA), so no second [L, D] f32 buffer ever exists.
    """
    rows = jnp.take(table, ids, axis=0, mode="fill", fill_value=0)
    return rows.astype(out_dtype) if out_dtype is not None else rows


def ident_pick_gather(table, ids, perm, srt, out_dtype=None):
    """Convenience order: arrays first, static dtype last."""
    return _ident_pick_gather(out_dtype, table, ids, perm, srt)


def _ipg_fwd(out_dtype, table, ids, perm, srt):
    rows = jnp.take(table, ids, axis=0, mode="fill", fill_value=0)
    if out_dtype is not None:
        rows = rows.astype(out_dtype)
    return rows, (perm, srt, table.shape[0],
                  jnp.zeros((0,), table.dtype), ids.shape)


def _ipg_bwd(out_dtype, res, g):
    from primekg_rgcn_tpu.ops.pallas.segment_sum import \
        dense_sorted_segment_sum

    perm, srt, rows, tab_proto, ids_shape = res
    # Reorder cotangents into id order (a row gather — ~14 ns/row on v5e),
    # then accumulate with the dense-output Pallas kernel: XLA's scatter-add
    # into a [10M, 64] target costs ~200 ns/row (1.9 s at 9.8M rows,
    # sorted-or-not) and WAS the sampled-10m step's dominant cost. The
    # kernel accumulates in f32 from bf16 cotangents exactly (one-hot MXU
    # matmul with f32 accumulation), so the bf16 cotangent stream loses
    # nothing while halving gather bytes.
    gp = jnp.take(g, perm, axis=0)
    dt = dense_sorted_segment_sum(gp, srt, rows).astype(tab_proto.dtype)
    f0 = jax.dtypes.float0
    return (dt, np.zeros(ids_shape, f0), np.zeros(perm.shape, f0),
            np.zeros(srt.shape, f0))


_ident_pick_gather.defvjp(_ipg_fwd, _ipg_bwd)


def _sample_layer_combined(key, ccsr: CombinedCsr, frontier: jnp.ndarray,
                           budget: int, mode: str, allow_ident: bool = False):
    mode, n_win = parse_sample_mode(mode)
    m = frontier.shape[0]
    n = ccsr.num_nodes
    r_count = ccsr.num_relations
    start = jnp.take(ccsr.row_start, frontier)
    dtot = jnp.take(ccsr.deg_total, frontier)
    n_blocks = None
    if mode == "uniform":
        key, k = jax.random.split(key)
        u = jax.random.uniform(k, (m, budget))
        idx = jnp.floor(u * dtot[:, None]).astype(jnp.int32)
        valid = (dtot > 0)[:, None] & jnp.ones((m, budget), bool)
    elif mode == "block":
        # n_win independent uniformly-random ALIGNED blocks of
        # F/n_win consecutive merged-CSR edges per node: every edge's
        # inclusion probability within one sub-window is exactly
        # 1 / ceil(deg_total / f) regardless of which block it sits in
        # (the last, short block is chosen with the same probability), so
        # each sub-window's per-relation-mean estimator is unbiased with
        # weight ceil(deg_total / f) / deg_r; averaging the n_win
        # independent draws divides the weight by n_win and stays
        # unbiased. Each sub-window's picks are CONTIGUOUS records,
        # fetchable as one DMA instead of f random row-gather descriptors
        # (the config-5 pick fetch is descriptor-bound, docs/KERNELS.md
        # "Round 3"). deg <= f reduces to the exact full neighborhood
        # replicated n_win times at 1/n_win weight (== exact mean).
        if budget % n_win:
            raise ValueError(
                f"block window count {n_win} must divide the layer "
                f"budget {budget}")
        f_win = budget // n_win
        key, k = jax.random.split(key)
        n_blocks = -(-dtot // f_win)  # ceil; 0 when deg == 0
        u = jax.random.uniform(k, (m, n_win))
        blk = jnp.floor(u * jnp.maximum(n_blocks, 1).astype(
            jnp.float32)[:, None]).astype(jnp.int32)
        blk = jnp.minimum(blk, jnp.maximum(n_blocks - 1, 0)[:, None])
        idx = ((blk * f_win)[:, :, None]
               + jnp.arange(f_win, dtype=jnp.int32)[None, None, :]
               ).reshape(m, budget)
        valid = idx < dtot[:, None]
    else:  # truncate: the first min(deg_total, F) merged edges
        idx = jnp.broadcast_to(jnp.arange(budget, dtype=jnp.int32),
                               (m, budget))
        valid = idx < dtot[:, None]
    pos = start[:, None] + jnp.minimum(idx, jnp.maximum(dtot[:, None] - 1, 0))
    if ccsr.packed is not None and ccsr.packed.shape[0]:
        pairs = packed_is_pairs(ccsr.packed)
        if pairs and mode != "block":
            raise ValueError(
                f"packed CSR is in granule-pairs form, which only block-"
                f"mode window fetches can read — build it without "
                f"window_pairs for mode={mode!r}")
        if mode == "block" and (pairs or _window_fetch_enabled()):
            # Contiguous windows: ONE async DMA per node instead of F
            # row-gather descriptors (ops/pallas/window_fetch.py). The
            # build-time WINDOW_PAD sentinel rows absorb the over-read
            # past each row's end; out-of-row slots are masked below like
            # any invalid slot.
            from primekg_rgcn_tpu.ops.pallas.window_fetch import \
                window_rows_fetch

            f_win = budget // n_win
            rec = window_rows_fetch(
                ccsr.packed,
                (start[:, None] + blk * f_win).reshape(-1),
                f_win).reshape(m, budget, 2)
        else:
            # Packed slim layout: (src, rel | deg) in one int32[E, 2]
            # record — ONE 8-byte row gather per slot instead of three
            # element gathers.
            rec = jnp.take(ccsr.packed, pos.reshape(-1),
                           axis=0).reshape(m, budget, 2)
        picks = jnp.where(valid, rec[..., 0], n)
        meta = rec[..., 1]
        # Invalid slots tag the LAST relation (weight 0) so per-row rel
        # tags stay ascending — the aggregation's sorted-segment promise.
        rtag = jnp.where(valid, meta >> 16, r_count - 1)
        deg_r = jax.lax.bitcast_convert_type(
            (meta & 0xFFFF).astype(jnp.uint16),
            jnp.float16).astype(jnp.float32)
        deg_r = jnp.where(valid, deg_r, 0.0)
    else:
        picks = jnp.where(valid, jnp.take(ccsr.col, pos), n)
        # Invalid slots tag the LAST relation (weight 0) so per-row rel tags
        # stay ascending — the aggregation's sorted-segment promise needs it.
        rtag = jnp.where(valid, jnp.take(ccsr.rel, pos).astype(jnp.int32),
                         r_count - 1)
        if ccsr.edge_deg.shape[0]:
            # Unpacked slim layout (R > 32767 or f16-overflowing hub): the
            # picked edge's (dst, rel) in-degree rides along per edge.
            deg_r = jnp.where(
                valid, jnp.take(ccsr.edge_deg, pos),
                ccsr.edge_deg.dtype.type(0)).astype(jnp.float32)
        else:
            # Fat layout: word-width gather into the degree table.
            deg_r = jnp.take(
                ccsr.deg_rel_flat,
                frontier[:, None] * r_count + rtag).astype(jnp.float32)
            deg_r = jnp.where(valid, deg_r, 0.0)
    if mode == "uniform":
        w = dtot[:, None].astype(jnp.float32) / (
            budget * jnp.maximum(deg_r, 1.0))
    elif mode == "block":
        # n_blocks is ceil(deg_total / f_win); the n_win independent
        # sub-window estimators are averaged (1/n_win each).
        w = n_blocks[:, None].astype(jnp.float32) / (
            n_win * jnp.maximum(deg_r, 1.0))
    else:
        w = 1.0 / jnp.maximum(deg_r, 1.0)
    w = jnp.where(valid & (deg_r > 0), w, 0.0)

    # Sort each node's slots by relation tag — ONLY the rowwise/chunked
    # aggregation structures need ascending per-row tags (their cumsum-diff
    # reduction is a sorted-segment walk); the DEFAULT one-hot einsum is
    # slot-order-independent, so it skips the [M, F] argsort plus the three
    # M*F-element regathers entirely (measured ~100 ms of the config-5
    # sample forward). The merged CSR is already rel-sorted per node, so
    # truncate-mode picks arrive sorted either way.
    tags_sorted = True
    if mode == "uniform" or (mode == "block" and n_win > 1):
        # Multi-window block rows are per-sub-window sorted but not
        # globally ascending — same handling as uniform picks.
        if _combined_agg_impl() != "einsum":
            order = jnp.argsort(rtag, axis=1, stable=True)
            # Flat 1-D gathers, not take_along_axis (which lowers to M*F
            # single-element gathers on TPU — 20 ms per array at this size).
            flat = (jnp.arange(m, dtype=jnp.int32)[:, None] * budget
                    + order).reshape(-1)
            g1 = lambda a: jnp.take(a.reshape(-1), flat, axis=0).reshape(  # noqa: E731
                m, budget)
            picks, rtag, w = g1(picks), g1(rtag), g1(w)
        else:
            tags_sorted = False

    raw = jnp.concatenate([frontier, picks.reshape(-1)])
    raw_len = int(raw.shape[0])
    if allow_ident and raw_len >= _ident_fraction() * (n + 1):
        # Near-saturated innermost frontier: skip dedup, keep global ids.
        # The backward still needs the raw stream's argsort (sorted
        # segment-sum into table rows); forward-only traces DCE it away.
        perm = jnp.argsort(raw).astype(jnp.int32)
        srt = jnp.take(raw, perm, axis=0)
        block = CombinedBlock(
            src_local=picks, rel_tag=rtag, slot_w=w,
            self_idx=frontier, out_ids=frontier, sort_perm=perm,
            sort_uid=srt, m_out=m, m_in=n, ident=True,
            tags_sorted=tags_sorted)
        return key, None, block
    cap = _unique_cap(raw_len, n)
    uniq, inv, perm, uid = _sorted_unique(raw, cap, n)
    block = CombinedBlock(
        src_local=inv[m:].reshape(m, budget), rel_tag=rtag, slot_w=w,
        self_idx=inv[:m], out_ids=frontier, sort_perm=perm, sort_uid=uid,
        m_out=m, m_in=cap, tags_sorted=tags_sorted)
    return key, uniq, block


def sample_batch_combined(key: jax.Array, ccsr: CombinedCsr,
                          seeds: jnp.ndarray, budgets: Sequence[int],
                          *, mode: str = "uniform",
                          allow_ident: bool = False) -> SampledBatch:
    """Combined-layout analogue of :func:`sample_batch`.

    ``budgets`` are TOTAL per-node in-neighbor budgets per layer
    (outermost-first) covering all relations jointly — compare per-relation
    ``fanouts`` which cost R x f slots per node.

    ``allow_ident=True`` lets the INNERMOST layer go identity when its raw
    slot stream covers >= IDENT_FRACTION of the node space (see
    :class:`CombinedBlock`): ``batch.frontier`` is then None and the
    encoder gathers straight from the embedding table. Only single-chip
    paths may enable it — sharded layouts rely on frontier-sized
    collectives and must keep the deduplicated frontier.

    Modes: "uniform" (per-slot with-replacement picks), "block" /
    "blockN" (one / N random aligned sub-window(s) of F[/N] edges per
    node — unbiased, DMA-contiguous, see :func:`_sample_layer_combined`
    and :func:`parse_sample_mode`), "truncate" (first min(deg, F) edges;
    exact when F >= max degree).
    """
    if parse_sample_mode(mode)[0] not in ("uniform", "block", "truncate"):
        raise ValueError(f"unknown sampling mode {mode!r}")
    seeds = seeds.astype(jnp.int32)
    cap0 = _unique_cap(int(seeds.shape[0]), ccsr.num_nodes)
    frontier, seed_gather = jnp.unique(
        seeds, return_inverse=True, size=cap0, fill_value=ccsr.num_nodes)
    seed_gather = seed_gather.astype(jnp.int32)
    blocks: List[CombinedBlock] = []
    for li, f in enumerate(budgets):
        key, frontier, block = _sample_layer_combined(
            key, ccsr, frontier, int(f), mode,
            allow_ident=allow_ident and li == len(budgets) - 1)
        blocks.append(block)
    return SampledBatch(frontier=frontier, blocks=tuple(reversed(blocks)),
                        seed_gather=seed_gather)


def _block_aggregate_combined(layer_params, x_in: jnp.ndarray,
                              block: CombinedBlock, materialize_fn,
                              compute_dtype=None) -> jnp.ndarray:
    w_rel = materialize_fn(layer_params)   # [R, Din, Dout]
    w_root = layer_params["w_root"]
    bias = layer_params["bias"]
    r_count = w_rel.shape[0]
    din, dout = w_rel.shape[1], w_rel.shape[2]
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None \
        else x_in.dtype
    w_rel = w_rel.astype(dt)
    w_root = w_root.astype(dt)
    bias = bias.astype(dt)
    inv_all = jnp.concatenate(
        [block.self_idx, block.src_local.reshape(-1)])
    if block.ident:
        # x_in is the raw table; ids are global; sentinel (== num_nodes)
        # fills zero. Conversion rides inside the op (gather-then-convert;
        # casting the table first would materialize a full [N, D] copy).
        rows = ident_pick_gather(x_in, inv_all, block.sort_perm,
                                 block.sort_uid, dt)
    else:
        rows = dedup_gather(x_in, inv_all, block.sort_perm, block.sort_uid)
    m = block.m_out
    out = rows[:m] @ w_root + bias[None, :]
    budget = block.src_local.shape[1]
    # Per-(node, relation) sums, then all R relation transforms as one
    # [*, R*Din] @ [R*Din, Dout] MXU matmul. Three interchangeable
    # reduction structures (identical math; relative speed varies with the
    # backend's memory-space placement decisions, which on the hosted v5e
    # frontend have proven shape-dependent; full-PrimeKG fanout-15/10
    # train step measured clean: einsum 446 ms, rowwise 572 ms, chunked
    # 760 ms — hence the default, revisit on other backends via
    # PRIMEKG_COMBINED_AGG):
    #   einsum (default): one-hot [M, F, R] einsum (streams M*F*R*Din);
    #   rowwise: whole-batch cumsum-diff (rowwise_rel_sum);
    #   chunked: lax.scan over node chunks + manual VJP, big
    #       intermediates only ever exist at chunk size.
    impl = _combined_agg_impl()
    msg3 = rows[m:].reshape(m, budget, din)
    slot_w = block.slot_w.astype(dt)  # keep bf16 paths bf16
    if impl == "einsum":
        msg = msg3 * slot_w[..., None]
        onehot = (block.rel_tag[..., None]
                  == jnp.arange(r_count, dtype=jnp.int32)).astype(msg.dtype)
        agg = jnp.einsum("mfr,mfd->mrd", onehot, msg)
        return out + agg.reshape(m, r_count * din) @ w_rel.reshape(
            r_count * din, dout)
    if not block.tags_sorted:
        raise ValueError(
            "PRIMEKG_COMBINED_AGG changed between sampling and aggregation: "
            f"the '{impl}' reduction needs per-row ascending relation tags, "
            "but this block was sampled for the order-independent einsum "
            "path (tag sort skipped). Keep the env var constant per step.")
    ends = jnp.stack(
        [(block.rel_tag <= r).sum(1, dtype=jnp.int32)
         for r in range(r_count)], axis=1)                  # [M, R]
    if impl == "rowwise":
        agg = rowwise_rel_sum(msg3 * slot_w[..., None],
                              block.rel_tag, ends)
        return out + agg.reshape(m, r_count * din) @ w_rel.reshape(
            r_count * din, dout)
    nc = _pick_chunks(m)
    return out + chunked_rel_apply(
        nc, msg3, block.rel_tag, slot_w, ends, w_rel)
