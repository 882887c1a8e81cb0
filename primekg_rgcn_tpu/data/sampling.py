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

A sampled 2-layer step touches O(unique(B * f^2)) embedding rows instead of
O(E) — which is what makes 100M-edge graphs trainable.
"""

from __future__ import annotations

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
    uniq, inv = jnp.unique(raw, return_inverse=True, size=cap, fill_value=n)
    inv = inv.astype(jnp.int32)
    block = SampledBlock(
        src_local=inv[m:].reshape(r_count, m, fanout),
        self_idx=inv[:m],
        out_ids=frontier,
        inv_cnt=jnp.stack(inv_cnt),           # [R, M]
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
                    materialize_fn) -> jnp.ndarray:
    """Apply one RGCN layer over a sampled block.

    x_in: [M_in, Din] deduped input-table features (sentinel rows zero).
    Returns [M_out, Dout].
    """
    w_rel = materialize_fn(layer_params)   # [R, Din, Dout]
    w_root = layer_params["w_root"]
    bias = layer_params["bias"]
    r_count, m, fanout = block.src_local.shape
    out = jnp.take(x_in, block.self_idx, axis=0) @ w_root + bias[None, :]
    for r in range(r_count):
        nbr = jnp.take(x_in, block.src_local[r].reshape(-1), axis=0)
        nbr = nbr.reshape(m, fanout, x_in.shape[1])       # [M, f, Din]
        mean = nbr.sum(axis=1) * block.inv_cnt[r][:, None]
        out = out + mean @ w_rel[r]
    return out
