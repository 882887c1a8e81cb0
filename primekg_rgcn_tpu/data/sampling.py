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
- Everything is statically shaped: layer l has exactly
  M_{l+1} * (1 + R * f_l) frontier slots and M * f padded edge slots per
  relation; invalid slots point at a sentinel position whose features are
  zero and whose count weight is zero.

A sampled 2-layer step gathers only the frontier's embedding rows — O(B * f^2)
work instead of O(E) — which is what makes 100M-edge graphs trainable.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.data.graph import RelGraph


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

    For an output frontier of M nodes and fanout f per relation:
    src_local: int32[R, M, f] indices into the *input* frontier
        (position-coded: input frontier layout is
        [out_frontier (M), nbrs_r0 (M*f), nbrs_r1 (M*f), ...]);
        invalid slots hold the input-frontier sentinel M_in.
    inv_cnt: float32[R, M] reciprocal of the number of valid samples.
    m_out / m_in: static frontier sizes (excluding sentinels).
    """

    src_local: jnp.ndarray
    inv_cnt: jnp.ndarray
    m_out: int
    m_in: int


class SampledBatch(NamedTuple):
    """Input to a sampled encoder pass.

    frontier: int32[M0] global node ids feeding the embedding table
        (sentinel slots hold num_nodes).
    blocks: innermost-first list; blocks[-1] outputs the seed embeddings.
    seeds are the first ``blocks[-1].m_out`` entries of every frontier.
    """

    frontier: jnp.ndarray
    blocks: Tuple[SampledBlock, ...]


def _sample_layer(key, csr: CsrCache, frontier: jnp.ndarray, fanout: int,
                  mode: str) -> Tuple[jnp.ndarray, SampledBlock]:
    """Expand one layer: returns (new_frontier, block).

    frontier: int32[M] global ids (sentinel = num_nodes).
    new_frontier layout: [frontier, nbr_r0.flat, nbr_r1.flat, ...].
    """
    m = frontier.shape[0]
    r_count = csr.num_relations
    nbr_ids = []
    src_local = []
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
        picks = jnp.where(valid, picks, csr.num_nodes)
        nbr_ids.append(picks.reshape(-1))
        # Input-frontier position of each pick: layout is
        # [frontier (m), picks_r0 (m*f), picks_r1 (m*f), ...].
        base = m + r * m * fanout
        local = base + jnp.arange(m * fanout, dtype=jnp.int32)
        src_local.append(local.reshape(m, fanout))
        inv_cnt.append(jnp.where(n_valid > 0, 1.0 / n_valid, 0.0))

    new_frontier = jnp.concatenate([frontier] + nbr_ids)
    block = SampledBlock(
        src_local=jnp.stack(src_local),       # [R, M, f]
        inv_cnt=jnp.stack(inv_cnt),           # [R, M]
        m_out=m,
        m_in=int(new_frontier.shape[0]),
    )
    return key, new_frontier, block


def sample_batch(key: jax.Array, csr: CsrCache, seeds: jnp.ndarray,
                 fanouts: Sequence[int], *, mode: str = "uniform"
                 ) -> SampledBatch:
    """Sample an L-layer computation block for ``seeds``.

    fanouts are outermost-first (e.g. [15, 10] samples 15 in-neighbors per
    relation for the output layer and 10 for the layer below, mirroring the
    config in BASELINE.json). Jit-safe for fixed seed count.
    """
    frontier = seeds.astype(jnp.int32)
    blocks: List[SampledBlock] = []
    for f in fanouts:
        key, frontier, block = _sample_layer(key, csr, frontier, int(f), mode)
        blocks.append(block)
    return SampledBatch(frontier=frontier, blocks=tuple(reversed(blocks)))


def block_aggregate(layer_params, x_in: jnp.ndarray, block: SampledBlock,
                    materialize_fn) -> jnp.ndarray:
    """Apply one RGCN layer over a sampled block.

    x_in: [M_in + 1, Din] input-frontier features with a trailing zero
    sentinel row. Returns [M_out, Dout].
    """
    w_rel = materialize_fn(layer_params)   # [R, Din, Dout]
    w_root = layer_params["w_root"]
    bias = layer_params["bias"]
    r_count, m, fanout = block.src_local.shape
    out = x_in[:m] @ w_root + bias[None, :]
    for r in range(r_count):
        # The input-frontier layout is [frontier (m), picks_r0 (m*f), ...],
        # so relation r's neighbor rows are a CONTIGUOUS slice — no gather
        # (and, crucially, no unsorted scatter-add in the backward).
        base = m + r * m * fanout
        nbr = jax.lax.slice_in_dim(x_in, base, base + m * fanout, axis=0)
        nbr = nbr.reshape(m, fanout, x_in.shape[1])       # [M, f, Din]
        mean = nbr.sum(axis=1) * block.inv_cnt[r][:, None]
        out = out + mean @ w_rel[r]
    return out
