"""Pallas TPU kernel: sorted segment-sum (the RGCN aggregation hot op).

Why: XLA lowers ``segment_sum`` to a scatter-add that updates one row per
edge (~9 cycles/edge measured on v5e — identical time for f32 and bf16, i.e.
pure per-row overhead, not bandwidth). This kernel replaces the per-edge
scatter with per-*run* work by exploiting that the segment ids are sorted:

  - Edges stream through VMEM in chunks of K rows (double-buffered by the
    Pallas pipeline).
  - Within a chunk, consecutive equal ids form runs. A rank vector
    (log-step inclusive scan of run starts) compacts the chunk into <= K run
    sums via ONE one-hot matmul on the MXU:
    ``partial[j] = sum_{rank[k]=j} msg[k]``.
  - Only the run sums (total ~= #distinct (node, chunk) pairs — tens of
    thousands instead of millions) are read-modify-written into the output
    tile resident in VMEM.
  - The output is tiled over segments so arbitrarily large node counts fit
    VMEM. The grid is a flat, host-precomputed list of (tile, chunk) pairs —
    each tile visits exactly the chunk range that can touch it, with no
    rectangular-grid waste (scalar-prefetched index arrays).

Runs crossing chunk or tile boundaries are accumulated correctly because the
TPU grid executes sequentially and both fragments RMW the same output row.

Reference context: this is the op PyG's RGCNConv delegates to torch-scatter
(reference: src/models/rgcn.py:72-85); the kernel is the TPU-native
equivalent demanded by SURVEY.md §2.5.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel tiling constants. K: edges per chunk; TILE: output segment rows held
# in VMEM per grid step. K=512 amortizes the fixed per-grid-step cost
# (~300 cycles) while keeping the K x K compaction matmul cheap.
SEG_K = 512
SEG_TILE = 8192


def _lane_iota(k: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)


def _segment_kernel(tile_ref, chunk_ref, first_ref, skip_ref,
                    msg_ref, dst_ref, out_ref,
                    partial_ref, runs_ref, *, tile: int, k: int, rows: int,
                    mxu_dtype: jnp.dtype):
    p = pl.program_id(0)
    tile_id = tile_ref[p]
    first = first_ref[p]
    skip = skip_ref[p]

    @pl.when(first == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(skip == 0)
    def _body():
        d = dst_ref[0, 0, :].reshape(1, k)  # (1, K) int32, non-decreasing
        lane = _lane_iota(k)

        # Run starts: first lane, or id differs from previous lane.
        prev = pltpu.roll(d, 1, axis=1)
        is_start = jnp.logical_or(lane == 0, d != prev).astype(jnp.int32)

        # rank[k] = (#starts at lanes <= k) - 1, via log-step inclusive scan.
        r = is_start
        sh = 1
        while sh < k:
            r = r + jnp.where(lane >= sh, pltpu.roll(r, sh, axis=1), 0)
            sh *= 2
        rank = r - 1  # (1, K) in [0, n_runs)
        n_runs = rank[0, k - 1] + 1

        # One-hot compaction on the MXU: partial[j] = sum of run j's rows.
        # ``rows`` is the per-bucket upper bound on runs per chunk (host
        # computed): dense buckets compact K edges into as few as 128 rows,
        # shrinking the matmul 4x. TPU f32 matmuls default to a single bf16
        # pass; request HIGHEST (exact) for the float32 path.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 0)
        one_hot_bool = row_ids == rank  # (rows runs, K edges)
        precision = (jax.lax.Precision.HIGHEST
                     if mxu_dtype == jnp.float32 else None)
        partial_ref[:] = jnp.dot(one_hot_bool.astype(mxu_dtype),
                                 msg_ref[:].astype(mxu_dtype),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

        # Destination segment of each run: exact int32 lane reduction
        # (a matmul would push node ids through bf16 and corrupt them).
        runs_ref[:] = jnp.max(
            jnp.where(one_hot_bool, jnp.broadcast_to(d, (rows, k)), -1),
            axis=1, keepdims=True)

        t0 = tile_id * tile
        row0 = runs_ref[0, 0] - t0
        row_last = runs_ref[jnp.maximum(n_runs - 1, 0), 0] - t0

        # Fast path: runs hit consecutive output rows entirely inside this
        # tile (the common case for dense buckets) -> one block RMW. Rows at
        # index >= n_runs have all-zero partials, so over-storing is exact.
        contiguous = jnp.logical_and(
            row_last - row0 == n_runs - 1,
            jnp.logical_and(row0 >= 0, row0 + rows <= tile))

        @pl.when(contiguous)
        def _fast():
            out_ref[pl.ds(row0, rows), :] += partial_ref[:]

        @pl.when(jnp.logical_not(contiguous))
        def _slow():
            def store(j, _):
                row = runs_ref[j, 0] - t0

                @pl.when(jnp.logical_and(row >= 0, row < tile))
                def _():
                    out_ref[pl.ds(row, 1), :] += partial_ref[pl.ds(j, 1), :]

                return 0

            jax.lax.fori_loop(0, n_runs, store, 0)


def _pair_schedule(dst_host: np.ndarray, num_segments: int,
                   k: int, tile: int) -> Tuple[np.ndarray, int]:
    """Flat (tile, chunk) schedule (host-side, runs once per static graph).

    Returns meta int32[P, 4] rows (tile_id, chunk_id, is_first_of_tile, skip)
    and the tile count. Tiles with no overlapping chunks get one skip row so
    their output block is still zeroed.
    """
    n_tiles = -(-num_segments // tile)
    starts = np.searchsorted(dst_host, np.arange(n_tiles) * tile, side="left")
    stops = np.searchsorted(dst_host, (np.arange(n_tiles) + 1) * tile,
                            side="left")
    c_lo = starts // k
    c_hi = np.maximum(-(-stops // k), c_lo)
    rows = []
    for s in range(n_tiles):
        if c_hi[s] == c_lo[s]:
            rows.append((s, 0, 1, 1))
            continue
        for i, c in enumerate(range(int(c_lo[s]), int(c_hi[s]))):
            rows.append((s, c, 1 if i == 0 else 0, 0))
    return np.asarray(rows, dtype=np.int32), n_tiles


def sorted_segment_sum_pallas(
    msg: jnp.ndarray,
    dst: jnp.ndarray,
    dst_host: np.ndarray,
    num_segments: int,
    *,
    mxu_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum of ``msg`` rows by sorted ``dst`` ids.

    Args:
        msg: [E, D] float32 rows, E % SEG_K == 0, D % 128 == 0 (pad upstream).
        dst: int32[E] non-decreasing segment ids in [0, num_segments).
        dst_host: the same ids as a concrete numpy array (the graph is static;
            the chunk schedule is precomputed on the host).
        num_segments: number of output rows.
        mxu_dtype: dtype fed to the compaction matmul. float32 is exact;
            bfloat16 doubles MXU throughput at ~3 decimal digits on messages.
    """
    e, d_dim = msg.shape
    if e % SEG_K:
        raise ValueError(f"edge count {e} not a multiple of {SEG_K}")
    if d_dim % 128:
        raise ValueError(f"feature dim {d_dim} not a multiple of 128")

    if jax.default_backend() == "cpu":
        # No Mosaic on CPU (tests / simulated meshes): run interpreted.
        interpret = True

    k, tile = SEG_K, SEG_TILE
    meta, n_tiles = _pair_schedule(dst_host, num_segments, k, tile)
    n_pairs = meta.shape[0]
    out_rows = n_tiles * tile

    # Per-bucket compaction width: max #runs in any chunk, rounded to the MXU
    # row granularity. Dense graphs (high in-degree) need far fewer than K.
    chunk_view = dst_host.reshape(-1, k)
    runs_per_chunk = 1 + (np.diff(chunk_view, axis=1) != 0).sum(axis=1)
    rows = int(min(k, max(128, -(-int(runs_per_chunk.max()) // 128) * 128)))

    dst_chunks = dst.reshape(e // k, 1, k)

    # Four flat 1-D prefetch arrays (a [P, 4] array would be lane-padded to
    # [P, 128] in SMEM and overflow it).
    def msg_index(p, tile_ref, chunk_ref, first_ref, skip_ref):
        return chunk_ref[p], 0

    def dst_index(p, tile_ref, chunk_ref, first_ref, skip_ref):
        return chunk_ref[p], 0, 0

    def out_index(p, tile_ref, chunk_ref, first_ref, skip_ref):
        return tile_ref[p], 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((k, d_dim), msg_index),
            pl.BlockSpec((1, 1, k), dst_index),
        ],
        out_specs=pl.BlockSpec((tile, d_dim), out_index),
        scratch_shapes=[
            pltpu.VMEM((rows, d_dim), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.int32),
        ],
    )

    kernel = functools.partial(_segment_kernel, tile=tile, k=k, rows=rows,
                               mxu_dtype=mxu_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, d_dim), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(meta[:, 0]), jnp.asarray(meta[:, 1]),
      jnp.asarray(meta[:, 2]), jnp.asarray(meta[:, 3]),
      msg.astype(jnp.float32), dst_chunks)
    return out[:num_segments]
