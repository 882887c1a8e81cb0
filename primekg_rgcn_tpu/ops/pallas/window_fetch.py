"""Contiguous-window record fetch for block sampling (2 impls, bake-off).

Why: the combined-layout pick phase is descriptor-count-bound — XLA's row
gather issues one descriptor per picked slot, and at config-5 scale (~8M
slots from the [100M, 2] packed CSR) that is ~150 ms of the sampled step
(docs/KERNELS.md "Round 3"). Block sampling mode (data/sampling.py) makes
every node's F picks ONE contiguous run of packed records, so the fetch
can exploit contiguity: per node, grab the two 64-record granules the
window straddles (one aligned 1 KB contiguous read) and shift the window
out — [M] granule-pair reads replace [M * F] row-gather descriptors.

Mosaic constraint that shaped the design: VMEM/HBM lane slices must be
128-lane granules at 128-aligned offsets ("Failed to prove that a tile
index in dimension 1 is divisible by the tiling (128)"), so arbitrary
per-node window DMAs are not expressible — both impls fetch ALIGNED
[G, 128]-word rows (the packed table is build-time padded to whole
granules, data/sampling._window_pad) and extract the window afterwards:

- ``xla``: one XLA gather of the two consecutive granule rows per node
  (rows r, r+1 are contiguous in HBM — a single coalescable descriptor
  pair) + a [M, 2F]-element ``take_along_axis`` shift. No Pallas.
- ``pallas``: one async DMA per node for the contiguous (2, 128)-word
  granule pair + an in-kernel dynamic lane roll (tpu.dynamic_rotate)
  replacing the element-gather shift.

``window_rows_fetch(impl="auto")`` picks ``pallas`` — the round-5 on-chip
bake-off at config-5 scale measured the integrated sampled step at
475 ms (pallas) vs 830 ms (xla) vs 586 ms uniform-gather baseline
(bench_report.json ``sampled-10m-block-pallas-15-10``): the [M, 2F]
``take_along_axis`` lane shift was indeed the xla impl's pathology, and
the contiguous-DMA rationale holds once it is gone. PRIMEKG_WINDOW_IMPL
overrides.

Reference context: the reference's PyG pipeline has no sampled path at all
(reference: README.md:624-627 lists mini-batch sampling as unimplemented);
this op serves BASELINE.json config 4/5's fanout-sampled training.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Words per granule row: the Mosaic lane-tiling quantum for int32.
LANES = 128

# Nodes per grid step in the pallas impl.
WINDOW_NB = 256


def _pair_view(packed: jnp.ndarray):
    """[Ep, 2] int32 -> [G, 128] granule rows; pass-through for [G, 128].

    The device-side narrow-dim reshape is NOT free on TPU at scale: XLA
    lowers reshape([100M, 2] -> [G, 128]) by first copying the table into
    the lane-padded (8, 128)-tiled layout — a 51.2 GB allocation that
    OOMs compile at config-5 (measured). Production callers therefore
    hand in the granule-pairs form directly (host-reshaped at CSR build,
    data/sampling.build_combined_csr window_pairs=True); the reshape here
    stays only for small/test tables.
    """
    if packed.ndim == 2 and packed.shape[1] == LANES:
        return packed
    ep2 = packed.shape[0] * 2
    if ep2 % LANES:
        raise ValueError(
            f"packed table has {packed.shape[0]} records, not a whole "
            f"number of 64-record granules — build it via "
            f"build_combined_csr (data/sampling._window_pad)")
    return packed.reshape(ep2 // LANES, LANES)


def _xla_window_fetch(packed, starts, width):
    """Aligned granule-pair gather + take_along_axis shift."""
    m = starts.shape[0]
    w2 = 2 * width
    x = _pair_view(packed)
    s2 = starts * 2
    r = s2 // LANES
    pair = jnp.take(x, jnp.stack([r, r + 1], 1).reshape(-1),
                    axis=0).reshape(m, 2 * LANES)
    lane = (s2 - r * LANES)[:, None] + jnp.arange(w2, dtype=jnp.int32)
    rec = jnp.take_along_axis(pair, lane, axis=1)
    return rec.reshape(m, width, 2)


def _roll_kernel(starts2_ref, x_ref, out_ref, buf, sem, *, nb):
    p = pl.program_id(0)

    def issue(j, _):
        r = starts2_ref[p * nb + j] // LANES
        pltpu.make_async_copy(
            x_ref.at[pl.ds(r, 2), :],
            buf.at[j],
            sem.at[j],
        ).start()
        return 0

    jax.lax.fori_loop(0, nb, issue, 0)

    def extract(j, _):
        pltpu.make_async_copy(
            x_ref.at[pl.ds(0, 2), :], buf.at[j], sem.at[j],
        ).wait()
        sh = starts2_ref[p * nb + j] % LANES
        row = jnp.concatenate([buf[j, 0:1, :], buf[j, 1:2, :]], axis=1)
        # Left-roll by sh: the window's first word lands in lane 0.
        out_ref[j] = pltpu.roll(row, shift=2 * LANES - sh, axis=1)[:, :LANES]
        return 0

    jax.lax.fori_loop(0, nb, extract, 0)


# Max starts per pallas_call: the starts array is a scalar-prefetch operand
# living in SMEM (1 MB on v5e). 131072 x int32 = 512 KB leaves headroom for
# Mosaic's own SMEM use. Multi-window sampling (mode="blockN") multiplies
# the per-layer starts count by N — an 800K-starts innermost layer
# (3.2 MB) was a measured compile-time SMEM OOM before chunking.
SMEM_STARTS = 131072


def _pallas_window_fetch(packed, starts, width, interpret=False):
    """Granule-pair DMA + in-kernel dynamic lane roll (SMEM-chunked)."""
    m = int(starts.shape[0])
    if m > SMEM_STARTS:
        outs = [
            _pallas_window_fetch(packed, starts[s:s + SMEM_STARTS], width,
                                 interpret)
            for s in range(0, m, SMEM_STARTS)
        ]
        return jnp.concatenate(outs, axis=0)
    x = _pair_view(packed)
    nb = min(WINDOW_NB, max(m, 1))
    mp = -(-m // nb) * nb
    s2 = starts * 2
    if mp != m:
        s2 = jnp.concatenate([s2, jnp.zeros((mp - m,), s2.dtype)])
    if jax.default_backend() == "cpu":
        interpret = True
    kernel = functools.partial(_roll_kernel, nb=nb)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((nb, 1, LANES),
                                   lambda p, *pf: (p, 0, 0)),
            scratch_shapes=[pltpu.VMEM((nb, 2, LANES), jnp.int32),
                            pltpu.SemaphoreType.DMA((nb,))],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, 1, LANES), jnp.int32),
        interpret=interpret,
    )(s2, x)
    return out[:m, 0, :2 * width].reshape(m, width, 2)


def window_rows_fetch(packed: jnp.ndarray, starts: jnp.ndarray,
                      width: int, impl: str = "auto") -> jnp.ndarray:
    """Fetch ``packed[starts[i] : starts[i] + width, :]`` for every i.

    Args:
        packed: the record table in whole 64-record granules with >= 64
            sentinel records of tail padding (build_combined_csr) —
            either granule-pairs form int32[G, 128] (production: no
            device reshape) or row form int32[Ep, 2] (small/test tables
            only; see _pair_view for why the reshape is unsafe at scale).
        starts: int32[M] window starts (record indices); the caller
            guarantees ``starts <= true_edge_count - 1``.
        width: static window length F (the layer budget), <= 64.

    Returns int32[M, width, 2].
    """
    if width > 64:
        raise ValueError(f"window width {width} > 64 (the granule-pair "
                         f"fetch and tail padding are sized for the "
                         f"48-slot budget cap)")
    if impl == "auto":
        impl = os.environ.get("PRIMEKG_WINDOW_IMPL", "pallas")
    if impl == "pallas":
        return _pallas_window_fetch(packed, starts, width)
    return _xla_window_fetch(packed, starts, width)
