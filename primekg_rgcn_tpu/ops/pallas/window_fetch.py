"""Pallas TPU kernel: contiguous-window record fetch for block sampling.

Why: the combined-layout pick phase is descriptor-count-bound — XLA's row
gather issues one descriptor per picked slot, and at config-5 scale (~8M
slots from the [100M, 2] packed CSR) that is ~150 ms of the sampled step
(docs/KERNELS.md "Round 3"). Block sampling mode (data/sampling.py) makes
every node's F picks ONE contiguous run of packed records, so the fetch
can be one async HBM->VMEM DMA per *node* instead of F descriptors per
node: [M] window copies of F records replace [M * F] row gathers.

Shape strategy: both DMA sides stay contiguous — the packed table is
viewed as int32[1, (E + pad) * 2] (HBM, untiled, arbitrary lane slices)
and each window lands in one (1, 2F) VMEM row (2F <= 96 lanes for the
48-slot budget cap — a single sublane row, no strided sub-transfers).
The output block is [NB, 1, 2F]; callers reshape to [M, F, 2].

The caller guarantees ``starts + F <= packed_rows`` via the build-time
WINDOW_PAD sentinel rows (data/sampling.py), so the kernel needs no bounds
checks. Invalid slots inside a window (past the node's degree) are masked
by the sampler's validity logic, not here.

Reference context: the reference's PyG pipeline has no sampled path at all
(reference: README.md:624-627 lists mini-batch sampling as unimplemented);
this kernel serves BASELINE.json config 4/5's fanout-sampled training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Nodes per grid step: enough in-flight DMAs to hide issue latency while
# keeping the semaphore array and the [NB, 1, 2F] output block small.
WINDOW_NB = 256


def _window_kernel(starts_ref, flat_ref, out_ref, sem, *, nb, w2):
    p = pl.program_id(0)

    def issue(j, _):
        s = starts_ref[p * nb + j]
        pltpu.make_async_copy(
            flat_ref.at[:, pl.ds(s, w2)],
            out_ref.at[j],
            sem.at[j],
        ).start()
        return 0

    jax.lax.fori_loop(0, nb, issue, 0)

    def drain(j, _):
        # Reconstruct an equivalent-shape copy to wait on sem[j] for the
        # right byte count (the standard Pallas wait idiom for DMAs issued
        # inside traced loops).
        pltpu.make_async_copy(
            flat_ref.at[:, pl.ds(0, w2)],
            out_ref.at[j],
            sem.at[j],
        ).wait()
        return 0

    jax.lax.fori_loop(0, nb, drain, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def window_rows_fetch(packed: jnp.ndarray, starts: jnp.ndarray,
                      width: int, interpret: bool = False) -> jnp.ndarray:
    """Fetch ``packed[starts[i] : starts[i] + width, :]`` for every i.

    Args:
        packed: int32[Ep, 2] record table, padded so every window fits
            (Ep >= max(starts) + width — see data/sampling.WINDOW_PAD).
        starts: int32[M] window starts (row indices into ``packed``).
        width: static window length F (the layer budget).

    Returns int32[M, width, 2].

    One async DMA per node; on CPU (tests) the Pallas interpreter runs the
    same program. Callers on non-TPU backends should prefer the plain XLA
    gather — this kernel's win is descriptor amortization, which only
    exists on real TPU DMA hardware.
    """
    m = int(starts.shape[0])
    w2 = 2 * width
    nb = min(WINDOW_NB, max(m, 1))
    mp = -(-m // nb) * nb
    if mp != m:
        # Padded lanes fetch window 0 and are sliced off.
        starts = jnp.concatenate(
            [starts, jnp.zeros((mp - m,), starts.dtype)])
    flat = packed.reshape(1, -1)
    if jax.default_backend() == "cpu":
        interpret = True
    kernel = functools.partial(_window_kernel, nb=nb, w2=w2)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((nb, 1, w2), lambda p, *pf: (p, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((nb,))],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, 1, w2), jnp.int32),
        interpret=interpret,
    )(starts * 2, flat)
    return out[:m].reshape(m, width, 2)
