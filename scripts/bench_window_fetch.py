"""On-chip bake-off: block-mode pick-fetch implementations.

Measures, at config-5-like shapes (packed table ~100M records, ~200K
frontier nodes x budget-40 windows):

  1. per-slot row gather (the uniform-mode fetch: one descriptor/slot)
  2. XLA aligned granule-pair gather + take_along_axis shift
  3. Pallas granule-pair DMA + in-kernel dynamic lane roll

Usage: python scripts/bench_window_fetch.py [--e 100000000] [--m 200000]
       [--f 40] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=100_000_000)
    ap.add_argument("--m", type=int, default=200_000)
    ap.add_argument("--f", type=int, default=40)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.data.sampling import _window_pad
    from primekg_rgcn_tpu.ops.pallas.window_fetch import window_rows_fetch

    print("platform:", jax.devices()[0].platform, flush=True)
    e, m, f = args.e, args.m, args.f
    rng = np.random.default_rng(0)
    packed_h = rng.integers(0, 2**31 - 1, (e + _window_pad(e), 2),
                            dtype=np.int64).astype(np.int32)
    # Row form for the per-slot gather; granule-pairs form (the SAME bytes,
    # host-reshaped) for the window impls — deriving the pair view on
    # device is unsafe: XLA copies the [100M, 2] table into the
    # lane-padded (8, 128)-tiled layout first (51.2 GB, compile-time OOM).
    packed = jnp.asarray(packed_h)
    pairs = jnp.asarray(packed_h.reshape(-1, 128))
    starts_h = rng.integers(0, e, m).astype(np.int32)
    starts = jnp.asarray(starts_h)

    def timed(label, fn):
        out = fn(starts)
        s0 = int(np.asarray(out[0, 0]).sum())  # sync by fetch
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(starts)
        _ = np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:28s} {dt:8.2f} ms  (sync {s0})", flush=True)
        return dt

    @jax.jit
    def per_slot(s):
        pos = s[:, None] + jnp.arange(f, dtype=jnp.int32)[None, :]
        return jnp.take(packed, pos.reshape(-1),
                        axis=0).reshape(m, f, 2)

    @jax.jit
    def xla_pair(s):
        return window_rows_fetch(pairs, s, f, impl="xla")

    @jax.jit
    def pallas_roll(s):
        return window_rows_fetch(pairs, s, f, impl="pallas")

    r_slot = per_slot(starts)
    r_xla = xla_pair(starts)
    np.testing.assert_array_equal(np.asarray(r_slot), np.asarray(r_xla))
    r_pal = pallas_roll(starts)
    np.testing.assert_array_equal(np.asarray(r_slot), np.asarray(r_pal))
    print("parity ok (all three impls byte-identical)", flush=True)

    timed("per-slot gather", per_slot)
    timed("xla granule-pair + shift", xla_pair)
    timed("pallas pair-DMA + roll", pallas_roll)


if __name__ == "__main__":
    main()
