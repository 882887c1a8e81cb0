"""Stage-by-stage attribution of the sampled-10m-15-10 step (VERDICT r2 #3).

Breaks the 4.26 s/step into its phases on the real chip so the kernel work
targets what actually dominates. Sync discipline per docs/KERNELS.md: every
timing fetches a data-dependent scalar to the host (block_until_ready can
return at enqueue time on this PJRT frontend).

Usage: python scripts/profile_sampled10m.py [--scale small|full] [--stages ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# Runnable as `python scripts/profile_sampled10m.py` (sys.path[0] is the
# scripts dir; PYTHONPATH=<repo> breaks the hosted backend's plugin
# discovery, so append late instead).
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, warmup=2, iters=5, label=""):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<44s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full", choices=["small", "full"])
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.sampling import (
        build_combined_csr, sample_batch_combined)
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import encoder_apply_sampled, init_params
    from primekg_rgcn_tpu.train.loop import TrainState
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_train_step, resolve_sampler)

    print("platform:", jax.devices()[0].platform, flush=True)

    if args.scale == "full":
        n, e, r = 10_000_000, 100_000_000, 50
    else:
        n, e, r = 1_000_000, 10_000_000, 50
    t0 = time.perf_counter()
    g = native.rmat_native(n, e, r, seed=0) or rmat(n, e, r, seed=0)
    print(f"graph gen: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    graph = build_rel_graph(g["src"], g["dst"], g["rel"], n, r)
    print(f"rel graph: {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = ModelConfig(num_nodes=n, num_relations=r,
                      compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=1024)
    csr, budgets, use_combined = resolve_sampler(graph, (15, 10))
    print("budgets:", budgets, "combined:", use_combined,
          "avg_present:", getattr(csr, "avg_present_relations", None),
          flush=True)
    assert use_combined

    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    edges = np.stack([g["src"], g["dst"], g["rel"]], 1).astype(np.int32)
    batch_np = edges[rng.integers(0, e, tcfg.batch_size)]
    batch_dev = jnp.asarray(batch_np)

    # Seeds as the step would build them: 2B pos + 2B neg endpoints.
    seeds_np = np.concatenate([
        batch_np[:, 0], batch_np[:, 1],
        rng.integers(0, n, 2 * tcfg.batch_size),
    ]).astype(np.int32)
    seeds = jnp.asarray(seeds_np)

    m1 = 4096  # deduped seed cap
    raw1 = m1 * (1 + budgets[0])
    raw2 = raw1 * (1 + budgets[1])
    print(f"layer frontiers: raw1={raw1:,} raw2={raw2:,} (N+1={n+1:,})",
          flush=True)

    stages = set(args.stages or
                 ["sort", "picks", "sample", "fwd", "step"])

    if "sort" in stages:
        # The inner layer's dedup argsort, in isolation.
        raw = jnp.asarray(rng.integers(0, n + 1, raw2).astype(np.int32))

        srt_j = jax.jit(lambda x: jnp.sort(x))
        asort_j = jax.jit(lambda x: jnp.argsort(x))
        asort_st_j = jax.jit(lambda x: jnp.argsort(x, stable=True))
        timed(lambda: int(srt_j(raw)[0]), label=f"sort int32 [{raw2:,}]")
        timed(lambda: int(asort_j(raw)[0]), label="argsort (unstable)")
        timed(lambda: int(asort_st_j(raw)[0]), label="argsort (stable)")

    if "picks" in stages and not csr.packed.shape[0]:
        # Small --scale builds auto-disable the slim/packed layout (the fat
        # table fits), leaving csr.packed the empty (0, 2) array — a gather
        # over it would be garbage, so the stage is meaningless here.
        print("picks: skipped (packed CSR disabled at this scale)")
    elif "picks" in stages:
        # Pick-phase gathers in isolation (packed layout: ONE row gather).
        front = jnp.asarray(
            rng.integers(0, n, raw1).astype(np.int32))

        def pick_phase(front, row_start, deg_total, packed, k):
            b = budgets[1]
            m = front.shape[0]
            start = jnp.take(row_start, front)
            dtot = jnp.take(deg_total, front)
            u = jax.random.uniform(k, (m, b))
            idx = jnp.floor(u * dtot[:, None]).astype(jnp.int32)
            valid = (dtot > 0)[:, None]
            pos = start[:, None] + jnp.minimum(
                idx, jnp.maximum(dtot[:, None] - 1, 0))
            rec = jnp.take(packed, pos.reshape(-1), axis=0).reshape(m, b, 2)
            picks = jnp.where(valid, rec[..., 0], n)
            rtag = jnp.where(valid, rec[..., 1] >> 16, r - 1)
            return picks.sum() + rtag.sum()

        pj = jax.jit(pick_phase)
        timed(lambda: float(pj(front, csr.row_start, csr.deg_total,
                               csr.packed, key)),
              label=f"pick gathers [{raw1:,} x {budgets[1]}]")

    csr_arrays = (csr.row_start, csr.col, csr.rel, csr.edge_deg,
                  csr.deg_total, csr.deg_rel_flat, csr.packed)

    def rebuild(a):
        return csr._replace(row_start=a[0], col=a[1], rel=a[2],
                            edge_deg=a[3], deg_total=a[4],
                            deg_rel_flat=a[5], packed=a[6])

    if "sample" in stages:
        @jax.jit
        def sample_only(k, arrs, s):
            b = sample_batch_combined(k, rebuild(arrs), s, budgets,
                                      allow_ident=True)
            return (b.blocks[0].src_local.sum()
                    + b.blocks[0].slot_w.sum())

        timed(lambda: float(sample_only(key, csr_arrays, seeds)),
              label="sample_batch_combined fwd")

    if "fwd" in stages:
        @jax.jit
        def fwd_only(p, k, arrs, s):
            b = sample_batch_combined(k, rebuild(arrs), s, budgets,
                                      allow_ident=True)
            emb = encoder_apply_sampled(p, b, cfg, train=False)
            return emb.sum()

        timed(lambda: float(fwd_only(params, key, csr_arrays, seeds)),
              label="sample + encoder fwd")

    if "step" in stages:
        import optax
        opt = optax.sgd(tcfg.lr)
        step_fn = build_sampled_train_step(csr, cfg, tcfg, opt,
                                           fanouts=(15, 10),
                                           sparse_emb=True)
        holder = {"state": TrainState(params, opt.init(params),
                                      jnp.zeros((), jnp.int32)),
                  "key": jax.random.PRNGKey(2)}

        def one_step():
            holder["key"], k = jax.random.split(holder["key"])
            holder["state"], (loss, _) = step_fn(holder["state"],
                                                 batch_dev, k)
            return float(loss)

        timed(one_step, warmup=2, iters=5, label="FULL sparse-emb step")

    if hasattr(jax.devices()[0], "memory_stats"):
        ms = jax.devices()[0].memory_stats() or {}
        gb = 2.0**30
        print("bytes_in_use: %.2f GB, peak: %.2f GB" % (
            ms.get("bytes_in_use", 0) / gb,
            ms.get("peak_bytes_in_use", 0) / gb))


if __name__ == "__main__":
    main()
