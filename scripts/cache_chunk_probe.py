"""Chunked-dispatch probe of the cached config-5 step.

The hosted frontend charges ~15-30 ms of dispatch+fetch per jit call
(docs/KERNELS.md "hosted-backend pathologies"); at 68 ms/step that is a
large fraction of the cached step's wall clock. This probe times the SAME
step through step.chunk (lax.scan over K steps, ONE dispatch) to separate
device time from dispatch floor — the number an epoch-style training loop
(which always chunks) actually pays per step.

Usage: python scripts/cache_chunk_probe.py [--k 8] [--fanouts 15 10]
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
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--fanouts", type=int, nargs=2, default=(15, 10))
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    g = native.rmat_native(10_000_000, 100_000_000, 50, seed=0) \
        or rmat(10_000_000, 100_000_000, 50, seed=0)
    src, dst, rel = g["src"], g["dst"], g["rel"]
    n = 10_000_000
    n_rel = int(rel.max()) + 1
    graph = build_rel_graph(src, dst, rel, n, n_rel)
    cfg = ModelConfig(num_nodes=n, num_relations=n_rel,
                      compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=1024)
    step = build_sampled_train_step(graph, cfg, tcfg, optax.sgd(tcfg.lr),
                                    fanouts=tuple(args.fanouts),
                                    sparse_emb=True, layout="combined",
                                    cache_layer1=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = step.init_state(params)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k_steps = args.k

    def run_chunk(state, key):
        key, ks = step.chunk_keys(key, k_steps)
        idx = rng.integers(0, len(edges), (k_steps, tcfg.batch_size))
        state, (ls, _) = step.chunk(state, jnp.asarray(edges[idx]), ks)
        return state, key, ls

    for _ in range(2):  # warmup/compile
        state, key, ls = run_chunk(state, key)
    np.asarray(ls)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, key, ls = run_chunk(state, key)
    np.asarray(ls)
    dt = (time.perf_counter() - t0) / (args.iters * k_steps)
    print({"chunk_k": k_steps, "step_ms": round(dt * 1e3, 2),
           "edges_per_s": round(tcfg.batch_size / dt, 1)})


if __name__ == "__main__":
    main()
