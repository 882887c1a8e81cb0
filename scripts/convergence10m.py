"""Config-5 (10M nodes / 100M edges / 50 rel) training demo on ONE chip.

Round 3 made the sampled step 586 ms (docs/KERNELS.md "Round 3"), which
turns config-5 single-chip training from a capability claim into something
you can actually run: this script trains N steps with the exact
`sampled-10m-15-10` bench configuration (batch 1024, fanout 15/10, bf16
streams, sparse-emb SGD) and reports the train-loss trajectory plus a
sampled-eval loss on held-out edges before/after. Results land in
results/convergence10m.json.

Usage: python scripts/convergence10m.py [--steps 400] [--eval_edges 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval_edges", type=int, default=4096)
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--table_opt", default="sgd",
                    choices=["sgd", "adafactor"],
                    help="adafactor = factored-second-moment adaptive "
                         "table updates ([N]+[D] state, ~40 MB at 10M "
                         "nodes) — the single-chip answer to 'dense adam "
                         "does not fit'.")
    ap.add_argument("--train_pool", type=int, default=0,
                    help="restrict training batches to a fixed pool of this "
                         "many edges (0 = all). At 10M nodes a 400-step run "
                         "over ALL 100M edges touches each node's decoder "
                         "signal ~0.08 times — loss cannot move; a bounded "
                         "pool gives a real revisit rate, demonstrating the "
                         "optimizer actually learns at this scale. (A full "
                         "epoch is 97K steps = ~16 h/chip; genuine "
                         "convergence at config 5 is the pod layouts' job.)")
    ap.add_argument("--fanouts", type=int, nargs=2, default=(15, 10),
                    help="per-layer sample budgets (outermost first). The "
                         "combined layout's importance weights keep the "
                         "per-relation-mean estimator unbiased at ANY "
                         "budget, so smaller budgets trade estimator "
                         "variance for step time — the step is ~70% "
                         "row-fetch floor, so time scales ~linearly with "
                         "the budget product (docs/KERNELS.md Round 3/4).")
    ap.add_argument("--eval_fanouts", type=int, nargs=2, default=None,
                    help="budgets for the held-out eval encode (default: "
                         "same as --fanouts). For a budget sweep, pin these "
                         "so quality comparisons share one eval estimator.")
    ap.add_argument("--sweep", type=int, nargs="+", default=None,
                    help="flat list of budget pairs (e.g. --sweep 15 10 8 "
                         "6 5 4) to run as one in-process sweep sharing "
                         "the ~5-min graph+CSR build; each config re-inits "
                         "params and trains --steps steps; --eval_fanouts "
                         "(default: the first pair) pins one shared eval "
                         "estimator. Writes a {budgets: result} map.")
    ap.add_argument("--mode", default="uniform",
                    choices=["uniform", "block", "truncate"],
                    help="neighbor pick scheme (block = contiguous random "
                         "window, the DMA-friendly unbiased fetch)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale factor on the 10M/100M graph (smoke-test "
                         "the sweep at e.g. 0.01 before burning chip time)")
    ap.add_argument("--out", default="results/convergence10m.json")
    args = ap.parse_args()
    if args.sweep and len(args.sweep) % 2:
        ap.error("--sweep takes flat PAIRS of budgets")
    sweep = [tuple(args.sweep[i:i + 2])
             for i in range(0, len(args.sweep or []), 2)] or \
        [tuple(args.fanouts)]
    fanouts = sweep[0]
    eval_fanouts = tuple(args.eval_fanouts or fanouts)

    import jax
    import jax.numpy as jnp
    import optax

    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_eval_epoch, build_sampled_train_step, resolve_sampler)

    print("platform:", jax.devices()[0].platform, flush=True)
    n, e, r = 10_000_000, 100_000_000, 50
    if args.scale != 1.0:
        n, e = int(n * args.scale), int(e * args.scale)
    t0 = time.perf_counter()
    g = native.rmat_native(n, e, r, seed=0) or rmat(n, e, r, seed=0)
    src, dst, rel = g["src"], g["dst"], g["rel"]
    print(f"graph gen {time.perf_counter() - t0:.0f}s", flush=True)

    # Hold out eval edges from the TRAINING stream (messages still ride the
    # full graph CSR, the reference's full-graph-messages quirk).
    rng = np.random.default_rng(1)
    hold = rng.choice(e, size=args.eval_edges, replace=False)
    mask = np.zeros(e, bool)
    mask[hold] = True
    val_edges = np.stack([src[hold], dst[hold], rel[hold]], 1).astype(np.int32)
    tr = ~mask
    edges = np.stack([src[tr], dst[tr], rel[tr]], 1).astype(np.int32)

    t0 = time.perf_counter()
    graph = build_rel_graph(src, dst, rel, n, r)
    print(f"rel graph {time.perf_counter() - t0:.0f}s", flush=True)

    cfg = ModelConfig(num_nodes=n, num_relations=r,
                      compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=1024, lr=args.lr)
    # ONE shared CSR: train and eval builders each resolving their own
    # would hold two 880 MB copies on the chip (measured OOM). The combined
    # CSR is budget-independent, so a --sweep shares it across configs.
    csr, _, _ = resolve_sampler(graph, fanouts)
    del g, src, dst, rel, graph

    batch_rng0 = np.random.default_rng(0)
    if args.train_pool:
        pool = batch_rng0.choice(len(edges), size=args.train_pool,
                                 replace=False)
        edges = edges[pool]

    def run_cfg(fo):
        # With an adaptive table rule there is no dense-step-parity
        # constraint on the rest params, so they get adam (the reference's
        # optimizer).
        opt = optax.adam(1e-3) if args.table_opt == "adafactor" \
            else optax.sgd(tcfg.lr)
        params = init_params(jax.random.PRNGKey(0), cfg)
        step_fn = build_sampled_train_step(csr, cfg, tcfg, opt,
                                           fanouts=fo, mode=args.mode,
                                           sparse_emb=True,
                                           table_opt=args.table_opt)
        eval_fn = build_sampled_eval_epoch(csr, val_edges, cfg, tcfg,
                                           fanouts=eval_fanouts)
        state = step_fn.init_state(params)
        key = jax.random.PRNGKey(2)
        ek = jax.random.PRNGKey(3)

        v0_loss, v0_acc = (float(x) for x in eval_fn(state.params, ek))
        print(f"[{fo}] eval@0: loss {v0_loss:.4f} acc {v0_acc:.4f}",
              flush=True)

        batch_rng = np.random.default_rng(0)
        hist = []
        t_start = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            idx = batch_rng.integers(0, len(edges), tcfg.batch_size)
            state, (loss, acc) = step_fn(state, jnp.asarray(edges[idx]), k)
            if (i + 1) % args.log_every == 0 or i == 0:
                lf, af = float(loss), float(acc)
                hist.append({"step": i + 1, "loss": round(lf, 4),
                             "acc": round(af, 4)})
                print(f"[{fo}] step {i + 1:4d} | loss {lf:.4f} | "
                      f"acc {af:.4f}", flush=True)
        wall = time.perf_counter() - t_start

        v1_loss, v1_acc = (float(x) for x in eval_fn(state.params, ek))
        print(f"[{fo}] eval@{args.steps}: loss {v1_loss:.4f} "
              f"acc {v1_acc:.4f}", flush=True)
        return {
            "config": {"nodes": n, "edges": e, "relations": r,
                       "batch_size": tcfg.batch_size, "fanouts": list(fo),
                       "mode": args.mode,
                       "eval_fanouts": list(eval_fanouts),
                       "compute_dtype": "bfloat16",
                       "table_opt": args.table_opt,
                       "rest_opt": "adam(1e-3)"
                                   if args.table_opt == "adafactor"
                                   else "sgd",
                       "lr": tcfg.lr, "sparse_emb": True,
                       "train_pool": args.train_pool or len(edges)},
            "steps": args.steps,
            "wall_s": round(wall, 1),
            "ms_per_step": round(wall / args.steps * 1e3, 1),
            "train_history": hist,
            "eval": {"step0": {"loss": round(v0_loss, 4),
                               "acc": round(v0_acc, 4)},
                     "final": {"loss": round(v1_loss, 4),
                               "acc": round(v1_acc, 4)},
                     "held_out_edges": args.eval_edges},
        }

    if len(sweep) == 1:
        out = run_cfg(sweep[0])
    else:
        out = {"sweep": {f"{fo[0]}/{fo[1]}": run_cfg(fo) for fo in sweep}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
