"""Benchmark suite over the BASELINE.json configurations.

``bench.py`` at the repo root prints the single north-star line; this module
measures the wider matrix and writes a JSON report:

1. primekg-default   — full-batch training step, PrimeKG statistics
                       (the north-star: edges/s/chip of RGCN fwd+bwd)
2. primekg-bases     — same with basis decomposition (num_bases=2)
3. primekg-bf16      — bfloat16 compute
4. primekg-xla       — XLA segment-sum instead of the Pallas kernel
5. sampled-15-10     — neighbor-sampled mini-batch step (fanout 15/10)
6. rmat-large        — full-graph step on an R-MAT graph (scaled to fit one
                       chip; the 100M-edge multi-host config runs the same
                       code over a pod mesh)
7. eval-ranking      — all-tails ranking throughput (score_all_tails + rank)
8. sampled-10m-*     — config-5 (10M nodes / 100M edges) sampled-step
                       matrix: pick modes, budgets, identity threshold,
                       historical cache (sampled-*-cache-*)
9. ident-crossover   — dedup-vs-identity regime sweep (both regimes timed
                       at five raw-fraction points; docs/KERNELS.md)

Usage: python -m primekg_rgcn_tpu.bench.suite [--out bench_report.json]
       [--configs primekg-default sampled-15-10 ...]
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Callable, Dict

import numpy as np

BASELINE_EDGES_PER_S = 1_677_772 / (4.5 * 3600 / 100)  # RTX-1070 anchor


def _sync(out):
    """Synchronize by fetching data: on some hosted PJRT frontends
    block_until_ready returns at enqueue, under-reporting timings."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def _timed_steps(step_fn, n_steps: int, warmup: int = 3):
    out = None
    for i in range(warmup):
        out = step_fn(i)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n_steps):
        out = step_fn(i)
    _sync(out)
    return (time.perf_counter() - t0) / n_steps


def _full_batch_config(num_bases=None, compute_dtype="float32", impl="auto",
                       graph_override=None):
    """Returns (step_fn, batch_size) for the full-graph training step."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
    from primekg_rgcn_tpu.train.loop import TrainState, _batch_loss, make_optimizer

    if graph_override is None:
        raw = primekg_like(seed=0, scale=1.0)
        src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
        n, r = raw["num_nodes"], 3
    else:
        src, dst, rel, n, r = graph_override
    graph = build_rel_graph(src, dst, rel, n, r)

    model_cfg = ModelConfig(num_nodes=n, num_relations=r,
                            num_bases=num_bases, compute_dtype=compute_dtype)
    train_cfg = TrainConfig(batch_size=1024)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    opt = make_optimizer(train_cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    edges_pad = jnp.asarray(np.concatenate([edges, np.zeros((1, 3), np.int32)]))
    layer_fn = functools.partial(rgcn_layer_segment,
                                 impl="xla" if impl == "xla" else "auto")
    # Auto-restricted final layer: picked up by large graphs (primekg-full
    # is a measured 1.71x), skipped at north-star scale where it loses.
    final_plan = None
    if impl != "xla":
        from primekg_rgcn_tpu.ops.rgcn_final_layer import resolve_final_plan

        final_plan = resolve_final_plan(
            graph, edges, train_cfg.batch_size, train_cfg.num_neg_samples,
            seed=train_cfg.seed, mode=train_cfg.restrict_final)
    grad_fn = jax.value_and_grad(
        lambda p, bi, k: _batch_loss(p, graph, edges_pad, bi, k, model_cfg,
                                     train_cfg, train=True, layer_fn=layer_fn,
                                     final_plan=final_plan),
        has_aux=True)

    @jax.jit
    def train_step(state, batch_idx, key):
        (loss, _), grads = grad_fn(state.params, batch_idx, key)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, updates),
                          opt_state, state.step + 1), loss

    rng = np.random.default_rng(0)
    b = train_cfg.batch_size
    key_holder = {"key": jax.random.PRNGKey(0), "state": state}

    def step(i):
        key_holder["key"], k = jax.random.split(key_holder["key"])
        bi = jnp.asarray(rng.integers(0, len(edges), b).astype(np.int32))
        key_holder["state"], loss = train_step(key_holder["state"], bi, k)
        return loss

    return step, b, graph, final_plan


def _gather_floor_fields(graph, dt_s: float, final_plan=None) -> Dict:
    """Machine-checked DMA-gather roofline for the full-batch step
    (docs/KERNELS.md "Roofline"): 2 layers x (fwd + transpose-bwd) gather
    every padded edge's source row once, at the measured ~2.3 ns/row v5e
    floor regardless of row width. When the batch-restricted final layer
    is active, conv2's two passes run over the plan's static capacity
    instead of the full edge list. floor_fraction = floor / measured
    step; a drop flags a regression relative to the step's own bound."""
    e_pad = graph.padded_num_edges
    conv2_rows = e_pad if final_plan is None else int(sum(final_plan.e_cap))
    floor_ms = 2 * (e_pad + conv2_rows) * 2.3e-9 * 1e3
    return {"floor_ms": round(floor_ms, 2),
            "floor_fraction": round(floor_ms / (dt_s * 1e3), 3)}


def bench_full_batch(**kw) -> Dict:
    step, b, graph, plan = _full_batch_config(**kw)
    dt = _timed_steps(step, 30)
    return {"step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(b / dt, 1),
            "vs_baseline": round(b / dt / BASELINE_EDGES_PER_S, 2),
            **_gather_floor_fields(graph, dt, plan)}


def bench_sampled(fanouts=(15, 10), dataset="primekg",
                  compute_dtype=None, mode="uniform",
                  window_impl=None, ident_fraction=None,
                  cache=False) -> Dict:
    """Mini-batch neighbor-sampled training step.

    dataset="primekg" is the north-star subgraph; "primekg-full" is BASELINE
    config 4 (full PrimeKG + fanout-15/10 sampling) — the sampled step's cost
    is batch-neighborhood-bound, so it is where sampling beats full-batch.
    """
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.sampling import build_csr_cache
    from primekg_rgcn_tpu.data.synthetic import (
        bidirect, primekg_full_like, primekg_like)
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.loop import make_optimizer
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    if dataset == "rmat-10m":
        # BASELINE configs 4+5 combined on ONE chip: full-batch cannot even
        # materialize its message stream at 100M edges ([100M, 64] f32 =
        # 25.6 GB > HBM); the sampled step is frontier-bound and fits.
        from primekg_rgcn_tpu import native
        from primekg_rgcn_tpu.data.synthetic import rmat

        g = native.rmat_native(10_000_000, 100_000_000, 50, seed=0) \
            or rmat(10_000_000, 100_000_000, 50, seed=0)
        src, dst, rel = g["src"], g["dst"], g["rel"]
        n = 10_000_000
    elif dataset == "primekg-full":
        raw = primekg_full_like(seed=0, scale=1.0)
        src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
        n = raw["num_nodes"]
    else:
        raw = primekg_like(seed=0, scale=1.0)
        src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
        n = raw["num_nodes"]
    n_rel = int(rel.max()) + 1
    graph = build_rel_graph(src, dst, rel, n, n_rel)
    big = dataset == "rmat-10m"
    # Single-chip 10M-node memory spec: bf16 messages + plain SGD. Dense
    # adam state is 3x params (7.7 GB) and this backend declines buffer
    # donation, so input+output state alone would exceed the 16 GB chip —
    # adam at this scale is exactly what the multi-chip node-sharded path
    # (bench/pod_scale.py) exists for.
    cfg = ModelConfig(num_nodes=n, num_relations=n_rel,
                      compute_dtype=compute_dtype
                      or ("bfloat16" if big else "float32"))
    tcfg = TrainConfig(batch_size=1024)
    if big or cache:
        # cache_layer1 extends the sparse-embedding step, whose table
        # update is plain SGD (or adafactor) — match the 10M config.
        import optax

        opt = optax.sgd(tcfg.lr)
    else:
        opt = make_optimizer(tcfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # layout="auto": per-relation picks on the dense 3-relation subgraph,
    # combined-neighborhood on relation-sparse full PrimeKG. At 10M nodes
    # the sparse-embedding step drops the dense [N, 64] table gradient
    # (2.56 GB) and the full-table SGD stream from the per-step live set.
    import os

    prev_impl = os.environ.get("PRIMEKG_WINDOW_IMPL")
    prev_ident = os.environ.get("PRIMEKG_IDENT_FRACTION")
    if window_impl is not None:
        # Pin the block-mode window-fetch implementation for this row
        # (ops/pallas/window_fetch.py reads the env at trace time).
        # Restored in the finally below — a leaked value would silently
        # pin every later block-mode row in the same suite process.
        os.environ["PRIMEKG_WINDOW_IMPL"] = window_impl
    if ident_fraction is not None:
        # Near-saturation identity threshold override (data/sampling.py):
        # the round-5 8/5 bench showed the dedup-vs-ident regime boundary
        # dominates the budget product at config-5 scale.
        os.environ["PRIMEKG_IDENT_FRACTION"] = str(ident_fraction)
    try:
        step_fn = build_sampled_train_step(graph, cfg, tcfg, opt,
                                           fanouts=fanouts,
                                           sparse_emb=big or cache,
                                           mode=mode,
                                           layout="combined" if cache
                                           else "auto",
                                           cache_layer1=cache)

        edges = np.stack([src, dst, rel], 1).astype(np.int32)
        rng = np.random.default_rng(0)
        # init_state builds whatever opt_state structure the step needs
        # (plain, (rest, factored-table), or (base, history-cache)).
        holder = {"state": step_fn.init_state(params),
                  "key": jax.random.PRNGKey(0)}

        def step(i):
            holder["key"], k = jax.random.split(holder["key"])
            idx = rng.integers(0, len(edges), tcfg.batch_size)
            holder["state"], (loss, _) = step_fn(holder["state"],
                                                 jnp.asarray(edges[idx]), k)
            return loss

        dt = _timed_steps(step, 30)
    finally:
        if window_impl is not None:
            if prev_impl is None:
                os.environ.pop("PRIMEKG_WINDOW_IMPL", None)
            else:
                os.environ["PRIMEKG_WINDOW_IMPL"] = prev_impl
        if ident_fraction is not None:
            if prev_ident is None:
                os.environ.pop("PRIMEKG_IDENT_FRACTION", None)
            else:
                os.environ["PRIMEKG_IDENT_FRACTION"] = prev_ident
    return {"step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(tcfg.batch_size / dt, 1),
            "vs_baseline": round(
                tcfg.batch_size / dt / BASELINE_EDGES_PER_S, 2)}


def bench_ident_sweep(fanouts=(8, 5), batches=(1024, 512, 256, 128, 64),
                      n_steps=15) -> Dict:
    """Dedup-vs-identity regime crossover sweep (post-round-5 item 3).

    The near-saturation identity threshold (data/sampling.IDENT_FRACTION)
    decides, from the innermost layer's STATIC raw pick-slot count as a
    fraction of the node space, whether the sampled step keeps the
    deduplicated frontier (unique construction + frontier gather) or
    gathers straight from the embedding table. Round 5 measured identity
    3.3x faster at 0.34 x N and moved the default 0.5 -> 0.3 — the lowest
    measured-win point; BELOW that the crossover was unmeasured. Raw slots
    scale linearly with the batch size at fixed budgets, so this sweep
    varies the batch and times BOTH regimes at each point on the config-5
    graph, then interpolates the crossover fraction — the measurement that
    lets the default sit at the regime boundary instead of a bound.
    """
    import os

    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.loop import TrainState
    from primekg_rgcn_tpu.train.sampled import (build_sampled_train_step,
                                                resolve_sampler)
    import optax

    g = native.rmat_native(10_000_000, 100_000_000, 50, seed=0) \
        or rmat(10_000_000, 100_000_000, 50, seed=0)
    src, dst, rel = g["src"], g["dst"], g["rel"]
    n = 10_000_000
    n_rel = int(rel.max()) + 1
    graph = build_rel_graph(src, dst, rel, n, n_rel)
    csr, budgets, _ = resolve_sampler(graph, fanouts)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)

    prev_ident = os.environ.get("PRIMEKG_IDENT_FRACTION")
    points = []
    try:
        for b in batches:
            cfg = ModelConfig(num_nodes=n, num_relations=n_rel,
                              compute_dtype="bfloat16")
            tcfg = TrainConfig(batch_size=b)
            # Static raw innermost slot count for this batch size (ids are
            # irrelevant to the static shapes; one eager sample reads it).
            seeds = jnp.zeros((2 * b * (1 + tcfg.num_neg_samples),),
                              jnp.int32)
            probe = sample_batch_combined(jax.random.PRNGKey(0), csr, seeds,
                                          budgets, allow_ident=False)
            raw = int(np.prod(probe.blocks[0].src_local.shape))
            frac = raw / n
            pt = {"batch": b, "raw_slots": raw,
                  "raw_fraction": round(frac, 4)}
            for regime, frac_env in (("ident", "1e-9"), ("dedup", "9e9")):
                os.environ["PRIMEKG_IDENT_FRACTION"] = frac_env
                opt = optax.sgd(tcfg.lr)
                step_fn = build_sampled_train_step(
                    csr, cfg, tcfg, opt, fanouts=fanouts, sparse_emb=True)
                params = init_params(jax.random.PRNGKey(0), cfg)
                rng = np.random.default_rng(0)
                holder = {"state": step_fn.init_state(params),
                          "key": jax.random.PRNGKey(0)}

                def step(i):
                    holder["key"], k = jax.random.split(holder["key"])
                    idx = rng.integers(0, len(edges), b)
                    holder["state"], (loss, _) = step_fn(
                        holder["state"], jnp.asarray(edges[idx]), k)
                    return loss

                dt = _timed_steps(step, n_steps)
                pt[f"{regime}_ms"] = round(dt * 1e3, 2)
                del holder, step_fn, params
            points.append(pt)
            print(json.dumps(pt), flush=True)
    finally:
        if prev_ident is None:
            os.environ.pop("PRIMEKG_IDENT_FRACTION", None)
        else:
            os.environ["PRIMEKG_IDENT_FRACTION"] = prev_ident

    # Crossover: walk points by ascending fraction; interpolate where the
    # ident-minus-dedup sign flips. If identity wins everywhere measured,
    # the crossover upper bound is the smallest measured fraction.
    pts = sorted(points, key=lambda p: p["raw_fraction"])
    crossover = None
    for lo, hi in zip(pts, pts[1:]):
        d_lo = lo["ident_ms"] - lo["dedup_ms"]
        d_hi = hi["ident_ms"] - hi["dedup_ms"]
        if d_lo >= 0 and d_hi < 0:
            t = d_lo / (d_lo - d_hi) if d_lo != d_hi else 0.0
            crossover = lo["raw_fraction"] + t * (
                hi["raw_fraction"] - lo["raw_fraction"])
            break
    ident_everywhere = all(p["ident_ms"] <= p["dedup_ms"] for p in pts)
    head = next(p for p in points if p["batch"] == batches[0])
    return {"step_ms": min(head["ident_ms"], head["dedup_ms"]),
            "edges_per_s": round(
                batches[0] / (min(head["ident_ms"], head["dedup_ms"])
                              / 1e3), 1),
            "crossover_fraction":
                round(crossover, 4) if crossover is not None else None,
            "ident_wins_everywhere": ident_everywhere,
            "points": points}


def bench_primekg_full(scale=1.0) -> Dict:
    """BASELINE.json config 3: FULL PrimeKG (~129K nodes, 30 relations,
    ~4.5M directed edges) — stresses per-relation bucketing at realistic
    skew (bucket sizes span 1.2K..800K rows)."""
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_full_like

    raw = primekg_full_like(seed=0, scale=scale)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    step, b, graph, plan = _full_batch_config(
        graph_override=(src, dst, rel, raw["num_nodes"],
                        raw["num_relations"]))
    dt = _timed_steps(step, 10)
    return {"step_ms": round(dt * 1e3, 2),
            "nodes": int(raw["num_nodes"]),
            "relations": int(raw["num_relations"]),
            "edges": int(len(src)),
            "edges_per_s": round(b / dt, 1),
            "vs_baseline": round(b / dt / BASELINE_EDGES_PER_S, 2),
            **_gather_floor_fields(graph, dt, plan)}


def bench_rmat(num_nodes=500_000, num_edges=5_000_000, num_relations=10) -> Dict:
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu import native

    g = native.rmat_native(num_nodes, num_edges, num_relations, seed=0) \
        or rmat(num_nodes, num_edges, num_relations, seed=0)
    step, b, graph, plan = _full_batch_config(
        graph_override=(g["src"], g["dst"], g["rel"], num_nodes,
                        num_relations))
    dt = _timed_steps(step, 10)
    return {"step_ms": round(dt * 1e3, 2),
            "nodes": num_nodes, "edges": num_edges,
            # Normalized like every other full-batch row (candidate
            # edges/s at batch 1024) so cross-round regression tracking
            # has a comparable cell; the graph-sweep rate is kept too.
            "edges_per_s": round(b / dt, 1),
            "vs_baseline": round(b / dt / BASELINE_EDGES_PER_S, 2),
            "graph_edges_per_s_fwd_bwd": round(num_edges / dt, 1),
            **_gather_floor_fields(graph, dt, plan)}


def bench_eval_ranking() -> Dict:
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.evaluate.metrics import ranks_of_true_tails
    from primekg_rgcn_tpu.ops.distmult import distmult_score_all_tails

    n, d, b = 30926, 128, 1024
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    heads = jnp.asarray(rng.integers(0, n, b))
    tails = jnp.asarray(rng.integers(0, n, b))

    @jax.jit
    def rank(emb, rel, heads, tails):
        scores = distmult_score_all_tails(jnp.take(emb, heads, axis=0), rel,
                                          emb)
        return ranks_of_true_tails(scores, tails)

    def step(i):
        return rank(emb, rel, heads, tails)

    dt = _timed_steps(step, 30)
    # HBM-bytes roofline for the ranking batch (edges/s is meaningless
    # here): score matrix [B, N] written+read by the rank reduction plus
    # one table read, at v5e's ~819 GB/s. The measured batch is dominated
    # by the hosted frontend's per-call dispatch floor (docs/KERNELS.md),
    # which is what this fraction makes visible each round.
    hbm_bytes = (2 * b * n + n * d + b * d) * 4
    floor_ms = hbm_bytes / 819e9 * 1e3
    return {"batch_ms": round(dt * 1e3, 3),
            "step_ms": round(dt * 1e3, 3),
            "triples_per_s": round(b / dt, 1),
            "entities": n,
            "floor_ms": round(floor_ms, 3),
            "floor_fraction": round(floor_ms / (dt * 1e3), 3)}


def bench_sharded_step(agg: str = "pallas", scale: float = 1.0) -> Dict:
    """Edge-sharded training step on a 1-device mesh: the exact multi-chip
    program (shard_map + grad-psum plumbing + scheduled aggregation)
    measured at its single-chip cost — a pod runs this same program n-wide.
    Also the tracker for the hosted-backend collective anomaly logged in
    docs/KERNELS.md ("The kernel inside shard_map")."""
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.parallel.edge_shard import (
        build_sharded_train_step,
        shard_rel_graph,
    )
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.loop import make_optimizer

    raw = primekg_like(seed=0, scale=scale)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3)
    cfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3)
    tcfg = TrainConfig(batch_size=1024)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg)
    mesh = make_mesh(1)
    sg = shard_rel_graph(graph, 1, pallas=(agg == "pallas"))
    sstep = build_sharded_train_step(mesh, sg, cfg, tcfg, opt)

    rng = np.random.default_rng(0)
    b = tcfg.batch_size
    holder = {"p": params, "o": opt.init(params),
              "key": jax.random.PRNGKey(0)}

    def step(i):
        holder["key"], k = jax.random.split(holder["key"])
        batch = np.zeros((b, 4), np.int32)
        batch[:, 0] = rng.integers(0, cfg.num_nodes, b)
        batch[:, 1] = rng.integers(0, cfg.num_nodes, b)
        batch[:, 2] = rng.integers(0, 3, b)
        batch[:, 3] = 1
        holder["p"], holder["o"], (loss, _) = sstep(
            holder["p"], holder["o"], jnp.asarray(batch), k)
        return loss

    dt = _timed_steps(step, 20)
    return {"step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(b / dt, 1),
            "vs_baseline": round(b / dt / BASELINE_EDGES_PER_S, 2),
            "agg": agg, "mesh": 1}


CONFIGS: Dict[str, Callable[[], Dict]] = {
    "primekg-default": lambda: bench_full_batch(),
    "primekg-bases": lambda: bench_full_batch(num_bases=2),
    "primekg-bf16": lambda: bench_full_batch(compute_dtype="bfloat16"),
    "primekg-xla": lambda: bench_full_batch(impl="xla"),
    "sampled-15-10": lambda: bench_sampled((15, 10)),
    "sampled-full-15-10": lambda: bench_sampled((15, 10), "primekg-full"),
    "sampled-full-bf16-15-10": lambda: bench_sampled(
        (15, 10), "primekg-full", compute_dtype="bfloat16"),
    # Config-4 at the qualified low budget (the 8/5 lever, Round 5).
    "sampled-full-8-5": lambda: bench_sampled((8, 5), "primekg-full"),
    "sampled-10m-15-10": lambda: bench_sampled((15, 10), "rmat-10m"),
    "sampled-10m-block-15-10": lambda: bench_sampled((15, 10), "rmat-10m",
                                                     mode="block"),
    "sampled-10m-block-pallas-15-10": lambda: bench_sampled(
        (15, 10), "rmat-10m", mode="block", window_impl="pallas"),
    "sampled-10m-block-xla-15-10": lambda: bench_sampled(
        (15, 10), "rmat-10m", mode="block", window_impl="xla"),
    # Budget-quality sweep (docs/KERNELS.md Round 4) showed 8/5 == 15/10
    # quality at qualification scale. Round-5 measurement: under the THEN
    # default threshold 0.5 the smaller budget was SLOWER (949 vs 583 ms)
    # because its innermost raw stream dropped into the dedup+scatter
    # regime — the regime boundary dominates the budget product. The
    # -ident04/-ident03 rows ledger that discovery; since the crossover
    # sweep (ident-crossover row) the DEFAULT threshold is 0.03, so the
    # plain 8-5 row runs identity out of the box.
    "sampled-10m-8-5": lambda: bench_sampled((8, 5), "rmat-10m"),
    "sampled-10m-8-5-ident04": lambda: bench_sampled(
        (8, 5), "rmat-10m", ident_fraction=0.4),
    # (8, 5) maps to budgets (32, 24) on this graph: innermost raw stream
    # = ~135K frontier x 25 = 3.38M slots = 0.34 x N — threshold 0.4 still
    # leaves it in dedup mode (measured 927 ms, unchanged); 0.3 flips it
    # to identity.
    "sampled-10m-8-5-ident03": lambda: bench_sampled(
        (8, 5), "rmat-10m", ident_fraction=0.3),
    # Compose the two round-5 wins: low budget in identity regime + the
    # Pallas contiguous-window fetch.
    "sampled-10m-block-8-5": lambda: bench_sampled(
        (8, 5), "rmat-10m", mode="block"),
    "sampled-10m-block4-8-5": lambda: bench_sampled(
        (8, 5), "rmat-10m", mode="block4"),
    # blockN: N independent sub-windows per node — same budget/bytes as
    # block, ~Nx the per-step relation coverage (the quality fix for
    # block mode's relation-correlated picks).
    "sampled-10m-block4-15-10": lambda: bench_sampled(
        (15, 10), "rmat-10m", mode="block4"),
    # Post-round-5 item 3: the dedup-vs-identity crossover, measured.
    "ident-crossover": lambda: bench_ident_sweep(),
    # Historical layer-1 embeddings (GAS-style): ONE sampled hop serves
    # both convolutions — the innermost frontier fetch (the sampled
    # step's measured cost floor) is structurally removed.
    "sampled-10m-cache-15-10": lambda: bench_sampled(
        (15, 10), "rmat-10m", cache=True),
    "sampled-10m-cache-8-5": lambda: bench_sampled(
        (8, 5), "rmat-10m", cache=True),
    "sampled-full-cache-15-10": lambda: bench_sampled(
        (15, 10), "primekg-full", cache=True),
    "primekg-full": lambda: bench_primekg_full(),
    "rmat-large": lambda: bench_rmat(),
    "eval-ranking": lambda: bench_eval_ranking(),
    "sharded-1dev-pallas": lambda: bench_sharded_step("pallas"),
    "sharded-1dev-xla": lambda: bench_sharded_step("xla"),
}


def main(argv=None):
    p = argparse.ArgumentParser(description="Benchmark suite")
    p.add_argument("--out", default="bench_report.json")
    p.add_argument("--configs", nargs="+", default=list(CONFIGS))
    args = p.parse_args(argv)

    import jax

    report = {"device": str(jax.devices()[0]),
              "baseline_edges_per_s": round(BASELINE_EDGES_PER_S, 1),
              "results": {}}
    # Partial runs (--configs a b) merge into an existing report instead of
    # clobbering the other configs' entries.
    try:
        with open(args.out) as f:
            prev = json.load(f)
        report["results"].update(prev.get("results", {}))
    except (OSError, ValueError):
        pass
    for name in args.configs:
        print(f"== {name} ==", flush=True)
        try:
            report["results"][name] = CONFIGS[name]()
        except Exception as e:  # keep the suite running
            report["results"][name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(report["results"][name]), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    main()
