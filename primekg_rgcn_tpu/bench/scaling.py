"""Scaling-efficiency harness: edges/s vs device count + analytic ICI bytes.

BASELINE.json's north star asks for ">=80% edges/s scaling efficiency 1 chip
-> N hosts". Only one physical chip exists in this environment, so this
harness produces the two things that CAN be produced honestly today
(VERDICT.md round-1 item 5):

1. **Measured step time on a simulated CPU mesh** for n in {1,2,4,8} x
   {edge-shard, node-shard}. CPU wall-clock is a *correctness and traffic*
   model — host cores share memory bandwidth, there is no ICI — so these
   numbers validate that the collectives and shardings compose and how the
   compute partitions, NOT what a v5e pod would deliver. They are labeled
   as such in the report.
2. **Analytic per-layer communication-bytes model** from the real partition
   metadata (halo request lists, psum shapes), which IS hardware-independent:
   - edge-shard: each RGCN layer psums stacked per-relation partial
     aggregates [R, N, D_agg] (parallel/edge_shard.py); a ring all-reduce
     moves 2*(n-1)/n * bytes per device.
   - node-shard: each layer runs one all_to_all of the halo serve lists
     (parallel/node_shard.py); each device ships (n-1) * halo_width * D
     rows, where halo_width comes from the actual partitioned graph. The
     training step adds the batch endpoint assembly (all_gather of ids +
     psum of [n, C, H] candidate rows).

The crossover these two models expose (replication-psum traffic is O(R*N*D)
per device regardless of n; halo traffic is O(cut) and shrinks per device)
is the quantitative argument for node-sharding at 10M+ nodes recorded in
SURVEY.md §2.4.

Run: ``python -m primekg_rgcn_tpu.bench.scaling [--scale 0.25] [--out
bench_report.json]`` (forces the 8-device CPU platform itself; safe to run
while the TPU is busy).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List


def _ring_allreduce_bytes(payload_bytes: int, n: int) -> int:
    """Per-device bytes sent by a ring all-reduce (reduce-scatter+all-gather)."""
    if n <= 1:
        return 0
    return int(2 * (n - 1) / n * payload_bytes)


def comms_bytes_model(graph, model_cfg, n_devices: int,
                      batch_size: int = 1024,
                      num_neg_samples: int = 1) -> Dict:
    """Analytic per-device bytes per training step for both layouts.

    Uses the REAL partition metadata: ``partition_nodes`` is executed for the
    node layout, so halo widths reflect the actual boundary cut of this
    graph, not an estimate.
    """
    from primekg_rgcn_tpu.parallel.node_shard import partition_nodes

    n = n_devices
    N = graph.num_nodes
    R = graph.num_relations
    emb, hid = model_cfg.embedding_dim, model_cfg.hidden_dim
    f32 = 4

    # Edge-shard: layer aggregates in min(Din, Dout) width (aggregate-first,
    # ops/rgcn_segment.py) and psums the stacked [R, N, D_agg] partials.
    d1 = min(emb, hid)       # conv1 aggregation width
    d2 = min(hid, hid)       # conv2
    edge_fwd = sum(_ring_allreduce_bytes(R * N * d * f32, n)
                   for d in (d1, d2))
    # Backward psums the same shapes (transpose aggregation partials).
    edge_step = 2 * edge_fwd

    result = {
        "edge_shard": {
            "per_layer_psum_bytes": [R * N * d1 * f32, R * N * d2 * f32],
            "per_device_step_bytes": edge_step,
            "note": "O(R*N*D) per device, independent of n — replication "
                    "tax; dominates at large N",
        },
    }

    if n > 1:
        sg = partition_nodes(graph, n)
        halo_rows = (n - 1) * sg.halo_width
        node_fwd = sum(halo_rows * d * f32 for d in (emb, hid))
        # Batch endpoint assembly (build_node_sharded_train_step.fetch):
        # 2 endpoint lists x all_gather[C ids] + psum[n, C, H] rows.
        C = (batch_size // n) * (1 + num_neg_samples)
        fetch = 2 * (_ring_allreduce_bytes(n * C * hid * f32, n)
                     + (n - 1) * C * 4)
        node_step = 2 * node_fwd + fetch
        result["node_shard"] = {
            "halo_width": int(sg.halo_width),
            "per_layer_alltoall_bytes": [halo_rows * emb * f32,
                                         halo_rows * hid * f32],
            "batch_fetch_bytes": int(fetch),
            "per_device_step_bytes": int(node_step),
            "note": "O(boundary cut) per device — shrinks as partitions "
                    "localize; the scalable layout",
        }
        result["node_over_edge_traffic"] = round(node_step / max(edge_step, 1), 4)

    # Sampled data-parallel (train/sampled.py): the only collective is the
    # grads psum (pcast transpose) over the full parameter pytree; ZeRO-1
    # adds the all-gather that rebuilds the embedding table from the
    # per-device updated slices (ring: each device ships its slice to n-1
    # peers) but the same psum.  Param bytes computed exactly for the
    # no-basis architecture (models/rgcn.py init_params).
    p_emb = N * emb * f32
    p_rest = (R * emb * hid + emb * hid + hid          # conv1
              + R * hid * hid + hid * hid + hid        # conv2
              + R * hid) * f32                         # decoder rel_emb
    grads_psum = _ring_allreduce_bytes(p_emb + p_rest, n)
    result["sampled_dp"] = {
        "grads_psum_bytes": int(grads_psum),
        "per_device_step_bytes": int(grads_psum),
        "note": "frontier work splits n-fold; comms = one grads psum, "
                "independent of graph size beyond the embedding table",
    }
    if n > 1:
        n_loc = -(-N // n)
        ag = (n - 1) * n_loc * emb * f32
        result["sampled_zero1"] = {
            "emb_allgather_bytes": int(ag),
            "per_device_step_bytes": int(grads_psum + ag),
            "per_device_moment_bytes_saved": int(2 * p_emb * (n - 1) / n),
            "note": "adds the table-rebuild all-gather; buys an n-fold cut "
                    "of the 2x-params Adam moment memory",
        }
        # Fully-sharded table (zero3): every collective is frontier-sized
        # (ids all_gather + rows psum_scatter + row-cotangent all_gather);
        # nothing scales with N except the n-fold-SLICED params/moments.
        from primekg_rgcn_tpu.data.sampling import _unique_cap
        from primekg_rgcn_tpu.train.sampled import resolve_sampler

        _, budgets, comb = resolve_sampler(graph, (15, 10))
        # Seeds per device = heads + tails = 2 * per_dev * (1 + num_neg=1).
        cap = _unique_cap(2 * max(batch_size // n, 1) * 2, N)
        for f in budgets:
            slots = int(f) if comb else int(f) * R
            cap = _unique_cap(cap * (1 + slots), N)
        row = emb * f32
        result["sampled_zero3"] = {
            "frontier_cap": int(cap),
            "per_device_step_bytes": int(n * cap * (4 + 2 * row)
                                         + _ring_allreduce_bytes(p_rest,
                                                                 n)),
            "per_device_table_bytes": int(n_loc * row * 3),
            "note": "frontier-proportional ICI, independent of N; params "
                    "+ adam moments sliced n-fold (no table-sized object "
                    "per device)",
        }
    return result


def measure_sim_mesh(scale: float = 0.25,
                     device_counts: List[int] = (1, 2, 4, 8),
                     batch_size: int = 256,
                     n_steps: int = 8) -> Dict:
    """Step-time measurements on the forced CPU mesh (traffic/correctness
    model only — labeled, see module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.parallel.edge_shard import (
        build_sharded_train_step, shard_rel_graph)
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.parallel.node_shard import (
        build_node_sharded_train_step, partition_nodes)
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

    raw = primekg_like(seed=0, scale=scale)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3)
    model_cfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3)
    train_cfg = TrainConfig(batch_size=batch_size)
    opt = make_optimizer(train_cfg)
    params = init_params(jax.random.PRNGKey(0), model_cfg)

    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(0)

    def batches(i):
        idx = rng.integers(0, len(edges), batch_size)
        b = np.concatenate([edges[idx], np.ones((batch_size, 1), np.int32)],
                           axis=1)
        return jnp.asarray(b)

    out: Dict = {"graph": {"nodes": graph.num_nodes,
                           "edges": graph.num_edges,
                           "scale": scale},
                 "batch_size": batch_size,
                 "platform": jax.default_backend(),
                 "disclaimer": "simulated CPU mesh: collective/sharding "
                               "correctness + partition cost model, NOT ICI "
                               "throughput",
                 "layouts": {}}

    for layout in ("edge", "node", "sampled-dp", "sampled-zero1",
                   "sampled-zero3"):
        rows = {}
        for n in device_counts:
            if n > len(jax.devices()):
                continue
            if layout.startswith("sampled") and n == 1:
                continue  # DP variants need a mesh axis; single-chip path
                # is benched separately (bench/suite.py sampled configs)
            mesh = make_mesh(n)
            if layout.startswith("sampled"):
                from primekg_rgcn_tpu.train.sampled import (
                    build_sampled_train_step_dp,
                    build_sampled_train_step_zero1,
                    build_sampled_train_step_zero3,
                )

                # The sampled steps donate their state; give each run its
                # own copy so later layouts don't see deleted buffers.
                p0 = jax.tree_util.tree_map(jnp.copy, params)
                if layout == "sampled-dp":
                    sstep = build_sampled_train_step_dp(
                        graph, model_cfg, train_cfg, opt, mesh,
                        fanouts=(5, 3))
                    st0 = TrainState(p0, opt.init(p0),
                                     jnp.zeros((), jnp.int32))
                elif layout == "sampled-zero1":
                    init_z1, sstep = build_sampled_train_step_zero1(
                        graph, model_cfg, train_cfg, mesh, fanouts=(5, 3))
                    st0 = init_z1(p0)
                else:
                    init_z3, sstep, _, _ = build_sampled_train_step_zero3(
                        graph, model_cfg, train_cfg, mesh, fanouts=(5, 3))
                    st0 = init_z3(p0)
                state = {"s": st0}

                def run(i, _s=sstep, _st=state):
                    _st["s"], (loss, _) = _s(_st["s"], batches(i)[:, :3],
                                             jax.random.PRNGKey(i))
                    return loss
            elif layout == "edge":
                sg = shard_rel_graph(graph, n)
                step = build_sharded_train_step(mesh, sg, model_cfg,
                                                train_cfg, opt)
                state = {"params": params, "opt": opt.init(params)}

                def run(i, _s=step, _st=state):
                    _st["params"], _st["opt"], (loss, _) = _s(
                        _st["params"], _st["opt"], batches(i),
                        jax.random.PRNGKey(i))
                    return loss
            else:
                sg = partition_nodes(graph, n)
                step = build_node_sharded_train_step(mesh, sg, model_cfg,
                                                     train_cfg, opt)
                state = {"s": TrainState(params, opt.init(params),
                                         jnp.zeros((), jnp.int32))}

                def run(i, _s=step, _st=state):
                    _st["s"], (loss, _) = _s(_st["s"], batches(i),
                                             jax.random.PRNGKey(i))
                    return loss

            loss = run(0)
            float(loss)  # sync by fetching
            t0 = time.perf_counter()
            for i in range(n_steps):
                loss = run(i)
            float(loss)
            dt = (time.perf_counter() - t0) / n_steps
            rows[str(n)] = {"step_ms": round(dt * 1e3, 2),
                            "edges_per_s": round(batch_size / dt, 1)}
        base = rows.get("1", {}).get("edges_per_s")
        for k, v in rows.items():
            if base:
                v["speedup_vs_1"] = round(v["edges_per_s"] / base, 3)
                v["parallel_efficiency"] = round(
                    v["edges_per_s"] / (base * int(k)), 3)
        out["layouts"][layout] = rows

    # Flat normalized metric for cross-round regression tracking (the
    # nested per-layout cells stay): the 1-device edge-layout step.
    ref_row = out["layouts"].get("edge", {}).get("1")
    if ref_row:
        out["step_ms"] = ref_row["step_ms"]
        out["edges_per_s"] = ref_row["edges_per_s"]

    # Analytic model at the measured scale and at full PrimeKG scale.
    out["comms_model"] = {
        str(n): comms_bytes_model(graph, model_cfg, n,
                                  batch_size=batch_size)
        for n in device_counts}
    return out


def main(argv=None):
    # Env must be set before jax initializes any backend.
    os.environ.setdefault("PRIMEKG_FORCE_CPU", "1")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--out", default="bench_report.json")
    args = p.parse_args(argv)

    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()

    result = measure_sim_mesh(scale=args.scale,
                              batch_size=args.batch_size,
                              n_steps=args.steps)
    print(json.dumps(result, indent=2))

    try:
        with open(args.out) as f:
            report = json.load(f)
    except (OSError, ValueError):
        report = {"results": {}}
    report.setdefault("results", {})["scaling-sim-mesh"] = result
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"merged into {args.out}")
    return result


if __name__ == "__main__":
    main()
