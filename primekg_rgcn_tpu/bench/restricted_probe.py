"""Measured probe of the parked north-star optimization (VERDICT r2 item 4):
a STATIC host-precomputed batch-restricted final layer with schedules in
BOTH sort orders, vs the dynamic restricted layer and the full layer.

docs/KERNELS.md "Roofline" parked this as a costing (~4.7 GB HBM for 1639
per-batch plans). This probe measures the per-batch mechanism itself on the
real chip so the accept/reject is based on numbers:

- **full**: the production conv2 (rgcn_layer_segment over all 1.68M edges,
  fwd+bwd) — what the 25.2 ms north-star step runs today.
- **dynamic**: final_layer_restricted (on-device plan construction,
  clip-gathers into a static e_cap, XLA segment-sum) — the existing path
  that loses at north-star scale (26.6 vs 24.9 ms/step).
- **static**: host-extracted exact restricted edge lists for ONE batch,
  dst-sorted with a Pallas run-compaction schedule for the forward and
  src-sorted with its own schedule for the transpose backward
  (make_gather_segment_sum(sched=, t_sched=)) — the mechanism the parked
  per-epoch design would run per batch.

The step-level projection: conv2 contributes gather rows in both
directions; replacing full (2 x E) with static-restricted (2 x E_restr)
saves (2 x (E - E_restr)) x ~2.3 ns plus the shrunken segment-sum/matmul.
Run: ``python -m primekg_rgcn_tpu.bench.restricted_probe``
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _extract_restricted(graph, nodes_u: np.ndarray):
    """Per relation: edges with dst in ``nodes_u``, in both sort orders.

    Returns a list of dicts with dst-sorted (src, dst_local, scale) and
    src-sorted (t_src, t_dst_local, t_scale) arrays, each padded to a
    SEG_K multiple (sentinel gathers row N/local row m -> zero dummy).
    """
    from primekg_rgcn_tpu.ops.pallas.segment_sum import SEG_K

    n = graph.num_nodes
    m = len(nodes_u)
    src_h = np.asarray(graph.src)
    dst_h = np.asarray(graph.dst)
    local_of = np.full(n + 1, m, np.int32)
    local_of[nodes_u] = np.arange(m, dtype=np.int32)

    out = []
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        rp = np.searchsorted(dst_h[s:e], np.arange(n + 1)).astype(np.int64)
        # Contiguous in-edge ranges of each restricted node, dst-sorted by
        # construction (nodes_u is sorted).
        starts, stops = rp[nodes_u], rp[nodes_u + 1]
        counts = stops - starts
        eid = np.repeat(starts, counts) + (
            np.arange(counts.sum()) -
            np.repeat(np.cumsum(counts) - counts, counts))
        src = src_h[s:e][eid].astype(np.int32)
        dstl = np.repeat(np.arange(m, dtype=np.int32), counts)
        if graph.norm_mode == "edge":
            scale = np.asarray(graph.edge_scale)[s:e][eid].astype(np.float32)
        else:
            scale = np.asarray(
                graph.inv_in_deg[r])[nodes_u][dstl].astype(np.float32)

        ecnt = len(src)
        pad = (-ecnt) % SEG_K
        src_p = np.concatenate([src, np.full(pad, n, np.int32)])
        dstl_p = np.concatenate([dstl, np.full(pad, m, np.int32)])
        scale_p = np.concatenate([scale, np.zeros(pad, np.float32)])

        order = np.argsort(src_p[:ecnt], kind="stable")
        t_src = np.concatenate([src_p[:ecnt][order],
                                np.full(pad, n, np.int32)])
        t_dstl = np.concatenate([dstl_p[:ecnt][order],
                                 np.full(pad, m, np.int32)])
        t_scale = np.concatenate([scale_p[:ecnt][order],
                                  np.zeros(pad, np.float32)])
        out.append(dict(src=src_p, dst_local=dstl_p, scale=scale_p,
                        t_src=t_src, t_dst_local=t_dstl, t_scale=t_scale,
                        real_edges=ecnt))
    return out


def run_probe(scale: float = 1.0, batch_size: int = 1024, steps: int = 30,
              seed: int = 0):
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.ops.pallas.segment_sum import build_schedule_arrays
    from primekg_rgcn_tpu.ops.rgcn_final_layer import (
        final_layer_restricted, plan_final_layer)
    from primekg_rgcn_tpu.ops.rgcn_segment import (
        make_gather_segment_sum, materialize_relation_weights,
        rgcn_layer_segment)

    raw = primekg_like(seed=seed, scale=scale)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"],
                            raw["num_relations"])
    n = graph.num_nodes
    cfg = ModelConfig(num_nodes=n, num_relations=graph.num_relations)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    conv2 = params["encoder"]["conv2"]

    # A representative batch (positives degree-biased, negatives uniform),
    # as the sampler draws it (reference: src/train.py:43-97).
    rng = np.random.default_rng(seed)
    edges = np.stack([src, dst, rel], 1)
    bi = rng.integers(0, len(edges), batch_size)
    h, t = edges[bi, 0], edges[bi, 1]
    coin = rng.random(batch_size) < 0.5
    ent = rng.integers(0, n, batch_size)
    nh = np.where(coin, ent, h)
    nt = np.where(~coin, ent, t)
    nodes = np.concatenate([h, t, nh, nt]).astype(np.int32)
    nodes_u = np.unique(nodes)
    m = len(nodes_u)

    restricted = _extract_restricted(graph, nodes_u)
    e_restr = sum(d["real_edges"] for d in restricted)
    e_static = sum(len(d["src"]) for d in restricted)

    # Static restricted ops: Pallas schedules in both sort orders.
    ops = []
    for d in restricted:
        sched = build_schedule_arrays(d["dst_local"], m + 1)
        t_sched = build_schedule_arrays(d["t_src"], n + 1)
        f = make_gather_segment_sum(
            jnp.asarray(d["src"]), jnp.asarray(d["dst_local"]),
            jnp.asarray(d["t_src"]), jnp.asarray(d["t_dst_local"]),
            m + 1,
            scale=jnp.asarray(d["scale"]),
            t_scale=jnp.asarray(d["t_scale"]),
            sched=jax.tree_util.tree_map(jnp.asarray, sched),
            t_sched=jax.tree_util.tree_map(jnp.asarray, t_sched),
            t_num_segments=n + 1)
        ops.append(f)

    h1 = jax.random.normal(jax.random.PRNGKey(1), (n, cfg.hidden_dim))
    nodes_j = jnp.asarray(nodes)
    nodes_u_j = jnp.asarray(nodes_u)
    w_rel_c = materialize_relation_weights(conv2)

    def static_fn(x):
        xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
        out = jnp.take(xp, nodes_u_j, axis=0) @ conv2["w_root"] \
            + conv2["bias"][None, :]
        for r, f in enumerate(ops):
            out = out + f(xp)[:m] @ w_rel_c[r]
        return out

    def full_fn(x):
        h2 = rgcn_layer_segment(conv2, x, graph)
        return jnp.take(h2, nodes_u_j, axis=0)

    plan = plan_final_layer(graph, edges, batch_size, 1, seed=seed)

    def dynamic_fn(x):
        xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
        return final_layer_restricted(conv2, xp, graph, plan, nodes_j)

    # Parity gate before timing: the static restricted rows must equal the
    # full layer's rows (identical math, restricted enumeration).
    np.testing.assert_allclose(np.asarray(static_fn(h1)),
                               np.asarray(full_fn(h1)),
                               rtol=2e-4, atol=2e-4)

    ct = jax.random.normal(jax.random.PRNGKey(2), (m, cfg.hidden_dim))
    ct_b = jax.random.normal(jax.random.PRNGKey(2),
                             (len(nodes), cfg.hidden_dim))

    def timed(fn, cot, label):
        # One jitted lax.scan over `steps` iterations, like the production
        # whole-epoch trainer: closure constants (graph/index arrays) are
        # staged ONCE per call, not per step — per-call timing on the
        # hosted backend would otherwise measure captured-constant
        # restaging, not compute (docs/KERNELS.md hosted-backend lessons).
        def body(c, _):
            g = jax.grad(lambda x: jnp.vdot(fn(x), cot))(h1 * (1.0 + c))
            return g[0, 0] * 1e-30, None

        run = jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=steps)[0])
        float(run(jnp.float32(0)))  # compile + warm
        t0 = time.perf_counter()
        out = run(jnp.float32(0))
        float(out)  # sync through the tunnel
        dt = (time.perf_counter() - t0) / steps * 1e3
        return round(dt, 3)

    res = {
        "graph_edges": int(graph.num_edges),
        "batch_nodes_unique": int(m),
        "restricted_edges": int(e_restr),
        "restricted_edges_padded": int(e_static),
        "edge_ratio": round(graph.num_edges / max(e_restr, 1), 2),
        "full_fwd_bwd_ms": timed(full_fn, ct, "full"),
        "static_fwd_bwd_ms": timed(static_fn, ct, "static"),
        "dynamic_fwd_bwd_ms": timed(dynamic_fn, ct_b, "dynamic"),
        "platform": jax.default_backend(),
    }
    res["static_saving_ms"] = round(
        res["full_fwd_bwd_ms"] - res["static_fwd_bwd_ms"], 3)
    # Per-epoch plan memory if every batch stored these arrays in HBM.
    n_batches = -(-len(edges) // batch_size)
    bytes_per_batch = sum(
        sum(a.nbytes for a in d.values() if isinstance(a, np.ndarray))
        for d in restricted)
    # Schedules add rank (E ints) + runs_dst per sort order.
    sched_bytes = 2 * e_static * 4 * 2
    res["plan_gb_per_epoch"] = round(
        n_batches * (bytes_per_batch + sched_bytes) / 2**30, 2)
    return res


def main(argv=None):
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args(argv)
    res = run_probe(args.scale, args.batch_size, args.steps)
    print(json.dumps(res, indent=2))
    return res


if __name__ == "__main__":
    main()
