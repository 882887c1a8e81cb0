"""BASELINE config 5 capability proof: 10M nodes / 100M edges / 50 relations,
node-sharded training step over the simulated 8-device mesh.

The 100M-edge R-MAT config CANNOT run full-batch on one chip — the conv1
message stream alone ([100M, 64] f32 = 25.6 GB) exceeds v5e HBM — which is
exactly why it is the multi-chip config (BASELINE.json config 5). With no
pod hardware in this environment, this module runs the REAL node-sharded
training step (parallel/node_shard.py: halo all_to_all + local/halo split
aggregation + data-parallel batch split) at the REAL scale on the
8-device CPU mesh, and reports:

- host partitioning cost (lexsorts, halo request extraction) at 100M edges,
- the actual partition metadata (halo_width, per-device edge capacities),
- one measured training step (compile excluded) — CPU wall-clock, labeled
  as a correctness/memory proof, NOT pod throughput,
- the analytic per-device ICI byte model (bench/scaling.comms_bytes_model)
  which IS hardware-independent.

Run:  python -m primekg_rgcn_tpu.bench.pod_scale [--nodes 10000000
      --edges 100000000 --relations 50] [--out bench_report.json]
A scaled-down smoke of the same path runs in tests/test_multichip.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run_pod_scale(num_nodes: int, num_edges: int, num_relations: int,
                  n_devices: int = 8, batch_size: int = 1024,
                  emb_dim: int = 64, hidden_dim: int = 128,
                  run_step: bool = True, checkpoint=None) -> dict:
    """``checkpoint(report)`` (optional) is called after each phase so a
    later OOM still leaves the completed phases recorded. ``run_step=False``
    stops after partitioning + the analytic comms model: executing the
    step on the SIMULATED mesh needs the pod's total HBM (8 x 16 GB) in
    host RAM plus XLA slack — more than this host has at the full config-5
    scale (two OOM kills at 130 GB RSS); the step itself is proven at
    5M/50M (half scale, same code and shapes-per-device structure).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.bench.scaling import comms_bytes_model
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.parallel.node_shard import (
        build_node_sharded_train_step, partition_nodes)
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

    report: dict = {"nodes": num_nodes, "edges": num_edges,
                    "relations": num_relations, "devices": n_devices,
                    "platform": jax.default_backend(),
                    "disclaimer": "simulated mesh on host CPU: capability/"
                                  "memory/partition proof at real scale; "
                                  "step wall-clock is NOT pod throughput"}

    t0 = time.time()
    g = native.rmat_native(num_nodes, num_edges, num_relations, seed=0) \
        or rmat(num_nodes, num_edges, num_relations, seed=0)
    report["rmat_gen_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    graph = build_rel_graph(g["src"], g["dst"], g["rel"], num_nodes,
                            num_relations)
    report["graph_build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sg = partition_nodes(graph, n_devices)
    report["partition_s"] = round(time.time() - t0, 1)
    report["halo_width"] = int(sg.halo_width)
    report["n_loc"] = int(sg.n_loc)
    report["e_local_cap"] = int(sg.offsets_local[-1])
    report["e_halo_cap"] = int(sg.offsets_halo[-1])
    if checkpoint:
        checkpoint(report)

    model_cfg = ModelConfig(num_nodes=num_nodes,
                            num_relations=num_relations,
                            embedding_dim=emb_dim, hidden_dim=hidden_dim)
    train_cfg = TrainConfig(batch_size=batch_size)
    opt = make_optimizer(train_cfg)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    report["comms_model"] = comms_bytes_model(
        graph, model_cfg, n_devices, batch_size=batch_size)
    if checkpoint:
        checkpoint(report)
    if not run_step:
        report["note"] = ("step skipped (--partition_only): simulating the "
                          "pod's total HBM exceeds host RAM at this scale; "
                          "see the half-scale entry for the executed step")
        return report

    mesh = make_mesh(n_devices)
    step = build_node_sharded_train_step(mesh, sg, model_cfg, train_cfg, opt)

    rng = np.random.default_rng(0)
    edges = np.stack([g["src"][:200_000], g["dst"][:200_000],
                      g["rel"][:200_000]], 1).astype(np.int32)

    def batch():
        idx = rng.integers(0, len(edges), batch_size)
        return jnp.asarray(np.concatenate(
            [edges[idx], np.ones((batch_size, 1), np.int32)], axis=1))

    t0 = time.time()
    state, (loss, acc) = step(state, batch(), jax.random.PRNGKey(1))
    float(loss)
    report["first_step_incl_compile_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    state, (loss, acc) = step(state, batch(), jax.random.PRNGKey(2))
    float(loss)
    report["step_s_cpu"] = round(time.time() - t0, 1)
    report["step_ms"] = round(report["step_s_cpu"] * 1e3, 1)
    report["loss"] = round(float(loss), 4)
    report["acc"] = round(float(acc), 4)
    assert np.isfinite(report["loss"])

    if checkpoint:
        checkpoint(report)
    return report


def run_pod_scale_zero3(num_nodes: int, num_edges: int, num_relations: int,
                        n_devices: int = 8, batch_size: int = 1024,
                        emb_dim: int = 64, hidden_dim: int = 128,
                        fanouts=(15, 10), table_opt: str = "sgd",
                        checkpoint=None) -> dict:
    """Config-5 at FULL scale with dense ADAM, executed on the sim mesh.

    The node-sharded/zero1 steps at 10M/100M need the pod's total HBM in
    host RAM (two 130 GB OOM kills; see run_pod_scale) because table-shaped
    objects exist per device. zero3 (train/sampled.py) keeps every
    table-shaped object SLICED — params 320 MB + adam moments 640 MB per
    device — and its collectives frontier-sized, so the full-scale step
    actually EXECUTES here, dense adam included (one chip can only afford
    SGD at this scale, bench/suite.py sampled-10m).
    """
    import gc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu import native
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.sampling import _unique_cap
    from primekg_rgcn_tpu.data.synthetic import rmat
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_train_step_zero3, resolve_sampler)

    table_factored = table_opt == "adafactor"
    report: dict = {"nodes": num_nodes, "edges": num_edges,
                    "relations": num_relations, "devices": n_devices,
                    "mode": ("sampled-zero3-adafactor" if table_factored
                             else "sampled-zero3-adam"),
                    "platform": jax.default_backend(),
                    "disclaimer": "simulated mesh on host CPU: capability/"
                                  "memory proof at real scale; step "
                                  "wall-clock is NOT pod throughput"}

    t0 = time.time()
    g = native.rmat_native(num_nodes, num_edges, num_relations, seed=0) \
        or rmat(num_nodes, num_edges, num_relations, seed=0)
    report["rmat_gen_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    graph = build_rel_graph(g["src"], g["dst"], g["rel"], num_nodes,
                            num_relations)
    report["graph_build_s"] = round(time.time() - t0, 1)
    edges = np.stack([g["src"][:200_000], g["dst"][:200_000],
                      g["rel"][:200_000]], 1).astype(np.int32)
    del g
    gc.collect()
    if checkpoint:
        checkpoint(report)

    model_cfg = ModelConfig(num_nodes=num_nodes,
                            num_relations=num_relations,
                            embedding_dim=emb_dim, hidden_dim=hidden_dim,
                            compute_dtype="bfloat16")
    # default = adam + clip for the rest params; the factored table rule
    # carries its own block-RMS clip and forbids global-norm grad_clip.
    train_cfg = TrainConfig(batch_size=batch_size,
                            grad_clip=0.0 if table_factored else 1.0)

    t0 = time.time()
    csr, budgets, use_combined = resolve_sampler(graph, fanouts)
    report["csr_build_s"] = round(time.time() - t0, 1)
    report["layout"] = "combined" if use_combined else "per-relation"
    report["budgets"] = list(budgets)

    # Frontier-capacity ladder -> analytic per-device ICI bytes per step
    # (hardware-independent; the zero3 collectives are ids all_gather +
    # rows psum_scatter + row-cotangent all_gather, all n*cap-sized).
    # Seeds per device = heads + tails of the candidate batch:
    # 2 * per_dev * (1 + num_neg).
    per_dev = batch_size // n_devices
    cap = _unique_cap(2 * per_dev * (1 + train_cfg.num_neg_samples),
                      num_nodes)
    for f in budgets:
        slots = int(f) if use_combined else int(f) * num_relations
        cap = _unique_cap(cap * (1 + slots), num_nodes)
    row_bytes = emb_dim * 4
    report["zero3_comms_model"] = {
        "frontier_cap": int(cap),
        "ids_allgather_bytes": int(n_devices * cap * 4),
        "rows_psum_scatter_bytes": int(n_devices * cap * row_bytes),
        "cotangent_allgather_bytes": int(n_devices * cap * row_bytes),
        "note": "per device per step; independent of N (zero1 moves two "
                "table-sized [N, D] collectives instead)"}
    if checkpoint:
        checkpoint(report)

    mesh = make_mesh(n_devices)
    # Pass the ORIGINAL fanouts: the builder re-resolves them against the
    # same CSR to the same budgets (feeding budgets back in would have
    # resolve_sampler multiply by avg_present_relations a second time and
    # silently run a fatter step than the model above describes).
    init_state, step, to_full, _ = build_sampled_train_step_zero3(
        csr, model_cfg, train_cfg, mesh, fanouts=fanouts, layout="combined"
        if use_combined else "per-relation", table_opt=table_opt)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = init_state(params)
    del params
    gc.collect()
    report["table_slice_mb"] = round(
        -(-num_nodes // n_devices) * row_bytes / 2**20, 1)
    if checkpoint:
        checkpoint(report)

    rng = np.random.default_rng(0)

    def batch():
        idx = rng.integers(0, len(edges), batch_size)
        return jnp.asarray(edges[idx])

    t0 = time.time()
    state, (loss, acc) = step(state, batch(), jax.random.PRNGKey(1))
    loss = float(loss)
    report["first_step_incl_compile_s"] = round(time.time() - t0, 1)
    if checkpoint:
        checkpoint(report)

    t0 = time.time()
    state, (loss, acc) = step(state, batch(), jax.random.PRNGKey(2))
    loss = float(loss)
    report["step_s_cpu"] = round(time.time() - t0, 1)
    report["step_ms"] = round(report["step_s_cpu"] * 1e3, 1)
    report["loss"] = round(loss, 4)
    report["acc"] = round(float(acc), 4)
    assert np.isfinite(loss)
    try:
        rss_kb = int(open("/proc/self/status").read()
                     .split("VmHWM:")[1].split()[0])
        report["peak_host_rss_gb"] = round(rss_kb / 2**20, 1)
    except (OSError, IndexError, ValueError):
        pass
    if checkpoint:
        checkpoint(report)
    return report


def main(argv=None):
    os.environ.setdefault("PRIMEKG_FORCE_CPU", "1")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "collective_call_terminate" not in flags:
        # 8 simulated devices on a few host cores legitimately spend
        # minutes of compute between collectives at config-5 scale; XLA
        # CPU's default 40 s rendezvous TERMINATION kills the process when
        # thunk scheduling lets one device reach the collective early
        # (observed: two crashes vs one lucky pass on a 4-core host).
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
                  " --xla_cpu_collective_timeout_seconds=7200")
    os.environ["XLA_FLAGS"] = flags

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--nodes", type=int, default=10_000_000)
    p.add_argument("--edges", type=int, default=100_000_000)
    p.add_argument("--relations", type=int, default=50)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--partition_only", action="store_true",
                   help="stop after partitioning + comms model (the "
                        "simulated step needs the pod's total HBM in host "
                        "RAM)")
    p.add_argument("--sampled_zero3", action="store_true",
                   help="run the fully-sharded-table sampled ADAM step "
                        "instead of the node-sharded full-batch step — "
                        "table-shaped objects stay sliced, so this "
                        "executes at full config-5 scale on this host")
    p.add_argument("--table_opt", choices=["sgd", "adafactor"],
                   default="sgd",
                   help="with --sampled_zero3: 'adafactor' swaps the table "
                        "slices' dense-adam update for per-slice factored "
                        "second moments (O(N/n + D) optimizer state)")
    p.add_argument("--tag", default="config5-pod-dryrun",
                   help="results key in the report file")
    p.add_argument("--out", default="bench_report.json")
    args = p.parse_args(argv)

    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()

    def merge(report):
        try:
            with open(args.out) as f:
                full = json.load(f)
        except (OSError, ValueError):
            full = {"results": {}}
        full.setdefault("results", {})[args.tag] = report
        with open(args.out, "w") as f:
            json.dump(full, f, indent=2)
            f.write("\n")

    if args.sampled_zero3:
        report = run_pod_scale_zero3(args.nodes, args.edges,
                                     args.relations,
                                     n_devices=args.devices,
                                     batch_size=args.batch_size,
                                     table_opt=args.table_opt,
                                     checkpoint=merge)
    else:
        report = run_pod_scale(args.nodes, args.edges, args.relations,
                               n_devices=args.devices,
                               batch_size=args.batch_size,
                               run_step=not args.partition_only,
                               checkpoint=merge)
    print(json.dumps(report, indent=2))
    merge(report)
    print(f"merged into {args.out}")
    return report


if __name__ == "__main__":
    main()
