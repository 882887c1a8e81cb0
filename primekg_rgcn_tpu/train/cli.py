"""Training CLI with the reference's argument surface.

Usage parity with ``python src/train.py`` (reference: src/train.py:635-770):
    python -m primekg_rgcn_tpu.train.cli --epochs 100 --lr 0.001 \
        --batch_size 1024 --data_dir data/processed --output_dir output

Adds: --resume (missing from the reference, SURVEY.md §5), --impl
(xla segment-sum vs pallas kernel), --compute_dtype, --synthetic (train on a
PrimeKG-statistics synthetic graph when no processed data is available —
the reference repo ships no train split).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Train RGCN model for drug-disease link prediction")
    p.add_argument("--data_dir", default="data/processed")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint_dir", default=None,
                   help="[DEPRECATED] use --output_dir")
    p.add_argument("--embedding_dim", type=int, default=64)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--decoder_dropout", type=float, default=0.1)
    p.add_argument("--num_bases", type=int, default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--optimizer", choices=["adam", "adamw", "sgd"],
                   default="adam")
    p.add_argument("--num_neg_samples", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--early_stopping", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    # TPU-native additions
    p.add_argument("--impl", choices=["auto", "xla", "pallas"],
                   default="auto", help="message-passing implementation")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--synthetic", action="store_true",
                   help="train on a PrimeKG-statistics synthetic graph")
    p.add_argument("--synthetic_scale", type=float, default=1.0)
    p.add_argument("--steps_per_scan", type=int, default=0,
                   help="split each epoch into jitted scan segments of this "
                        "many optimizer updates (0 = whole epoch fused); "
                        "with --sample_fanouts on one device: steps fused "
                        "per dispatch (0 = default 32)")
    p.add_argument("--sample_mode", default="uniform",
                   help="with --sample_fanouts: neighbor pick scheme. "
                        "uniform = per-slot with-replacement; block = one "
                        "random aligned F-edge CSR window per node "
                        "(unbiased, DMA-contiguous — the fast fetch at "
                        "config-5 scale); blockN (e.g. block4) = N "
                        "independent F/N-edge sub-windows per node (same "
                        "budget/bytes, ~Nx the per-step relation "
                        "coverage); truncate = first min(deg, F) edges "
                        "(deterministic, exact at F >= max degree)")
    p.add_argument("--sample_fanouts", type=int, nargs="+", default=None,
                   help="enable neighbor-sampled mini-batch training with "
                        "these per-relation fanouts, outermost layer first "
                        "(e.g. --sample_fanouts 15 10)")
    p.add_argument("--zero1", action="store_true",
                   help="with --sample_fanouts and --shard: shard the "
                        "embedding-table optimizer state (ZeRO-1) over the "
                        "mesh — dense Adam at the 10M-node config exceeds "
                        "one chip without it")
    p.add_argument("--zero3", action="store_true",
                   help="with --sample_fanouts and --shard: shard the "
                        "embedding TABLE itself (params + moments + "
                        "update all stay slice-local; frontier rows are "
                        "fetched via psum_scatter) — per-device memory "
                        "O(N/n + frontier), dense adam at any N that "
                        "fits the POD")
    p.add_argument("--dp_pods", type=int, default=0,
                   help="with --zero3: hierarchical 2-D mesh — the table "
                        "shards over n_devices/dp_pods chips (lay on ICI) "
                        "and dp_pods data-parallel replicas span pods "
                        "(DCN); only the [N/tp, D] slice-gradient psum "
                        "crosses pods")
    p.add_argument("--val_sampled", action="store_true",
                   help="with --sample_fanouts: validate with the sampled "
                        "encoder (O(frontier) per batch) instead of a "
                        "full-graph encode — required at scales where the "
                        "full encode cannot materialize; with --zero3 the "
                        "table stays sharded through validation too")
    p.add_argument("--sparse_emb", action="store_true",
                   help="with --sample_fanouts and --optimizer sgd "
                        "(grad_clip/weight_decay 0): update only the "
                        "frontier's embedding rows per step — no dense "
                        "[N, D] table gradient ever materializes")
    p.add_argument("--table_opt", choices=["sgd", "adafactor"],
                   default="sgd",
                   help="with --sparse_emb (single chip) or --zero3 (any "
                        "mesh): the embedding-TABLE update rule. adafactor "
                        "= factored-second-moment adaptive updates "
                        "([N]+[D] state, ~40 MB at 10M nodes vs dense "
                        "adam's 7.7 GB; per-slice [N/n]+[D] under --zero3 "
                        "with mesh-size-invariant cross-slice stats) — "
                        "adaptive training at scales where adam cannot "
                        "fit; the rest params are then free to use "
                        "--optimizer adam")
    p.add_argument("--cache_layer1", action="store_true",
                   help="with --sparse_emb: historical layer-1 embeddings "
                        "(GAS/VR-GCN style) — ONE sampled hop serves both "
                        "convolutions; conv2 reads out-of-batch neighbors "
                        "from an [N, hidden] history cache refreshed as "
                        "nodes appear in batches. Removes the innermost "
                        "frontier fetch (the sampled step's cost floor); "
                        "histories introduce bounded staleness — see "
                        "docs/KERNELS.md Round 5 for the qualification")
    # Multi-chip (SURVEY.md §2.4; the reference is single-device only,
    # reference: src/train.py:758-761)
    p.add_argument("--shard", choices=["none", "edge", "node"],
                   default="none",
                   help="multi-chip layout: edge-partitioned (replicated "
                        "features + psum) or node-partitioned (halo "
                        "exchange); none = single device")
    p.add_argument("--n_devices", type=int, default=0,
                   help="mesh size for --shard (0 = all visible devices)")
    p.add_argument("--halo_impl", choices=["xla", "pallas"], default="xla",
                   help="node-shard halo transport (lax.all_to_all vs "
                        "remote-DMA Pallas kernel)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler (XLA/xprof) trace of the "
                        "training run into this directory")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the JAX multi-host runtime "
                        "(jax.distributed) before building the mesh")
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args(argv)
    import re

    if not re.fullmatch(r"uniform|truncate|block([1-9]\d*)?",
                        args.sample_mode):
        p.error(f"invalid --sample_mode {args.sample_mode!r} "
                f"(uniform | block | blockN | truncate)")
    if args.cache_layer1 and not args.sample_fanouts:
        p.error("--cache_layer1 needs --sample_fanouts (it is a sampled-"
                "trainer mode)")
    return args


def _load_graphs(args):
    """(train_graph, full_graph, train_edges, val_edges, model dims)."""
    from primekg_rgcn_tpu.data import artifacts
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import (
        bidirect,
        primekg_like,
        synthetic_mappings,
    )

    log = logging.getLogger("train")
    if args.synthetic:
        raw = primekg_like(seed=args.seed, scale=args.synthetic_scale)
        n, r = raw["num_nodes"], raw["num_relations"]
        # Hold out drug-gene rows as val/test BEFORE bidirecting, mirroring
        # the reference's protocol (reference: src/preprocess.py:265-345
        # splits undirected rows, then each split emits fwd+rev edges).
        # Splitting after bidirect would leave the reverse copy of every
        # held-out edge in the training set — with DistMult's head/tail
        # symmetry that trains directly on the test positives.
        dg_rows = np.flatnonzero(raw["rel"] == 0)
        rng = np.random.default_rng(args.seed)
        heldout = rng.choice(dg_rows, size=max(2 * (len(dg_rows) // 7), 2),
                             replace=False)
        val_rows = heldout[: len(heldout) // 2]
        test_rows = heldout[len(heldout) // 2:]
        mask = np.ones(len(raw["src"]), bool)
        mask[heldout] = False

        def _bid(rows_mask_or_idx):
            s, d, rr = (raw["src"][rows_mask_or_idx],
                        raw["dst"][rows_mask_or_idx],
                        raw["rel"][rows_mask_or_idx])
            bs, bd, br = bidirect(s, d, rr)
            return np.stack([bs, bd, br], 1)

        train_edges = _bid(mask)
        val_edges = _bid(val_rows)
        test_edges = _bid(test_rows)
        src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
        train_graph = build_rel_graph(train_edges[:, 0], train_edges[:, 1],
                                      train_edges[:, 2], n, r)
        full_graph = build_rel_graph(src, dst, rel, n, r)
        log.info("Synthetic graph: %d nodes, %d train edges", n,
                 len(train_edges))

        # Persist reference-format splits so evaluate/analyze CLIs work on
        # the synthetic run (the reference repo ships no train artifacts).
        out = Path(args.output_dir) / "synthetic_data"
        out.mkdir(parents=True, exist_ok=True)

        def _save(name, e):
            artifacts.save_split_npz(out / f"{name}.npz", {
                "edge_index": e[:, :2].T, "edge_type": e[:, 2],
                "num_nodes": n, "num_relations": r})

        _save("train_data", train_edges)
        _save("val_data", val_edges)
        _save("test_data", test_edges)
        _save("full_graph", np.stack([src, dst, rel], 1))
        artifacts.save_mappings(out / "mappings.json",
                                synthetic_mappings(raw))
        log.info("Saved synthetic splits to %s", out)
        return train_graph, full_graph, train_edges, val_edges, n, r

    ds = artifacts.load_dataset(args.data_dir)
    train, val, full = ds["train"], ds["val"], ds["full"]
    if full is None:
        full = train
    train_edges = artifacts.split_to_edges(train)
    val_edges = artifacts.split_to_edges(val) if val else train_edges[:1024]
    train_graph = artifacts.split_to_rel_graph(train)
    full_graph = artifacts.split_to_rel_graph(full)
    log.info("Loaded %s: %d nodes, %d train / %d val edges", args.data_dir,
             train["num_nodes"], len(train_edges), len(val_edges))
    return (train_graph, full_graph, train_edges, val_edges,
            train["num_nodes"], train["num_relations"])


def _run_training(trainer, args):
    """train() under the optional profiler scope (one wrapper for every
    trainer path)."""
    from primekg_rgcn_tpu.utils.telemetry import profile_trace

    with profile_trace(args.profile_dir, enabled=bool(args.profile_dir)):
        trainer.train()


def main(argv=None):
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    args = parse_args(argv)
    if args.distributed:
        # MUST run before anything touches jax (graph building already
        # materializes jnp arrays, which initializes the XLA backend and
        # makes a later jax.distributed.initialize a silent no-op — each
        # process would then train an INDEPENDENT local-mesh run).
        from primekg_rgcn_tpu.train.multichip import (
            maybe_initialize_distributed,
        )

        ok = maybe_initialize_distributed(args.coordinator_address,
                                          args.num_processes,
                                          args.process_id)
        if not ok and (args.num_processes or 0) > 1:
            raise RuntimeError(
                "--distributed with --num_processes > 1 did not yield a "
                "multi-process runtime")
    if args.checkpoint_dir is not None:
        logging.getLogger("train").warning(
            "--checkpoint_dir is deprecated; use --output_dir")
        args.output_dir = args.checkpoint_dir

    # training.log is rank-0-only in multi-process runs (concurrent
    # appends from several ranks interleave torn lines).
    import jax as _jax

    handlers = [logging.StreamHandler(sys.stdout)]
    if _jax.process_index() == 0:
        handlers.insert(0, logging.FileHandler("training.log"))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=handlers)

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.train.loop import Trainer

    (train_graph, full_graph, train_edges, val_edges,
     num_nodes, num_relations) = _load_graphs(args)

    model_cfg = ModelConfig(
        num_nodes=num_nodes, num_relations=num_relations,
        embedding_dim=args.embedding_dim, hidden_dim=args.hidden_dim,
        dropout=args.dropout, decoder_dropout=args.decoder_dropout,
        num_bases=args.num_bases, compute_dtype=args.compute_dtype)
    train_cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, optimizer=args.optimizer,
        num_neg_samples=args.num_neg_samples, grad_clip=args.grad_clip,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        save_every=args.save_every, early_stopping=args.early_stopping,
        seed=args.seed, impl=args.impl, steps_per_scan=args.steps_per_scan)

    import functools
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    layer_fn = functools.partial(rgcn_layer_segment, impl=args.impl)

    if args.sample_fanouts:
        from primekg_rgcn_tpu.train.sampled import SampledTrainer

        # Sampled multi-chip is data-parallel: any --shard layout request
        # splits the seed batch (and thus the frontier) across the mesh.
        sample_ndev = None
        if args.shard != "none":
            import jax as _jax

            sample_ndev = args.n_devices or len(_jax.devices())
        trainer = SampledTrainer(model_cfg, train_cfg, train_graph,
                                 full_graph, train_edges, val_edges,
                                 args.output_dir,
                                 fanouts=tuple(args.sample_fanouts),
                                 mode=args.sample_mode,
                                 n_devices=sample_ndev, zero1=args.zero1,
                                 zero3=args.zero3, dp_pods=args.dp_pods,
                                 sparse_emb=args.sparse_emb,
                                 val_sampled=args.val_sampled,
                                 table_opt=args.table_opt,
                                 cache_layer1=args.cache_layer1)
        if args.resume:
            trainer.resume(args.resume)
        _run_training(trainer, args)
        logging.getLogger("train").info("Training completed successfully!")
        return

    if args.shard != "none":
        from primekg_rgcn_tpu.train.multichip import ShardedTrainer

        trainer = ShardedTrainer(
            model_cfg, train_cfg, train_graph, full_graph, train_edges,
            val_edges, args.output_dir, shard=args.shard,
            n_devices=args.n_devices or None, halo_impl=args.halo_impl,
            agg_impl=args.impl, layer_fn=layer_fn)
    else:
        trainer = Trainer(model_cfg, train_cfg, train_graph, full_graph,
                          train_edges, val_edges, args.output_dir,
                          layer_fn=layer_fn)
    if args.resume:
        trainer.resume(args.resume)
    _run_training(trainer, args)
    logging.getLogger("train").info("Training completed successfully!")


if __name__ == "__main__":
    main()
