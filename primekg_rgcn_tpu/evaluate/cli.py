"""Evaluation CLI producing the reference's results contract.

Usage parity with ``python src/evaluate.py`` (reference:
src/evaluate.py:778-837):
    python -m primekg_rgcn_tpu.evaluate.cli --model_path output/models/best_model \
        --data_dir data/processed --output_dir results --k_values 10 50 100

Outputs results.json, metrics_summary.txt and the four evaluation PNGs into
--output_dir (reference: src/evaluate.py:595-652 and ResultsVisualizer).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Evaluate trained RGCN model for link prediction")
    p.add_argument("--model_path", required=True)
    p.add_argument("--data_dir", default="data/processed")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--num_neg_samples", type=int, default=1)
    p.add_argument("--k_values", type=int, nargs="+", default=[10, 50])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--impl", choices=["auto", "xla", "pallas"], default="auto")
    p.add_argument("--shard", choices=["none", "node"], default="none",
                   help="node: fully-sharded evaluation over the mesh — "
                        "node-partitioned encode feeds device-major "
                        "rank/score kernels; no device materializes the "
                        "[N, D] table (for graphs that exceed one chip)")
    p.add_argument("--rank_direction", choices=["tail", "both"],
                   default="tail",
                   help="both: also rank HEADS given (r, t) and report "
                        "head / head+tail-averaged blocks (the common KG "
                        "convention; the reference ranks tails only)")
    p.add_argument("--filtered", action="store_true",
                   help="also report FILTERED ranking metrics (known true "
                        "tails of (h, r) across all splits removed from "
                        "the candidate set — the standard KG protocol; "
                        "the reference reports raw ranks only)")
    args = p.parse_args(argv)
    if args.filtered and args.shard == "node":
        # Fail fast: the filtered adjustment gathers from the dense
        # ranker's own [B, N] score rows, which the fully-sharded path
        # never materializes. Without this check the incompatibility only
        # surfaced after the full node-sharded encode had already run.
        p.error("--filtered needs the dense evaluator (--shard none): "
                "the exact-tie filter gather reads the ranker's own score "
                "rows, which the fully-sharded path never materializes")
    return args


def main(argv=None):
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    args = parse_args(argv)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler(out_dir / "evaluation.log"),
                  logging.StreamHandler(sys.stdout)])
    log = logging.getLogger("evaluate")

    import functools

    import numpy as np

    from primekg_rgcn_tpu.config import EvalConfig
    from primekg_rgcn_tpu.data import artifacts
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator, save_results
    from primekg_rgcn_tpu.evaluate.visualize import ResultsVisualizer
    from primekg_rgcn_tpu.models.rgcn import count_params
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
    from primekg_rgcn_tpu.train import checkpoint as ckpt

    payload = ckpt.load(args.model_path)
    params = payload["state"].params
    from primekg_rgcn_tpu.config import ModelConfig

    model_cfg = ModelConfig.from_dict(payload["model_config"])
    log.info("Loaded checkpoint (epoch %s, %s params)", payload.get("epoch"),
             count_params(params))

    ds = artifacts.load_dataset(args.data_dir, require_train=False)
    test = ds["test"]
    if test is None:
        raise FileNotFoundError(f"no test split in {args.data_dir}")
    full = ds["full"] or ds["train"] or test
    test_edges = artifacts.split_to_edges(test)
    full_graph = artifacts.split_to_rel_graph(full)
    log.info("Test edges: %d over %d nodes", len(test_edges),
             full_graph.num_nodes)

    layer_fn = functools.partial(rgcn_layer_segment, impl=args.impl)
    evaluator = Evaluator(
        params, model_cfg, full_graph, test_edges,
        EvalConfig(batch_size=args.batch_size,
                   num_neg_samples=args.num_neg_samples,
                   k_values=tuple(args.k_values), seed=args.seed),
        layer_fn=layer_fn, shard_encode=args.shard)
    known = None
    if args.filtered:
        # Filter set = union of true triples across every available split
        # (the 'full' artifact IS that union when present).
        if ds["full"] is not None:
            known = artifacts.split_to_edges(ds["full"])
        else:
            parts = [artifacts.split_to_edges(ds[k])
                     for k in ("train", "val", "test") if ds.get(k)]
            known = np.concatenate(parts) if parts else test_edges
        log.info("Filtered ranking over %d known triples", len(known))
    metrics = evaluator.evaluate(known_triples=known,
                                 rank_direction=args.rank_direction)

    model_info = {
        "checkpoint_path": str(args.model_path),
        "epoch": payload.get("epoch"),
        "num_nodes": model_cfg.num_nodes,
        "num_relations": model_cfg.num_relations,
        "embedding_dim": model_cfg.embedding_dim,
        "hidden_dim": model_cfg.hidden_dim,
        "num_parameters": count_params(params),
        "best_val_loss": payload.get("best_val_loss"),
        "best_val_acc": payload.get("best_val_acc"),
    }
    save_results(metrics, out_dir, model_info)

    viz = ResultsVisualizer(evaluator.scores, evaluator.labels, out_dir)
    viz.generate_all_plots()
    log.info("Evaluation complete: AUC-ROC %.4f, MRR %.4f",
             metrics["classification"]["auc_roc"], metrics["ranking"]["mrr"])
    return metrics


if __name__ == "__main__":
    main()
