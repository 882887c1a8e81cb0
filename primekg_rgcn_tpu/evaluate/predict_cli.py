"""Top-K tail prediction CLI (serving entry point).

The reference exposes ``predict_all_tails`` as a model method only
(reference: src/models/rgcn.py:362-395); this CLI makes retrieval a
first-class surface: load a checkpoint, score every entity as tail for the
given (head, relation) queries, and return the K best — dense on one chip,
or fully sharded (``--shard node``: node-partitioned encode + distributed
top-K, no device ever holds the [N, D] table or a [B, N] score row).

    python -m primekg_rgcn_tpu.evaluate.predict_cli \
        --model_path output/models/best_model --data_dir data/processed \
        --heads 12 844 --relation 0 --topk 10 [--shard node] \
        [--output predictions.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Top-K tail prediction")
    p.add_argument("--model_path", required=True)
    p.add_argument("--data_dir", default="data/processed")
    p.add_argument("--heads", type=int, nargs="+", required=True,
                   help="head entity ids to query")
    p.add_argument("--relation", type=int, default=0)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--shard", choices=["none", "node"], default="none")
    p.add_argument("--impl", choices=["auto", "xla", "pallas"],
                   default="auto")
    p.add_argument("--output", default=None,
                   help="optional JSON file for the predictions")
    p.add_argument("--export", default=None,
                   help="ALSO write a self-contained AOT serving artifact "
                        "(jax.export StableHLO; frozen embeddings baked "
                        "in) to this path — load with "
                        "evaluate.export.load_predictor, no model code "
                        "needed")
    p.add_argument("--export_batch", type=int, default=32,
                   help="fixed query batch size of the exported program")
    return p.parse_args(argv)


def main(argv=None):
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(message)s",
                        handlers=[logging.StreamHandler(sys.stdout)])
    log = logging.getLogger("predict")

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu.config import ModelConfig
    from primekg_rgcn_tpu.data import artifacts
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
    from primekg_rgcn_tpu.train import checkpoint as ckpt

    payload = ckpt.load(args.model_path)
    params = payload["state"].params
    model_cfg = ModelConfig.from_dict(payload["model_config"])
    ds = artifacts.load_dataset(args.data_dir, require_train=False)
    full = ds["full"] or ds["train"] or ds["test"]
    if full is None:
        raise SystemExit(
            f"no graph artifacts (full_graph/train_data/test_data) found "
            f"under {args.data_dir}")
    graph = artifacts.split_to_rel_graph(full)
    n = graph.num_nodes
    for h in args.heads:
        if not 0 <= h < n:
            raise SystemExit(f"head id {h} out of range [0, {n})")
    if not 0 <= args.relation < graph.num_relations:
        raise SystemExit(f"relation {args.relation} out of range "
                         f"[0, {graph.num_relations})")

    names = None
    if ds.get("mappings"):
        names = {int(i): str(v[1])
                 for i, v in ds["mappings"]["idx2node"].items()}

    heads = jnp.asarray(args.heads, jnp.int32)
    rels = jnp.full((len(args.heads),), args.relation, jnp.int32)
    layer_fn = functools.partial(rgcn_layer_segment, impl=args.impl)

    if args.shard == "node" and len(jax.devices()) < 2:
        raise SystemExit(
            "--shard node needs a multi-device runtime — a silent dense "
            "fallback would materialize the [N, D] table and a [B, N] "
            "score row, exactly what this mode exists to avoid")
    if args.shard == "node":
        from primekg_rgcn_tpu.evaluate.sharded_ranking import (
            build_sharded_topk,
        )
        from primekg_rgcn_tpu.parallel.mesh import make_mesh
        from primekg_rgcn_tpu.parallel.node_shard import (
            build_node_sharded_forward,
            partition_nodes,
        )

        mesh = make_mesh(len(jax.devices()))
        nsg = partition_nodes(graph, mesh.devices.size)
        emb_dm = build_node_sharded_forward(mesh, nsg, model_cfg,
                                            gather=False)(params)
        topk = build_sharded_topk(mesh, emb_dm,
                                  params["decoder"]["rel_emb"], n,
                                  args.topk)
        scores, ids = topk(heads, rels)
    else:
        from primekg_rgcn_tpu.models.rgcn import predict_all_tails

        all_scores = predict_all_tails(params, graph, heads, rels,
                                       model_cfg, layer_fn=layer_fn)
        scores, ids = jax.lax.top_k(all_scores, args.topk)

    scores, ids = np.asarray(scores), np.asarray(ids)
    results = []
    for qi, h in enumerate(args.heads):
        rows = [{"tail_id": int(t), "score": float(s),
                 **({"tail_name": names.get(int(t), "")} if names else {})}
                for t, s in zip(ids[qi], scores[qi])]
        results.append({"head_id": int(h),
                        **({"head_name": names.get(int(h), "")}
                           if names else {}),
                        "relation": int(args.relation),
                        "predictions": rows})
        log.info("head %s -> top-%d tails: %s", h, args.topk,
                 ", ".join(f"{r['tail_id']}({r['score']:.3f})"
                           for r in rows[:5]))
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
        log.info("Wrote %s", args.output)
    if args.export:
        if args.shard == "node":
            raise SystemExit(
                "--export runs a dense full-graph encode at export time "
                "(the artifact freezes the [N, D] embeddings); it cannot "
                "be combined with --shard node, whose point is that the "
                "table does not fit one device")
        from primekg_rgcn_tpu.evaluate.export import export_topk_predictor

        out = export_topk_predictor(params, graph, model_cfg, args.export,
                                    batch_size=args.export_batch,
                                    topk=args.topk, layer_fn=layer_fn)
        log.info("Exported serving artifact: %s (%d bytes)", out,
                 out.stat().st_size)
    return results


if __name__ == "__main__":
    main()
