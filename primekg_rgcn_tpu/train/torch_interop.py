"""Torch checkpoint interop.

Users migrating from the reference keep their trained ``.pt`` checkpoints
(torch pickles of DrugDiseaseModel state dicts, reference:
src/train.py:418-462). This module maps those to/from this framework's
parameter pytree so every evaluation and analysis tool here runs on
reference-trained models — and models trained here export back into the
reference's loaders (reference: src/evaluate.py:655-730 rebuilds the
architecture from the stored argparse namespace + state-dict shapes).

State-dict layout (PyG RGCNConv internals, verified against the parameter
count decomposition in SURVEY.md §2.1/C7):
    encoder.node_embeddings.weight   [N, d_emb]
    encoder.conv{1,2}.weight         [R, Din, Dout]   (or [B, Din, Dout] with
    encoder.conv{1,2}.comp           [R, B]            basis decomposition)
    encoder.conv{1,2}.root           [Din, Dout]
    encoder.conv{1,2}.bias           [Dout]
    decoder.relation_embeddings.weight [R, d_h]

Both directions use x @ W conventions, so tensors map without transposition.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from primekg_rgcn_tpu.config import ModelConfig


def _conv_from_state(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    import jax.numpy as jnp

    def get(name):
        return jnp.asarray(np.asarray(sd[f"{prefix}.{name}"].cpu()
                                      if hasattr(sd[f"{prefix}.{name}"], "cpu")
                                      else sd[f"{prefix}.{name}"]))

    conv: Dict[str, Any] = {"w_root": get("root"), "bias": get("bias")}
    if f"{prefix}.comp" in sd:
        conv["basis"] = get("weight")
        conv["coef"] = get("comp")
    else:
        conv["w_rel"] = get("weight")
    return conv


def import_torch_checkpoint(path) -> Tuple[Dict[str, Any], ModelConfig,
                                           Dict[str, Any]]:
    """Load a reference checkpoint ``.pt`` -> (params, ModelConfig, meta).

    Accepts both full trainer checkpoints ({'model_state_dict': ...,
    'args': ...}) and bare state dicts.
    """
    import jax.numpy as jnp
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        meta = {k: v for k, v in blob.items() if k != "model_state_dict"}
    else:
        sd, meta = blob, {}

    node_emb = jnp.asarray(np.asarray(
        sd["encoder.node_embeddings.weight"].cpu()))
    rel_emb = jnp.asarray(np.asarray(
        sd["decoder.relation_embeddings.weight"].cpu()))
    params = {
        "encoder": {
            "node_emb": node_emb,
            "conv1": _conv_from_state(sd, "encoder.conv1"),
            "conv2": _conv_from_state(sd, "encoder.conv2"),
        },
        "decoder": {"rel_emb": rel_emb},
    }

    num_nodes, embedding_dim = node_emb.shape
    num_relations, hidden_dim = rel_emb.shape
    num_bases: Optional[int] = None
    if "basis" in params["encoder"]["conv1"]:
        num_bases = int(params["encoder"]["conv1"]["basis"].shape[0])

    args = meta.get("args")
    dropout = getattr(args, "dropout", 0.5) if args is not None else 0.5
    decoder_dropout = (getattr(args, "decoder_dropout", 0.0)
                       if args is not None else 0.0)
    cfg = ModelConfig(
        num_nodes=int(num_nodes), num_relations=int(num_relations),
        embedding_dim=int(embedding_dim), hidden_dim=int(hidden_dim),
        dropout=float(dropout), decoder_dropout=float(decoder_dropout),
        num_bases=num_bases)
    # The argparse namespace is not JSON-safe; keep scalars only.
    meta_out = {k: v for k, v in meta.items()
                if isinstance(v, (int, float, str, bool))}
    return params, cfg, meta_out


def export_torch_checkpoint(params: Dict[str, Any], cfg: ModelConfig, path,
                            meta: Optional[Dict[str, Any]] = None) -> None:
    """Write params as a reference-loadable torch checkpoint."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x).copy())

    enc = params["encoder"]
    sd: Dict[str, Any] = {
        "encoder.node_embeddings.weight": t(enc["node_emb"]),
        "decoder.relation_embeddings.weight": t(params["decoder"]["rel_emb"]),
    }
    for name, conv in [("conv1", enc["conv1"]), ("conv2", enc["conv2"])]:
        sd[f"encoder.{name}.root"] = t(conv["w_root"])
        sd[f"encoder.{name}.bias"] = t(conv["bias"])
        if "w_rel" in conv:
            sd[f"encoder.{name}.weight"] = t(conv["w_rel"])
        else:
            sd[f"encoder.{name}.weight"] = t(conv["basis"])
            sd[f"encoder.{name}.comp"] = t(conv["coef"])

    import argparse

    args = argparse.Namespace(
        embedding_dim=cfg.embedding_dim, hidden_dim=cfg.hidden_dim,
        dropout=cfg.dropout, decoder_dropout=cfg.decoder_dropout,
        num_bases=cfg.num_bases)
    torch.save({"model_state_dict": sd, "args": args,
                **(meta or {})}, path)


def main(argv=None):
    """CLI: convert checkpoints between formats.

    python -m primekg_rgcn_tpu.train.torch_interop import  ref.pt  out_ckpt
    python -m primekg_rgcn_tpu.train.torch_interop export  ckpt    out.pt
    """
    import argparse

    p = argparse.ArgumentParser(description="Torch checkpoint interop")
    p.add_argument("mode", choices=["import", "export"])
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args(argv)

    if args.mode == "import":
        import jax
        import jax.numpy as jnp

        from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
        from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer
        from primekg_rgcn_tpu.config import TrainConfig

        params, cfg, meta = import_torch_checkpoint(args.src)
        opt = make_optimizer(TrainConfig())
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        ckpt_lib.save(args.dst, {
            "state": state,
            "epoch": meta.get("epoch", 0),
            "best_val_loss": meta.get("best_val_loss", float("inf")),
            "best_val_acc": meta.get("best_val_acc", 0.0),
            "history": {"train_losses": [], "val_losses": [],
                        "train_accs": [], "val_accs": []},
            "model_config": cfg.to_dict(),
            "train_config": TrainConfig().to_dict(),
        })
        print(f"imported {args.src} -> {args.dst} "
              f"({cfg.num_nodes} nodes, {cfg.num_relations} relations)")
    else:
        from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
        from primekg_rgcn_tpu.config import ModelConfig

        payload = ckpt_lib.load(args.src)
        cfg = ModelConfig.from_dict(payload["model_config"])
        export_torch_checkpoint(
            payload["state"].params, cfg, args.dst,
            {"epoch": payload.get("epoch", 0)})
        print(f"exported {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
