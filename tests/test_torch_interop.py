"""Torch checkpoint interop: round-trips and reference-shape compatibility."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from primekg_rgcn_tpu.config import ModelConfig  # noqa: E402
from primekg_rgcn_tpu.models.rgcn import count_params, init_params  # noqa: E402
from primekg_rgcn_tpu.train.torch_interop import (  # noqa: E402
    export_torch_checkpoint,
    import_torch_checkpoint,
)


def _reference_style_checkpoint(path, num_bases=None):
    """Fabricate a checkpoint with the reference's exact state-dict layout
    (names and shapes per SURVEY.md §2.1/C7)."""
    import argparse

    n, r, de, dh, b = 50, 3, 8, 16, num_bases
    g = torch.Generator().manual_seed(0)
    sd = {
        "encoder.node_embeddings.weight": torch.randn(n, de, generator=g),
        "decoder.relation_embeddings.weight": torch.randn(r, dh, generator=g),
    }
    for name, din, dout in [("conv1", de, dh), ("conv2", dh, dh)]:
        if b is None:
            sd[f"encoder.{name}.weight"] = torch.randn(r, din, dout,
                                                       generator=g)
        else:
            sd[f"encoder.{name}.weight"] = torch.randn(b, din, dout,
                                                       generator=g)
            sd[f"encoder.{name}.comp"] = torch.randn(r, b, generator=g)
        sd[f"encoder.{name}.root"] = torch.randn(din, dout, generator=g)
        sd[f"encoder.{name}.bias"] = torch.randn(dout, generator=g)
    args = argparse.Namespace(embedding_dim=de, hidden_dim=dh, dropout=0.4,
                              decoder_dropout=0.1, num_bases=b)
    torch.save({"model_state_dict": sd, "args": args, "epoch": 7,
                "best_val_loss": 0.5, "best_val_acc": 0.9}, path)
    return sd


@pytest.mark.parametrize("num_bases", [None, 2])
def test_import_reference_checkpoint(tmp_path, num_bases):
    path = tmp_path / "ref.pt"
    sd = _reference_style_checkpoint(path, num_bases)
    params, cfg, meta = import_torch_checkpoint(path)

    assert cfg.num_nodes == 50 and cfg.num_relations == 3
    assert cfg.embedding_dim == 8 and cfg.hidden_dim == 16
    assert cfg.dropout == pytest.approx(0.4)
    assert cfg.num_bases == num_bases
    assert meta["epoch"] == 7
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["node_emb"]),
        sd["encoder.node_embeddings.weight"].numpy())
    key = "basis" if num_bases else "w_rel"
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["conv1"][key]),
        sd["encoder.conv1.weight"].numpy())

    # The imported model must run.
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.models.rgcn import encoder_apply

    rng = np.random.default_rng(0)
    graph = build_rel_graph(rng.integers(0, 50, 300),
                            rng.integers(0, 50, 300),
                            rng.integers(0, 3, 300), 50, 3,
                            bucket_pad_multiple=64)
    emb = encoder_apply(params, graph, cfg)
    assert emb.shape == (50, 16)


def test_export_import_round_trip(tmp_path):
    cfg = ModelConfig(num_nodes=40, num_relations=3, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "export.pt"
    export_torch_checkpoint(params, cfg, path, {"epoch": 3})

    params2, cfg2, meta = import_torch_checkpoint(path)
    assert cfg2.num_nodes == cfg.num_nodes
    assert meta["epoch"] == 3
    assert count_params(params2) == count_params(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_interop_cli(tmp_path):
    from primekg_rgcn_tpu.train.torch_interop import main as interop_main
    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib

    ref = tmp_path / "ref.pt"
    _reference_style_checkpoint(ref)
    interop_main(["import", str(ref), str(tmp_path / "native")])
    payload = ckpt_lib.load(tmp_path / "native")
    assert payload["epoch"] == 7

    interop_main(["export", str(tmp_path / "native"),
                  str(tmp_path / "back.pt")])
    blob = torch.load(tmp_path / "back.pt", weights_only=False)
    assert "encoder.conv1.weight" in blob["model_state_dict"]
    assert blob["args"].hidden_dim == 16


def test_ckpt_load_auto_detects_torch_pt(tmp_path):
    """ckpt.load on a reference .pt routes through torch_interop in one step
    (reference evaluator rebuilds straight from the .pt,
    reference: src/evaluate.py:655-730)."""
    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib

    path = tmp_path / "best_model.pt"
    sd = _reference_style_checkpoint(path)
    payload = ckpt_lib.load(path)
    assert payload["epoch"] == 7
    cfg_d = payload["model_config"]
    assert cfg_d["num_nodes"] == 50 and cfg_d["hidden_dim"] == 16
    np.testing.assert_allclose(
        np.asarray(payload["state"].params["encoder"]["node_emb"]),
        sd["encoder.node_embeddings.weight"].numpy())
