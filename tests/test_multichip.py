"""Multi-chip training as a CLI-reachable capability (simulated 8-CPU mesh):
ShardedTrainer epochs for both layouts, CLI smoke for --shard, and a
loss-curve comparison against the single-device Trainer."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


def _tiny_setup(seed=0):
    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like

    raw = primekg_like(seed=seed, scale=0.02)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3,
                            bucket_pad_multiple=64)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    mcfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3,
                       embedding_dim=16, hidden_dim=16, dropout=0.0)
    tcfg = TrainConfig(epochs=3, batch_size=64, lr=1e-2, seed=seed,
                       save_every=100)
    return graph, edges, mcfg, tcfg


@pytest.mark.parametrize("shard", ["edge", "node"])
def test_sharded_trainer_trains_and_checkpoints(tmp_path, shard):
    from primekg_rgcn_tpu.train.multichip import ShardedTrainer

    graph, edges, mcfg, tcfg = _tiny_setup()
    out = tmp_path / shard
    trainer = ShardedTrainer(mcfg, tcfg, graph, graph, edges, edges[:64],
                             str(out), shard=shard)
    result = trainer.train()
    losses = result["history"]["train_losses"]
    assert len(losses) == 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert (out / "models" / "final_model.msgpack").exists()
    assert (out / "metrics.jsonl").exists()


def test_sharded_loss_curve_matches_single_device(tmp_path):
    """Edge-sharded multi-chip training must follow the single-device loss
    curve (same model/data; negative streams differ per device, so the
    comparison is tolerance-based, not bit-exact)."""
    from primekg_rgcn_tpu.train.loop import Trainer
    from primekg_rgcn_tpu.train.multichip import ShardedTrainer

    graph, edges, mcfg, tcfg = _tiny_setup(seed=1)
    t1 = Trainer(mcfg, tcfg, graph, graph, edges, edges[:64],
                 str(tmp_path / "single"))
    r1 = t1.train()
    t2 = ShardedTrainer(mcfg, tcfg, graph, graph, edges, edges[:64],
                        str(tmp_path / "sharded"), shard="edge")
    r2 = t2.train()
    l1 = np.asarray(r1["history"]["train_losses"])
    l2 = np.asarray(r2["history"]["train_losses"])
    assert np.all(np.abs(l1 - l2) < 0.08), (l1, l2)


def test_cli_shard_edge(tmp_path):
    from primekg_rgcn_tpu.train.cli import main as train_main

    out = tmp_path / "out"
    train_main(["--synthetic", "--synthetic_scale", "0.02",
                "--epochs", "2", "--batch_size", "64",
                "--embedding_dim", "8", "--hidden_dim", "8",
                "--shard", "edge", "--output_dir", str(out),
                "--save_every", "1"])
    assert (out / "models" / "final_model.msgpack").exists()
    meta = json.loads(
        (out / "models" / "final_model.json").read_text())
    assert meta["epoch"] == 2
    lines = [json.loads(x) for x in
             (out / "metrics.jsonl").read_text().splitlines()]
    assert sum(1 for x in lines if x.get("event") == "epoch") == 2


@pytest.mark.parametrize("table_opt", ["sgd", "adafactor"])
def test_pod_scale_zero3_smoke(tmp_path, table_opt):
    """Scaled-down run of the config-5 zero3 harness (both table rules):
    the full-scale capability rows in bench_report.json ride this exact
    code path, so it must stay runnable end-to-end."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from primekg_rgcn_tpu.bench.pod_scale import run_pod_scale_zero3

    report = run_pod_scale_zero3(20_000, 120_000, 10, n_devices=8,
                                 batch_size=64, table_opt=table_opt,
                                 fanouts=(5, 4))
    assert np.isfinite(report["loss"])
    assert report["mode"] == f"sampled-zero3-{'adafactor' if table_opt == 'adafactor' else 'adam'}"
    assert report["zero3_comms_model"]["frontier_cap"] > 0
