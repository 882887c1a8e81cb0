"""End-to-end CLI pipeline test: preprocess -> train -> evaluate, exercising
the reference's three-stage workflow (reference: README quickstart) on a tiny
synthetic kg.csv entirely in-process."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Generate a small but connected kg.csv and preprocess it."""
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    n_drug, n_gene, n_dis = 20, 40, 10
    rows = []
    for _ in range(300):
        d, g = rng.integers(n_drug), rng.integers(n_gene)
        rows.append(("drug_protein", f"DB{d}", "drug", f"drug{d}",
                     f"P{g}", "gene/protein", f"gene{g}"))
    for _ in range(200):
        a, b = rng.integers(n_gene), rng.integers(n_gene)
        rows.append(("protein_protein", f"P{a}", "gene/protein", f"gene{a}",
                     f"P{b}", "gene/protein", f"gene{b}"))
    for _ in range(100):
        s, g = rng.integers(n_dis), rng.integers(n_gene)
        rows.append(("disease_protein", f"D{s}", "disease", f"dis{s}",
                     f"P{g}", "gene/protein", f"gene{g}"))
    pd.DataFrame(rows, columns=["relation", "x_id", "x_type", "x_name",
                                "y_id", "y_type", "y_name"]).to_csv(
        tmp / "kg.csv", index=False)

    from primekg_rgcn_tpu.data.preprocess import main as preprocess_main

    preprocess_main(["--raw-data", str(tmp / "kg.csv"),
                     "--processed-dir", str(tmp / "processed"),
                     "--no-torch"])
    return tmp


def test_train_then_evaluate_cli(tiny_dataset):
    from primekg_rgcn_tpu.train.cli import main as train_main
    from primekg_rgcn_tpu.evaluate.cli import main as eval_main

    out = tiny_dataset / "output"
    train_main(["--data_dir", str(tiny_dataset / "processed"),
                "--output_dir", str(out),
                "--epochs", "2", "--batch_size", "256",
                "--embedding_dim", "8", "--hidden_dim", "8",
                "--save_every", "1"])
    assert (out / "models" / "final_model.msgpack").exists()

    results_dir = tiny_dataset / "results"
    metrics = eval_main(["--model_path", str(out / "models" / "best_model"),
                         "--data_dir", str(tiny_dataset / "processed"),
                         "--output_dir", str(results_dir),
                         "--k_values", "10", "50",
                         "--batch_size", "64"])

    with open(results_dir / "results.json") as f:
        saved = json.load(f)
    # Schema parity with the reference results.json
    # (reference: results/results.json).
    assert set(saved) == {"metrics", "model_info"}
    cls = saved["metrics"]["classification"]
    assert {"auc_roc", "auc_pr", "precision", "recall", "f1_score",
            "threshold"} <= set(cls)
    rnk = saved["metrics"]["ranking"]
    assert {"mrr", "mean_rank", "median_rank", "hits@10", "hits@50"} <= set(rnk)
    assert saved["model_info"]["num_parameters"] > 0

    for png in ["confusion_matrix.png", "roc_curve.png",
                "precision_recall_curve.png", "score_distribution.png"]:
        assert (results_dir / png).exists()
    assert (results_dir / "metrics_summary.txt").exists()

    # Extensions: --filtered + --rank_direction both add their blocks
    # (and only then — the default contract above has exactly the
    # reference's keys).
    assert "ranking_filtered" not in saved["metrics"]
    filt_dir = tiny_dataset / "results_filtered"
    m2 = eval_main(["--model_path", str(out / "models" / "best_model"),
                    "--data_dir", str(tiny_dataset / "processed"),
                    "--output_dir", str(filt_dir),
                    "--batch_size", "64",
                    "--filtered", "--rank_direction", "both"])
    for key in ("ranking_filtered", "ranking_head", "ranking_both",
                "ranking_filtered_head", "ranking_filtered_both"):
        assert key in m2, key
    assert m2["ranking_filtered"]["mrr"] >= m2["ranking"]["mrr"] - 1e-12
    summary = (filt_dir / "metrics_summary.txt").read_text()
    assert "Filtered Ranking Metrics" in summary


def test_train_resume_cli(tiny_dataset):
    from primekg_rgcn_tpu.train.cli import main as train_main

    out = tiny_dataset / "output_resume"
    train_main(["--data_dir", str(tiny_dataset / "processed"),
                "--output_dir", str(out), "--epochs", "1",
                "--batch_size", "256", "--embedding_dim", "8",
                "--hidden_dim", "8"])
    # Resume from the final model and continue to epoch 2.
    train_main(["--data_dir", str(tiny_dataset / "processed"),
                "--output_dir", str(out), "--epochs", "2",
                "--batch_size", "256", "--embedding_dim", "8",
                "--hidden_dim", "8",
                "--resume", str(out / "models" / "final_model")])
    from primekg_rgcn_tpu.train import checkpoint as ckpt

    payload = ckpt.load(out / "models" / "final_model")
    assert payload["epoch"] == 2
    assert len(payload["history"]["train_losses"]) == 2


def test_synthetic_training_cli(tmp_path):
    from primekg_rgcn_tpu.train.cli import main as train_main
    from primekg_rgcn_tpu.data import artifacts

    out = tmp_path / "out"
    train_main(["--synthetic", "--synthetic_scale", "0.01",
                "--output_dir", str(out), "--epochs", "1",
                "--batch_size", "512", "--embedding_dim", "8",
                "--hidden_dim", "8"])
    assert (out / "models" / "final_model.msgpack").exists()

    # The synthetic data dir must be a complete reference-format dataset,
    # including mappings the analysis suite can consume.
    ds = artifacts.load_dataset(out / "synthetic_data")
    # Leakage regression: no held-out edge may appear in train in EITHER
    # direction (DistMult is head/tail symmetric, so a reverse copy in train
    # means training on the test positives).
    train_set = {(int(h), int(t))
                 for h, t in artifacts.split_to_edges(ds["train"])[:, :2]}
    for h, t, _ in artifacts.split_to_edges(ds["test"]):
        assert (int(h), int(t)) not in train_set
        assert (int(t), int(h)) not in train_set
    assert ds["mappings"] is not None
    m = ds["mappings"]
    types = {t for (_, _, t) in m["idx2node"].values()}
    assert types == {"drug", "disease", "gene/protein"}
    assert m["relation2idx"] == {"drug-gene": 0, "gene-disease": 1,
                                 "gene-gene": 2}
    assert len(m["idx2node"]) == ds["train"]["num_nodes"]


def test_sampled_training_cli(tiny_dataset):
    from primekg_rgcn_tpu.train.cli import main as train_main
    from primekg_rgcn_tpu.train import checkpoint as ckpt

    out = tiny_dataset / "output_sampled"
    train_main(["--data_dir", str(tiny_dataset / "processed"),
                "--output_dir", str(out), "--epochs", "2",
                "--batch_size", "128", "--embedding_dim", "8",
                "--hidden_dim", "8", "--sample_fanouts", "4", "3"])
    payload = ckpt.load(out / "models" / "final_model")
    assert payload["epoch"] == 2
    assert len(payload["history"]["train_losses"]) == 2


def test_predict_cli_dense_equals_sharded(tiny_dataset, tmp_path):
    """Top-K prediction CLI: dense vs fully-sharded paths return the same
    tails, names resolved from mappings."""
    import json

    from primekg_rgcn_tpu.evaluate.predict_cli import main as predict_main

    ckpt = tiny_dataset / "output" / "models" / "best_model"
    if not ckpt.with_suffix(".msgpack").exists():
        pytest.skip("training test must run first (module-ordered)")
    common = ["--model_path", str(ckpt),
              "--data_dir", str(tiny_dataset / "processed"),
              "--heads", "0", "5", "--relation", "0", "--topk", "4"]
    dense = predict_main(common + ["--output",
                                   str(tmp_path / "dense.json")])
    shard = predict_main(common + ["--shard", "node", "--output",
                                   str(tmp_path / "shard.json")])
    for a, b in zip(dense, shard):
        assert [r["tail_id"] for r in a["predictions"]] == \
            [r["tail_id"] for r in b["predictions"]]
    saved = json.loads((tmp_path / "dense.json").read_text())
    assert saved[0]["predictions"][0]["tail_name"]  # names resolved


def test_export_serving_artifact(tiny_dataset, tmp_path):
    """predict_cli --export writes a self-contained StableHLO artifact;
    load_predictor replays it with exact parity to the live CLI scores."""
    import json

    from primekg_rgcn_tpu.evaluate.export import load_predictor
    from primekg_rgcn_tpu.evaluate.predict_cli import main as predict_main

    ckpt = tiny_dataset / "output" / "models" / "best_model"
    if not ckpt.with_suffix(".msgpack").exists():
        pytest.skip("training test must run first (module-ordered)")
    art = tmp_path / "model.stablehlo"
    live = predict_main(["--model_path", str(ckpt),
                         "--data_dir", str(tiny_dataset / "processed"),
                         "--heads", "0", "5", "--relation", "0",
                         "--topk", "4", "--export", str(art),
                         "--export_batch", "8"])
    assert art.exists() and art.stat().st_size > 1000

    predict = load_predictor(art)
    heads = np.array([0, 5, 0, 0, 0, 0, 0, 0], np.int32)
    rels = np.zeros(8, np.int32)
    scores, tails = predict(heads, rels)
    for qi, q in enumerate(live):
        assert list(tails[qi][:4]) == [r["tail_id"]
                                       for r in q["predictions"]]
        np.testing.assert_allclose(
            scores[qi][:4], [r["score"] for r in q["predictions"]],
            rtol=1e-5, atol=1e-6)


def test_sampled_training_cli_blockn_mode(tiny_dataset):
    """--sample_mode block2 trains end-to-end; malformed modes fail at
    argparse time."""
    import pytest

    from primekg_rgcn_tpu.train import checkpoint as ckpt
    from primekg_rgcn_tpu.train.cli import main as train_main, parse_args

    out = tiny_dataset / "output_block2"
    train_main(["--data_dir", str(tiny_dataset / "processed"),
                "--output_dir", str(out), "--epochs", "1",
                "--batch_size", "128", "--embedding_dim", "8",
                "--hidden_dim", "8", "--sample_fanouts", "4", "4",
                "--sample_mode", "block2"])
    payload = ckpt.load(out / "models" / "final_model")
    assert payload["epoch"] == 1
    with pytest.raises(SystemExit):
        parse_args(["--sample_mode", "blockx"])
    with pytest.raises(SystemExit):
        parse_args(["--sample_mode", "block0"])
