"""Analysis-suite tests: shared context, each tool (A1-A7), orchestrator —
run against a small trained model on a synthetic kg.csv dataset."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    """Preprocess a tiny kg.csv, train 2 epochs, return (model_path, data_dir)."""
    tmp = tmp_path_factory.mktemp("analyze")
    rng = np.random.default_rng(1)
    n_drug, n_gene, n_dis = 15, 30, 8
    rows = []
    for d in range(n_drug):          # every drug has targets
        for g in rng.choice(n_gene, 4, replace=False):
            rows.append(("drug_protein", f"DB{d}", "drug", f"drugname{d}",
                         f"P{g}", "gene/protein", f"genename{g}"))
    for _ in range(120):
        a, b = rng.integers(n_gene), rng.integers(n_gene)
        rows.append(("protein_protein", f"P{a}", "gene/protein",
                     f"genename{a}", f"P{b}", "gene/protein", f"genename{b}"))
    for s in range(n_dis):           # every disease has genes
        for g in rng.choice(n_gene, 3, replace=False):
            rows.append(("disease_protein", f"D{s}", "disease",
                         f"disease name {s}", f"P{g}", "gene/protein",
                         f"genename{g}"))
    pd.DataFrame(rows, columns=["relation", "x_id", "x_type", "x_name",
                                "y_id", "y_type", "y_name"]).to_csv(
        tmp / "kg.csv", index=False)

    from primekg_rgcn_tpu.data.preprocess import main as preprocess_main
    from primekg_rgcn_tpu.train.cli import main as train_main

    preprocess_main(["--raw-data", str(tmp / "kg.csv"),
                     "--processed-dir", str(tmp / "processed"), "--no-torch"])
    train_main(["--data_dir", str(tmp / "processed"),
                "--output_dir", str(tmp / "output"), "--epochs", "2",
                "--batch_size", "256", "--embedding_dim", "8",
                "--hidden_dim", "8"])
    return tmp / "output" / "models" / "best_model", tmp / "processed", tmp


@pytest.fixture(scope="module")
def ctx(trained_setup):
    from primekg_rgcn_tpu.analyze.core import AnalysisContext

    model_path, data_dir, _ = trained_setup
    return AnalysisContext(model_path, data_dir)


def test_context_basics(ctx):
    assert ctx.embeddings.shape[0] == ctx.full_graph.num_nodes
    assert len(ctx.drug_indices) == 15
    assert len(ctx.disease_indices) == 8
    assert len(ctx.gene_indices) == 30
    # fuzzy name lookup
    idx = ctx.find_node("disease name 3", "disease")
    assert idx is not None and ctx.node_names[idx] == "disease name 3"
    assert ctx.find_node("DISEASE NAME 3", "disease") == idx
    assert ctx.find_node("no such node", "disease") is None
    # cosine scores in [0, 1]
    s = ctx.cosine_score(int(ctx.drug_indices[0]), int(ctx.disease_indices[0]))
    assert 0.0 <= s <= 1.0
    preds = ctx.top_drugs_for_disease(int(ctx.disease_indices[0]), top_k=5)
    assert len(preds) == 5
    assert preds[0][1] >= preds[-1][1]


def test_error_analysis(ctx, trained_setup, tmp_path):
    from primekg_rgcn_tpu.analyze.error_analysis import ErrorAnalyzer
    from primekg_rgcn_tpu.data import artifacts

    _, data_dir, _ = trained_setup
    ds = artifacts.load_dataset(data_dir, require_train=False)
    analyzer = ErrorAnalyzer(ctx, artifacts.split_to_edges(ds["test"]),
                             tmp_path)
    out = analyzer.run()
    assert out["false_negatives"]["count"] + out["low_confidence"]["count"] \
        <= len(analyzer.scores)
    for f in ["error_patterns.png", "score_distribution.png",
              "entity_analysis.png", "error_analysis_report.txt",
              "false_negatives.csv", "low_confidence.csv"]:
        assert (tmp_path / f).exists()
    # Reference figure depth: separate head/tail problem lists feed the
    # problematic-entities panels (reference: src/error_analysis.py:283-284,
    # 408-462).
    for pat in out.values():
        assert "top_heads" in pat and "top_tails" in pat


def test_case_study(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.case_studies import DrugDiseaseCaseStudy

    out = DrugDiseaseCaseStudy(ctx, tmp_path).run_case_study(
        "disease name 2", top_k=5)
    assert out is not None
    assert len(out["predictions"]) == 5
    assert all(0 <= p["score"] <= 1 for p in out["predictions"])
    # No direct drug-disease edges exist -> everything is novel.
    assert not any(p["known_association"] for p in out["predictions"])
    d = tmp_path / "disease_name_2"
    assert (d / "predictions.json").exists()
    assert (d / "predictions.png").exists()
    assert (d / "report.txt").exists()
    # Per-hop relation names ride along with every stored path.
    for p in out["predictions"]:
        assert len(p["path_relations"]) == len(p["paths"])
        for path, rels in zip(p["paths"], p["path_relations"]):
            assert len(rels) == len(path) - 1
    # Combined all-predictions network renders when any path exists
    # (exceeds the reference's top-prediction-only figure).
    if any(p["num_paths"] > 0 for p in out["predictions"]):
        assert (d / "path_network_all.png").exists()
        assert (d / "path_network.png").exists()


def test_explainer(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.explain_predictions import (
        PredictionExplainer,
    )

    out = PredictionExplainer(ctx, tmp_path).explain("drugname1",
                                                     "disease name 1")
    assert out is not None
    assert 0 <= out["prediction_score"] <= 1
    if out["top_paths"]:
        # Scores sorted descending, explanations rendered.
        scores = [p["score"] for p in out["top_paths"]]
        assert scores == sorted(scores, reverse=True)
        assert all(p["explanation"] for p in out["top_paths"])
        # Length penalty: direct edges would beat equal-sim longer paths.
        ex = PredictionExplainer(ctx, tmp_path)
        p2 = ex.score_path(out["top_paths"][0]["path"][:2])
        assert p2 >= 0
        # Sankey pathway-flow artifact (plotly HTML when available, else
        # the matplotlib fallback PNG; reference gates the same way,
        # src/explain_predictions.py:587-590,732-797).
        sub = next(p for p in tmp_path.iterdir() if p.is_dir())
        assert list(sub.glob("sankey_*.png")) + list(sub.glob("sankey_*.html"))


def test_embedding_visualizer(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.visualize_embeddings import (
        EmbeddingVisualizer,
    )

    viz = EmbeddingVisualizer(ctx, tmp_path)
    result = viz.run(sample_size=40, query="drugname1", k_neighbors=3,
                     do_cluster=True, n_clusters=3, skip_interactive=True)
    assert result["projected"] == 40
    assert len(result["neighbors"]) == 3
    assert all(-1.0 <= n["similarity"] <= 1.0 for n in result["neighbors"])
    assert (tmp_path / "embeddings_2d.png").exists()
    assert (tmp_path / "embedding_stats.txt").exists()
    assert (tmp_path / "drug_distances.png").exists()


def test_medical_validator(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.medical_validation import MedicalValidator

    results = MedicalValidator(ctx, tmp_path).run(top_k=10, threshold=0.0,
                                                  sample_diseases=4)
    assert len(results) > 0
    for r in results:
        assert set(r["evidence"]) == {"target_overlap", "common_neighbors",
                                      "similar_drugs", "literature",
                                      "clinical_trials"}
        assert 0 <= r["validation_score"] <= 1
        assert r["confidence"] in {"high", "medium", "low"}
    assert (tmp_path / "validation_results.csv").exists()
    report = (tmp_path / "validation_report.txt").read_text()
    assert "MOCK" in report  # mock evidence must be labeled


def test_method_comparison(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.compare_methods import MethodComparator

    cmp = MethodComparator(ctx, tmp_path, ["random", "degree", "rgcn"])
    results = cmp.run(num_samples=200, frequency_analysis=True,
                      statistical_tests=True)
    assert set(results) == {"Random", "NodeDegree", "RGCN"}
    for m in results.values():
        assert 0 <= m["auc_roc"] <= 1
        assert "mrr" in m and "hits@10" in m
    assert (tmp_path / "test_results.csv").exists()
    assert (tmp_path / "results_table.md").exists()
    assert (tmp_path / "results_table.tex").exists()
    assert (tmp_path / "method_comparison.png").exists()
    # statistical_tests=True must emit the (MOCK-labeled) pairwise p-value
    # heatmap (reference: src/compare_methods.py:846-877).
    assert (tmp_path / "significance_heatmap_auc_roc.png").exists()
    # frequency_analysis=True bins EVERY method, not just RGCN
    # (reference: src/compare_methods.py:616-699), and renders the grouped
    # chart + lists each method in the report.
    assert (tmp_path / "frequency_breakdown.png").exists()
    report = (tmp_path / "comparison_report.txt").read_text()
    for m in ("Random", "NodeDegree", "RGCN"):
        assert f"  {m}: " in report


def test_transe_baseline_learns(ctx):
    from primekg_rgcn_tpu.analyze.compare_methods import SimpleTransE

    t = SimpleTransE(dim=16, epochs=10, seed=0)
    t.fit(ctx.train_edges, ctx.full_graph.num_nodes)
    e = ctx.train_edges[:50]
    pos = t.predict(e[:, 0], e[:, 1]).mean()
    rng = np.random.default_rng(0)
    neg = t.predict(rng.integers(0, ctx.full_graph.num_nodes, 50),
                    rng.integers(0, ctx.full_graph.num_nodes, 50)).mean()
    assert pos > neg  # trained edges score higher than random pairs


def test_failure_analyzer(ctx, tmp_path):
    from primekg_rgcn_tpu.analyze.analyze_failures import FailureAnalyzer

    out = FailureAnalyzer(ctx, tmp_path).run(num_failures=3,
                                             num_successes=3,
                                             num_samples=200)
    assert set(out["buckets"]) == {"false_positives", "false_negatives",
                                   "true_positives", "true_negatives"}
    assert len(out["hypotheses"]) > 0
    assert (tmp_path / "failure_analysis_report.txt").exists()


def test_orchestrator_in_process(trained_setup, tmp_path):
    from primekg_rgcn_tpu.analyze.run_full_analysis import AnalysisPipeline

    model_path, data_dir, _ = trained_setup
    pipe = AnalysisPipeline(
        model_path, tmp_path, data_dir,
        diseases=["disease name 1"],
        explanations=[("drugname2", "disease name 2")])
    results = pipe.run_all(only=["evaluate", "error_analysis",
                                 "case_studies", "explanations",
                                 "comparison", "failures"])
    assert all(r["success"] for r in results.values()), results
    assert (tmp_path / "analysis_summary.txt").exists()
    assert (tmp_path / "results.json").exists()
    # Dedicated per-analysis log files (reference: each script writes its
    # own log, e.g. src/evaluate.py:855-860 -> results/evaluation.log).
    for name in ["evaluate", "error_analysis", "case_studies",
                 "explanations", "comparison", "failures"]:
        log = tmp_path / f"{name}.log"
        assert log.exists() and log.stat().st_size > 0, name


def test_orchestrator_isolates_failures(trained_setup, tmp_path):
    from primekg_rgcn_tpu.analyze.run_full_analysis import AnalysisPipeline

    model_path, data_dir, _ = trained_setup
    pipe = AnalysisPipeline(model_path, tmp_path, "/nonexistent/dir",
                            diseases=["x"])
    results = pipe.run_all(only=["error_analysis", "case_studies"])
    # Both fail (bad data dir) but the pipeline completes and reports.
    assert results["error_analysis"]["success"] is False
    assert (tmp_path / "analysis_summary.txt").exists()


def test_orchestrator_subprocess_mode(trained_setup, tmp_path, monkeypatch):
    """The reference-style process-isolated mode (subprocess per analysis).
    Children must not grab the (possibly busy) TPU during tests."""
    monkeypatch.setenv("PRIMEKG_FORCE_CPU", "1")
    model_path, data_dir, _ = trained_setup
    from primekg_rgcn_tpu.analyze.run_full_analysis import AnalysisPipeline

    pipe = AnalysisPipeline(model_path, tmp_path, data_dir,
                            use_subprocess=True, timeout=240,
                            diseases=["disease name 1"])
    results = pipe.run_all(only=["error_analysis", "case_studies"])
    assert results["error_analysis"]["success"], results
    assert results["case_studies"]["success"], results
    assert (tmp_path / "error_analysis" /
            "error_analysis_report.txt").exists()
