"""Metric parity vs sklearn and vs the reference's argsort ranking loop."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import (
    average_precision_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

from primekg_rgcn_tpu.evaluate.metrics import (
    auc_roc,
    average_precision,
    classification_metrics,
    ranking_metrics_from_ranks,
    ranks_of_true_tails,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    labels = rng.integers(0, 2, n)
    scores = rng.normal(size=n) + labels * rng.uniform(0.2, 1.5)
    ours = float(auc_roc(jnp.asarray(scores, jnp.float32),
                         jnp.asarray(labels, jnp.float32)))
    theirs = roc_auc_score(labels, scores.astype(np.float32))
    assert abs(ours - theirs) < 1e-6


def test_auc_with_ties_matches_sklearn():
    rng = np.random.default_rng(3)
    n = 2000
    labels = rng.integers(0, 2, n)
    scores = rng.integers(0, 10, n).astype(np.float32)  # heavy ties
    ours = float(auc_roc(jnp.asarray(scores), jnp.asarray(labels, jnp.float32)))
    theirs = roc_auc_score(labels, scores)
    assert abs(ours - theirs) < 1e-6


@pytest.mark.parametrize("seed", [0, 4])
def test_average_precision_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 3000
    labels = rng.integers(0, 2, n)
    scores = rng.normal(size=n) + labels
    assert abs(average_precision(scores, labels)
               - average_precision_score(labels, scores)) < 1e-10
    # with ties
    scores_q = np.round(scores, 1)
    assert abs(average_precision(scores_q, labels)
               - average_precision_score(labels, scores_q)) < 1e-10


def test_classification_metrics_match_sklearn():
    rng = np.random.default_rng(7)
    n = 4000
    labels = rng.integers(0, 2, n)
    probs = np.clip(rng.normal(0.5, 0.3, n) + 0.2 * labels, 0, 1)
    m = classification_metrics(probs, labels)
    preds = (probs >= 0.5).astype(int)
    assert abs(m["precision"] - precision_score(labels, preds)) < 1e-10
    assert abs(m["recall"] - recall_score(labels, preds)) < 1e-10
    assert abs(m["f1_score"] - f1_score(labels, preds)) < 1e-10
    assert abs(m["auc_roc"] - roc_auc_score(labels, probs)) < 1e-5
    assert abs(m["auc_pr"] - average_precision_score(labels, probs)) < 1e-10


def test_ranks_match_argsort_loop():
    """Vectorized rank must equal the reference's argsort-position rank
    (reference: src/evaluate.py:264-276) when scores have no ties."""
    rng = np.random.default_rng(11)
    b, n = 64, 500
    scores = rng.normal(size=(b, n))
    true_tails = rng.integers(0, n, b)
    ours = np.asarray(ranks_of_true_tails(jnp.asarray(scores),
                                          jnp.asarray(true_tails)))
    for i in range(b):
        order = np.argsort(-scores[i])
        expected = int(np.where(order == true_tails[i])[0][0]) + 1
        assert ours[i] == expected


def test_ranking_metrics_formulas():
    ranks = np.array([1, 2, 10, 100])
    m = ranking_metrics_from_ranks(ranks, k_values=[10, 50])
    assert m["mrr"] == pytest.approx(np.mean([1, 0.5, 0.1, 0.01]))
    assert m["mean_rank"] == pytest.approx(28.25)
    assert m["median_rank"] == pytest.approx(6.0)
    assert m["hits@10"] == pytest.approx(0.75)
    assert m["hits@50"] == pytest.approx(0.75)


def test_evaluator_end_to_end(tmp_path):
    import jax
    from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator, save_results
    from primekg_rgcn_tpu.models.rgcn import init_params

    rng = np.random.default_rng(0)
    n, r, e = 80, 3, 500
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    test_edges = np.stack([rng.integers(0, n, 130), rng.integers(0, n, 130),
                           rng.integers(0, r, 130)], axis=1)
    ev = Evaluator(params, cfg, graph, test_edges,
                   EvalConfig(batch_size=64, k_values=(10, 50)))
    metrics = ev.evaluate()
    assert set(metrics) == {"classification", "ranking", "test_edges",
                            "num_nodes"}
    assert 0.0 <= metrics["classification"]["auc_roc"] <= 1.0
    assert metrics["test_edges"] == 130
    assert set(metrics["ranking"]) == {"mrr", "mean_rank", "median_rank",
                                       "hits@10", "hits@50"}
    save_results(metrics, tmp_path, {"epoch": 1})
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "metrics_summary.txt").exists()


def test_evaluator_sharded_ranking_matches_single():
    import jax
    from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator
    from primekg_rgcn_tpu.models.rgcn import init_params

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    rng = np.random.default_rng(3)
    n, r, e = 90, 3, 600
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(1), cfg)
    test_edges = np.stack([rng.integers(0, n, 100), rng.integers(0, n, 100),
                           rng.integers(0, r, 100)], axis=1)
    ev = Evaluator(params, cfg, graph, test_edges, EvalConfig(batch_size=32))
    m_single = ev.compute_ranking_metrics(sharded=False)
    # The rank cache is keyed (direction, resolved-sharded), so this call
    # MUST run the sharded ranker rather than replay the dense ranks (a
    # direction-only cache key once made this comparison vacuous).
    assert ("tail", True) not in ev._raw_ranks
    m_sharded = ev.compute_ranking_metrics(sharded=True)
    assert ("tail", True) in ev._raw_ranks and ("tail", False) in ev._raw_ranks
    assert m_single == m_sharded


def test_filtered_ranking_matches_bruteforce():
    """Filtered protocol (Bordes et al.): known true tails of (h, r) do
    not count against the test tail's rank. Brute-force numpy over the
    full score matrix vs the evaluator's scorer-based adjustment."""
    import jax
    import jax.numpy as jnp
    from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator
    from primekg_rgcn_tpu.evaluate.metrics import ranking_metrics_from_ranks
    from primekg_rgcn_tpu.models.rgcn import init_params

    rng = np.random.default_rng(7)
    n, r, e = 60, 3, 400
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(2), cfg)
    test_edges = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50),
                           rng.integers(0, r, 50)], axis=1).astype(np.int32)
    # Known triples: the test split itself plus extra shared-(h, r) tails
    # so the filter actually bites (same head+rel, different tails).
    extra = test_edges.copy()
    extra[:, 1] = rng.integers(0, n, 50)
    # Duplicate triples on purpose: multigraph data repeats (h, r, t) and
    # the adjustment must count each candidate once.
    known = np.concatenate([test_edges, extra, extra, test_edges])

    ev = Evaluator(params, cfg, graph, test_edges,
                   EvalConfig(batch_size=16, k_values=(10,)))
    got = ev.compute_filtered_ranking_metrics(known)

    # Brute force over the ranker's OWN score matrix (fetched once), so
    # strict comparisons are bit-identical to the kernel's.
    import jax.numpy as jnp
    from primekg_rgcn_tpu.ops.distmult import distmult_score_all_tails

    h_all = jnp.take(ev._node_emb, jnp.asarray(test_edges[:, 0]), axis=0)
    r_all = jnp.take(ev._rel_emb, jnp.asarray(test_edges[:, 2]), axis=0)
    smat = np.asarray(distmult_score_all_tails(h_all, r_all, ev._node_emb))
    franks = []
    for i, (h, t, rr) in enumerate(test_edges):
        s = smat[i]
        keep = np.ones(n, bool)
        tails = known[(known[:, 0] == h) & (known[:, 2] == rr), 1]
        keep[tails] = False
        keep[t] = True
        franks.append(1 + int(((s > s[t]) & keep).sum()))
    expect = ranking_metrics_from_ranks(np.asarray(franks), [10])
    for k in expect:
        assert got[k] == pytest.approx(expect[k]), k

    # evaluate(known_triples=...) adds the block; raw ranks unchanged.
    m = ev.evaluate(known_triples=known)
    assert "ranking_filtered" in m
    assert m["ranking_filtered"]["mrr"] >= m["ranking"]["mrr"] - 1e-12


def test_head_direction_ranking_symmetry():
    """DistMult is (h, t)-symmetric, so head ranking must equal tail
    ranking on endpoint-swapped test edges; 'both' averages the two rank
    populations. Filtered variants obey the same swap."""
    import jax
    from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator
    from primekg_rgcn_tpu.models.rgcn import init_params

    rng = np.random.default_rng(11)
    n, r, e = 50, 3, 300
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(3), cfg)
    te = np.stack([rng.integers(0, n, 40), rng.integers(0, n, 40),
                   rng.integers(0, r, 40)], axis=1).astype(np.int32)
    known = te.copy()

    ev = Evaluator(params, cfg, graph, te,
                   EvalConfig(batch_size=16, k_values=(10,)))
    ev_sw = Evaluator(params, cfg, graph, te[:, [1, 0, 2]],
                      EvalConfig(batch_size=16, k_values=(10,)))
    assert ev.compute_ranking_metrics(direction="head", sharded=False) == \
        ev_sw.compute_ranking_metrics(sharded=False)
    m_both = ev.compute_ranking_metrics(direction="both", sharded=False)
    mrr_t = ev.compute_ranking_metrics(sharded=False)["mrr"]
    mrr_h = ev.compute_ranking_metrics(direction="head",
                                       sharded=False)["mrr"]
    assert m_both["mrr"] == pytest.approx((mrr_t + mrr_h) / 2)
    # Filtered head == filtered tail on the swapped evaluator+known set.
    fh = ev.compute_filtered_ranking_metrics(known, direction="head")
    ft_sw = ev_sw.compute_filtered_ranking_metrics(known[:, [1, 0, 2]])
    assert fh == ft_sw
    # evaluate() wires the blocks.
    m = ev.evaluate(known_triples=known, rank_direction="both")
    for key in ("ranking_head", "ranking_both", "ranking_filtered_head",
                "ranking_filtered_both"):
        assert key in m, key
