"""Vectorized evaluation metrics.

The reference computes classification metrics with sklearn on host numpy
(reference: src/evaluate.py:301-339) and finds ranking positions with a
per-example Python argsort loop (src/evaluate.py:264-276). Here every metric
is a closed-form vectorized computation that runs under jit on device:

- AUC-ROC via the Mann-Whitney statistic with midrank tie handling — exactly
  what sklearn's trapezoidal ROC integration yields.
- Average precision with sklearn's step-function definition (ties grouped by
  distinct score).
- rank(true tail) = 1 + #{entities with strictly higher score}, replacing the
  argsort loop with one comparison reduction per row (identical result up to
  tie ordering, where argsort order is arbitrary anyway).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _midranks(scores: jnp.ndarray) -> jnp.ndarray:
    """1-indexed midranks (average rank over ties) of each element."""
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    n = scores.shape[0]
    # For each score value: number of elements strictly less / less-or-equal.
    lo = jnp.searchsorted(sorted_scores, scores, side="left")
    hi = jnp.searchsorted(sorted_scores, scores, side="right")
    return (lo + hi + 1).astype(jnp.float64 if scores.dtype == jnp.float64
                                else jnp.float32) / 2.0


def auc_roc(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Exact AUC-ROC (Mann-Whitney with midrank ties). Jit-safe."""
    labels = labels.astype(jnp.float32)
    ranks = _midranks(scores)
    n_pos = labels.sum()
    n_neg = labels.shape[0] - n_pos
    rank_sum_pos = (ranks * labels).sum()
    return (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """sklearn-exact average precision (host-side numpy).

    AP = sum_n (R_n - R_{n-1}) * P_n over thresholds at distinct scores,
    descending — the same step-function integral sklearn uses.
    """
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    order = np.argsort(-scores, kind="mergesort")
    scores_s, labels_s = scores[order], labels[order]
    # threshold boundaries: last index of each distinct score value
    distinct = np.where(np.diff(scores_s))[0]
    idx = np.concatenate([distinct, [labels_s.size - 1]])
    tp = np.cumsum(labels_s)[idx]
    fp = (idx + 1) - tp
    precision = tp / (tp + fp)
    recall = tp / max(labels_s.sum(), 1.0)
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def classification_metrics(
    scores: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """AUC-ROC/AUC-PR/precision/recall/F1 at a probability threshold,
    matching the reference's metric dict (reference: src/evaluate.py:322-331).
    ``scores`` are probabilities in [0, 1]."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    preds = (scores >= threshold).astype(np.int64)
    tp = float(np.sum((preds == 1) & (labels == 1)))
    fp = float(np.sum((preds == 1) & (labels == 0)))
    fn = float(np.sum((preds == 0) & (labels == 1)))
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return {
        "auc_roc": float(auc_roc(jnp.asarray(scores), jnp.asarray(labels))),
        "auc_pr": average_precision(scores, labels),
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "threshold": threshold,
    }


def ranks_of_true_tails(all_scores: jnp.ndarray,
                        true_tails: jnp.ndarray) -> jnp.ndarray:
    """1-indexed raw (unfiltered) rank of each true tail.

    Vectorized replacement for the reference's per-row argsort loop
    (reference: src/evaluate.py:264-276): rank = 1 + #{strictly better}.
    """
    b = all_scores.shape[0]
    true_scores = all_scores[jnp.arange(b), true_tails]
    return 1 + jnp.sum(all_scores > true_scores[:, None], axis=1)


def ranking_metrics_from_ranks(
    ranks: np.ndarray, k_values: Sequence[int] = (10, 50)
) -> Dict[str, float]:
    """MRR / mean / median rank / Hits@K from 1-indexed ranks
    (reference: src/evaluate.py:278-299)."""
    ranks = np.asarray(ranks, dtype=np.float64)
    out = {
        "mrr": float(np.mean(1.0 / ranks)),
        "mean_rank": float(np.mean(ranks)),
        "median_rank": float(np.median(ranks)),
    }
    for k in k_values:
        out[f"hits@{k}"] = float(np.mean(ranks <= k))
    return out
