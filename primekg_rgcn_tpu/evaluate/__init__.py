from primekg_rgcn_tpu.evaluate.metrics import (
    auc_roc,
    average_precision,
    classification_metrics,
    ranking_metrics_from_ranks,
)
from primekg_rgcn_tpu.evaluate.evaluator import Evaluator

__all__ = [
    "auc_roc",
    "average_precision",
    "classification_metrics",
    "ranking_metrics_from_ranks",
    "Evaluator",
]
