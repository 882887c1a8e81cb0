"""End-to-end model evaluation producing the reference's results contract.

Mirrors ModelEvaluator (reference: src/evaluate.py:75-385) with two TPU-native
fixes to the compute plan, neither of which changes results:

- The reference re-encodes the full graph for every evaluation batch
  (src/evaluate.py:189-195, 250-254) even though eval-mode encoding is
  deterministic. Here the graph is encoded **once** and embeddings are reused
  for all classification and ranking batches.
- Ranking is a single [B, D] x [D, N] matmul per batch followed by a
  vectorized rank reduction on device — no per-example argsort loop.

Output contract matches results.json / metrics_summary.txt exactly
(reference: src/evaluate.py:595-652, results/results.json).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.evaluate.metrics import (
    classification_metrics,
    ranking_metrics_from_ranks,
    ranks_of_true_tails,
)
from primekg_rgcn_tpu.models.rgcn import encoder_apply
from primekg_rgcn_tpu.ops.distmult import distmult_score, distmult_score_all_tails
from primekg_rgcn_tpu.train.neg_sampling import sample_negatives

logger = logging.getLogger(__name__)


class Evaluator:
    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        full_graph: RelGraph,
        test_edges: np.ndarray,  # [E, 3] (head, tail, rel)
        eval_cfg: Optional[EvalConfig] = None,
        *,
        layer_fn=None,
        shard_encode: str = "none",
    ):
        from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

        self.params = params
        self.model_cfg = model_cfg
        self.graph = full_graph
        self.test_edges = np.asarray(test_edges, dtype=np.int32)
        self.cfg = eval_cfg or EvalConfig()
        self.layer_fn = layer_fn or rgcn_layer_segment
        self.scores: Optional[np.ndarray] = None
        self.labels: Optional[np.ndarray] = None
        # Keyed (direction, resolved_sharded): the dense and sharded
        # rankers are different kernels, so a direction-only key would
        # serve one's ranks for the other after the first call.
        self._raw_ranks: Dict[tuple, Optional[np.ndarray]] = {}
        self._rel_emb = params["decoder"]["rel_emb"]

        if shard_encode == "node" and len(jax.devices()) < 2:
            raise ValueError(
                "shard_encode='node' needs a multi-device runtime — a "
                "silent dense fallback would materialize the [N, D] table "
                "this mode exists to avoid")
        if shard_encode == "node":
            # Fully-sharded pipeline: node-partitioned encode keeps the
            # entity table device-major ([n_dev, N/n, D]) and the
            # rank/score kernels fetch query endpoints with owner-masked
            # psums — no device ever materializes [N, D]. This is the
            # evaluation mode for graphs whose encode/table exceed one
            # chip (BASELINE config 5).
            from primekg_rgcn_tpu.evaluate.sharded_ranking import (
                build_sharded_eval_from_sharded,
            )
            from primekg_rgcn_tpu.parallel.mesh import make_mesh
            from primekg_rgcn_tpu.parallel.node_shard import (
                build_node_sharded_forward,
                partition_nodes,
            )

            mesh = make_mesh(len(jax.devices()))
            nsg = partition_nodes(full_graph, mesh.devices.size)
            emb_dm = build_node_sharded_forward(
                mesh, nsg, model_cfg, gather=False)(params)
            rank_fn, score_fn = build_sharded_eval_from_sharded(
                mesh, emb_dm, self._rel_emb, full_graph.num_nodes)
            self._node_emb = None
            self._score_triples = lambda h, t, r: jax.nn.sigmoid(
                score_fn(h, t, r))
            self._rank_batch = rank_fn
        elif shard_encode not in ("none", "node"):
            raise ValueError(f"unknown shard_encode: {shard_encode!r}")
        else:
            # One deterministic full-graph encode, reused everywhere.
            self._node_emb = jax.jit(
                lambda p: encoder_apply(p, full_graph, model_cfg,
                                        train=False,
                                        layer_fn=self.layer_fn)
            )(params)
            self._score_triples = jax.jit(self._score_triples_impl)
            self._rank_batch = jax.jit(self._rank_batch_impl)

    # -- jitted kernels ------------------------------------------------------
    def _score_triples_impl(self, heads, tails, rels):
        h = jnp.take(self._node_emb, heads, axis=0)
        t = jnp.take(self._node_emb, tails, axis=0)
        r = jnp.take(self._rel_emb, rels, axis=0)
        return jax.nn.sigmoid(distmult_score(h, t, r))

    def _rank_batch_impl(self, heads, rels, true_tails):
        h = jnp.take(self._node_emb, heads, axis=0)
        r = jnp.take(self._rel_emb, rels, axis=0)
        all_scores = distmult_score_all_tails(h, r, self._node_emb)
        return ranks_of_true_tails(all_scores, true_tails)

    # -- public API ----------------------------------------------------------
    def compute_scores_and_labels(self, seed: Optional[int] = None):
        """Probabilities + labels over positives and 1:num_neg sampled
        negatives (reference: src/evaluate.py:147-217)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        e = self.test_edges
        n = e.shape[0]
        all_scores, all_labels = [], []
        for start in range(0, n, cfg.batch_size):
            stop = min(start + cfg.batch_size, n)
            h = jnp.asarray(e[start:stop, 0])
            t = jnp.asarray(e[start:stop, 1])
            r = jnp.asarray(e[start:stop, 2])
            key, k = jax.random.split(key)
            nh, nt, nr = sample_negatives(k, h, t, r, self.graph.num_nodes,
                                          cfg.num_neg_samples)
            probs = self._score_triples(
                jnp.concatenate([h, nh]), jnp.concatenate([t, nt]),
                jnp.concatenate([r, nr]))
            all_scores.append(np.asarray(probs))
            all_labels.append(np.concatenate([
                np.ones(stop - start), np.zeros((stop - start) * cfg.num_neg_samples)
            ]))
        self.scores = np.concatenate(all_scores)
        self.labels = np.concatenate(all_labels)
        return self.scores, self.labels

    def _compute_raw_ranks(self, sharded: Optional[bool] = None,
                           direction: str = "tail") -> np.ndarray:
        """1-indexed raw rank of every test edge's true tail (cached).

        ``direction="head"`` ranks the HEAD against all entities given
        (r, t): DistMult is symmetric in (h, t), so head ranking is tail
        ranking with the endpoints swapped — one kernel serves both.
        """
        if direction not in ("tail", "head"):
            raise ValueError(f"unknown rank direction {direction!r}")
        if self._node_emb is None:
            # shard_encode="node": _rank_batch already IS the fully-sharded
            # ranker over the device-major table; there is only one kernel.
            sharded = False
        elif sharded is None:
            sharded = len(jax.devices()) > 1
        else:
            sharded = bool(sharded) and len(jax.devices()) > 1
        cache_key = (direction, sharded)
        if self._raw_ranks.get(cache_key) is not None:
            return self._raw_ranks[cache_key]
        e = self.test_edges
        if direction == "head":
            e = e[:, [1, 0, 2]]  # score symmetry: swap the endpoints
        n = e.shape[0]
        b = self.cfg.batch_size

        rank_fn = self._rank_batch
        if sharded:
            from primekg_rgcn_tpu.evaluate.sharded_ranking import (
                build_sharded_ranker,
            )
            from primekg_rgcn_tpu.parallel.mesh import make_mesh

            rank_fn = build_sharded_ranker(make_mesh(len(jax.devices())),
                                           self._node_emb, self._rel_emb)

        # Pad to a fixed batch shape so one compiled program serves all steps.
        n_pad = -(-n // b) * b
        pad = n_pad - n
        ep = np.concatenate([e, np.zeros((pad, 3), e.dtype)], axis=0)
        ranks = []
        for start in range(0, n_pad, b):
            chunk = ep[start:start + b]
            rk = rank_fn(jnp.asarray(chunk[:, 0]),
                         jnp.asarray(chunk[:, 2]),
                         jnp.asarray(chunk[:, 1]))
            ranks.append(np.asarray(rk))
        self._raw_ranks[cache_key] = np.concatenate(ranks)[:n]
        return self._raw_ranks[cache_key]

    def compute_ranking_metrics(
        self, k_values: Optional[Sequence[int]] = None,
        *, sharded: Optional[bool] = None, direction: str = "tail",
    ) -> Dict[str, float]:
        """Raw ranking metrics. When several devices are visible (and
        ``sharded`` is not explicitly False), the all-tails scoring shards
        the entity axis across the mesh (evaluate/sharded_ranking.py) —
        required when B x N score rows stop fitting one chip.

        ``direction``: "tail" (the reference's protocol), "head", or
        "both" (per-query average of head and tail ranks — the common KG
        reporting convention)."""
        k_values = list(k_values or self.cfg.k_values)
        if direction == "both":
            ranks = np.concatenate([self._compute_raw_ranks(sharded, "tail"),
                                    self._compute_raw_ranks(sharded, "head")])
        else:
            ranks = self._compute_raw_ranks(sharded, direction)
        return ranking_metrics_from_ranks(ranks, k_values)

    # -- filtered ranking (extension; the reference ranks raw only,
    # reference: src/evaluate.py:264-276) --------------------------------
    def _rank_filtered_impl(self, heads, rels, true_tails, filt):
        """(raw_rank, filtered_rank) from ONE [B, N] score matrix.

        ``filt`` is int32[B, W]: each query's known true tails, padded
        with the query's OWN tail. Both the raw count and the filter
        adjustment gather from the SAME ``all_scores`` tensor, so tie
        semantics are exact by construction — a first version that
        re-scored the filter tails through the elementwise triple scorer
        produced ulp-level drift against the ranker's matmul (the padded
        own-tail entries then counted as 'strictly higher' ~half the
        time, driving filtered ranks below 1)."""
        h = jnp.take(self._node_emb, heads, axis=0)
        r = jnp.take(self._rel_emb, rels, axis=0)
        all_scores = distmult_score_all_tails(h, r, self._node_emb)
        s_true = jnp.take_along_axis(all_scores, true_tails[:, None],
                                     axis=1)
        raw = 1 + jnp.sum(all_scores > s_true, axis=1)
        fs = jnp.take_along_axis(all_scores, filt, axis=1)  # [B, W]
        adj = jnp.sum(fs > s_true, axis=1)  # own-tail pads are exact ties
        return raw, raw - adj

    def _filter_lists(self, known_triples: np.ndarray,
                      direction: str = "tail"):
        """int32[n_test, W] known-true-tail lists per test query, padded
        with the query's own tail (an exact tie — contributes 0).
        ``direction="head"``: known heads of (r, t), endpoints swapped."""
        e = self.test_edges
        kt = np.asarray(known_triples, dtype=np.int64)  # [K, 3] (h, t, r)
        if direction == "head":
            e = e[:, [1, 0, 2]]
            kt = kt[:, [1, 0, 2]]
        r_count = int(max(self.model_cfg.num_relations,
                          kt[:, 2].max() + 1 if len(kt) else 1))
        # Dedupe triples: multigraph data (and bidirected unions) repeat
        # (h, r, t), which would double-count the same candidate in the
        # rank adjustment (each raw rank counts it once).
        n_nodes = int(self.graph.num_nodes)
        full_key = (kt[:, 0] * r_count + kt[:, 2]) * n_nodes + kt[:, 1]
        kt = kt[np.unique(full_key, return_index=True)[1]]
        key_known = kt[:, 0] * r_count + kt[:, 2]
        order = np.argsort(key_known, kind="stable")
        key_sorted = key_known[order]
        tails_sorted = kt[order, 1].astype(np.int32)
        key_q = e[:, 0].astype(np.int64) * r_count + e[:, 2]
        lo = np.searchsorted(key_sorted, key_q, side="left")
        hi = np.searchsorted(key_sorted, key_q, side="right")
        counts = hi - lo
        w = int(max(counts.max() if len(e) else 0, 1))
        filt = np.repeat(e[:, 1].astype(np.int32)[:, None], w, axis=1)
        total = int(counts.sum())
        if total:
            # Ragged lists flattened via the repeat-offset trick.
            qidx = np.repeat(np.arange(len(e), dtype=np.int64), counts)
            base = np.repeat(np.cumsum(counts) - counts, counts)
            slot = np.arange(total) - base
            pos = np.repeat(lo, counts) + slot
            filt[qidx, slot] = tails_sorted[pos]
        return filt

    def compute_filtered_ranking_metrics(
        self, known_triples: np.ndarray,
        k_values: Optional[Sequence[int]] = None,
        direction: str = "tail",
    ) -> Dict[str, float]:
        """Filtered ranking metrics (Bordes et al. protocol): candidates
        that are THEMSELVES true tails of (h, r) anywhere in
        ``known_triples`` (train/val/test union) do not count against the
        test tail's rank. The reference evaluates raw ranks only — this
        is a framework extension. Dense evaluator path only: the combined
        kernel gathers filter scores from the ranker's own [B, N] score
        rows (shard_encode='none'; the batch already materializes those
        rows, so the [B, W] filter gather is marginal)."""
        if self._node_emb is None:
            raise ValueError(
                "filtered ranking needs the dense evaluator "
                "(shard_encode='none'): the exact-tie filter gather reads "
                "the ranker's own score rows, which the fully-sharded "
                "path never materializes")
        k_values = list(k_values or self.cfg.k_values)
        if direction == "both":
            ranks = np.concatenate([
                self._filtered_ranks(known_triples, "tail"),
                self._filtered_ranks(known_triples, "head")])
            return ranking_metrics_from_ranks(ranks, k_values)
        return ranking_metrics_from_ranks(
            self._filtered_ranks(known_triples, direction), k_values)

    def _filtered_ranks(self, known_triples: np.ndarray,
                        direction: str) -> np.ndarray:
        e = self.test_edges
        if direction == "head":
            e = e[:, [1, 0, 2]]
        n = e.shape[0]
        b = self.cfg.batch_size
        filt = self._filter_lists(known_triples, direction)
        rank_fn = jax.jit(self._rank_filtered_impl)
        n_pad = -(-n // b) * b
        pad = n_pad - n
        ep = np.concatenate([e, np.zeros((pad, 3), e.dtype)], axis=0)
        fp = np.concatenate(
            [filt, np.zeros((pad, filt.shape[1]), filt.dtype)], axis=0)
        raws, franks = [], []
        for start in range(0, n_pad, b):
            chunk = ep[start:start + b]
            raw, frk = rank_fn(jnp.asarray(chunk[:, 0]),
                               jnp.asarray(chunk[:, 2]),
                               jnp.asarray(chunk[:, 1]),
                               jnp.asarray(fp[start:start + b]))
            raws.append(np.asarray(raw))
            franks.append(np.asarray(frk))
        raws = np.concatenate(raws)[:n]
        franks = np.concatenate(franks)[:n]
        if self._raw_ranks.get((direction, False)) is None:
            # Same matmul, same comparisons as the DENSE ranker — cache
            # under the dense key so a later non-sharded rank request is
            # served without re-ranking (a sharded request still runs the
            # sharded kernel; the two must not share a cache slot).
            self._raw_ranks[(direction, False)] = raws
        if len(franks) and franks.min() < 1:
            raise AssertionError(
                "filtered rank < 1: adjustment exceeded raw rank despite "
                "single-tensor gathers — investigate")
        return franks

    def evaluate(self, known_triples: Optional[np.ndarray] = None,
                 rank_direction: str = "tail") -> Dict:
        """Full evaluation dict in the reference's results.json schema
        (reference: src/evaluate.py:341-385). ``known_triples`` adds a
        ``ranking_filtered`` block; ``rank_direction="both"`` adds
        ``ranking_head`` / ``ranking_both`` (+ filtered variants) — both
        extensions; the reference ranks raw tails only."""
        if rank_direction not in ("tail", "both"):
            # Fail before any compute — an invalid value used to surface
            # only in the trailing elif, after the full evaluation ran.
            raise ValueError(f"rank_direction {rank_direction!r} — "
                             f"use 'tail' (reference protocol) or 'both'")
        scores, labels = self.compute_scores_and_labels()
        cls = classification_metrics(scores, labels)
        filtered = None
        if known_triples is not None:
            # First: its combined kernel also caches the (dense) raw
            # ranks, so on a single-device runtime both blocks come from
            # one score tensor per batch.
            filtered = self.compute_filtered_ranking_metrics(known_triples)
        rnk = self.compute_ranking_metrics()
        out = {
            "classification": cls,
            "ranking": rnk,
            "test_edges": int(self.test_edges.shape[0]),
            "num_nodes": int(self.graph.num_nodes),
        }
        if filtered is not None:
            out["ranking_filtered"] = filtered
        if rank_direction == "both":
            out["ranking_head"] = self.compute_ranking_metrics(
                direction="head")
            out["ranking_both"] = self.compute_ranking_metrics(
                direction="both")
            if known_triples is not None:
                out["ranking_filtered_head"] = \
                    self.compute_filtered_ranking_metrics(
                        known_triples, direction="head")
                out["ranking_filtered_both"] = \
                    self.compute_filtered_ranking_metrics(
                        known_triples, direction="both")
        return out


def save_results(metrics: Dict, output_dir, model_info: Optional[Dict] = None):
    """results.json + metrics_summary.txt (reference: src/evaluate.py:595-652)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "results.json", "w") as f:
        json.dump({"metrics": metrics, "model_info": model_info or {}}, f,
                  indent=2)
    with open(output_dir / "metrics_summary.txt", "w") as f:
        f.write("=" * 60 + "\nEVALUATION RESULTS SUMMARY\n" + "=" * 60 + "\n\n")
        if model_info:
            f.write("Model Information:\n" + "-" * 60 + "\n")
            for k, v in model_info.items():
                f.write(f"{k}: {v}\n")
            f.write("\n")
        f.write("Dataset Statistics:\n" + "-" * 60 + "\n")
        f.write(f"Test edges: {metrics['test_edges']:,}\n")
        f.write(f"Number of nodes: {metrics['num_nodes']:,}\n\n")
        f.write("Classification Metrics:\n" + "-" * 60 + "\n")
        for k, v in metrics["classification"].items():
            f.write(f"{k}: {v:.4f}\n")
        f.write("\nRanking Metrics:\n" + "-" * 60 + "\n")
        for k, v in metrics["ranking"].items():
            f.write(f"{k}: {v:.4f}\n")
        titles = {
            "ranking_filtered": "Filtered Ranking Metrics (known true "
                                "tails removed from candidates)",
            "ranking_head": "Head Ranking Metrics",
            "ranking_both": "Head+Tail Ranking Metrics",
            "ranking_filtered_head": "Filtered Head Ranking Metrics",
            "ranking_filtered_both": "Filtered Head+Tail Ranking Metrics",
        }
        for key, title in titles.items():
            if key in metrics:
                f.write(f"\n{title}:\n" + "-" * 60 + "\n")
                for k, v in metrics[key].items():
                    f.write(f"{k}: {v:.4f}\n")
        f.write("\n" + "=" * 60 + "\n")
    logger.info("Saved results to %s", output_dir)
