"""Shared inference layer for the analysis suite.

Every reference analysis script re-implements the same skeleton — load
mappings + graph + checkpoint, rebuild the model, run one full-graph encode,
build a NetworkX graph (reference: case_studies.py:92-197,
visualize_embeddings.py, explain_predictions.py, medical_validation.py,
analyze_failures.py, compare_methods.py each have private copies). This
module factors that into ONE context object: artifacts load once, the
encoder runs once (jitted), and every tool shares the cached embeddings,
name indexes and NetworkX view.

Scoring semantics preserved from the reference: analysis tools score
drug-disease pairs by cosine similarity of encoder embeddings rescaled to
[0, 1] (reference: case_studies.py:261-275, explain_predictions.py:235-253)
— NOT by the DistMult decoder, because the processed graph has no direct
drug-disease edges.
"""

from __future__ import annotations

import logging
from functools import cached_property
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class AnalysisContext:
    """Loads artifacts + checkpoint once; serves every analysis tool."""

    def __init__(self, model_path, data_dir, *, impl: str = "auto"):
        import functools

        import jax

        from primekg_rgcn_tpu.config import ModelConfig
        from primekg_rgcn_tpu.data import artifacts
        from primekg_rgcn_tpu.models.rgcn import encoder_apply
        from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
        from primekg_rgcn_tpu.train import checkpoint as ckpt

        self.model_path = str(model_path)
        self.data_dir = Path(data_dir)

        payload = ckpt.load(model_path)
        self.params = payload["state"].params
        self.model_cfg = ModelConfig.from_dict(payload["model_config"])
        self.checkpoint_meta = {k: v for k, v in payload.items()
                                if k != "state"}

        ds = artifacts.load_dataset(data_dir, require_train=False)
        self.mappings = ds["mappings"]
        self.train_split = ds["train"]
        self.full_split = ds["full"] or ds["train"] or ds["test"]
        if self.full_split is None:
            raise FileNotFoundError(f"no graph artifacts in {data_dir}")
        self.full_graph = artifacts.split_to_rel_graph(self.full_split)
        self.full_edges = artifacts.split_to_edges(self.full_split)
        self.train_edges = (artifacts.split_to_edges(self.train_split)
                            if self.train_split else self.full_edges)

        layer_fn = functools.partial(
            rgcn_layer_segment, impl="xla" if impl == "xla" else "auto")
        logger.info("Encoding full graph (%d nodes, %d edges)...",
                    self.full_graph.num_nodes, self.full_graph.num_edges)
        emb = jax.jit(
            lambda p: encoder_apply(p, self.full_graph, self.model_cfg,
                                    train=False, layer_fn=layer_fn)
        )(self.params)
        self.embeddings = np.asarray(emb)
        norms = np.linalg.norm(self.embeddings, axis=1, keepdims=True)
        self.embeddings_norm = self.embeddings / np.maximum(norms, 1e-12)

    # -- node naming ---------------------------------------------------------
    @cached_property
    def node_names(self) -> List[str]:
        n = self.full_graph.num_nodes
        names = [f"node_{i}" for i in range(n)]
        if self.mappings:
            for idx, (nid, name, ntype) in self.mappings["idx2node"].items():
                if 0 <= idx < n:
                    names[idx] = str(name)
        return names

    @cached_property
    def node_types(self) -> np.ndarray:
        """Array of type strings per node ('' when unmapped)."""
        n = self.full_graph.num_nodes
        types = np.array([""] * n, dtype=object)
        if self.mappings:
            for idx, (nid, name, ntype) in self.mappings["idx2node"].items():
                if 0 <= idx < n:
                    types[idx] = ntype
        return types

    def indices_of_type(self, node_type: str) -> np.ndarray:
        return np.flatnonzero(self.node_types == node_type)

    @cached_property
    def drug_indices(self) -> np.ndarray:
        return self.indices_of_type("drug")

    @cached_property
    def disease_indices(self) -> np.ndarray:
        return self.indices_of_type("disease")

    @cached_property
    def gene_indices(self) -> np.ndarray:
        return self.indices_of_type("gene/protein")

    def find_node(self, name: str, node_type: str) -> Optional[int]:
        """Exact then case-insensitive-substring name lookup, mirroring the
        fuzzy matching in the reference (reference: case_studies.py:199-234,
        explain_predictions.py:187-233)."""
        cand = self.indices_of_type(node_type)
        names = self.node_names
        for i in cand:
            if names[i] == name:
                return int(i)
        low = name.lower()
        for i in cand:
            if low == names[i].lower():
                return int(i)
        matches = [int(i) for i in cand if low in names[i].lower()]
        if matches:
            matches.sort(key=lambda i: len(names[i]))
            return matches[0]
        return None

    # -- scoring -------------------------------------------------------------
    def cosine_score(self, a_idx: int, b_idx: int) -> float:
        """Cosine similarity rescaled to [0, 1] (reference semantics)."""
        s = float(self.embeddings_norm[a_idx] @ self.embeddings_norm[b_idx])
        return (s + 1.0) / 2.0

    def cosine_scores_against(self, idx: int,
                              candidates: np.ndarray) -> np.ndarray:
        sims = self.embeddings_norm[candidates] @ self.embeddings_norm[idx]
        return (sims + 1.0) / 2.0

    def top_drugs_for_disease(self, disease_idx: int, top_k: int = 10,
                              threshold: float = 0.0
                              ) -> List[Tuple[int, float]]:
        scores = self.cosine_scores_against(disease_idx, self.drug_indices)
        order = np.argsort(-scores)
        out = []
        for i in order:
            if scores[i] < threshold:
                continue
            out.append((int(self.drug_indices[i]), float(scores[i])))
            if len(out) >= top_k:
                break
        return out

    def known_direct_associations(self, disease_idx: int,
                                  drug_indices: Sequence[int]
                                  ) -> Dict[int, bool]:
        """Direct drug<->disease train edges (reference:
        case_studies.py:286-317; in PrimeKG's processed graph these never
        exist, so everything reports novel — preserved behavior)."""
        drug_set = set(int(d) for d in drug_indices)
        known = {d: False for d in drug_set}
        e = self.train_edges
        hit_head = np.isin(e[:, 0], list(drug_set)) & (e[:, 1] == disease_idx)
        hit_tail = (e[:, 0] == disease_idx) & np.isin(e[:, 1], list(drug_set))
        for d in e[hit_head, 0]:
            known[int(d)] = True
        for d in e[hit_tail, 1]:
            known[int(d)] = True
        return known

    # -- graph views ---------------------------------------------------------
    @cached_property
    def nx_graph(self):
        """Undirected NetworkX view of the full graph (built lazily once;
        the reference rebuilds this per script at case_studies.py:177-197)."""
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from(range(self.full_graph.num_nodes))
        g.add_edges_from(map(tuple, self.full_edges[:, :2]))
        return g

    @cached_property
    def neighbor_sets(self) -> Dict[int, set]:
        """Adjacency as python sets (lazy, shared by gene-overlap analyses)."""
        adj: Dict[int, set] = {}
        for h, t in self.full_edges[:, :2]:
            adj.setdefault(int(h), set()).add(int(t))
            adj.setdefault(int(t), set()).add(int(h))
        return adj

    def gene_neighbors(self, idx: int) -> set:
        genes = set(int(g) for g in self.gene_indices)
        return self.neighbor_sets.get(int(idx), set()) & genes

    @cached_property
    def pair_relation(self) -> Dict[Tuple[int, int], int]:
        """(head, tail) -> relation id for every stored edge (both
        directions exist after bidirecting). Used to label path edges with
        relation names (reference: src/case_studies.py:500-505 stores a
        per-hop ``relation`` attribute on the path network)."""
        e = self.full_edges
        return {(int(h), int(t)): int(r) for h, t, r in e}

    def relation_name(self, rel: int) -> str:
        if self.mappings:
            return str(self.mappings["idx2relation"].get(
                int(rel), str(int(rel))))
        return str(int(rel))

    def edge_relation_name(self, a: int, b: int) -> str:
        r = self.pair_relation.get((int(a), int(b)))
        if r is None:
            r = self.pair_relation.get((int(b), int(a)))
        return self.relation_name(r) if r is not None else ""

    def find_paths(self, source: int, target: int, max_length: int = 4,
                   max_paths: int = 20) -> List[List[int]]:
        """Bounded simple-path enumeration (reference:
        case_studies.py:319-351, explain_predictions.py:255-295)."""
        import networkx as nx

        g = self.nx_graph
        if source not in g or target not in g:
            return []
        paths = []
        try:
            for p in nx.all_simple_paths(g, source, target,
                                         cutoff=max_length):
                paths.append(p)
                if len(paths) >= max_paths * 5:
                    break
        except nx.NetworkXNoPath:
            return []
        paths.sort(key=len)
        return paths[:max_paths]
