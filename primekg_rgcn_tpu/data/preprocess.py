"""PrimeKG preprocessing: raw kg.csv -> processed artifacts.

Re-implements the reference preprocessing pipeline (reference:
src/preprocess.py — the P1 component of SURVEY.md §2.2) with identical
behavior but vectorized pandas/numpy throughout. The reference's hot loops
are two Python ``iterrows`` passes over every row (preprocess.py:154, 207) at
O(rows) interpreter cost; here mapping and conversion are joins/gathers.

Behavior preserved exactly:
- node-type filter {drug, gene/protein, disease}; relation filter
  {drug_protein, protein_protein, disease_protein} standardized to
  {drug-gene, gene-gene, gene-disease} (preprocess.py:56-65, 100-140)
- node ids keyed by (str(id), type), sorted by (type, id, name); relations
  sorted alphabetically (preprocess.py:142-188)
- ONLY drug-gene rows are split 70/15/15 with sklearn train_test_split and
  the given seed; every other relation stays in train (preprocess.py:265-345)
- every kept row emits forward + reverse directed edges with the same
  relation id (preprocess.py:228-234)
- outputs: {train,val,test}_data.pt, full_graph.pt, mappings.pt, per-split
  CSVs and statistics.csv (preprocess.py:347-409), plus the native .npz /
  .json variants.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

TARGET_NODE_TYPES = {"drug", "gene/protein", "disease"}
RELATION_STANDARDIZATION = {
    "drug_protein": "drug-gene",
    "protein_protein": "gene-gene",
    "disease_protein": "gene-disease",
}


class PrimeKGPreprocessor:
    """Vectorized preprocessor with the reference's public surface
    (reference: src/preprocess.py:40-451)."""

    def __init__(self, raw_data_path: str, processed_data_path: str,
                 *, write_torch: bool = True,
                 keep_all_relations: bool = False):
        self.raw_data_path = Path(raw_data_path)
        self.processed_data_path = Path(processed_data_path)
        self.processed_data_path.mkdir(parents=True, exist_ok=True)
        self.write_torch = write_torch
        # BASELINE.json config 3 (full PrimeKG, ~129K nodes / ~30 relations):
        # skip the reference's 3-relation / 3-node-type filter
        # (reference: src/preprocess.py:56-65) and keep every row. The trio
        # still gets the standardized names so the drug-gene split target is
        # identical in both modes; all other relations pass through verbatim.
        self.keep_all_relations = keep_all_relations
        self.node2idx: Dict[Tuple[str, str], int] = {}
        self.idx2node: Dict[int, Tuple[str, str, str]] = {}
        self.relation2idx: Dict[str, int] = {}
        self.idx2relation: Dict[int, str] = {}
        self.stats: Dict[str, int] = {}

    # -- pipeline stages -----------------------------------------------------
    def load_data(self) -> pd.DataFrame:
        logger.info("Loading %s", self.raw_data_path)
        df = pd.read_csv(self.raw_data_path, low_memory=False)
        self.stats["total_edges"] = len(df)
        self.stats["total_node_types"] = df["x_type"].nunique()
        self.stats["total_relation_types"] = df["relation"].nunique()
        return df

    def filter_subgraph(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.keep_all_relations:
            out = df.copy()
            out["relation_standard"] = out["relation"].map(
                RELATION_STANDARDIZATION).fillna(out["relation"])
        else:
            mask = (df["x_type"].isin(TARGET_NODE_TYPES)
                    & df["y_type"].isin(TARGET_NODE_TYPES)
                    & df["relation"].isin(RELATION_STANDARDIZATION))
            out = df[mask].copy()
            out["relation_standard"] = out["relation"].map(
                RELATION_STANDARDIZATION)
        self.stats["filtered_edges"] = len(out)
        self.stats["filtered_relations"] = out["relation_standard"].nunique()
        logger.info("Filtered to %d rows", len(out))
        return out

    def build_mappings(self, df: pd.DataFrame) -> None:
        # Endpoint frames -> unique (id, name, type) triples, vectorized.
        x = df[["x_id", "x_name", "x_type"]].astype(
            {"x_id": str}).drop_duplicates()
        y = df[["y_id", "y_name", "y_type"]].astype(
            {"y_id": str}).drop_duplicates()
        x.columns = y.columns = ["id", "name", "type"]
        nodes = pd.concat([x, y]).drop_duplicates()
        # Reference sort key: (type, id, name) (preprocess.py:158).
        nodes = nodes.sort_values(["type", "id", "name"], kind="mergesort")
        nodes = nodes.reset_index(drop=True)

        self.node2idx = {(i, t): idx for idx, (i, t) in
                         enumerate(zip(nodes["id"], nodes["type"]))}
        self.idx2node = {idx: (i, n, t) for idx, (i, n, t) in
                         enumerate(zip(nodes["id"], nodes["name"],
                                       nodes["type"]))}
        rels = sorted(df["relation_standard"].unique())
        self.relation2idx = {r: i for i, r in enumerate(rels)}
        self.idx2relation = {i: r for i, r in enumerate(rels)}

        for t in sorted(nodes["type"].unique()):
            self.stats[f"num_{t}_nodes"] = int((nodes["type"] == t).sum())
        for r in rels:
            self.stats[f"num_{r}_edges"] = int(
                (df["relation_standard"] == r).sum())
        logger.info("Mapped %d nodes, %d relations", len(self.node2idx),
                    len(self.relation2idx))

    def split_edges(self, df, train_ratio=0.7, val_ratio=0.15, test_ratio=0.15,
                    random_seed=42, target_relation="drug-gene"):
        from sklearn.model_selection import train_test_split

        mask = df["relation_standard"] == target_relation
        if not mask.any():
            logger.warning("No %s rows; falling back to gene-disease",
                           target_relation)
            target_relation = "gene-disease"
            mask = df["relation_standard"] == target_relation
        target_df, other_df = df[mask], df[~mask]

        np.random.seed(random_seed)
        train_t, valtest_t = train_test_split(
            target_df, test_size=val_ratio + test_ratio,
            random_state=random_seed)
        val_adj = val_ratio / (val_ratio + test_ratio)
        val_t, test_t = train_test_split(valtest_t, test_size=1 - val_adj,
                                         random_state=random_seed)
        train_df = pd.concat([train_t, other_df], ignore_index=True)
        self.stats["train_edges"] = len(train_df)
        self.stats["val_edges"] = len(val_t)
        self.stats["test_edges"] = len(test_t)
        self.stats["train_target_edges"] = len(train_t)
        logger.info("Split: train %d (target %d) / val %d / test %d",
                    len(train_df), len(train_t), len(val_t), len(test_t))
        return train_df, val_t.copy(), test_t.copy()

    def convert_split(self, df: pd.DataFrame) -> Dict:
        """Rows -> bidirectional edge arrays via vectorized index lookup."""
        num_nodes = len(self.node2idx)
        sidx = self._lookup(df["x_id"].astype(str), df["x_type"])
        tidx = self._lookup(df["y_id"].astype(str), df["y_type"])
        rid = df["relation_standard"].map(self.relation2idx).to_numpy()
        valid = (sidx >= 0) & (tidx >= 0)
        dropped = int((~valid).sum())
        if dropped:
            logger.warning("Skipped %d rows with unmapped endpoints", dropped)
        s, t, r = sidx[valid], tidx[valid], rid[valid]
        # Forward + reverse edge per row, interleaved like the reference
        # (preprocess.py:228-234 appends fwd then rev for each row).
        edge_index = np.empty((2, 2 * len(s)), dtype=np.int64)
        edge_index[0, 0::2], edge_index[1, 0::2] = s, t
        edge_index[0, 1::2], edge_index[1, 1::2] = t, s
        edge_type = np.repeat(r, 2)
        return {
            "edge_index": edge_index,
            "edge_type": edge_type,
            "num_nodes": num_nodes,
            "num_relations": len(self.relation2idx),
        }

    def _lookup(self, ids, types) -> np.ndarray:
        keys = list(zip(ids, types))
        return np.fromiter((self.node2idx.get(k, -1) for k in keys),
                           dtype=np.int64, count=len(keys))

    def save_processed_data(self, train_df, val_df, test_df, full_df) -> None:
        from primekg_rgcn_tpu.data import artifacts

        splits = {
            "train_data": self.convert_split(train_df),
            "val_data": self.convert_split(val_df),
            "test_data": self.convert_split(test_df),
            "full_graph": self.convert_split(full_df),
        }
        for name, split in splits.items():
            if self.write_torch:
                artifacts.save_split_pt(self.processed_data_path / f"{name}.pt",
                                        split)
            artifacts.save_split_npz(
                self.processed_data_path / f"{name}.npz", split)

        mappings = {
            "node2idx": self.node2idx,
            "idx2node": self.idx2node,
            "relation2idx": self.relation2idx,
            "idx2relation": self.idx2relation,
        }
        if self.write_torch:
            artifacts.save_mappings(self.processed_data_path / "mappings.pt",
                                    mappings)
        artifacts.save_mappings(self.processed_data_path / "mappings.json",
                                mappings)

        train_df.to_csv(self.processed_data_path / "train_edges.csv",
                        index=False)
        val_df.to_csv(self.processed_data_path / "val_edges.csv", index=False)
        test_df.to_csv(self.processed_data_path / "test_edges.csv",
                       index=False)
        pd.DataFrame([self.stats]).to_csv(
            self.processed_data_path / "statistics.csv", index=False)
        logger.info("Saved processed data to %s", self.processed_data_path)

    def process(self, train_ratio=0.7, val_ratio=0.15, test_ratio=0.15,
                random_seed=42, target_relation="drug-gene") -> None:
        df = self.load_data()
        filtered = self.filter_subgraph(df)
        self.build_mappings(filtered)
        train_df, val_df, test_df = self.split_edges(
            filtered, train_ratio, val_ratio, test_ratio, random_seed,
            target_relation)
        self.save_processed_data(train_df, val_df, test_df, filtered)
        logger.info("Preprocessing complete")


def main(argv: Optional[list] = None):
    import argparse

    p = argparse.ArgumentParser(
        description="Preprocess PrimeKG data for RGCN link prediction")
    p.add_argument("--raw-data", default="data/raw/kg.csv")
    p.add_argument("--processed-dir", default="data/processed")
    p.add_argument("--train-ratio", type=float, default=0.7)
    p.add_argument("--val-ratio", type=float, default=0.15)
    p.add_argument("--test-ratio", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--target-relation", default="drug-gene")
    p.add_argument("--keep-all-relations", action="store_true",
                   help="skip the 3-relation/3-node-type filter and keep the "
                        "FULL knowledge graph (~129K nodes, ~30 relations); "
                        "the drug-gene trio still gets standardized names so "
                        "the split target is unchanged")
    p.add_argument("--no-torch", action="store_true",
                   help="write only the native .npz/.json artifacts")
    args = p.parse_args(argv)

    if abs(args.train_ratio + args.val_ratio + args.test_ratio - 1.0) > 1e-6:
        raise ValueError("train/val/test ratios must sum to 1.0")

    logging.basicConfig(level=logging.INFO)
    pp = PrimeKGPreprocessor(args.raw_data, args.processed_dir,
                             write_torch=not args.no_torch,
                             keep_all_relations=args.keep_all_relations)
    pp.process(args.train_ratio, args.val_ratio, args.test_ratio, args.seed,
               args.target_relation)


if __name__ == "__main__":
    main()
