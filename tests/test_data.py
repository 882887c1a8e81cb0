"""Data-layer tests: preprocessing pipeline behavior, artifact round-trips,
compatibility with the reference's shipped .pt files, synthetic generators."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from primekg_rgcn_tpu.data import artifacts
from primekg_rgcn_tpu.data.preprocess import PrimeKGPreprocessor
from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like, rmat

REFERENCE_DATA = Path("/root/reference/data/processed")


def _tiny_kg_csv(path):
    """A miniature kg.csv with the PrimeKG schema: extra node types and
    relations that must be filtered out, plus all three kept relations."""
    rows = [
        # relation, x_id, x_type, x_name, y_id, y_type, y_name
        ("drug_protein", "DB01", "drug", "aspirin", "P1", "gene/protein", "COX1"),
        ("drug_protein", "DB01", "drug", "aspirin", "P2", "gene/protein", "COX2"),
        ("drug_protein", "DB02", "drug", "ibuprofen", "P1", "gene/protein", "COX1"),
        ("drug_protein", "DB03", "drug", "metformin", "P3", "gene/protein", "AMPK"),
        ("drug_protein", "DB04", "drug", "statin", "P4", "gene/protein", "HMGCR"),
        ("drug_protein", "DB05", "drug", "warfarin", "P5", "gene/protein", "VKORC1"),
        ("protein_protein", "P1", "gene/protein", "COX1", "P2", "gene/protein", "COX2"),
        ("protein_protein", "P2", "gene/protein", "COX2", "P3", "gene/protein", "AMPK"),
        ("disease_protein", "D1", "disease", "inflammation", "P1", "gene/protein", "COX1"),
        ("disease_protein", "D2", "disease", "diabetes", "P3", "gene/protein", "AMPK"),
        # must be filtered out:
        ("drug_drug", "DB01", "drug", "aspirin", "DB02", "drug", "ibuprofen"),
        ("phenotype_protein", "H1", "effect/phenotype", "fever", "P1",
         "gene/protein", "COX1"),
    ]
    df = pd.DataFrame(rows, columns=["relation", "x_id", "x_type", "x_name",
                                     "y_id", "y_type", "y_name"])
    df.to_csv(path, index=False)
    return df


def test_preprocess_pipeline(tmp_path):
    raw = tmp_path / "kg.csv"
    _tiny_kg_csv(raw)
    out = tmp_path / "processed"
    pp = PrimeKGPreprocessor(raw, out, write_torch=True)
    pp.process(train_ratio=0.5, val_ratio=0.25, test_ratio=0.25,
               random_seed=42)

    # Filtering: 10 kept rows, 3 relations.
    assert pp.stats["filtered_edges"] == 10
    assert pp.stats["filtered_relations"] == 3
    # Node mapping sorted by (type, id): disease < drug < gene/protein.
    assert pp.idx2node[0][2] == "disease"
    assert pp.relation2idx == {"drug-gene": 0, "gene-disease": 1,
                               "gene-gene": 2}

    # Only drug-gene rows are split; others all stay in train.
    assert (pp.stats["train_edges"]
            == pp.stats["train_target_edges"] + 4)  # 2 gene-gene + 2 gene-dis
    assert (pp.stats["train_target_edges"] + pp.stats["val_edges"]
            + pp.stats["test_edges"] == 6)

    # Artifacts exist in both formats and round-trip.
    for stem in ["train_data", "val_data", "test_data", "full_graph"]:
        assert (out / f"{stem}.pt").exists()
        assert (out / f"{stem}.npz").exists()
        a = artifacts.load_split(out / f"{stem}.pt")
        b = artifacts.load_split(out / f"{stem}.npz")
        np.testing.assert_array_equal(a["edge_index"], b["edge_index"])
        np.testing.assert_array_equal(a["edge_type"], b["edge_type"])

    full = artifacts.load_split(out / "full_graph.pt")
    # Bidirectional: 10 rows -> 20 directed edges.
    assert full["edge_index"].shape == (2, 20)
    # Every forward edge is followed by its reverse.
    ei = full["edge_index"]
    np.testing.assert_array_equal(ei[0, 0::2], ei[1, 1::2])
    np.testing.assert_array_equal(ei[1, 0::2], ei[0, 1::2])

    m = artifacts.load_mappings(out / "mappings.pt")
    mj = artifacts.load_mappings(out / "mappings.json")
    assert m["node2idx"] == mj["node2idx"]
    assert m["idx2relation"] == mj["idx2relation"]

    stats = pd.read_csv(out / "statistics.csv")
    assert int(stats["filtered_edges"].iloc[0]) == 10


def test_split_determinism(tmp_path):
    raw = tmp_path / "kg.csv"
    _tiny_kg_csv(raw)
    outs = []
    for sub in ["a", "b"]:
        pp = PrimeKGPreprocessor(raw, tmp_path / sub, write_torch=False)
        pp.process(random_seed=42)
        outs.append(artifacts.load_split(tmp_path / sub / "test_data.npz"))
    np.testing.assert_array_equal(outs[0]["edge_index"], outs[1]["edge_index"])


@pytest.mark.skipif(not REFERENCE_DATA.exists(),
                    reason="reference artifacts not mounted")
def test_loads_reference_shipped_artifacts():
    """The shipped val/test .pt + mappings.pt must load and match the
    published statistics (reference: data/processed/statistics.csv)."""
    val = artifacts.load_split(REFERENCE_DATA / "val_data.pt")
    test = artifacts.load_split(REFERENCE_DATA / "test_data.pt")
    assert val["num_nodes"] == 30926
    assert val["num_relations"] == 3
    # 7,696 undirected rows -> 15,392 directed edges, of which the shipped
    # files already had the ~invalid ones dropped: 15,362 val / 15,372 test
    # (the latter matches results.json "test_edges": 15372).
    assert val["edge_index"].shape[1] == 15362
    assert test["edge_index"].shape[1] == 15372

    edges = artifacts.split_to_edges(test)
    assert edges.shape[0] == 15372
    assert edges[:, 0].max() < 30926 and edges[:, 1].max() < 30926

    m = artifacts.load_mappings(REFERENCE_DATA / "mappings.pt")
    assert len(m["node2idx"]) == 30926
    assert m["relation2idx"]["drug-gene"] == 0

    g = artifacts.split_to_rel_graph(test)
    assert g.num_nodes == 30926
    assert g.num_edges == edges.shape[0]


def test_primekg_like_generator_statistics():
    raw = primekg_like(seed=0, scale=1.0)
    assert raw["num_nodes"] == 30926
    counts = np.bincount(raw["rel"], minlength=3)
    assert counts[0] == 51306 and counts[1] == 160822 and counts[2] == 642150
    # Endpoint type ranges respected.
    drug_lo, drug_hi = raw["type_ranges"]["drug"]
    gene_lo, gene_hi = raw["type_ranges"]["gene/protein"]
    dg = raw["rel"] == 0
    assert (raw["src"][dg] >= drug_lo).all() and (raw["src"][dg] < drug_hi).all()
    assert (raw["dst"][dg] >= gene_lo).all() and (raw["dst"][dg] < gene_hi).all()
    # Heavy-tailed degrees: top-1% of genes take a large share of gene-gene.
    gg_dst = raw["dst"][raw["rel"] == 2]
    deg = np.bincount(gg_dst - gene_lo)
    top = np.sort(deg)[::-1][: max(len(deg) // 100, 1)].sum()
    assert top / len(gg_dst) > 0.1

    s2, d2, r2 = bidirect(raw["src"], raw["dst"], raw["rel"])
    assert len(s2) == 2 * len(raw["src"])

    # Every drug and disease appears in at least one row (no isolated
    # entities; real PrimeKG nodes exist only via rows).
    dg_src = raw["src"][raw["rel"] == 0]
    dis_src = raw["src"][raw["rel"] == 1]
    drug_lo2, drug_hi2 = raw["type_ranges"]["drug"]
    dis_lo, dis_hi = raw["type_ranges"]["disease"]
    assert len(np.unique(dg_src)) == drug_hi2 - drug_lo2
    assert len(np.unique(dis_src)) == dis_hi - dis_lo


def test_rmat_generator():
    g = rmat(num_nodes=1000, num_edges=20000, num_relations=5, seed=1)
    assert g["src"].shape == (20000,)
    assert g["src"].max() < 1000 and g["dst"].max() < 1000
    assert np.bincount(g["rel"], minlength=5).min() > 0
    # Power-law skew: max degree far above mean.
    deg = np.bincount(g["dst"], minlength=1000)
    assert deg.max() > 10 * deg.mean()
