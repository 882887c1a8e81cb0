"""BASELINE.json config 3: full (unfiltered) PrimeKG — the ~30-relation
synthetic stand-in, --keep-all-relations preprocessing, and a training smoke
test over the 30-relation bucketing."""

import numpy as np
import pandas as pd
import pytest


def test_primekg_full_like_census():
    from primekg_rgcn_tpu.data.synthetic import (
        PRIMEKG_FULL_RELATIONS,
        PRIMEKG_FULL_TYPE_SIZES,
        primekg_full_like,
    )

    assert sum(PRIMEKG_FULL_TYPE_SIZES.values()) == 129_375
    assert len(PRIMEKG_FULL_RELATIONS) == 30
    raw = primekg_full_like(seed=0, scale=1.0)
    assert raw["num_nodes"] == 129_375
    assert raw["num_relations"] == 30
    directed = 2 * len(raw["src"])
    assert 4.0e6 < directed < 5.0e6  # "~4.5M directed edges"
    # Bucket skew spans orders of magnitude (the per-relation bucketing
    # stress this config exists for).
    counts = np.bincount(raw["rel"], minlength=30)
    assert counts.min() >= 8
    assert counts.max() / max(counts.min(), 1) > 500
    # Endpoints live inside their declared type ranges.
    assert raw["src"].min() >= 0 and raw["dst"].max() < raw["num_nodes"]


def test_keep_all_relations_preprocess(tmp_path):
    """--keep-all-relations keeps every node type and relation while still
    standardizing the reference trio (so the drug-gene split target is
    unchanged; reference filter: src/preprocess.py:56-65)."""
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(60):
        d, g = rng.integers(10), rng.integers(20)
        rows.append(("drug_protein", f"DB{d}", "drug", f"drug{d}",
                     f"P{g}", "gene/protein", f"gene{g}"))
    for _ in range(30):
        a, b = rng.integers(20), rng.integers(20)
        rows.append(("protein_protein", f"P{a}", "gene/protein", f"gene{a}",
                     f"P{b}", "gene/protein", f"gene{b}"))
    # Rows the reference filter would drop: new node types + relations.
    for _ in range(25):
        an, g = rng.integers(8), rng.integers(20)
        rows.append(("anatomy_protein_present", f"A{an}", "anatomy",
                     f"anat{an}", f"P{g}", "gene/protein", f"gene{g}"))
    for _ in range(15):
        d1, d2 = rng.integers(10), rng.integers(10)
        rows.append(("drug_drug", f"DB{d1}", "drug", f"drug{d1}",
                     f"DB{d2}", "drug", f"drug{d2}"))
    df = pd.DataFrame(rows, columns=["relation", "x_id", "x_type", "x_name",
                                     "y_id", "y_type", "y_name"])
    df.to_csv(tmp_path / "kg.csv", index=False)

    from primekg_rgcn_tpu.data import artifacts
    from primekg_rgcn_tpu.data.preprocess import main as pp_main

    pp_main(["--raw-data", str(tmp_path / "kg.csv"),
             "--processed-dir", str(tmp_path / "full"),
             "--keep-all-relations", "--no-torch"])
    m = artifacts.load_mappings(tmp_path / "full" / "mappings.json")
    rels = set(m["relation2idx"])
    # Trio standardized, extras verbatim.
    assert {"drug-gene", "gene-gene"} <= rels
    assert {"anatomy_protein_present", "drug_drug"} <= rels
    types = {t for (_, _, t) in m["idx2node"].values()}
    assert "anatomy" in types

    # Filtered mode on the same csv drops the extras (reference behavior).
    pp_main(["--raw-data", str(tmp_path / "kg.csv"),
             "--processed-dir", str(tmp_path / "filtered"), "--no-torch"])
    m2 = artifacts.load_mappings(tmp_path / "filtered" / "mappings.json")
    assert set(m2["relation2idx"]) <= {"drug-gene", "gene-gene",
                                       "gene-disease"}


def test_full_relation_training_smoke():
    """One train step + one eval over a 30-relation graph (reduced scale)."""
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_full_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.loop import (
        TrainState,
        build_train_epoch,
        make_optimizer,
    )

    raw = primekg_full_like(seed=0, scale=0.03)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"],
                            raw["num_relations"], bucket_pad_multiple=64)
    assert graph.num_relations == 30
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    mcfg = ModelConfig(num_nodes=raw["num_nodes"],
                       num_relations=raw["num_relations"],
                       embedding_dim=8, hidden_dim=8)
    tcfg = TrainConfig(batch_size=256, lr=1e-2)
    opt = make_optimizer(tcfg)
    params = init_params(jax.random.PRNGKey(0), mcfg)
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    epoch = build_train_epoch(graph, edges, mcfg, tcfg, opt,
                              layer_fn=rgcn_layer_segment)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state, (loss, acc) = epoch(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
