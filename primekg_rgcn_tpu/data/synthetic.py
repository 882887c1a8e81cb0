"""Synthetic graph generators.

The reference ships only val/test splits and mappings (no train graph, no raw
kg.csv), so training-scale experiments and benchmarks need synthetic graphs
with the published PrimeKG statistics (reference: data/processed/statistics.csv:
30,926 nodes = 6,282 drug + 19,093 gene + 5,593 disease (node-id order is
disease < drug < gene per the sorted mapping in reference preprocess.py:158);
854,278 undirected filtered rows = 51,306 drug-gene + 642,150 gene-gene +
160,822 gene-disease, each stored as forward + reverse directed edges).

Also provides an RMAT generator for the multi-host scaling configs in
BASELINE.json (10M nodes / 100M edges / 50 relations).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# Node-type index ranges matching the reference's sorted node mapping
# (sorted by (node_type, node_id): disease < drug < gene/protein). Note the
# reference's statistics.csv per-type counts (5593/6282/19093) sum to 30,968,
# but its actual node mapping holds 30,926 entries (README.md, mappings.pt) —
# the stats were computed before (id, type) de-duplication. We pin the real
# total and absorb the difference in the gene count.
PRIMEKG_NUM_DISEASE = 5593
PRIMEKG_NUM_DRUG = 6282
PRIMEKG_NUM_GENE = 19051
PRIMEKG_NUM_NODES = PRIMEKG_NUM_DISEASE + PRIMEKG_NUM_DRUG + PRIMEKG_NUM_GENE
assert PRIMEKG_NUM_NODES == 30926

# Undirected row counts per standardized relation (statistics.csv).
PRIMEKG_REL_ROWS = {"drug-gene": 51306, "gene-gene": 642150, "gene-disease": 160822}
# Relation ids follow the reference's sorted(unique) order
# (preprocess.py:166-169): drug-gene=0, gene-disease=1, gene-gene=2.
PRIMEKG_RELATIONS = ("drug-gene", "gene-disease", "gene-gene")


def _sample_powerlaw_endpoints(
    rng: np.random.Generator, n_rows: int, lo: int, hi: int, alpha: float
) -> np.ndarray:
    """Sample node ids in [lo, hi) with a Zipf-like preferential skew.

    Real PrimeKG degree distributions are heavy-tailed (hub genes with
    thousands of interactions); benchmarks must reproduce that skew because it
    stresses the scatter-add far more than uniform edges do.
    """
    n = hi - lo
    # Inverse-CDF sampling of a truncated power law over ranks.
    u = rng.random(n_rows)
    ranks = np.floor(n * u ** alpha).astype(np.int64)
    perm = rng.permutation(n)
    return lo + perm[np.clip(ranks, 0, n - 1)]


def primekg_like(
    seed: int = 0,
    scale: float = 1.0,
    *,
    alpha: float = 2.5,
    structure: str = "community",
    n_communities: int = 64,
    p_structured: float = 0.8,
) -> Dict[str, np.ndarray]:
    """Generate a PrimeKG-shaped heterogeneous graph.

    Returns a dict with undirected rows: src, dst, rel (int64 arrays) plus
    num_nodes / num_relations, using the reference's node-id layout. ``scale``
    < 1 shrinks node and row counts proportionally (for tests).

    structure: "community" (default) assigns every node a latent community
    and draws ``p_structured`` of each relation's rows within-community, so
    held-out edges are genuinely predictable from the graph — an honest
    end-to-end learnability check. "none" draws endpoints independently
    (degree effects are then the only learnable signal; real PrimeKG's
    biology has no counterpart in such a graph).
    """
    rng = np.random.default_rng(seed)
    nd = max(int(PRIMEKG_NUM_DISEASE * scale), 4)
    ng = max(int(PRIMEKG_NUM_DRUG * scale), 4)
    npr = max(int(PRIMEKG_NUM_GENE * scale), 8)
    disease = (0, nd)
    drug = (nd, nd + ng)
    gene = (nd + ng, nd + ng + npr)
    num_nodes = nd + ng + npr

    rows_src, rows_dst, rows_rel = [], [], []
    specs = {
        # relation id -> (src range, dst range): forward direction matches the
        # raw PrimeKG rows (drug->gene, gene->gene, disease->gene).
        0: (drug, gene, int(PRIMEKG_REL_ROWS["drug-gene"] * scale * scale) or 16),
        1: (disease, gene, int(PRIMEKG_REL_ROWS["gene-disease"] * scale * scale) or 16),
        2: (gene, gene, int(PRIMEKG_REL_ROWS["gene-gene"] * scale * scale) or 16),
    }
    # Latent communities over the whole node space (community of node i is
    # stable across relations, so drug->gene and gene->disease structure
    # compose into learnable drug..disease paths).
    community = rng.integers(0, n_communities, num_nodes)

    for rid, (srange, drange, n_rows) in specs.items():
        s = _sample_powerlaw_endpoints(rng, n_rows, srange[0], srange[1], alpha)
        d = _sample_powerlaw_endpoints(rng, n_rows, drange[0], drange[1], alpha)
        if structure == "community":
            # Rewire a fraction of destinations to a random member of the
            # source's community (within the destination type range).
            dst_ids = np.arange(drange[0], drange[1])
            dst_comm = community[dst_ids]
            order = np.argsort(dst_comm, kind="stable")
            sorted_ids = dst_ids[order]
            bounds = np.searchsorted(dst_comm[order],
                                     np.arange(n_communities + 1))
            rewire = rng.random(n_rows) < p_structured
            cs = community[s]
            lo, hi = bounds[cs], bounds[np.minimum(cs + 1, n_communities)]
            has_member = hi > lo
            # Power-law rank within the community keeps the heavy-tailed
            # (hub-node) degree profile the scatter benchmarks rely on.
            u = rng.random(n_rows)
            offset = np.floor(np.maximum(hi - lo, 1) * u ** alpha).astype(
                np.int64)
            pick = lo + np.minimum(offset, np.maximum(hi - lo - 1, 0))
            d = np.where(rewire & has_member, sorted_ids[pick], d)
        # Every source-type entity appears in at least one row (in real
        # PrimeKG a node exists only because some row references it; pure
        # power-law sampling would leave tail drugs/diseases isolated and
        # make path/case-study analyses degenerate). Overwrites the first
        # |range| rows, keeping row counts identical to the statistics.
        n_src = srange[1] - srange[0]
        if n_rows >= n_src:
            s[:n_src] = np.arange(srange[0], srange[1])
        rows_src.append(s)
        rows_dst.append(d)
        rows_rel.append(np.full(n_rows, rid, dtype=np.int64))

    return {
        "src": np.concatenate(rows_src),
        "dst": np.concatenate(rows_dst),
        "rel": np.concatenate(rows_rel),
        "num_nodes": num_nodes,
        "num_relations": 3,
        "type_ranges": {"disease": disease, "drug": drug, "gene/protein": gene},
    }


# Full (unfiltered) PrimeKG stand-in: BASELINE.json config 3 — ~129K nodes,
# ~30 relation types, ~4.5M directed edges. The reference repo ships neither
# the raw kg.csv nor the full graph, so the generator approximates the public
# PrimeKG type/relation census (node-type sizes sum to 129,375; undirected
# row counts below sum to ~2.26M -> ~4.5M directed after bidirect) with the
# same power-law endpoint skew as primekg_like. What matters for the bench is
# the SHAPE: 12 node types' worth of id ranges, 30 relation buckets spanning
# 4 orders of magnitude (1.2K .. 800K rows) — exactly the per-relation
# bucketing stress the config exists to measure.
PRIMEKG_FULL_TYPE_SIZES = {
    "gene/protein": 27671, "drug": 7957, "disease": 17080,
    "anatomy": 14035, "biological_process": 28642,
    "molecular_function": 11169, "cellular_component": 4176,
    "pathway": 2516, "effect/phenotype": 15311, "exposure": 818,
}
PRIMEKG_FULL_RELATIONS = (
    # (name, src_type, dst_type, undirected rows)
    ("anatomy_protein_present", "anatomy", "gene/protein", 800_000),
    ("protein_protein", "gene/protein", "gene/protein", 321_075),
    ("drug_drug", "drug", "drug", 300_000),
    ("bioprocess_protein", "biological_process", "gene/protein", 180_000),
    ("cellcomp_protein", "cellular_component", "gene/protein", 90_000),
    ("disease_phenotype_positive", "disease", "effect/phenotype", 90_000),
    ("disease_protein", "disease", "gene/protein", 80_411),
    ("molfunc_protein", "molecular_function", "gene/protein", 70_000),
    ("bioprocess_bioprocess", "biological_process", "biological_process",
     60_000),
    ("drug_effect", "drug", "effect/phenotype", 50_000),
    ("pathway_protein", "pathway", "gene/protein", 40_000),
    ("disease_disease", "disease", "disease", 35_000),
    ("anatomy_anatomy", "anatomy", "anatomy", 30_000),
    ("contraindication", "drug", "disease", 30_000),
    ("drug_protein", "drug", "gene/protein", 25_653),
    ("phenotype_phenotype", "effect/phenotype", "effect/phenotype", 25_000),
    ("anatomy_protein_absent", "anatomy", "gene/protein", 20_000),
    ("indication", "drug", "disease", 18_000),
    ("molfunc_molfunc", "molecular_function", "molecular_function", 13_000),
    ("phenotype_protein", "effect/phenotype", "gene/protein", 6_000),
    ("cellcomp_cellcomp", "cellular_component", "cellular_component", 4_000),
    ("off_label_use", "drug", "disease", 2_500),
    ("pathway_pathway", "pathway", "pathway", 2_500),
    ("exposure_disease", "exposure", "disease", 2_000),
    ("exposure_exposure", "exposure", "exposure", 1_500),
    ("exposure_bioprocess", "exposure", "biological_process", 1_500),
    ("exposure_protein", "exposure", "gene/protein", 1_200),
    ("disease_phenotype_negative", "disease", "effect/phenotype", 1_000),
    ("exposure_molfunc", "exposure", "molecular_function", 300),
    ("exposure_cellcomp", "exposure", "cellular_component", 200),
)


def primekg_full_like(seed: int = 0, scale: float = 1.0,
                      *, alpha: float = 2.5) -> Dict[str, np.ndarray]:
    """Full-PrimeKG-shaped graph: 129,375*scale nodes, 30 relations,
    ~2.26M*scale^2 undirected rows (~4.5M*scale^2 directed after bidirect).

    Same return contract as :func:`primekg_like` (undirected rows + type
    ranges); relation ids follow sorted(name) order like the reference's
    mapping build (reference: src/preprocess.py:166-169).
    """
    rng = np.random.default_rng(seed)
    ranges: Dict[str, Tuple[int, int]] = {}
    lo = 0
    # Sorted type order mirrors the reference's (type, id, name) node sort.
    for t in sorted(PRIMEKG_FULL_TYPE_SIZES):
        n_t = max(int(PRIMEKG_FULL_TYPE_SIZES[t] * scale), 4)
        ranges[t] = (lo, lo + n_t)
        lo += n_t
    num_nodes = lo

    names = sorted(r[0] for r in PRIMEKG_FULL_RELATIONS)
    rel_id = {n: i for i, n in enumerate(names)}
    rows_src, rows_dst, rows_rel = [], [], []
    for name, st, dt, rows in PRIMEKG_FULL_RELATIONS:
        n_rows = max(int(rows * scale * scale), 8)
        s = _sample_powerlaw_endpoints(rng, n_rows, *ranges[st], alpha)
        d = _sample_powerlaw_endpoints(rng, n_rows, *ranges[dt], alpha)
        rows_src.append(s)
        rows_dst.append(d)
        rows_rel.append(np.full(n_rows, rel_id[name], dtype=np.int64))

    return {
        "src": np.concatenate(rows_src),
        "dst": np.concatenate(rows_dst),
        "rel": np.concatenate(rows_rel),
        "num_nodes": num_nodes,
        "num_relations": len(names),
        "relation_names": tuple(names),
        "type_ranges": ranges,
    }


def bidirect(src: np.ndarray, dst: np.ndarray, rel: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Add a reverse edge with the same relation id for every row.

    Matches the reference's undirected-graph convention (reference:
    src/preprocess.py:228-234: each CSV row emits forward + reverse directed
    edges with the same relation id).
    """
    return (
        np.concatenate([src, dst]),
        np.concatenate([dst, src]),
        np.concatenate([rel, rel]),
    )


def rmat(
    num_nodes: int,
    num_edges: int,
    num_relations: int,
    seed: int = 0,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
) -> Dict[str, np.ndarray]:
    """R-MAT power-law graph generator (Chakrabarti et al. 2004).

    Used for the synthetic multi-host scaling config in BASELINE.json
    (10M nodes / 100M edges / 50 relations). Vectorized: generates all edge
    bits at once, O(E log N) with no Python loops over edges.
    """
    rng = np.random.default_rng(seed)
    n_bits = max(int(np.ceil(np.log2(max(num_nodes, 2)))), 1)
    src = np.zeros(num_edges, dtype=np.int64)
    dst = np.zeros(num_edges, dtype=np.int64)
    for _ in range(n_bits):
        r = rng.random(num_edges)
        src_bit = (r >= a + b).astype(np.int64)          # quadrants c, d
        dst_bit = ((r >= a) & (r < a + b) | (r >= a + b + c)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    src %= num_nodes
    dst %= num_nodes
    rel = rng.integers(0, num_relations, num_edges, dtype=np.int64)
    return {
        "src": src,
        "dst": dst,
        "rel": rel,
        "num_nodes": num_nodes,
        "num_relations": num_relations,
    }


def synthetic_mappings(raw: Dict[str, np.ndarray]) -> Dict:
    """Reference-format mappings for a primekg_like graph.

    Gives synthetic nodes stable ids/names/types so the analysis suite
    (name lookup, per-type indexing) runs on synthetically trained models.
    """
    idx2node = {}
    node2idx = {}
    for ntype, (lo, hi) in raw["type_ranges"].items():
        tag = {"drug": "drug", "disease": "disease",
               "gene/protein": "gene"}[ntype]
        for i in range(lo, hi):
            nid = f"SYN{tag.upper()}{i - lo}"
            name = f"synthetic {tag} {i - lo}"
            idx2node[i] = (nid, name, ntype)
            node2idx[(nid, ntype)] = i
    relation2idx = {r: i for i, r in enumerate(PRIMEKG_RELATIONS)}
    return {
        "node2idx": node2idx,
        "idx2node": idx2node,
        "relation2idx": relation2idx,
        "idx2relation": {i: r for r, i in relation2idx.items()},
    }
