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
