"""ICI-roofline projection (bench/ici_roofline.py): the math and the
structural claims docs/PARALLELISM.md rests on. No reference counterpart —
the reference has no distributed layer (SURVEY.md §2.4)."""

import numpy as np

from primekg_rgcn_tpu.bench.ici_roofline import (
    ICI_RING, project_layout, to_markdown, verdict_summary)
from primekg_rgcn_tpu.bench.scaling import comms_bytes_model
from primekg_rgcn_tpu.config import ModelConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like


def _graph(scale=0.05):
    raw = primekg_like(seed=0, scale=scale)
    s, d, r = bidirect(raw["src"], raw["dst"], raw["rel"])
    return build_rel_graph(s, d, r, raw["num_nodes"], raw["num_relations"])


def test_project_layout_math():
    # 10 ms single-chip step, 90 MB at n=2 over v5e's 90 GB/s ring
    # bandwidth -> t_ici = 1 ms exactly.
    rows = project_layout(10.0, {2: 90 * 10**9 // 1000}, hw="v5e")
    r = rows["2"]
    assert r["t_comp_ms"] == 5.0
    assert abs(r["t_ici_ms"] - 1.0) < 1e-6
    assert r["eff_overlapped"] == 1.0              # max(5, 1) = 5 = t1/n
    assert abs(r["eff_serial"] - 10.0 / (2 * 6.0)) < 1e-3
    assert r["verdict_80pct"] == "meets"

    # Comms-dominated: 10x the bytes -> t_ici = 10 ms > t_comp.
    r = project_layout(10.0, {2: 90 * 10**10 // 1000}, hw="v5e")["2"]
    assert r["eff_overlapped"] < 0.8
    assert r["verdict_80pct"] == "misses"


def test_bounds_ordering_and_bandwidths():
    assert ICI_RING["v5p"] == 2 * ICI_RING["v5e"]
    rows = project_layout(25.0, {2: 10**8, 4: 2 * 10**8, 8: 3 * 10**8})
    for r in rows.values():
        assert 0 < r["eff_serial"] <= r["eff_overlapped"] <= 1.0
        assert r["verdict_80pct"] in ("meets", "misses", "borderline")


def test_node_layout_ships_less_than_edge():
    """The structural claim: halo traffic (O(cut)) undercuts the edge
    layout's replication psum (O(R*N*D)) at every device count."""
    g = _graph()
    cfg = ModelConfig(num_nodes=g.num_nodes, num_relations=g.num_relations)
    for n in (2, 4, 8):
        m = comms_bytes_model(g, cfg, n)
        assert (m["node_shard"]["per_device_step_bytes"]
                < m["edge_shard"]["per_device_step_bytes"])
        # Edge psum payload is independent of n; the ring factor grows.
        assert m["edge_shard"]["per_layer_psum_bytes"] == \
            comms_bytes_model(g, cfg, 2)["edge_shard"]["per_layer_psum_bytes"]


def test_projection_summary_and_markdown():
    g = _graph()
    cfg = ModelConfig(num_nodes=g.num_nodes, num_relations=g.num_relations)
    models = {n: comms_bytes_model(g, cfg, n) for n in (2, 4, 8)}
    bytes_edge = {n: m["edge_shard"]["per_device_step_bytes"]
                  for n, m in models.items()}
    proj = {"configs": {"tiny": {"graph": {}, "t1_source": {},
                                 "v5e": {"edge": {"t1_ms": 37.0,
                                                  **project_layout(
                                                      37.0, bytes_edge)}}}}}
    md = to_markdown(proj, "v5e")
    assert md.count("\n") >= 4 and "| tiny | edge | 8 |" in md
    summ = verdict_summary(proj, "v5e")
    assert "edge" in summ["tiny"] and "80% target" in summ["tiny"]


def test_committed_report_row_is_consistent():
    """The bench_report.json ici-roofline row (if present) must agree with
    a recomputation of its own projection math."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "bench_report.json"
    if not path.exists():
        return
    row = json.load(open(path))["results"].get("ici-roofline")
    if row is None:
        return
    for cname, c in row["configs"].items():
        for hw in ("v5e", "v5p"):
            for lname, rows in c.get(hw, {}).items():
                t1 = rows["t1_ms"]
                for n in ("2", "4", "8"):
                    r = rows.get(n)
                    if not r:
                        continue
                    redo = project_layout(
                        t1, {int(n): int(r["ici_mb"] * 2**20)}, hw)[n]
                    np.testing.assert_allclose(
                        r["eff_serial"], redo["eff_serial"], atol=2e-3,
                        err_msg=f"{cname}/{hw}/{lname}/n={n}")
                    assert r["verdict_80pct"] == redo["verdict_80pct"] or \
                        abs(r["eff_serial"] - 0.8) < 0.02
