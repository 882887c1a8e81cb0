"""Op-layer parity tests: segment-sum path vs. dense oracle vs. hand math.

The reference has no tests for its message-passing math (it trusts PyG);
these tests pin the documented RGCNConv semantics (SURVEY.md §2.1/C7):
per-relation mean aggregation over in-neighbors + root transform + bias,
zero contribution for zero-degree nodes, basis decomposition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.data.graph import build_rel_graph, edge_arrays_from_graph
from primekg_rgcn_tpu.ops.rgcn_dense import rgcn_layer_dense
from primekg_rgcn_tpu.ops.rgcn_segment import (
    materialize_relation_weights,
    rgcn_layer_segment,
)


def _rand_layer_params(key, din, dout, num_relations, num_bases=None):
    ks = jax.random.split(key, 4)
    p = {
        "w_root": jax.random.normal(ks[0], (din, dout)) * 0.1,
        "bias": jax.random.normal(ks[1], (dout,)) * 0.1,
    }
    if num_bases is None:
        p["w_rel"] = jax.random.normal(ks[2], (num_relations, din, dout)) * 0.1
    else:
        p["basis"] = jax.random.normal(ks[2], (num_bases, din, dout)) * 0.1
        p["coef"] = jax.random.normal(ks[3], (num_relations, num_bases)) * 0.1
    return p


def test_segment_matches_dense_oracle(tiny_graph):
    g = tiny_graph
    key = jax.random.PRNGKey(1)
    params = _rand_layer_params(key, 16, 24, g["num_relations"])
    x = jax.random.normal(jax.random.PRNGKey(2), (g["num_nodes"], 16))

    out_dense = rgcn_layer_dense(
        params, x, jnp.asarray(g["src"]), jnp.asarray(g["dst"]),
        jnp.asarray(g["rel"]), g["num_nodes"], g["num_relations"])
    out_seg = rgcn_layer_segment(params, x, g["graph"])
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_seg),
                               rtol=1e-5, atol=1e-5)


def test_segment_matches_dense_oracle_basis(tiny_graph):
    g = tiny_graph
    params = _rand_layer_params(jax.random.PRNGKey(3), 16, 24,
                                g["num_relations"], num_bases=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (g["num_nodes"], 16))
    out_dense = rgcn_layer_dense(
        params, x, jnp.asarray(g["src"]), jnp.asarray(g["dst"]),
        jnp.asarray(g["rel"]), g["num_nodes"], g["num_relations"])
    out_seg = rgcn_layer_segment(params, x, g["graph"])
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_seg),
                               rtol=1e-5, atol=1e-5)


def test_hand_computed_mean_semantics():
    """Pin exact RGCNConv math on a 4-node graph computed by hand.

    Graph (relation 0): edges 1->0, 2->0, 3->2. Node 0 has two in-neighbors
    under r0 so it receives mean(W0 x1, W0 x2); node 2 receives W0 x3;
    nodes 1, 3 (zero in-degree) receive only root + bias.
    """
    num_nodes, num_relations = 4, 2
    src = np.array([1, 2, 3])
    dst = np.array([0, 0, 2])
    rel = np.array([0, 0, 0])
    graph = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                            bucket_pad_multiple=8)

    din = dout = 2
    w0 = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    w1 = jnp.array([[5.0, 6.0], [7.0, 8.0]])
    w_root = jnp.eye(2) * 10.0
    bias = jnp.array([0.5, -0.5])
    params = {"w_rel": jnp.stack([w0, w1]), "w_root": w_root, "bias": bias}
    x = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, -1.0]])

    out = np.asarray(rgcn_layer_segment(params, x, graph))

    exp = np.zeros((4, 2))
    xw0 = np.asarray(x @ w0)
    exp[0] = (xw0[1] + xw0[2]) / 2.0
    exp[2] = xw0[3]
    exp += np.asarray(x @ w_root) + np.asarray(bias)
    np.testing.assert_allclose(out, exp, rtol=1e-6, atol=1e-6)


def test_padding_contributes_zero():
    """Same edges, wildly different padding capacities -> identical output."""
    rng = np.random.default_rng(5)
    n, r, e = 30, 2, 100
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    x = jax.random.normal(jax.random.PRNGKey(6), (n, 8))
    params = _rand_layer_params(jax.random.PRNGKey(7), 8, 8, r)

    g_small = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=8)
    g_big = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=512)
    out_small = rgcn_layer_segment(params, x, g_small)
    out_big = rgcn_layer_segment(params, x, g_big)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_big),
                               rtol=1e-6, atol=1e-6)


def test_invalid_edges_dropped():
    """Out-of-range node ids are filtered at graph build, mirroring the
    reference's defensive load-time filter (reference: src/train.py:571-591)."""
    src = np.array([0, 1, 99, 2])
    dst = np.array([1, 2, 0, 98])
    rel = np.array([0, 0, 0, 0])
    g = build_rel_graph(src, dst, rel, num_nodes=10, num_relations=1)
    assert g.num_edges == 2
    s, d, r = edge_arrays_from_graph(g)
    assert len(s) == 2 and set(zip(s, d)) == {(0, 1), (1, 2)}


def test_materialize_basis_weights():
    basis = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    coef = jnp.array([[1.0, 0.0], [0.5, 0.5]])
    w = materialize_relation_weights({"basis": basis, "coef": coef})
    np.testing.assert_allclose(np.asarray(w[0]), np.asarray(basis[0]))
    np.testing.assert_allclose(np.asarray(w[1]),
                               np.asarray(0.5 * basis[0] + 0.5 * basis[1]))


def test_gradients_flow_and_match_oracle(tiny_graph):
    """d(loss)/d(params) identical between segment path and dense oracle."""
    g = tiny_graph
    params = _rand_layer_params(jax.random.PRNGKey(8), 8, 8, g["num_relations"])
    x = jax.random.normal(jax.random.PRNGKey(9), (g["num_nodes"], 8))

    def loss_seg(p):
        return jnp.sum(rgcn_layer_segment(p, x, g["graph"]) ** 2)

    def loss_dense(p):
        out = rgcn_layer_dense(p, x, jnp.asarray(g["src"]), jnp.asarray(g["dst"]),
                               jnp.asarray(g["rel"]), g["num_nodes"],
                               g["num_relations"])
        return jnp.sum(out ** 2)

    gs = jax.grad(loss_seg)(params)
    gd = jax.grad(loss_dense)(params)
    for k in gs:
        np.testing.assert_allclose(np.asarray(gs[k]), np.asarray(gd[k]),
                                   rtol=1e-4, atol=1e-4)
