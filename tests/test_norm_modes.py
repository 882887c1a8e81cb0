"""Normalization-mode tests: dense [R, N] table vs per-edge scales must give
identical layer outputs and gradients; native builder must match numpy in
both modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment


def _edges(seed=0, n=80, r=3, e=1200):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, n, e), rng.integers(0, n, e),
            rng.integers(0, r, e), n, r)


def _params(seed, din, dout, r):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "w_rel": jax.random.normal(ks[0], (r, din, dout)) * 0.1,
        "w_root": jax.random.normal(ks[1], (din, dout)) * 0.1,
        "bias": jax.random.normal(ks[2], (dout,)) * 0.1,
    }


@pytest.mark.parametrize("din,dout", [(16, 24), (24, 16)])
def test_edge_norm_matches_dense(din, dout):
    src, dst, rel, n, r = _edges()
    g_dense = build_rel_graph(src, dst, rel, n, r, norm="dense")
    g_edge = build_rel_graph(src, dst, rel, n, r, norm="edge")
    assert g_dense.norm_mode == "dense" and g_edge.norm_mode == "edge"

    params = _params(1, din, dout, r)
    x = jax.random.normal(jax.random.PRNGKey(2), (n, din))
    out_d = rgcn_layer_segment(params, x, g_dense)
    out_e = rgcn_layer_segment(params, x, g_edge)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)


def test_edge_norm_gradients_match_dense():
    src, dst, rel, n, r = _edges(seed=3)
    g_dense = build_rel_graph(src, dst, rel, n, r, norm="dense")
    g_edge = build_rel_graph(src, dst, rel, n, r, norm="edge")
    params = _params(4, 8, 8, r)
    x = jax.random.normal(jax.random.PRNGKey(5), (n, 8))

    gd = jax.grad(lambda p: jnp.sum(rgcn_layer_segment(p, x, g_dense) ** 2))(
        params)
    ge = jax.grad(lambda p: jnp.sum(rgcn_layer_segment(p, x, g_edge) ** 2))(
        params)
    for k in gd:
        np.testing.assert_allclose(np.asarray(gd[k]), np.asarray(ge[k]),
                                   rtol=1e-4, atol=1e-5)

    # Gradient w.r.t. node features too (exercises the transpose backward
    # with per-edge scales).
    gx_d = jax.grad(lambda xx: jnp.sum(rgcn_layer_segment(params, xx,
                                                          g_dense) ** 2))(x)
    gx_e = jax.grad(lambda xx: jnp.sum(rgcn_layer_segment(params, xx,
                                                          g_edge) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_e),
                               rtol=1e-4, atol=1e-5)


def test_auto_mode_selection():
    src, dst, rel, n, r = _edges()
    # small R*N vs E -> dense
    g = build_rel_graph(src, dst, rel, n, r, norm="auto")
    assert g.norm_mode == "dense"
    # huge node space, few edges -> edge
    g2 = build_rel_graph(src, dst, rel, 10_000_000, r, norm="auto")
    assert g2.norm_mode == "edge"


def test_native_edge_mode_matches_numpy():
    from primekg_rgcn_tpu import native

    if not native.native_available():
        pytest.skip("no C++ toolchain")
    src, dst, rel, n, r = _edges(seed=6, e=4000)
    g_np = build_rel_graph(src, dst, rel, n, r, norm="edge",
                           use_native="never")
    g_cc = build_rel_graph(src, dst, rel, n, r, norm="edge",
                           use_native="always")
    np.testing.assert_array_equal(np.asarray(g_np.src), np.asarray(g_cc.src))
    np.testing.assert_array_equal(np.asarray(g_np.t_dst),
                                  np.asarray(g_cc.t_dst))
    np.testing.assert_allclose(np.asarray(g_np.edge_scale),
                               np.asarray(g_cc.edge_scale))
    np.testing.assert_allclose(np.asarray(g_np.t_edge_scale),
                               np.asarray(g_cc.t_edge_scale))
