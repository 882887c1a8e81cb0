"""Cross-framework parity: our layer vs an independent torch implementation
of the documented RGCNConv semantics (SURVEY.md §2.1/C7), computed with
torch ops the way the reference's dependency does. Guards against a shared
blind spot between our JAX implementations."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from primekg_rgcn_tpu.data.graph import build_rel_graph  # noqa: E402
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment  # noqa: E402


def _t(a):
    """torch tensor from a possibly non-writable (jax-backed) numpy view."""
    return torch.from_numpy(np.array(a, copy=True))


def torch_rgcn_layer(x, src, dst, rel, w_rel, w_root, bias, num_nodes,
                     num_relations):
    """h'_i = W_root h_i + b + sum_r mean_{j in N_r(i)} W_r h_j (torch)."""
    x_t = _t(x)
    out = x_t @ _t(w_root) + _t(bias)
    for r in range(num_relations):
        m = rel == r
        s = _t(src[m]).long()
        d = _t(dst[m]).long()
        msg = x_t[s] @ _t(w_rel[r])
        agg = torch.zeros(num_nodes, msg.shape[1])
        agg.index_add_(0, d, msg)
        deg = torch.zeros(num_nodes)
        deg.index_add_(0, d, torch.ones(len(d)))
        agg = agg / deg.clamp(min=1.0).unsqueeze(1)
        out = out + agg
    return out.numpy()


@pytest.mark.parametrize("seed,din,dout", [(0, 16, 24), (1, 24, 16),
                                           (2, 64, 128)])
def test_layer_matches_independent_torch_implementation(seed, din, dout):
    rng = np.random.default_rng(seed)
    n, r, e = 70, 3, 900
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    x = rng.normal(size=(n, din)).astype(np.float32)
    w_rel = rng.normal(size=(r, din, dout)).astype(np.float32) * 0.1
    w_root = rng.normal(size=(din, dout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(dout,)).astype(np.float32) * 0.1

    expected = torch_rgcn_layer(x, src, dst, rel, w_rel, w_root, bias, n, r)

    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    params = {"w_rel": jnp.asarray(w_rel), "w_root": jnp.asarray(w_root),
              "bias": jnp.asarray(bias)}
    ours = np.asarray(rgcn_layer_segment(params, jnp.asarray(x), graph))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-5)


def test_full_model_scores_match_torch_pipeline():
    """End-to-end: embed -> conv -> relu -> conv -> DistMult in torch vs our
    model_apply (eval mode)."""
    from primekg_rgcn_tpu.config import ModelConfig
    from primekg_rgcn_tpu.models.rgcn import init_params, model_apply

    rng = np.random.default_rng(5)
    n, r, e = 60, 3, 700
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=16, dropout=0.0)
    params = init_params(jax.random.PRNGKey(3), cfg)

    x = np.asarray(params["encoder"]["node_emb"])

    def conv(p, xin):
        return torch_rgcn_layer(
            xin, src, dst, rel, np.asarray(p["w_rel"]),
            np.asarray(p["w_root"]), np.asarray(p["bias"]), n, r)

    h = conv(params["encoder"]["conv1"], x)
    h = np.maximum(h, 0.0).astype(np.float32)
    h = conv(params["encoder"]["conv2"], h)

    b = 40
    heads = rng.integers(0, n, b)
    tails = rng.integers(0, n, b)
    rels = rng.integers(0, r, b)
    rel_emb = np.asarray(params["decoder"]["rel_emb"])
    expected = np.sum(h[heads] * rel_emb[rels] * h[tails], axis=1)

    ours = np.asarray(model_apply(params, graph, jnp.asarray(heads),
                                  jnp.asarray(tails), jnp.asarray(rels),
                                  cfg, train=False))
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-4)
