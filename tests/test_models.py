"""Model-layer tests mirroring the reference's inline smoke tests
(reference: src/models/rgcn.py:422-643) plus exact parameter-count parity."""

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.config import ModelConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.models.rgcn import (
    count_params,
    encoder_apply,
    get_embeddings,
    init_params,
    model_apply,
    predict,
    predict_all_tails,
)


def _toy(num_nodes=100, num_relations=3, num_edges=500, seed=0):
    rng = np.random.default_rng(seed)
    graph = build_rel_graph(
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_nodes, num_edges),
        rng.integers(0, num_relations, num_edges),
        num_nodes, num_relations, bucket_pad_multiple=64,
    )
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    return graph, cfg, params


def test_encoder_shapes():
    graph, cfg, params = _toy()
    emb = encoder_apply(params, graph, cfg)
    assert emb.shape == (cfg.num_nodes, cfg.hidden_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_model_forward_and_inference_paths():
    graph, cfg, params = _toy()
    b = 32
    rng = np.random.default_rng(1)
    heads = jnp.asarray(rng.integers(0, cfg.num_nodes, b))
    tails = jnp.asarray(rng.integers(0, cfg.num_nodes, b))
    rels = jnp.asarray(rng.integers(0, cfg.num_relations, b))

    scores = model_apply(params, graph, heads, tails, rels, cfg,
                         train=True, dropout_rng=jax.random.PRNGKey(2))
    assert scores.shape == (b,)
    pred = predict(params, graph, heads, tails, rels, cfg)
    assert pred.shape == (b,)
    all_scores = predict_all_tails(params, graph, heads, rels, cfg)
    assert all_scores.shape == (b, cfg.num_nodes)
    emb = get_embeddings(params, graph, cfg)
    assert emb.shape == (cfg.num_nodes, cfg.hidden_dim)

    # all-tails scoring consistent with triple scoring (matmul vs elementwise
    # reduction orders differ, hence the loose tolerance)
    np.testing.assert_allclose(
        np.asarray(all_scores[jnp.arange(b), tails]), np.asarray(pred),
        rtol=1e-3, atol=1e-3)


def test_param_count_matches_reference():
    """Default PrimeKG config must have exactly 2,078,208 parameters
    (reference: results_final/results.json num_parameters; decomposition in
    SURVEY.md §2.1/C7)."""
    cfg = ModelConfig(num_nodes=30926, num_relations=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert count_params(params) == 2_078_208


def test_param_count_with_bases():
    cfg = ModelConfig(num_nodes=100, num_relations=3, num_bases=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    expected = (
        100 * 64                      # node emb
        + 2 * 64 * 128 + 3 * 2 + 64 * 128 + 128   # conv1 basis + coef + root + bias
        + 2 * 128 * 128 + 3 * 2 + 128 * 128 + 128  # conv2
        + 3 * 128                    # rel emb
    )
    assert count_params(params) == expected


def test_dropout_train_vs_eval():
    graph, cfg, params = _toy()
    e1 = encoder_apply(params, graph, cfg, train=False)
    e2 = encoder_apply(params, graph, cfg, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1 = encoder_apply(params, graph, cfg, train=True,
                       dropout_rng=jax.random.PRNGKey(1))
    t2 = encoder_apply(params, graph, cfg, train=True,
                       dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_model_jits_once_per_shape():
    graph, cfg, params = _toy()
    fwd = jax.jit(lambda p, h, t, r: model_apply(p, graph, h, t, r, cfg))
    b = 16
    h = jnp.zeros((b,), jnp.int32)
    out1 = fwd(params, h, h, jnp.zeros((b,), jnp.int32))
    out2 = fwd(params, h + 1, h + 1, jnp.zeros((b,), jnp.int32))
    assert out1.shape == out2.shape == (b,)
