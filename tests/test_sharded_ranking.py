"""Entity-sharded ranking must reproduce single-device raw ranks exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.evaluate.metrics import ranks_of_true_tails
from primekg_rgcn_tpu.evaluate.sharded_ranking import build_sharded_ranker
from primekg_rgcn_tpu.ops.distmult import distmult_score_all_tails
from primekg_rgcn_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


@pytest.mark.parametrize("n", [800, 805])  # exact and padded entity counts
def test_sharded_ranks_match_single_device(n):
    rng = np.random.default_rng(0)
    d, b, r = 32, 64, 3
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rel_emb = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    heads = jnp.asarray(rng.integers(0, n, b))
    rels = jnp.asarray(rng.integers(0, r, b))
    tails = jnp.asarray(rng.integers(0, n, b))

    mesh = make_mesh(len(jax.devices()))
    rank_fn = build_sharded_ranker(mesh, emb, rel_emb)
    sharded = np.asarray(rank_fn(heads, rels, tails))

    scores = distmult_score_all_tails(jnp.take(emb, heads, axis=0),
                                      jnp.take(rel_emb, rels, axis=0), emb)
    single = np.asarray(ranks_of_true_tails(scores, tails))
    np.testing.assert_array_equal(sharded, single)


def test_fully_sharded_eval_pipeline_matches_single_device():
    """node-sharded encode (gather=False) -> sharded rank/score with NO
    replicated [N, D] table anywhere; parity with the single-device
    encoder + ranking/scoring path."""
    from primekg_rgcn_tpu.config import ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.sharded_ranking import (
        build_sharded_eval_from_sharded,
    )
    from primekg_rgcn_tpu.models.rgcn import encoder_apply, init_params
    from primekg_rgcn_tpu.parallel.node_shard import (
        build_node_sharded_forward,
        partition_nodes,
    )

    rng = np.random.default_rng(4)
    num_nodes, num_rel, num_edges = 90, 3, 600
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_rel, num_edges)
    graph = build_rel_graph(src, dst, rel, num_nodes, num_rel,
                            bucket_pad_multiple=32)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_rel,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(2), cfg)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    nsg = partition_nodes(graph, n_dev)
    encode = build_node_sharded_forward(mesh, nsg, cfg, gather=False)
    emb_dm = encode(params)                      # [n_dev, n_loc, H] sharded
    assert emb_dm.shape[0] == n_dev

    rel_emb = params["decoder"]["rel_emb"]
    rank_fn, score_fn = build_sharded_eval_from_sharded(
        mesh, emb_dm, rel_emb, num_nodes)

    b = 40
    heads = jnp.asarray(rng.integers(0, num_nodes, b))
    rels = jnp.asarray(rng.integers(0, num_rel, b))
    tails = jnp.asarray(rng.integers(0, num_nodes, b))

    emb_single = encoder_apply(params, graph, cfg)
    scores_all = distmult_score_all_tails(
        jnp.take(emb_single, heads, axis=0),
        jnp.take(rel_emb, rels, axis=0), emb_single)
    ranks_single = np.asarray(ranks_of_true_tails(scores_all, tails))
    scores_single = np.asarray(jnp.sum(
        jnp.take(emb_single, heads, axis=0)
        * jnp.take(rel_emb, rels, axis=0)
        * jnp.take(emb_single, tails, axis=0), axis=-1))

    np.testing.assert_array_equal(np.asarray(rank_fn(heads, rels, tails)),
                                  ranks_single)
    np.testing.assert_allclose(np.asarray(score_fn(heads, tails, rels)),
                               scores_single, rtol=1e-4, atol=1e-5)


def test_evaluator_shard_encode_matches_dense():
    """Evaluator(shard_encode='node') — the CLI-reachable fully-sharded
    pipeline — must reproduce the dense Evaluator's results exactly (same
    RNG, same metrics; encode parity is what the node-sharded forward
    guarantees)."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    import numpy as np

    from primekg_rgcn_tpu.config import EvalConfig, ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.evaluator import Evaluator
    from primekg_rgcn_tpu.models.rgcn import init_params

    rng = np.random.default_rng(2)
    n, r, e = 120, 4, 900
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    test_edges = np.stack([src[:100], dst[:100], rel[:100]], 1)
    ecfg = EvalConfig(batch_size=64, k_values=(5, 10))

    dense = Evaluator(params, cfg, graph, test_edges, ecfg).evaluate()
    shard = Evaluator(params, cfg, graph, test_edges, ecfg,
                      shard_encode="node").evaluate()

    assert dense["ranking"] == shard["ranking"]
    for k, v in dense["classification"].items():
        np.testing.assert_allclose(shard["classification"][k], v,
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_sharded_topk_matches_dense():
    """Distributed top-K == dense argsort top-K (exact scores; ids checked
    per-row as sets where scores tie)."""
    import jax
    import jax.numpy as jnp
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    import numpy as np

    from primekg_rgcn_tpu.config import ModelConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.evaluate.sharded_ranking import build_sharded_topk
    from primekg_rgcn_tpu.models.rgcn import encoder_apply, init_params
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.parallel.node_shard import (
        build_node_sharded_forward, partition_nodes)

    rng = np.random.default_rng(4)
    n, r, e, k = 130, 5, 900, 7
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    nsg = partition_nodes(graph, n_dev)
    emb_dm = build_node_sharded_forward(mesh, nsg, cfg, gather=False)(params)
    rel_emb = params["decoder"]["rel_emb"]
    topk = build_sharded_topk(mesh, emb_dm, rel_emb, n, k)

    b = 24
    heads = rng.integers(0, n, b)
    rels = rng.integers(0, r, b)
    s_top, i_top = topk(heads, rels)
    s_top, i_top = np.asarray(s_top), np.asarray(i_top)

    emb = np.asarray(encoder_apply(params, graph, cfg))
    q = emb[heads] * np.asarray(rel_emb)[rels]
    dense = q @ emb.T                              # [B, N]
    order = np.argsort(-dense, axis=1)[:, :k]
    dense_scores = np.take_along_axis(dense, order, axis=1)

    np.testing.assert_allclose(s_top, dense_scores, rtol=2e-5, atol=2e-6)
    for i in range(b):
        # Where scores are unique the id sets must match exactly.
        if len(np.unique(np.round(dense_scores[i], 5))) == k:
            assert set(i_top[i]) == set(order[i]), i
