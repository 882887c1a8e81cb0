"""Multi-device tests on the simulated 8-CPU mesh: edge-sharded encoder parity
with the single-device path, and sharded training steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.models.rgcn import encoder_apply, init_params
from primekg_rgcn_tpu.parallel.edge_shard import (
    build_sharded_forward,
    build_sharded_train_step,
    shard_rel_graph,
)
from primekg_rgcn_tpu.parallel.mesh import make_mesh
from primekg_rgcn_tpu.train.loop import make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


def _toy(num_nodes=64, num_relations=3, num_edges=500, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    graph = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                            bucket_pad_multiple=32)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(1), cfg)
    return graph, cfg, params


def test_sharded_encode_matches_single_device():
    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev)
    encode = build_sharded_forward(mesh, sg, cfg)
    out_sharded = encode(params)
    out_single = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_single), rtol=1e-4, atol=1e-4)


def test_sharded_train_step_runs_and_improves():
    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev)
    tcfg = TrainConfig(batch_size=128, lr=1e-2)
    opt = make_optimizer(tcfg)
    step = build_sharded_train_step(mesh, sg, cfg, tcfg, opt)

    rng = np.random.default_rng(2)
    b = 128  # divisible by 8
    batch = np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)

    opt_state = opt.init(params)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(8):
        key, k = jax.random.split(key)
        params, opt_state, (loss, acc) = step(params, opt_state,
                                              jnp.asarray(batch), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_step_with_masked_padding():
    """Rows with mask=0 must not affect the update."""
    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)
    step = build_sharded_train_step(mesh, sg, cfg, tcfg, opt)

    rng = np.random.default_rng(3)
    b = 64
    batch = np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)
    batch_masked = batch.copy()
    batch_masked[b // 2:, 3] = 0
    # Garbage content in masked rows must be irrelevant.
    batch_masked[b // 2:, 0] = 0

    p1 = jax.tree_util.tree_map(jnp.copy, params)
    o1 = opt.init(p1)
    p1, o1, (l1, _) = step(p1, o1, jnp.asarray(batch_masked),
                           jax.random.PRNGKey(5))

    batch_masked2 = batch.copy()
    batch_masked2[b // 2:, 3] = 0
    batch_masked2[b // 2:, 0] = 7  # different garbage
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    o2 = opt.init(p2)
    p2, o2, (l2, _) = step(p2, o2, jnp.asarray(batch_masked2),
                           jax.random.PRNGKey(5))

    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_encode_pallas_schedule_matches_single_device():
    """shard_rel_graph(pallas=True) threads host-precomputed per-device
    kernel schedules through shard_map; the encoder must match the
    single-device path exactly (interpret-mode kernel on the CPU mesh)."""
    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev, pallas=True)
    assert sg.sched is not None
    assert any(s is not None for s in sg.sched)
    encode = build_sharded_forward(mesh, sg, cfg)
    out_sharded = encode(params)
    out_single = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_single), rtol=1e-4, atol=1e-4)


def test_sharded_train_step_pallas_schedule_matches_xla():
    """One sharded training step with the scheduled Pallas aggregation must
    produce the same update as the XLA-segment-sum sharded step (identical
    batches, keys, and negative draws; the backward runs the transpose
    schedule)."""
    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)

    rng = np.random.default_rng(7)
    b = 64
    batch = jnp.asarray(np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32))

    results = []
    for pallas in (False, True):
        sg = shard_rel_graph(graph, n_dev, pallas=pallas)
        step = build_sharded_train_step(mesh, sg, cfg, tcfg, opt)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = opt.init(p)
        p, o, (loss, acc) = step(p, o, batch, jax.random.PRNGKey(11))
        results.append((p, float(loss)))

    (p_xla, l_xla), (p_pal, l_pal) = results
    assert l_xla == pytest.approx(l_pal, rel=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p_xla),
                    jax.tree_util.tree_leaves(p_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_encode_bfloat16_both_layouts():
    """compute_dtype=bfloat16 flows through BOTH sharded layers (halving
    psum/halo ICI payloads on real hardware); outputs track the
    single-device bf16 encoder within bf16 tolerance."""
    from primekg_rgcn_tpu.parallel.node_shard import (
        build_node_sharded_forward,
        partition_nodes,
    )

    rng = np.random.default_rng(5)
    num_nodes, num_relations, num_edges = 64, 3, 500
    from primekg_rgcn_tpu.data.graph import build_rel_graph as _brg

    graph = _brg(rng.integers(0, num_nodes, num_edges),
                 rng.integers(0, num_nodes, num_edges),
                 rng.integers(0, num_relations, num_edges),
                 num_nodes, num_relations, bucket_pad_multiple=32)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations,
                      embedding_dim=8, hidden_dim=8, dropout=0.0,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    single = np.asarray(encoder_apply(params, graph, cfg))

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)

    sg = shard_rel_graph(graph, n_dev)
    out_edge = np.asarray(build_sharded_forward(mesh, sg, cfg)(params))
    np.testing.assert_allclose(out_edge, single, rtol=0.05, atol=0.05)

    nsg = partition_nodes(graph, n_dev)
    out_node = np.asarray(
        build_node_sharded_forward(mesh, nsg, cfg)(params))
    np.testing.assert_allclose(out_node, single, rtol=0.05, atol=0.05)


def test_sharded_gradient_accumulation_semantics():
    """accum=2 with a fully-masked second micro-batch must produce exactly
    half the SGD update of accum=1 on the same first micro-batch (micro
    mean-gradients averaged over the group, reference semantics), and the
    same reported loss (masked micro contributes no weight)."""
    import optax

    graph, cfg, params = _toy()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2, grad_clip=0.0)
    opt = optax.sgd(1e-2)

    rng = np.random.default_rng(13)
    b = 64
    batch1 = np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)
    masked = np.zeros((b, 4), np.int32)
    key = jax.random.PRNGKey(21)

    step1 = build_sharded_train_step(mesh, sg, cfg, tcfg, opt)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    p1, _, (l1, _) = step1(p1, opt.init(p1), jnp.asarray(batch1), key)

    step2 = build_sharded_train_step(mesh, sg, cfg, tcfg, opt,
                                     accum_steps=2)
    group = jnp.asarray(np.stack([batch1, masked]))
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    p2, _, (l2, _) = step2(p2, opt.init(p2), group, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for p0, a, c in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
        d1 = np.asarray(a) - np.asarray(p0)
        d2 = np.asarray(c) - np.asarray(p0)
        # atol: param deltas are ~1e-6 on ~0.1-magnitude f32 params, so a
        # single ulp of parameter storage (~3e-8) dominates the comparison.
        np.testing.assert_allclose(d2, d1 / 2, rtol=1e-3, atol=1e-7)


def test_sharded_pallas_sparse_bucket_falls_back():
    """A run-sparse bucket (avg in-degree ~1: more than 256 runs per
    512-edge chunk on some device) must get NO schedule — the sharded step
    silently keeps the XLA path for it and stays correct."""
    rng = np.random.default_rng(17)
    # 2000 nodes, 1 relation, 1500 edges -> nearly all runs length 1.
    num_nodes, num_edges = 2000, 1500
    graph = build_rel_graph(rng.integers(0, num_nodes, num_edges),
                            rng.integers(0, num_nodes, num_edges),
                            np.zeros(num_edges, np.int64),
                            num_nodes, 1, bucket_pad_multiple=32)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=1,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(3), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(graph, n_dev, pallas=True)
    assert sg.sched is not None and sg.sched[0] is None  # fell back
    out = build_sharded_forward(mesh, sg, cfg)(params)
    single = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-4, atol=1e-4)


def test_edge_norm_graph_edge_sharded_matches_dense_norm():
    """norm_mode="edge" graphs (auto-picked for relation-dense/large graphs,
    data/graph.py:_pick_norm) must run edge-sharded: the per-edge scales are
    partitioned with the buckets and the result matches the dense-norm
    sharded encode AND the single-device path exactly."""
    rng = np.random.default_rng(11)
    num_nodes, num_relations, num_edges = 64, 3, 500
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    g_dense = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                              bucket_pad_multiple=32, norm="dense")
    g_edge = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                             bucket_pad_multiple=32, norm="edge")
    assert g_edge.norm_mode == "edge"
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(1), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg_e = shard_rel_graph(g_edge, n_dev)
    assert sg_e.scale is not None and sg_e.t_scale is not None
    out_edge = build_sharded_forward(mesh, sg_e, cfg)(params)
    out_dense = build_sharded_forward(
        mesh, shard_rel_graph(g_dense, n_dev), cfg)(params)
    out_single = encoder_apply(params, g_dense, cfg)
    np.testing.assert_allclose(np.asarray(out_edge), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_edge), np.asarray(out_single),
                               rtol=1e-4, atol=1e-4)


def test_edge_norm_sharded_train_step_matches_dense_norm():
    """One edge-sharded training step over the edge-norm build of a graph
    must produce the same loss and updated params as over the dense-norm
    build (same batch, keys, negatives) — including the backward through the
    scaled transpose aggregation."""
    rng = np.random.default_rng(12)
    num_nodes, num_relations, num_edges = 64, 3, 500
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(2), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    b = 64
    batch = np.stack([
        rng.integers(0, num_nodes, b), rng.integers(0, num_nodes, b),
        rng.integers(0, num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)

    results = {}
    for norm in ("dense", "edge"):
        graph = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                                bucket_pad_multiple=32, norm=norm)
        opt = make_optimizer(tcfg)
        step = build_sharded_train_step(
            mesh, shard_rel_graph(graph, n_dev), cfg, tcfg, opt)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = opt.init(p)
        p, o, (loss, _) = step(p, o, jnp.asarray(batch),
                               jax.random.PRNGKey(7))
        results[norm] = (p, float(loss))

    assert results["edge"][1] == pytest.approx(results["dense"][1], rel=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(results["dense"][0]),
                    jax.tree_util.tree_leaves(results["edge"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_edge_norm_pallas_schedule_edge_sharded_matches_single():
    """Edge-norm + host-precomputed Pallas schedules together: the scaled
    messages flow through the run-compaction kernel path."""
    rng = np.random.default_rng(13)
    num_nodes, num_relations, num_edges = 64, 3, 500
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    g_edge = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                             bucket_pad_multiple=32, norm="edge")
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations,
                      embedding_dim=8, hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(4), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = shard_rel_graph(g_edge, n_dev, pallas=True)
    assert sg.scale is not None
    assert sg.sched is not None and any(s is not None for s in sg.sched)
    out = build_sharded_forward(mesh, sg, cfg)(params)
    g_dense = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                              bucket_pad_multiple=32, norm="dense")
    single = encoder_apply(params, g_dense, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=1e-4, atol=1e-4)
