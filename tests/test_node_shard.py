"""Node-sharded (halo-exchange) execution tests on the simulated 8-CPU mesh:
encoder parity with single-device, train-step gradient parity with the
single-device update."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.models.rgcn import encoder_apply, init_params
from primekg_rgcn_tpu.parallel.mesh import make_mesh
from primekg_rgcn_tpu.parallel.node_shard import (
    build_node_sharded_forward,
    build_node_sharded_train_step,
    partition_nodes,
)
from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


def _setup(seed=0, n=96, r=3, e=900):
    rng = np.random.default_rng(seed)
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    return graph, cfg, params


def test_partition_metadata():
    graph, cfg, _ = _setup()
    sg = partition_nodes(graph, 4)
    assert sg.n_devices == 4
    assert sg.n_loc == 24
    # Serve lists reference valid local rows or the sentinel.
    serve = np.asarray(sg.serve)
    assert serve.min() >= 0 and serve.max() <= sg.n_loc
    # All real edges preserved across the local + halo groups.
    real_local = int((np.asarray(sg.dst_local) < sg.n_loc).sum())
    real_halo = int((np.asarray(sg.dst_halo) < sg.n_loc).sum())
    assert real_local + real_halo == graph.num_edges
    assert real_local > 0 and real_halo > 0  # both groups exercised


def test_node_sharded_encode_matches_single_device():
    graph, cfg, params = _setup()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = partition_nodes(graph, n_dev)
    encode = build_node_sharded_forward(mesh, sg, cfg)
    out = encode(params)
    ref = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_node_sharded_train_step_matches_single_device_grad():
    """One update with dropout off must match the single-device train step's
    parameter update up to float summation-order tolerance."""
    from primekg_rgcn_tpu.models.rgcn import model_apply

    graph, cfg, params = _setup(seed=3)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = partition_nodes(graph, n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    # Plain SGD so the parameter delta is exactly -lr * grad: a clean
    # gradient comparison (adam's rsqrt amplifies float noise on near-zero
    # gradient elements).
    opt = optax.sgd(tcfg.lr)

    step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt)

    rng = np.random.default_rng(0)
    b = 64
    batch = np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)
    key = jax.random.PRNGKey(7)

    p_sh = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(p_sh, opt.init(p_sh), jnp.zeros((), jnp.int32))
    state, (loss_sh, acc_sh) = step(state, jnp.asarray(batch), key)

    # Reproduce the same update single-device. The sharded step splits the
    # batch across devices and folds the device index into the sampling key,
    # so rebuild the identical per-device candidate sets here.
    k_neg, k_drop = jax.random.split(key)
    from primekg_rgcn_tpu.train.neg_sampling import sample_negatives

    b_loc = b // n_dev
    hs, ts, rs, ls = [], [], [], []
    for d in range(n_dev):
        sl = batch[d * b_loc:(d + 1) * b_loc]
        h = jnp.asarray(sl[:, 0])
        t = jnp.asarray(sl[:, 1])
        r = jnp.asarray(sl[:, 2])
        kd = jax.random.fold_in(k_neg, d)
        nh, nt, nr = sample_negatives(kd, h, t, r, cfg.num_nodes, 1)
        hs += [h, nh]
        ts += [t, nt]
        rs += [r, nr]
        ls += [jnp.ones_like(h, jnp.float32), jnp.zeros_like(nh, jnp.float32)]
    heads = jnp.concatenate(hs)
    tails = jnp.concatenate(ts)
    rels = jnp.concatenate(rs)
    labels = jnp.concatenate(ls)

    def loss_fn(p):
        scores = model_apply(p, graph, heads, tails, rels, cfg, train=False)
        return optax.sigmoid_binary_cross_entropy(scores, labels).mean()

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state.params),
                     jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_node_sharded_training_improves():
    graph, cfg, params = _setup(seed=5)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = partition_nodes(graph, n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)
    step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt)

    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(1)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(10):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), 64)
        batch = np.concatenate([edges[idx], np.ones((64, 1), np.int32)], 1)
        state, (loss, acc) = step(state, jnp.asarray(batch), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pallas_halo_exchange_matches_all_to_all():
    """The remote-DMA kernel must match lax.all_to_all semantics."""
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as _P
    from primekg_rgcn_tpu.ops.pallas.halo import pallas_halo_exchange

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    p, d = 8, 128
    rng = np.random.default_rng(0)
    send = jnp.asarray(
        rng.normal(size=(n_dev, n_dev, p, d)).astype(np.float32))

    @jax.jit
    @_partial(jax.shard_map, mesh=mesh, in_specs=_P("data"),
              out_specs=_P("data"), check_vma=False)
    def via_pallas(s):
        return pallas_halo_exchange(s[0], "data")[None]

    @jax.jit
    @_partial(jax.shard_map, mesh=mesh, in_specs=_P("data"),
              out_specs=_P("data"), check_vma=False)
    def via_xla(s):
        return jax.lax.all_to_all(s[0], "data", split_axis=0,
                                  concat_axis=0, tiled=True)[None]

    np.testing.assert_allclose(np.asarray(via_pallas(send)),
                               np.asarray(via_xla(send)))


def test_node_sharded_encode_with_pallas_halo():
    graph, cfg, params = _setup()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = partition_nodes(graph, n_dev)
    encode = build_node_sharded_forward(mesh, sg, cfg, halo_impl="pallas")
    out = encode(params)
    ref = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_scan_accumulate_path_matches_unrolled():
    """uniform_caps (lax.scan over relations, custom-VJP backward) must match
    the unrolled path bit-for-tolerance in BOTH forward encode and the
    training-step gradient update. Exercised at R=18 (the scan path's auto
    threshold is R>=16 — the config-5 regime where the unrolled backward
    materializes R stacked cotangents)."""
    rng = np.random.default_rng(5)
    n, r, e = 96, 18, 1200
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(5), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)

    sg_scan = partition_nodes(graph, n_dev)          # auto: uniform at R=18
    assert sg_scan.uniform_caps
    sg_loop = partition_nodes(graph, n_dev, uniform_caps=False)
    assert not sg_loop.uniform_caps

    out_scan = build_node_sharded_forward(mesh, sg_scan, cfg)(params)
    out_loop = build_node_sharded_forward(mesh, sg_loop, cfg)(params)
    ref = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=1e-5, atol=1e-6)

    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = optax.sgd(tcfg.lr)
    batch = np.stack([
        rng.integers(0, n, 64), rng.integers(0, n, 64),
        rng.integers(0, r, 64), np.ones(64, np.int64)], 1).astype(np.int32)
    key = jax.random.PRNGKey(9)
    updated = []
    for sg in (sg_scan, sg_loop):
        step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt)
        p = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))
        state, (loss, _) = step(state, jnp.asarray(batch), key)
        updated.append((float(loss), state.params))
    assert updated[0][0] == pytest.approx(updated[1][0], rel=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(updated[0][1]),
                     jax.tree_util.tree_leaves(updated[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_node_shard_pallas_schedule_encode_and_grads_match():
    """partition_nodes(pallas=True): the non-scan layer runs the scheduled
    kernel for both edge groups (halo backward has an asymmetric segment
    count = the received-table height); encoder output and one training
    step must match the schedule-free node-sharded path exactly."""
    graph, cfg, params = _setup()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)

    rng = np.random.default_rng(9)
    b = 64
    batch = jnp.asarray(np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32))

    results = []
    for pallas in (False, True):
        sg = partition_nodes(graph, n_dev, pallas=pallas)
        if pallas:
            assert sg.sched is not None
            assert any(x is not None for x in sg.sched["local"])
        enc = build_node_sharded_forward(mesh, sg, cfg)
        emb = np.asarray(enc(params))
        step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt)
        st = TrainState(jax.tree_util.tree_map(jnp.copy, params),
                        opt.init(params), jnp.zeros((), jnp.int32))
        st, (loss, acc) = step(st, batch, jax.random.PRNGKey(3))
        results.append((emb, float(loss), st.params))

    (e0, l0, p0), (e1, l1, p1) = results
    np.testing.assert_allclose(e0, e1, rtol=1e-5, atol=1e-6)
    assert l0 == pytest.approx(l1, rel=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_node_shard_pallas_schedule_scan_path_matches():
    """R >= 16 engages the lax.scan-over-relations layer; pallas=True stacks
    per-relation schedules with a leading relation axis so the scan slices
    one per step. Encoder + train-step parity vs the schedule-free path."""
    rng = np.random.default_rng(11)
    n, r, e = 96, 18, 1400
    graph = build_rel_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                            rng.integers(0, r, e), n, r,
                            bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(4), cfg)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)

    b = 64
    batch = jnp.asarray(np.stack([
        rng.integers(0, n, b), rng.integers(0, n, b),
        rng.integers(0, r, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32))

    results = []
    for pallas in (False, True):
        sg = partition_nodes(graph, n_dev, pallas=pallas)
        assert sg.uniform_caps
        if pallas:
            assert sg.sched is not None and sg.sched["local"] is not None
            # stacked fields lead with [n_devices, R]
            assert sg.sched["local"][0].rank.shape[:2] == (n_dev, r)
        enc = build_node_sharded_forward(mesh, sg, cfg)
        emb = np.asarray(enc(params))
        step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt)
        st = TrainState(jax.tree_util.tree_map(jnp.copy, params),
                        opt.init(params), jnp.zeros((), jnp.int32))
        st, (loss, _) = step(st, batch, jax.random.PRNGKey(6))
        results.append((emb, float(loss), st.params))

    (e0, l0, p0), (e1, l1, p1) = results
    np.testing.assert_allclose(e0, e1, rtol=1e-5, atol=1e-6)
    assert l0 == pytest.approx(l1, rel=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_halo_exchange_vjp_matches_all_to_all():
    """The exchange's custom VJP (the same exchange on the cotangents,
    ops/pallas/halo.py) must match AD through lax.all_to_all."""
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as _P
    from primekg_rgcn_tpu.ops.pallas.halo import pallas_halo_exchange

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    p, d = 4, 32
    rng = np.random.default_rng(3)
    send = jnp.asarray(
        rng.normal(size=(n_dev, n_dev, p, d)).astype(np.float32))
    weight = jnp.asarray(
        rng.normal(size=(n_dev, n_dev, p, d)).astype(np.float32))

    def make(exchange):
        @jax.jit
        @_partial(jax.shard_map, mesh=mesh, in_specs=(_P("data"),) * 2,
                  out_specs=_P(), check_vma=False)
        def grad_fn(s, w):
            def loss(x):
                r = exchange(x[0])
                return jnp.sum(r * w[0] * r)  # nonlinear: VJP carries data
            return jax.grad(loss)(s)
        return grad_fn

    g_pallas = make(lambda x: pallas_halo_exchange(x, "data"))(send, weight)
    g_xla = make(lambda x: jax.lax.all_to_all(
        x, "data", split_axis=0, concat_axis=0, tiled=True))(send, weight)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-6)


def test_node_sharded_train_step_pallas_halo_matches_xla():
    """One full training update with halo_impl="pallas" must match the
    halo_impl="xla" update (same key/batch) — the remote-DMA transport is a
    pure substitution in both passes."""
    graph, cfg, params = _setup(seed=5)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sg = partition_nodes(graph, n_dev)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = optax.sgd(tcfg.lr)

    rng = np.random.default_rng(1)
    b = 64
    batch = np.stack([
        rng.integers(0, cfg.num_nodes, b), rng.integers(0, cfg.num_nodes, b),
        rng.integers(0, cfg.num_relations, b), np.ones(b, np.int64)
    ], axis=1).astype(np.int32)
    key = jax.random.PRNGKey(11)

    outs = {}
    for impl in ("xla", "pallas"):
        step = build_node_sharded_train_step(mesh, sg, cfg, tcfg, opt,
                                             halo_impl=impl)
        p = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))
        state, (loss, acc) = step(state, jnp.asarray(batch), key)
        outs[impl] = (float(loss), float(acc),
                      jax.tree_util.tree_leaves(state.params))

    assert outs["pallas"][0] == pytest.approx(outs["xla"][0], rel=1e-6)
    assert outs["pallas"][1] == outs["xla"][1]
    for a, b_ in zip(outs["pallas"][2], outs["xla"][2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)
