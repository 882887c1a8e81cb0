"""Layer-1 historical-embedding cache (GAS/VR-GCN style).

Anchor: with EXACT neighborhoods (truncate mode, budget >= max total
in-degree) and the cache pre-filled with the TRUE full-batch conv1
outputs, the cached forward must reproduce the full-graph encoder
EXACTLY on the seeds — the fresh in-batch rows and the histories then
agree, so any difference is a defect in the hop-reuse / push / overwrite
logic rather than estimator noise.

The reference has no sampled path at all (its README lists mini-batch
sampling as unimplemented); this subsystem is the TPU-native scale lever
(see models/rgcn.encoder_apply_cached, train/sampled.py cache_layer1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph, edge_arrays_from_graph
from primekg_rgcn_tpu.data.sampling import (
    build_combined_csr,
    sample_batch_combined,
)
from primekg_rgcn_tpu.models.rgcn import (
    encoder_apply,
    encoder_apply_cached,
    init_params,
)
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment


def _setup(seed=0, n=80, r=12, e=700):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    ccsr = build_combined_csr(graph)
    max_total = int(np.asarray(ccsr.deg_total).max())
    return graph, cfg, params, ccsr, max_total


def _true_h1(params, graph):
    return rgcn_layer_segment(params["encoder"]["conv1"],
                              params["encoder"]["node_emb"], graph)


def test_cached_forward_exact_with_true_histories():
    graph, cfg, params, ccsr, max_total = _setup()
    h1_true = _true_h1(params, graph)
    # Duplicated seeds exercise seed_gather; mixed ids exercise overwrite.
    seeds = jnp.asarray(np.array([0, 5, 5, 17, 3, 0, 42, 61], np.int32))
    batch = sample_batch_combined(jax.random.PRNGKey(0), ccsr, seeds,
                                  budgets=[max_total], mode="truncate")
    emb, new_cache = encoder_apply_cached(params, batch, h1_true, cfg)
    full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(emb),
                               np.asarray(full)[np.asarray(seeds)],
                               rtol=1e-4, atol=1e-5)
    # Push correctness: seed rows re-computed exactly (fresh == true under
    # exact neighborhoods), every other row untouched.
    np.testing.assert_allclose(np.asarray(new_cache),
                               np.asarray(h1_true), rtol=1e-4, atol=1e-5)


def test_cached_forward_uses_histories_for_out_of_batch():
    """With a DIFFERENT (non-true) cache, out-of-batch neighbor info must
    come from the cache — i.e. the output changes with the cache content —
    while in-batch rows are freshly overwritten in the push."""
    graph, cfg, params, ccsr, max_total = _setup()
    h1_true = _true_h1(params, graph)
    seeds = jnp.asarray(np.array([2, 9, 33], np.int32))
    batch = sample_batch_combined(jax.random.PRNGKey(1), ccsr, seeds,
                                  budgets=[max_total], mode="truncate")
    emb_a, cache_a = encoder_apply_cached(params, batch, h1_true, cfg)
    stale = jnp.zeros_like(h1_true)
    emb_b, cache_b = encoder_apply_cached(params, batch, stale, cfg)
    assert not np.allclose(np.asarray(emb_a), np.asarray(emb_b))
    # The push writes the same fresh rows regardless of history content.
    sid = np.asarray(seeds)
    np.testing.assert_allclose(np.asarray(cache_a)[sid],
                               np.asarray(cache_b)[sid],
                               rtol=1e-5, atol=1e-6)
    # Non-seed rows of the stale cache stay exactly zero.
    mask = np.ones(cfg.num_nodes, bool)
    mask[sid] = False
    assert np.all(np.asarray(cache_b)[mask] == 0)


def test_cached_step_trains_and_threads_cache(tmp_path):
    """build_sampled_train_step(cache_layer1=True): the history rides in
    opt_state as (base, cache), refreshes every step, and gradients reach
    the embedding table through the fresh conv1 path."""
    import optax

    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    graph, cfg, params, ccsr, _ = _setup()
    tcfg = TrainConfig(batch_size=32, lr=0.05)
    step = build_sampled_train_step(ccsr, cfg, tcfg, optax.adam(1e-2),
                                    fanouts=(5, 4), sparse_emb=True,
                                    table_opt="adafactor",
                                    cache_layer1=True)
    state = step.init_state(params)
    base_opt, cache0 = state.opt_state
    assert cache0.shape == (cfg.num_nodes, cfg.hidden_dim)
    assert np.all(np.asarray(cache0) == 0)  # cold start (no cache_init)

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    emb0 = np.array(params["encoder"]["node_emb"])
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(120):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, _) = step(state, jnp.asarray(edges[idx]), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.01, (
        losses[:10], losses[-10:])
    _, cache = state.opt_state
    assert np.abs(np.asarray(cache)).max() > 0  # histories populated
    d = np.abs(np.asarray(state.params["encoder"]["node_emb"]) - emb0).max()
    assert d > 1e-4  # table gradient flowed through the fresh conv1 path


def test_cached_step_chunked_matches_loop():
    """The K-steps-per-dispatch lax.scan chunk must thread the history
    cache identically to the per-step loop (bit-exact states)."""
    import optax

    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    graph, cfg, params, ccsr, _ = _setup()
    tcfg = TrainConfig(batch_size=16, lr=0.05)
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(3)
    k_steps = 4
    batches = edges[rng.integers(0, len(edges), (k_steps, 16))]

    finals = []
    for chunked in (False, True):
        step = build_sampled_train_step(ccsr, cfg, tcfg, optax.sgd(0.05),
                                        fanouts=(5, 4), sparse_emb=True,
                                        cache_layer1=True)
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = step.init_state(p0)
        key = jax.random.PRNGKey(9)
        if chunked:
            key, ks = step.chunk_keys(key, k_steps)
            st, _ = step.chunk(st, jnp.asarray(batches), ks)
        else:
            for i in range(k_steps):
                key, k = jax.random.split(key)
                st, _ = step(st, jnp.asarray(batches[i]), k)
        finals.append(st)
    a, b = finals
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("mode", ["block", "block2"])
def test_cached_step_composes_with_block_modes(mode):
    """The one-hop cached step must compose with the block/blockN pick
    layouts (the contiguous-window fetch path) — same step contract,
    finite losses, histories refreshed."""
    import optax

    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    graph, cfg, params, ccsr, _ = _setup()
    tcfg = TrainConfig(batch_size=32, lr=0.05)
    step = build_sampled_train_step(graph, cfg, tcfg, optax.sgd(0.05),
                                    fanouts=(5, 4), sparse_emb=True,
                                    mode=mode, cache_layer1=True)
    state = step.init_state(params)
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    key = jax.random.PRNGKey(2)
    rng = np.random.default_rng(2)
    for i in range(6):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, _) = step(state, jnp.asarray(edges[idx]), k)
        assert np.isfinite(float(loss))
    _, cache = state.opt_state
    assert np.abs(np.asarray(cache)).max() > 0


def test_cached_step_on_relation_dense_graph():
    """On a relation-DENSE graph (auto heuristic would pick the
    per-relation layout) cache_layer1 must override to combined instead
    of erroring — the reference-protocol config (3 relations) hit this."""
    import optax

    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    rng = np.random.default_rng(5)
    n, r, e = 60, 3, 500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=16, lr=0.05)
    step = build_sampled_train_step(graph, cfg, tcfg, optax.sgd(0.05),
                                    fanouts=(5, 4), sparse_emb=True,
                                    cache_layer1=True)
    state = step.init_state(params)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, (loss, _) = step(state, jnp.asarray(edges[:16]), k)
        assert np.isfinite(float(loss))


def test_cache_flag_validation():
    import optax

    from primekg_rgcn_tpu.train.sampled import (SampledTrainer,
                                                build_sampled_train_step)

    graph, cfg, params, ccsr, _ = _setup()
    tcfg = TrainConfig(batch_size=16, lr=0.05)
    with pytest.raises(ValueError, match="requires sparse_emb"):
        build_sampled_train_step(ccsr, cfg, tcfg, optax.sgd(0.05),
                                 fanouts=(5, 4), cache_layer1=True)
    with pytest.raises(ValueError, match="combined pick layout"):
        build_sampled_train_step(graph, cfg, tcfg, optax.sgd(0.05),
                                 fanouts=(5, 4), sparse_emb=True,
                                 layout="per-relation", cache_layer1=True)
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    with pytest.raises(ValueError, match="single-chip"):
        SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:50],
                       "/tmp/unused", fanouts=(5, 4), n_devices=2,
                       cache_layer1=True)


def test_trainer_warm_start_and_resume(tmp_path):
    """SampledTrainer(cache_layer1=True): the warm start fills histories
    with the exact full-batch conv1 pass, and the (base, cache) opt_state
    round-trips through checkpoint save/resume."""
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, params, ccsr, _ = _setup()
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    tcfg = TrainConfig(batch_size=64, lr=0.05, epochs=2, optimizer="adam",
                       grad_clip=0.0)
    t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:100],
                       tmp_path / "out", fanouts=(5, 4), sparse_emb=True,
                       table_opt="adafactor", cache_layer1=True)
    # Warm start: histories == the full conv1 pass of the INITIAL params.
    h1 = rgcn_layer_segment(t.state.params["encoder"]["conv1"],
                            t.state.params["encoder"]["node_emb"], graph)
    np.testing.assert_allclose(np.asarray(t.state.opt_state[1]),
                               np.asarray(h1), rtol=1e-5, atol=1e-6)
    hist = t.train()
    assert len(hist["val_losses"]) == 2

    t2 = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:100],
                        tmp_path / "out2", fanouts=(5, 4), sparse_emb=True,
                        table_opt="adafactor", cache_layer1=True)
    ck = sorted((tmp_path / "out" / "models").glob("*.msgpack"))
    assert ck
    t2.resume(str(ck[-1])[:-len(".msgpack")])
    _, cache = t2.state.opt_state
    assert cache.shape == (cfg.num_nodes, cfg.hidden_dim)
    # Restored histories are the TRAINED run's, not the fresh warm start.
    np.testing.assert_array_equal(np.asarray(cache),
                                  np.asarray(t.state.opt_state[1]))
