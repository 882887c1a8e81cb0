"""Batch-restricted final RGCN layer (ops/rgcn_final_layer.py).

The restricted evaluation must be mathematically identical to slicing the
full-graph layer output: same forward rows, same parameter gradients (the
unused output rows carry zero cotangent). Covers both norm modes, duplicate
batch nodes, the static-capacity overflow fallback, and the trainer wiring
(reference behavioral contract: src/models/rgcn.py:300-331 scores a batch by
encoding the entire graph; this op only changes where the final layer's
output is materialized, never its values).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
from primekg_rgcn_tpu.models.rgcn import init_params
from primekg_rgcn_tpu.ops.rgcn_final_layer import (
    FinalLayerPlan,
    final_layer_restricted,
    plan_final_layer,
)
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
from primekg_rgcn_tpu.train.loop import _batch_loss


def _setup(norm):
    raw = primekg_like(seed=0, scale=0.02)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3, norm=norm)
    cfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    return graph, cfg, params, edges


@pytest.mark.parametrize("norm", ["dense", "edge"])
def test_restricted_rows_match_full_layer(norm):
    graph, cfg, params, edges = _setup(norm)
    n = graph.num_nodes
    plan = plan_final_layer(graph, edges.astype(np.int64), 32, 1, sims=8)
    conv2 = params["encoder"]["conv2"]
    h1 = jax.random.normal(jax.random.PRNGKey(1), (n, 128))
    h1p = jnp.concatenate([h1, jnp.zeros((1, 128))])
    # Includes duplicates on purpose.
    nodes = jnp.asarray(
        np.array([0, 5, 5, n - 1, 17, 17, 17, 3], np.int32))
    full = rgcn_layer_segment(conv2, h1, graph)
    want = jnp.take(full, nodes, axis=0)
    got = jax.jit(lambda h, ns: final_layer_restricted(
        conv2, h, graph, plan, ns))(h1p, nodes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm", ["dense", "edge"])
def test_loss_and_grad_parity(norm):
    graph, cfg, params, edges = _setup(norm)
    tc = TrainConfig(batch_size=64)
    edges_pad = jnp.asarray(
        np.concatenate([edges, np.zeros((1, 3), np.int32)]))
    plan = plan_final_layer(graph, edges.astype(np.int64), 64, 1, sims=8)
    bi = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)

    def loss(p, fp):
        return _batch_loss(p, graph, edges_pad, bi, key, cfg, tc,
                           train=True, layer_fn=rgcn_layer_segment,
                           final_plan=fp)[0]

    lf, gf = jax.jit(jax.value_and_grad(lambda p: loss(p, None)))(params)
    lr, gr = jax.jit(jax.value_and_grad(lambda p: loss(p, plan)))(params)
    assert abs(float(lf) - float(lr)) < 1e-6
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_overflow_falls_back_exactly():
    graph, cfg, params, edges = _setup("dense")
    tc = TrainConfig(batch_size=64)
    edges_pad = jnp.asarray(
        np.concatenate([edges, np.zeros((1, 3), np.int32)]))
    plan = plan_final_layer(graph, edges.astype(np.int64), 64, 1, sims=8)
    # Force every relation over capacity: the lax.cond must take the exact
    # full-graph branch.
    tiny = FinalLayerPlan(plan.rowptr, tuple(8 for _ in plan.e_cap),
                          plan.group)
    bi = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)

    def loss(p, fp):
        return _batch_loss(p, graph, edges_pad, bi, key, cfg, tc,
                           train=True, layer_fn=rgcn_layer_segment,
                           final_plan=fp)[0]

    lf, gf = jax.jit(jax.value_and_grad(lambda p: loss(p, None)))(params)
    lt, gt = jax.jit(jax.value_and_grad(lambda p: loss(p, tiny)))(params)
    assert abs(float(lf) - float(lt)) < 1e-6
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resolve_final_plan_tristate():
    from primekg_rgcn_tpu.ops.rgcn_final_layer import (
        AUTO_EDGE_RATIO,
        resolve_final_plan,
    )

    graph, cfg, params, edges = _setup("dense")
    assert resolve_final_plan(graph, edges, 64, 1, mode="off") is None
    assert resolve_final_plan(graph, edges, 64, 1, mode=False) is None
    plan = resolve_final_plan(graph, edges, 64, 1, mode="on")
    assert plan is not None
    # Auto keeps the plan iff edges >= ratio * capacity.
    auto = resolve_final_plan(graph, edges, 64, 1, mode="auto")
    expect = graph.num_edges >= AUTO_EDGE_RATIO * sum(plan.e_cap)
    assert (auto is not None) == expect


def test_trainer_wiring_restrict_final(tmp_path):
    """build_train_epoch(restrict_final=True) trains to the same losses as
    the full path (same seeds => identical batches/negatives; the restricted
    layer only changes summation order).
    """
    from primekg_rgcn_tpu.train.loop import Trainer

    raw = primekg_like(seed=0, scale=0.02)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    cfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3)
    losses = []
    for flag in (False, True):
        tc = TrainConfig(batch_size=64, epochs=2, seed=3,
                         restrict_final=flag)
        graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3)
        trainer = Trainer(cfg, tc, graph, graph, edges, edges[:32],
                          str(tmp_path / f"run{int(flag)}"))
        result = trainer.train()
        losses.append(result["history"]["train_losses"])
    np.testing.assert_allclose(losses[0], losses[1], atol=1e-4)
