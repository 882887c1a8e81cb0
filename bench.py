"""North-star benchmark: training edges/s/chip on the PrimeKG default config.

Measures the reference's hot loop (full-graph 2-layer RGCN encode fwd+bwd per
1024-edge batch with negative sampling, BCE, adam; reference:
src/train.py:247-347) on a PrimeKG-statistics synthetic train graph
(30,926 nodes, ~1.68M directed edges, 3 relations with the real bucket skew —
the reference ships no train graph).

Baseline anchor: the reference reports ~4-5 h for 100 epochs on an RTX 1070
(reference: README.md:691-692). Taking 4.5 h => 162 s/epoch over 1,677,772
directed train edges => ~10,356 edges/s. No other throughput number exists
anywhere in the reference (SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_EDGES_PER_S = 1_677_772 / (4.5 * 3600 / 100)  # ~10,356

# The hosted TPU tunnel has been observed to wedge (device init blocks
# forever). Fail FAST with a diagnostic instead of hanging the driver; 15
# minutes comfortably covers a cold compile (~40 s) plus the 50-step run.
_DEADLINE_S = 900


def _watchdog():
    time.sleep(_DEADLINE_S)
    print(f"bench.py: no result within {_DEADLINE_S}s — "
          "TPU backend unreachable/wedged", file=sys.stderr, flush=True)
    os._exit(2)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.train.loop import TrainState, _batch_loss, make_optimizer
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    raw = primekg_like(seed=0, scale=1.0)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3)
    num_train_edges = graph.num_edges

    model_cfg = ModelConfig(num_nodes=raw["num_nodes"], num_relations=3)
    train_cfg = TrainConfig(batch_size=1024)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    opt = make_optimizer(train_cfg)
    opt_state = opt.init(params)

    edges = np.stack([src, dst, rel], axis=1).astype(np.int32)
    edges_pad = jnp.asarray(
        np.concatenate([edges, np.zeros((1, 3), np.int32)], axis=0))

    grad_fn = jax.value_and_grad(
        lambda p, bi, k: _batch_loss(
            p, graph, edges_pad, bi, k, model_cfg, train_cfg,
            train=True, layer_fn=rgcn_layer_segment),
        has_aux=True)

    @jax.jit
    def train_step(state, batch_idx, key):
        (loss, _), grads = grad_fn(state.params, batch_idx, key)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    b = train_cfg.batch_size

    def batch(i):
        return jnp.asarray(
            rng.integers(0, num_train_edges, b).astype(np.int32))

    # Warmup / compile. Synchronize by FETCHING a value: on some hosted
    # PJRT frontends block_until_ready returns at enqueue time, which would
    # under-report; a host transfer cannot complete before execution does.
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        state, loss = train_step(state, batch(i), k)
    float(loss)

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, loss = train_step(state, batch(i), k)
    float(loss)
    dt = time.perf_counter() - t0

    steps_per_s = n_steps / dt
    edges_per_s = steps_per_s * b
    step_ms = dt / n_steps * 1e3

    # Machine-checked roofline (docs/KERNELS.md "Roofline"): the step is
    # DMA-gather row-count-bound. Each of the 2 layers gathers every padded
    # edge's source row once forward and once backward (transpose graph),
    # at the measured ~2.3 ns/row v5e DMA-engine floor regardless of row
    # width. floor_fraction is the fraction of the measured step already at
    # that floor — a drop means the step regressed relative to its bound.
    gathered_rows = 4 * graph.padded_num_edges
    floor_ms = gathered_rows * 2.3e-9 * 1e3
    print(json.dumps({
        "metric": "train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 2),
        "step_ms": round(step_ms, 2),
        "floor_ms": round(floor_ms, 2),
        "floor_fraction": round(floor_ms / step_ms, 3),
    }))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, daemon=True).start()
    main()
