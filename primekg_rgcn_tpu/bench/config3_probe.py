"""Roofline decomposition of the config-3 (full PrimeKG) training step.

VERDICT r4 item 6: the `primekg-full` suite row (131 ms/step, 129K nodes,
30 relations, 4.6M directed edges) gets the same measured-decomposition
treatment as the north-star config (docs/KERNELS.md "Roofline"): split the
step into per-layer aggregation fwd+bwd shares and the dense residual, state
the DMA-gather floor, and publish the numbers so the accept/reject of any
future optimization idea is grounded.

Methodology mirrors bench/restricted_probe.py: every component is timed as a
jitted ``lax.scan`` over ``steps`` iterations so closure constants (graph
index arrays) are staged once per call — per-call timing on the hosted
backend measures captured-constant restaging, not compute.

Components:
- ``step_auto_ms``    — the production step (restrict_final auto, Pallas agg)
- ``step_full_ms``    — same with the batch-restricted final layer OFF
- ``conv1_fwd_bwd_ms``— layer-1 aggregation+transform alone ([N,64]->[N,128])
- ``conv2_fwd_bwd_ms``— FULL layer-2 alone ([N,128]->[N,128])
- ``encode_fwd_ms``   — 2-layer forward encode only
- derived: conv2's effective share under auto, the dense residual
  (embedding gathers, DistMult, BCE, adam, sampling), and the 2.3 ns/row
  gather floors per component.

Run (on the chip): ``python -m primekg_rgcn_tpu.bench.config3_probe``
Writes/merges the ``config3-decomp`` row into bench_report.json.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

GATHER_NS_PER_ROW = 2.3  # measured v5e DMA-gather floor (docs/KERNELS.md)


def run_probe(scale: float = 1.0, batch_size: int = 1024, steps: int = 20):
    import jax
    import jax.numpy as jnp

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_full_like
    from primekg_rgcn_tpu.models.rgcn import encoder_apply, init_params
    from primekg_rgcn_tpu.ops.rgcn_final_layer import resolve_final_plan
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
    from primekg_rgcn_tpu.train.loop import (TrainState, _batch_loss,
                                             make_optimizer)

    raw = primekg_full_like(seed=0, scale=scale)
    src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
    n, n_rel = int(raw["num_nodes"]), int(raw["num_relations"])
    graph = build_rel_graph(src, dst, rel, n, n_rel)
    cfg = ModelConfig(num_nodes=n, num_relations=n_rel)
    tcfg = TrainConfig(batch_size=batch_size)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tcfg)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    edges_pad = jnp.asarray(
        np.concatenate([edges, np.zeros((1, 3), np.int32)]))

    plan = resolve_final_plan(graph, edges, batch_size,
                              tcfg.num_neg_samples, seed=tcfg.seed,
                              mode="auto")
    e_cap = int(sum(plan.e_cap)) if plan is not None else None

    # -- whole-step variants (scan-amortized) -------------------------------
    def step_timer(final_plan):
        import optax

        grad_fn = jax.value_and_grad(
            lambda p, bi, k: _batch_loss(
                p, graph, edges_pad, bi, k, cfg, tcfg, train=True,
                layer_fn=rgcn_layer_segment, final_plan=final_plan),
            has_aux=True)
        state0 = TrainState(params, opt.init(params),
                            jnp.zeros((), jnp.int32))
        bidx = jnp.asarray(
            np.random.default_rng(0).integers(
                0, len(edges), (steps, batch_size)).astype(np.int32))

        def body(carry, inp):
            state, key = carry
            bi = inp
            key, k = jax.random.split(key)
            (loss, _), grads = grad_fn(state.params, bi, k)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            state = TrainState(optax.apply_updates(state.params, updates),
                               opt_state, state.step + 1)
            return (state, key), loss

        run = jax.jit(lambda s0, k0, b: jax.lax.scan(body, (s0, k0), b))
        (_, losses) = run(state0, jax.random.PRNGKey(0), bidx)
        float(losses[-1])  # compile + warm
        t0 = time.perf_counter()
        (_, losses) = run(state0, jax.random.PRNGKey(1), bidx)
        float(losses[-1])
        return round((time.perf_counter() - t0) / steps * 1e3, 2)

    # -- layer-alone fwd+bwd (scan-amortized vjp) ---------------------------
    def layer_timer(layer_params, din):
        x0 = jax.random.normal(jax.random.PRNGKey(1), (n, din))
        ct = jax.random.normal(jax.random.PRNGKey(2), (n, cfg.hidden_dim))

        def body(c, _):
            g = jax.grad(lambda x: jnp.vdot(
                rgcn_layer_segment(layer_params, x, graph), ct))(
                    x0 * (1.0 + c))
            return g[0, 0] * 1e-30, None

        run = jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=steps)[0])
        float(run(jnp.float32(0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(0)))
        return round((time.perf_counter() - t0) / steps * 1e3, 2)

    def encode_timer():
        def body(c, _):
            h = encoder_apply(params, graph, cfg, train=False,
                              layer_fn=rgcn_layer_segment)
            return c + h[0, 0] * 1e-30, None

        run = jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=steps)[0])
        float(run(jnp.float32(0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(0)))
        return round((time.perf_counter() - t0) / steps * 1e3, 2)

    res = {
        "nodes": n, "relations": n_rel,
        "edges": int(graph.num_edges),
        "edges_padded": int(graph.padded_num_edges),
        "restricted_e_cap": e_cap,
        "platform": jax.default_backend(),
        "step_auto_ms": step_timer(plan),
        "step_full_ms": step_timer(None),
        "conv1_fwd_bwd_ms": layer_timer(params["encoder"]["conv1"],
                                        cfg.embedding_dim),
        "conv2_fwd_bwd_ms": layer_timer(params["encoder"]["conv2"],
                                        cfg.hidden_dim),
        "encode_fwd_ms": encode_timer(),
    }
    # Effective conv2 share under the auto (restricted) plan: the full-layer
    # cost minus the measured end-to-end saving of turning restriction on.
    res["restrict_saving_ms"] = round(
        res["step_full_ms"] - res["step_auto_ms"], 2)
    res["conv2_auto_share_ms"] = round(
        res["conv2_fwd_bwd_ms"] - res["restrict_saving_ms"], 2)
    res["dense_residual_ms"] = round(
        res["step_auto_ms"] - res["conv1_fwd_bwd_ms"]
        - res["conv2_auto_share_ms"], 2)
    # 2.3 ns/row DMA-gather floors (fwd + transpose bwd per layer).
    e_pad = graph.padded_num_edges
    res["conv1_gather_floor_ms"] = round(
        2 * e_pad * GATHER_NS_PER_ROW * 1e-6, 2)
    conv2_rows = 2 * (e_cap if e_cap is not None else e_pad)
    res["conv2_gather_floor_ms"] = round(
        conv2_rows * GATHER_NS_PER_ROW * 1e-6, 2)
    res["floor_ms"] = round(res["conv1_gather_floor_ms"]
                            + res["conv2_gather_floor_ms"], 2)
    res["floor_fraction"] = round(res["floor_ms"] / res["step_auto_ms"], 3)
    return res


def main(argv=None):
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default="bench_report.json")
    args = p.parse_args(argv)

    res = run_probe(scale=args.scale, steps=args.steps)
    print(json.dumps(res, indent=2))
    try:
        with open(args.out) as f:
            report = json.load(f)
    except (OSError, ValueError):
        report = {"results": {}}
    report.setdefault("results", {})["config3-decomp"] = res
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"merged into {args.out}")
    return res


if __name__ == "__main__":
    main()
