"""Mini-batch (neighbor-sampled) training step.

Greenfield capability (the reference trains full-graph only; SURVEY.md §5
"long-context" row): each step samples the L-hop neighborhoods of the batch's
candidate endpoints on device and differentiates through the sampled
encoder — O(B * fanout^L) instead of O(E) per step, which is what makes the
100M-edge configs in BASELINE.json trainable.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.sampling import CsrCache, sample_batch
from primekg_rgcn_tpu.models.rgcn import encoder_apply_sampled
from primekg_rgcn_tpu.ops.distmult import distmult_score
from primekg_rgcn_tpu.train.loop import TrainState
from primekg_rgcn_tpu.train.neg_sampling import sample_negatives


def build_sampled_train_step(
    csr: CsrCache,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    *,
    fanouts: Sequence[int] = (15, 10),
    mode: str = "uniform",
):
    """Returns jitted ``step(state, pos_edges [B, 3], key)``."""
    fanouts = tuple(int(f) for f in fanouts)

    def loss_fn(params, pos, key):
        k_neg, k_sample, k_drop = jax.random.split(key, 3)
        h, t, r = pos[:, 0], pos[:, 1], pos[:, 2]
        nh, nt, nr = sample_negatives(k_neg, h, t, r, model_cfg.num_nodes,
                                      train_cfg.num_neg_samples)
        heads = jnp.concatenate([h, nh])
        tails = jnp.concatenate([t, nt])
        rels = jnp.concatenate([r, nr])
        labels = jnp.concatenate([jnp.ones_like(h, jnp.float32),
                                  jnp.zeros_like(nh, jnp.float32)])

        # One shared sampled block for every endpoint in the batch.
        seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
        batch = sample_batch(k_sample, csr, seeds, fanouts, mode=mode)
        emb = encoder_apply_sampled(params, batch, model_cfg, train=True,
                                    dropout_rng=k_drop)
        m = heads.shape[0]
        head_emb, tail_emb = emb[:m], emb[m:]
        rel_emb = jnp.take(params["decoder"]["rel_emb"], rels, axis=0)
        scores = distmult_score(head_emb, tail_emb, rel_emb)
        loss = optax.sigmoid_binary_cross_entropy(scores, labels).mean()
        preds = (jax.nn.sigmoid(scores) > 0.5).astype(jnp.float32)
        acc = (preds == labels).mean()
        return loss, acc

    @jax.jit
    def step(state: TrainState, pos_edges, key):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pos_edges, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), (loss, acc)

    return step
