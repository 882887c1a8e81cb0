"""Negative sampling for link prediction.

Reference semantics (reference: src/train.py:43-97, duplicated at
src/evaluate.py:106-145): each positive triple is repeated ``num_neg_samples``
times; for each copy a fair coin decides whether the head or the tail is
replaced by a uniformly random entity. True edges are *not* rejected —
matching the reference exactly (SURVEY.md §2.1/C5).

TPU-native: pure ``jax.random`` with threaded keys — deterministic under jit,
reproducible across replicas, no host round-trips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_negatives(
    key: jax.Array,
    pos_head: jnp.ndarray,
    pos_tail: jnp.ndarray,
    pos_rel: jnp.ndarray,
    num_nodes: int,
    num_neg_samples: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Corrupt positives into negatives.

    Returns (neg_head, neg_tail, neg_rel), each of length
    ``len(pos_head) * num_neg_samples`` with repeat-interleaved ordering to
    match the reference layout.
    """
    k_coin, k_ent = jax.random.split(key)
    neg_head = jnp.repeat(pos_head, num_neg_samples)
    neg_tail = jnp.repeat(pos_tail, num_neg_samples)
    neg_rel = jnp.repeat(pos_rel, num_neg_samples)
    total = neg_head.shape[0]
    corrupt_head = jax.random.uniform(k_coin, (total,)) < 0.5
    random_entities = jax.random.randint(k_ent, (total,), 0, num_nodes,
                                         dtype=neg_head.dtype)
    neg_head = jnp.where(corrupt_head, random_entities, neg_head)
    neg_tail = jnp.where(~corrupt_head, random_entities, neg_tail)
    return neg_head, neg_tail, neg_rel


def candidate_batch(
    key: jax.Array,
    pos_head: jnp.ndarray,
    pos_tail: jnp.ndarray,
    pos_rel: jnp.ndarray,
    num_nodes: int,
    num_neg_samples: int = 1,
    mask: jnp.ndarray = None,
):
    """Positives + corrupted negatives as one scoring batch.

    The single shared implementation of the corrupt/concat/label/weight block
    used by every training path (full-batch, edge-sharded, node-sharded,
    sampled). Returns (heads, tails, rels, labels, weights); ``weights`` are
    all-ones unless a padding ``mask`` over the positives is given (the mask
    repeats onto each positive's negatives).
    """
    neg_head, neg_tail, neg_rel = sample_negatives(
        key, pos_head, pos_tail, pos_rel, num_nodes, num_neg_samples)
    heads = jnp.concatenate([pos_head, neg_head])
    tails = jnp.concatenate([pos_tail, neg_tail])
    rels = jnp.concatenate([pos_rel, neg_rel])
    labels = jnp.concatenate([
        jnp.ones_like(pos_head, dtype=jnp.float32),
        jnp.zeros_like(neg_head, dtype=jnp.float32),
    ])
    if mask is None:
        weights = jnp.ones_like(labels)
    else:
        m = mask.astype(jnp.float32)
        weights = jnp.concatenate([m, jnp.repeat(m, num_neg_samples)])
    return heads, tails, rels, labels, weights


def bce_stats(scores: jnp.ndarray, labels: jnp.ndarray,
              weights: jnp.ndarray):
    """Weighted BCE-with-logits statistics shared by all training paths.

    Returns (loss_sum, correct, count); mean loss = loss_sum / max(count, 1).
    """
    import optax

    per_ex = optax.sigmoid_binary_cross_entropy(scores, labels)
    preds = (jax.nn.sigmoid(scores) > 0.5).astype(jnp.float32)
    correct = ((preds == labels).astype(jnp.float32) * weights).sum()
    return (per_ex * weights).sum(), correct, weights.sum()
