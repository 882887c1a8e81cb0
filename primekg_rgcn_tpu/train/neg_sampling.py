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
