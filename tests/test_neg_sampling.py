"""Negative-sampler + shared candidate-batch helper unit tests
(reference semantics: src/train.py:43-97)."""

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.train.neg_sampling import (
    bce_stats,
    candidate_batch,
    sample_negatives,
)


def test_sample_negatives_corrupts_exactly_one_side():
    key = jax.random.PRNGKey(0)
    b, n = 512, 100
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, n, b))
    t = jnp.asarray(rng.integers(0, n, b))
    r = jnp.asarray(rng.integers(0, 3, b))
    nh, nt, nr = sample_negatives(key, h, t, r, n, 1)
    nh, nt = np.asarray(nh), np.asarray(nt)
    head_kept = nh == np.asarray(h)
    tail_kept = nt == np.asarray(t)
    # Each negative keeps exactly one endpoint (modulo the rare case where
    # the random entity equals the original).
    assert np.mean(head_kept | tail_kept) == 1.0
    assert 0.3 < np.mean(head_kept) < 0.7  # fair corruption coin
    np.testing.assert_array_equal(np.asarray(nr), np.asarray(r))


def test_sample_negatives_repeat_interleave_layout():
    key = jax.random.PRNGKey(1)
    h = jnp.asarray([1, 2])
    t = jnp.asarray([3, 4])
    r = jnp.asarray([0, 1])
    nh, nt, nr = sample_negatives(key, h, t, r, 50, 3)
    assert nh.shape == (6,)
    # repeat-interleaved: first three negatives derive from positive 0
    np.testing.assert_array_equal(np.asarray(nr), [0, 0, 0, 1, 1, 1])


def test_candidate_batch_mask_propagates_to_negatives():
    key = jax.random.PRNGKey(2)
    h = jnp.asarray([1, 2, 3, 4])
    t = jnp.asarray([5, 6, 7, 8])
    r = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([1, 1, 0, 0])
    heads, tails, rels, labels, weights = candidate_batch(
        key, h, t, r, 20, 2, mask=mask)
    assert heads.shape == (12,)  # 4 pos + 8 neg
    np.testing.assert_array_equal(np.asarray(labels),
                                  [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(weights),
                                  [1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0])


def test_bce_stats_masked_mean_matches_unpadded():
    scores = jnp.asarray([2.0, -1.0, 0.5, 9.9])
    labels = jnp.asarray([1.0, 0.0, 1.0, 1.0])
    weights = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    loss_sum, correct, count = bce_stats(scores, labels, weights)
    l2, c2, n2 = bce_stats(scores[:3], labels[:3], jnp.ones(3))
    assert float(loss_sum) == float(l2)
    assert float(correct) == float(c2)
    assert float(count) == 3.0
