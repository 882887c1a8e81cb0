"""Entity-sharded ranking must reproduce single-device raw ranks exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.evaluate.metrics import ranks_of_true_tails
from primekg_rgcn_tpu.evaluate.sharded_ranking import build_sharded_ranker
from primekg_rgcn_tpu.ops.distmult import distmult_score_all_tails
from primekg_rgcn_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device platform")


@pytest.mark.parametrize("n", [800, 805])  # exact and padded entity counts
def test_sharded_ranks_match_single_device(n):
    rng = np.random.default_rng(0)
    d, b, r = 32, 64, 3
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rel_emb = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    heads = jnp.asarray(rng.integers(0, n, b))
    rels = jnp.asarray(rng.integers(0, r, b))
    tails = jnp.asarray(rng.integers(0, n, b))

    mesh = make_mesh(len(jax.devices()))
    rank_fn = build_sharded_ranker(mesh, emb, rel_emb)
    sharded = np.asarray(rank_fn(heads, rels, tails))

    scores = distmult_score_all_tails(jnp.take(emb, heads, axis=0),
                                      jnp.take(rel_emb, rels, axis=0), emb)
    single = np.asarray(ranks_of_true_tails(scores, tails))
    np.testing.assert_array_equal(sharded, single)
