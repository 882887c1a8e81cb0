"""DistMult scoring ops.

Reference semantics (reference: src/models/rgcn.py:189-243):
    score(h, r, t) = sum(h * e_r * t)          (triple scoring)
    score_all(h, r) = (h * e_r) @ E^T          (all-tails ranking matmul)

Both are pure MXU/VPU work; XLA fuses the elementwise product into the matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def distmult_score(
    head_emb: jnp.ndarray,
    tail_emb: jnp.ndarray,
    rel_emb: jnp.ndarray,
) -> jnp.ndarray:
    """Batched triple scores. [B, D] x [B, D] x [B, D] -> [B]."""
    return jnp.sum(head_emb * rel_emb * tail_emb, axis=-1)


def distmult_score_all_tails(
    head_emb: jnp.ndarray,
    rel_emb: jnp.ndarray,
    all_tail_emb: jnp.ndarray,
) -> jnp.ndarray:
    """Scores against every entity. [B, D], [B, D], [N, D] -> [B, N]."""
    hr = head_emb * rel_emb
    return jnp.dot(hr, all_tail_emb.T, preferred_element_type=jnp.float32)
