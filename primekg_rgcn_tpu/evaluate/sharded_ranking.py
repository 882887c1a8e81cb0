"""Entity-sharded all-tails ranking.

At PrimeKG scale the ranking matmul is [B,128] x [128, 31K] — trivial. At
the 10M-node configs the score matrix would be B x 10M; here the entity
axis is sharded across the mesh: each device scores its slice of the
embedding table, the true tail's score is recovered with one owner-masked
psum, and the global rank is one more psum of local greater-than counts.
Traffic per batch: O(B) scalars, independent of N.

Matches the single-device raw-rank semantics exactly
(evaluate/metrics.py::ranks_of_true_tails; reference:
src/evaluate.py:264-276).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from primekg_rgcn_tpu.ops.distmult import distmult_score_all_tails


def build_sharded_ranker(mesh: Mesh, node_emb: jnp.ndarray,
                         rel_emb: jnp.ndarray, *, axis_name: str = "data"):
    """Returns ``rank(heads, rels, true_tails) -> int32[B]`` (1-indexed raw
    ranks), with the N x D entity table sharded over the mesh axis.

    ``node_emb`` is the [N, D] encoder output (host or device array).
    """
    n_dev = mesh.devices.size
    n, d = node_emb.shape
    n_loc = -(-n // n_dev)
    pad = n_dev * n_loc - n
    # Padding rows are zero and masked out of the rank count explicitly
    # (scoring them -inf would NOT work: sum(hr * -inf) is +inf whenever
    # hr is all-negative, and NaN on mixed signs).
    emb_pad = jnp.concatenate(
        [jnp.asarray(node_emb), jnp.zeros((pad, d), node_emb.dtype)],
        axis=0) if pad else jnp.asarray(node_emb)
    emb_dm = emb_pad.reshape(n_dev, n_loc, d)
    emb_sh = jax.device_put(emb_dm, NamedSharding(mesh, P(axis_name)))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(), P(), P(), P()),
             out_specs=P(), check_vma=True)
    def _rank(emb_local, head_emb, rel_vecs, true_tails, _dummy):
        local = emb_local[0]                      # [n_loc, D]
        my = jax.lax.axis_index(axis_name)
        # Scores of this device's entity slice for every query.
        scores_local = distmult_score_all_tails(head_emb, rel_vecs, local)
        # True tail's score, recovered from its owner.
        owner = true_tails // n_loc
        loc_idx = jnp.where(owner == my, true_tails - my * n_loc, 0)
        picked = scores_local[jnp.arange(true_tails.shape[0]), loc_idx]
        true_scores = jax.lax.psum(
            jnp.where(owner == my, picked, 0.0), axis_name)
        # Mask this shard's padding slots (global id >= n) out of the count.
        valid = (my * n_loc + jnp.arange(n_loc)) < n
        better = jnp.sum(
            ((scores_local > true_scores[:, None]) & valid[None, :])
            .astype(jnp.int32), axis=1)
        return 1 + jax.lax.psum(better, axis_name)

    node_emb_dev = jnp.asarray(node_emb)
    rel_emb_dev = jnp.asarray(rel_emb)

    # Tables enter the jit as ARGUMENTS (captured device arrays become
    # duplicated lowering-time constants and per-call host restages on the
    # hosted backend — see parallel/edge_shard.py).
    @jax.jit
    def _jit_rank(emb_s, ne, re, heads, rels, true_tails):
        head_emb = jnp.take(ne, heads, axis=0)
        rel_vecs = jnp.take(re, rels, axis=0)
        return _rank(emb_s, head_emb, rel_vecs, true_tails, jnp.zeros(()))

    def rank(heads, rels, true_tails):
        return _jit_rank(emb_sh, node_emb_dev, rel_emb_dev, heads, rels,
                         true_tails.astype(jnp.int32))

    return rank


def _owner_masked_fetch(local, ids, my, n_loc, axis_name):
    """Owner-masked psum row fetch: [B] global ids -> [B, D].

    Each device contributes the rows it owns (zero elsewhere); the psum
    assembles the full batch on every device — O(B x D) ICI, independent
    of N.
    """
    owner = ids // n_loc
    idx = jnp.where(owner == my, ids - my * n_loc, 0)
    rows = jnp.take(local, idx, axis=0)
    rows = jnp.where((owner == my)[:, None], rows, jnp.zeros_like(rows))
    return jax.lax.psum(rows, axis_name)


def build_sharded_eval_from_sharded(mesh: Mesh, emb_dm, rel_emb,
                                    num_nodes: int, *,
                                    axis_name: str = "data"):
    """Fully-sharded evaluation over an ALREADY-SHARDED entity table.

    ``emb_dm`` is the device-major [n_dev, n_loc, D] encoder output exactly
    as the node-sharded forward produces it (``gather=False``) — it is never
    replicated or reshaped host-side, so the whole encode→rank/score pipeline
    stays O(N/n) memory per device (the missing piece flagged in
    docs/PARALLELISM.md: previously the ranker required a replicated
    [N, D] input). Endpoint embeddings for queries are fetched with
    owner-masked psums — O(B x D) ICI traffic, independent of N.

    Returns ``(rank, score)``:
      rank(heads, rels, true_tails) -> int32[B] 1-indexed raw ranks
        (semantics of evaluate/metrics.py::ranks_of_true_tails; reference:
        src/evaluate.py:264-276);
      score(heads, tails, rels) -> float32[B] DistMult logits
        (the classification-path scorer, reference: src/evaluate.py:120-150).
    """
    n_dev, n_loc, d = emb_dm.shape
    rel_emb = jnp.asarray(rel_emb)

    def _fetch(local, ids, my):
        return _owner_masked_fetch(local, ids, my, n_loc, axis_name)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis_name), P(), P(), P()),
             out_specs=P(), check_vma=True)
    def _rank(emb_local, heads, rels, true_tails):
        local = emb_local[0]                      # [n_loc, D]
        my = jax.lax.axis_index(axis_name)
        # Replicated id operands must be explicitly promoted before mixing
        # with device-varying values (check_vma=True).
        heads = jax.lax.pcast(heads, axis_name, to="varying")
        true_tails = jax.lax.pcast(true_tails, axis_name, to="varying")
        head_emb = _fetch(local, heads, my)
        rel_vecs = jnp.take(rel_emb, rels, axis=0)
        rel_vecs = jax.lax.pcast(rel_vecs, axis_name, to="varying")
        scores_local = distmult_score_all_tails(head_emb, rel_vecs, local)
        owner = true_tails // n_loc
        loc_idx = jnp.where(owner == my, true_tails - my * n_loc, 0)
        picked = scores_local[jnp.arange(true_tails.shape[0]), loc_idx]
        true_scores = jax.lax.psum(
            jnp.where(owner == my, picked, 0.0), axis_name)
        valid = (my * n_loc + jnp.arange(n_loc)) < num_nodes
        better = jnp.sum(
            ((scores_local > true_scores[:, None]) & valid[None, :])
            .astype(jnp.int32), axis=1)
        return 1 + jax.lax.psum(better, axis_name)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis_name), P(), P(), P()),
             out_specs=P(), check_vma=True)
    def _score(emb_local, heads, tails, rels):
        local = emb_local[0]
        my = jax.lax.axis_index(axis_name)
        heads = jax.lax.pcast(heads, axis_name, to="varying")
        tails = jax.lax.pcast(tails, axis_name, to="varying")
        he = _fetch(local, heads, my)
        te = _fetch(local, tails, my)
        re = jnp.take(rel_emb, rels, axis=0)
        re = jax.lax.pcast(re, axis_name, to="varying")
        s = jnp.sum(he * re * te, axis=-1)
        # Every device holds the identical psum-assembled result; hand one
        # replicated copy back.
        return jax.lax.psum(s, axis_name) / n_dev

    _jit_rank = jax.jit(_rank)
    _jit_score = jax.jit(_score)

    def rank(heads, rels, true_tails):
        return _jit_rank(emb_dm, heads.astype(jnp.int32),
                         rels.astype(jnp.int32),
                         true_tails.astype(jnp.int32))

    def score(heads, tails, rels):
        return _jit_score(emb_dm, heads.astype(jnp.int32),
                          tails.astype(jnp.int32), rels.astype(jnp.int32))

    return rank, score


def build_sharded_topk(mesh: Mesh, emb_dm, rel_emb, num_nodes: int, k: int,
                       *, axis_name: str = "data"):
    """Distributed top-K tail retrieval over a sharded entity table.

    The serving counterpart of ranking: ``topk(heads, rels) -> (scores
    [B, K], tail_ids [B, K])`` without any device materializing the
    [B, N] score matrix — each device computes ``lax.top_k`` over its
    [B, N/n] slice scores, the K-candidate lists are all-gathered
    ([n, B, K], K·n rows instead of N), and a final top-K over the
    concatenated candidates selects the exact global winners (top-K is
    distributive over partitions). Padded tail rows score -inf.

    Tie behavior: winners are exact by SCORE; among exactly-equal scores
    the returned id order follows slice-major candidate order (the dense
    oracle's argsort order may differ within a tie group).
    """
    n_dev, n_loc, d = emb_dm.shape
    rel_emb = jnp.asarray(rel_emb)
    if k > n_loc:
        raise ValueError(f"k={k} exceeds per-device slice {n_loc}")

    # rel_emb rides as a jit ARGUMENT like every other table (captured
    # device constants restage host-side per call on the hosted backend).
    @partial(shard_map, mesh=mesh, in_specs=(P(axis_name), P(), P(), P()),
             out_specs=(P(), P()), check_vma=True)
    def _topk(emb_local, rel_table, heads, rels):
        local = emb_local[0]                       # [n_loc, D]
        my = jax.lax.axis_index(axis_name)
        heads = jax.lax.pcast(heads, axis_name, to="varying")
        rels_v = jax.lax.pcast(rels, axis_name, to="varying")
        he = _owner_masked_fetch(local, heads, my, n_loc, axis_name)
        re = jnp.take(rel_table, rels_v, axis=0)
        q = he * re                                # [B, D]
        scores_local = q @ local.T                 # [B, n_loc]
        base = my * n_loc
        valid = (base + jnp.arange(n_loc)) < num_nodes
        scores_local = jnp.where(valid[None, :], scores_local, -jnp.inf)
        s_k, i_k = jax.lax.top_k(scores_local, k)  # [B, K] local winners
        i_k = i_k + base
        # Candidate exchange: K*n rows per query, not N. Every device
        # receives the identical concatenation, so the gather is typed
        # invariant for the replicated out_specs (same pattern as the
        # ZeRO-1 table rebuild).
        from jax._src.lax.parallel import all_gather_invariant

        s_all = all_gather_invariant(s_k, axis_name)   # [n, B, K]
        i_all = all_gather_invariant(i_k, axis_name)
        b = s_k.shape[0]
        s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)
        i_flat = jnp.transpose(i_all, (1, 0, 2)).reshape(b, -1)
        s_top, pos = jax.lax.top_k(s_flat, k)
        i_top = jnp.take_along_axis(i_flat, pos, axis=1)
        return s_top, i_top

    _jit = jax.jit(_topk)

    def topk(heads, rels):
        return _jit(emb_dm, rel_emb, jnp.asarray(heads, jnp.int32),
                    jnp.asarray(rels, jnp.int32))

    return topk
