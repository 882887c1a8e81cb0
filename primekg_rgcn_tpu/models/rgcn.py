"""RGCN encoder + DistMult decoder link-prediction model.

Functional re-design of the reference model family (reference:
src/models/rgcn.py — DrugDiseaseRGCN at 21-142, LinkPredictor at 145-243,
DrugDiseaseModel at 246-415) as pure pytrees + apply functions, so the whole
model jits, shards with pjit/shard_map, and differentiates without framework
state.

Architecture (identical to the reference):
    node embedding table [N, d_emb]  (Xavier-uniform init, rgcn.py:93-95)
    -> RGCN layer (d_emb -> d_h) -> ReLU -> Dropout(p)
    -> RGCN layer (d_h -> d_h)
    decoder: relation embedding table [R, d_h] (Xavier-uniform, rgcn.py:185-187)
             DistMult scoring.

Default config parameter count matches the reference's 2,078,208 exactly
(reference: results_final/results.json "num_parameters").
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from primekg_rgcn_tpu.config import ModelConfig
from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.ops.distmult import distmult_score, distmult_score_all_tails
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

Params = Dict[str, Any]


def _xavier_uniform(key: jax.Array, shape, fan_in: int, fan_out: int) -> jnp.ndarray:
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _init_conv(key: jax.Array, din: int, dout: int, num_relations: int,
               num_bases: Optional[int]) -> Params:
    k_rel, k_root, k_coef = jax.random.split(key, 3)
    conv: Params = {
        "w_root": _xavier_uniform(k_root, (din, dout), din, dout),
        "bias": jnp.zeros((dout,), jnp.float32),
    }
    if num_bases is None:
        conv["w_rel"] = _xavier_uniform(k_rel, (num_relations, din, dout), din, dout)
    else:
        conv["basis"] = _xavier_uniform(k_rel, (num_bases, din, dout), din, dout)
        conv["coef"] = _xavier_uniform(k_coef, (num_relations, num_bases),
                                       num_relations, num_bases)
    return conv


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Initialize the full model parameter pytree."""
    k_node, k_c1, k_c2, k_rel = jax.random.split(key, 4)
    return {
        "encoder": {
            "node_emb": _xavier_uniform(
                k_node, (cfg.num_nodes, cfg.embedding_dim),
                cfg.num_nodes, cfg.embedding_dim,
            ),
            "conv1": _init_conv(k_c1, cfg.embedding_dim, cfg.hidden_dim,
                                cfg.num_relations, cfg.num_bases),
            "conv2": _init_conv(k_c2, cfg.hidden_dim, cfg.hidden_dim,
                                cfg.num_relations, cfg.num_bases),
        },
        "decoder": {
            "rel_emb": _xavier_uniform(
                k_rel, (cfg.num_relations, cfg.hidden_dim),
                cfg.num_relations, cfg.hidden_dim,
            ),
        },
    }


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def encoder_apply(
    params: Params,
    graph: RelGraph,
    cfg: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    layer_fn=rgcn_layer_segment,
) -> jnp.ndarray:
    """Full-graph encode: returns [N, hidden_dim] node embeddings.

    Mirrors DrugDiseaseRGCN.forward (reference: src/models/rgcn.py:97-130):
    embed -> conv1 -> relu -> dropout -> conv2.
    """
    enc = params["encoder"]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x = enc["node_emb"]
    x = layer_fn(enc["conv1"], x, graph, compute_dtype=compute_dtype)
    x = jax.nn.relu(x)
    if train and cfg.dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when train=True and dropout > 0")
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = layer_fn(enc["conv2"], x, graph, compute_dtype=compute_dtype)
    return x


def model_apply(
    params: Params,
    graph: RelGraph,
    heads: jnp.ndarray,
    tails: jnp.ndarray,
    rels: jnp.ndarray,
    cfg: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    layer_fn=rgcn_layer_segment,
    final_plan=None,
) -> jnp.ndarray:
    """Training forward: encode the whole graph, score a triple batch.

    Mirrors DrugDiseaseModel.forward (reference: src/models/rgcn.py:300-331):
    the encoder runs over the **entire** message-passing graph for every batch
    and gradients flow through it.

    ``final_plan`` (an ``ops.rgcn_final_layer.FinalLayerPlan``) switches the
    final conv to the batch-restricted evaluation: only the heads'/tails' rows
    are aggregated — mathematically identical (the loss reads nothing else)
    but ~4x less final-layer work. Requires the default ``layer_fn``.
    """
    enc_rng = dec_rng = None
    if train and dropout_rng is not None:
        enc_rng, dec_rng = jax.random.split(dropout_rng)
    if final_plan is not None:
        from primekg_rgcn_tpu.ops.rgcn_final_layer import final_layer_restricted

        enc = params["encoder"]
        compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                         else jnp.float32)
        x = layer_fn(enc["conv1"], enc["node_emb"], graph,
                     compute_dtype=compute_dtype)
        x = jax.nn.relu(x)
        if train and cfg.dropout > 0.0:
            if enc_rng is None:
                raise ValueError("dropout_rng required when train=True")
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(enc_rng, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        x_pad = jnp.concatenate(
            [x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
        nodes = jnp.concatenate([heads, tails])
        out = final_layer_restricted(
            enc["conv2"], x_pad, graph, final_plan, nodes,
            compute_dtype=compute_dtype)
        head_emb = out[: heads.shape[0]]
        tail_emb = out[heads.shape[0]:]
    else:
        node_emb = encoder_apply(
            params, graph, cfg, train=train, dropout_rng=enc_rng,
            layer_fn=layer_fn
        )
        head_emb = jnp.take(node_emb, heads, axis=0)
        tail_emb = jnp.take(node_emb, tails, axis=0)
    rel_emb = jnp.take(params["decoder"]["rel_emb"], rels, axis=0)
    if train and cfg.decoder_dropout > 0.0:
        if dec_rng is None:
            raise ValueError("dropout_rng required when train=True and decoder_dropout > 0")
        keep = 1.0 - cfg.decoder_dropout
        mask = jax.random.bernoulli(dec_rng, keep, rel_emb.shape)
        rel_emb = jnp.where(mask, rel_emb / keep, 0.0)
    return distmult_score(head_emb, tail_emb, rel_emb)


def predict(params: Params, graph: RelGraph, heads, tails, rels, cfg: ModelConfig,
            *, layer_fn=rgcn_layer_segment) -> jnp.ndarray:
    """Inference triple scoring (no dropout), reference rgcn.py:333-360."""
    return model_apply(params, graph, heads, tails, rels, cfg,
                       train=False, layer_fn=layer_fn)


def predict_all_tails(params: Params, graph: RelGraph, heads, rels, cfg: ModelConfig,
                      *, layer_fn=rgcn_layer_segment) -> jnp.ndarray:
    """[B, N] scores of every entity as tail, reference rgcn.py:362-395."""
    node_emb = encoder_apply(params, graph, cfg, train=False, layer_fn=layer_fn)
    head_emb = jnp.take(node_emb, heads, axis=0)
    rel_emb = jnp.take(params["decoder"]["rel_emb"], rels, axis=0)
    return distmult_score_all_tails(head_emb, rel_emb, node_emb)


def get_embeddings(params: Params, graph: RelGraph, cfg: ModelConfig,
                   *, layer_fn=rgcn_layer_segment) -> jnp.ndarray:
    """Encoder output without dropout, reference rgcn.py:397-415."""
    return encoder_apply(params, graph, cfg, train=False, layer_fn=layer_fn)


def encoder_apply_sampled(
    params: Params,
    batch,  # data.sampling.SampledBatch
    cfg: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Encode only a sampled neighborhood block (mini-batch mode).

    ``x0`` optionally supplies the layer-0 frontier rows directly (already
    in compute dtype, sentinel rows zeroed), bypassing the embedding-table
    gather — the hook the sparse-embedding-update train step uses to get
    [frontier, D]-shaped table gradients instead of dense [N, D] ones.

    The reference has no sampled path (its README lists mini-batch sampling
    as unimplemented); semantics here: per-relation mean over the *sampled*
    neighbors (the standard unbiased estimator), same root/bias/ReLU/dropout
    structure as the full-graph encoder. Frontiers are deduplicated
    (data/sampling.py), so every intermediate tensor scales with unique-node
    counts; returns [num_seeds, hidden_dim] embeddings in seed order (via
    ``batch.seed_gather``).
    """
    from primekg_rgcn_tpu.data.sampling import (
        block_aggregate,
        table_gather_sorted,
    )
    from primekg_rgcn_tpu.ops.rgcn_segment import materialize_relation_weights

    enc = params["encoder"]
    n = cfg.num_nodes
    # No dummy-row concatenate: appending one row to the embedding table
    # would COPY it (at 10M nodes the XLA temp was 2 x 4.77 GB — the copy
    # plus tile-padding 2x expansion — which alone OOM'd the chip).
    # Sentinel slots instead clamp to row n-1 and are zeroed post-gather.
    # The frontier is sorted-unique (sentinel-padded), so this gather's
    # backward is one sorted segment-sum into the table, not a scatter.
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    ident0 = bool(getattr(batch.blocks[0], "ident", False))
    if ident0:
        # Identity innermost block (near-saturated frontier): the layer-0
        # "input table" IS the raw embedding table — no frontier gather and
        # no [frontier, D] materialization exist at all. Row fetch +
        # compute-dtype conversion happen per-pick inside block_aggregate.
        x = x0 if x0 is not None else enc["node_emb"]
    elif x0 is not None:
        x = x0.astype(compute_dtype)
    else:
        # Gather THEN convert: casting the table first materializes a full
        # [N, D] compute-dtype copy every step (1.28 GB at 10M nodes); the
        # gather is row-count-bound, not byte-bound, so fetching f32 rows
        # and converting the [frontier, D] result is free by comparison.
        sentinel = (batch.frontier == n)[:, None]
        x = table_gather_sorted(
            enc["node_emb"],
            jnp.minimum(batch.frontier, n - 1)).astype(compute_dtype)
        x = jnp.where(sentinel, jnp.zeros((), compute_dtype), x)

    layers = [enc["conv1"], enc["conv2"]]
    if len(batch.blocks) != len(layers):
        raise ValueError(
            f"need {len(layers)} sampled blocks, got {len(batch.blocks)}")

    for li, (layer, block) in enumerate(zip(layers, batch.blocks)):
        x = block_aggregate(layer, x, block, materialize_relation_weights,
                            compute_dtype=compute_dtype if
                            (li == 0 and ident0) else None)
        # Sentinel rows must stay exactly zero (the bias would otherwise
        # leak into higher layers through their sampled picks).
        x = jnp.where((block.out_ids == n)[:, None],
                      jnp.zeros((), x.dtype), x)
        if li < len(layers) - 1:
            x = jax.nn.relu(x)
            if train and cfg.dropout > 0.0:
                if dropout_rng is None:
                    raise ValueError("dropout_rng required when train=True")
                dropout_rng, k = jax.random.split(dropout_rng)
                keep = 1.0 - cfg.dropout
                mask = jax.random.bernoulli(k, keep, x.shape)
                x = jnp.where(mask, x / keep, jnp.zeros((), x.dtype))
    return jnp.take(x, batch.seed_gather, axis=0).astype(jnp.float32)


def encoder_apply_cached(
    params: Params,
    batch,  # data.sampling.SampledBatch with ONE (outer) CombinedBlock
    cache: jnp.ndarray,  # [N, hidden_dim] layer-1 history table
    cfg: ModelConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    x0: Optional[jnp.ndarray] = None,
):
    """Historical-embedding forward (GAS/VR-GCN style, single-chip).

    The sampled 2-layer step's cost floor is the innermost frontier's
    random row fetch (~15 ns/row over millions of rows at config-5 scale,
    docs/KERNELS.md "Round 3"). This path removes that layer entirely:
    ONE sampled hop serves both convolutions —

      * conv1 runs FRESH for the (deduplicated) seed nodes over their
        sampled neighbors' table rows (gradients flow to the table and
        conv1 weights exactly as in the 2-layer step);
      * the fresh pre-activation rows are PUSHED into ``cache`` (stop-
        gradient — histories are constants, the GNNAutoScale estimator);
      * conv2 reads its inputs from the cache at the SAME hop's frontier,
        with the in-batch rows overwritten by the fresh (differentiable)
        values — so intra-batch edges use exact current values and
        out-of-batch neighbors use their last-computed history.

    Staleness: a node's history refreshes whenever it appears as a seed
    (every ~N/|seeds| steps under uniform edge sampling); quality must be
    qualified per scale (see docs/KERNELS.md "Round 5"). The receptive
    field stays 2-hop through histories — which themselves aggregated
    their own neighbors in earlier steps.

    Returns ``(seed_embeddings [S, hidden], new_cache [N, hidden])``.
    The reference has no sampled path at all (its README lists mini-batch
    sampling as unimplemented); this is the TPU-native scale lever, not a
    port of reference behavior.
    """
    from primekg_rgcn_tpu.data.sampling import (
        CombinedBlock,
        block_aggregate,
        table_gather_sorted,
    )
    from primekg_rgcn_tpu.ops.rgcn_segment import materialize_relation_weights

    enc = params["encoder"]
    n = cfg.num_nodes
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    if len(batch.blocks) != 1:
        raise ValueError(
            f"cached encoder needs exactly 1 sampled hop, got "
            f"{len(batch.blocks)}")
    block = batch.blocks[0]
    if not isinstance(block, CombinedBlock) or block.ident:
        raise ValueError(
            "cached encoder needs a dedup-frontier CombinedBlock (the "
            "frontier's global ids address the history table)")

    if x0 is not None:
        x = x0.astype(compute_dtype)
    else:
        sentinel = (batch.frontier == n)[:, None]
        x = table_gather_sorted(
            enc["node_emb"],
            jnp.minimum(batch.frontier, n - 1)).astype(compute_dtype)
        x = jnp.where(sentinel, jnp.zeros((), compute_dtype), x)

    # Fresh conv1 at the deduplicated seeds (block.out_ids are their GLOBAL
    # ids; sentinel == n). Pre-activation, no dropout: histories must not
    # bake in per-step noise.
    h1 = block_aggregate(enc["conv1"], x, block,
                         materialize_relation_weights)
    h1 = jnp.where((block.out_ids == n)[:, None],
                   jnp.zeros((), h1.dtype), h1)

    # Push to history. out_ids are unique; the sentinel id n falls out of
    # bounds and drops. stop_gradient: histories are constants.
    new_cache = cache.at[block.out_ids].set(
        jax.lax.stop_gradient(h1).astype(cache.dtype), mode="drop")

    # conv2 input table: histories at the hop's frontier, fresh rows
    # overwriting the in-batch positions (block.self_idx maps each output
    # row to its own frontier slot), so gradients flow through the root
    # term AND through intra-batch neighbor picks.
    hist = jnp.take(new_cache, jnp.minimum(batch.frontier, n - 1), axis=0)
    hist = jnp.where((batch.frontier == n)[:, None],
                     jnp.zeros((), hist.dtype), hist)
    h_tab = jax.lax.stop_gradient(hist.astype(h1.dtype))
    h_tab = h_tab.at[block.self_idx].set(h1)

    a = jax.nn.relu(h_tab)
    if train and cfg.dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when train=True")
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, a.shape)
        a = jnp.where(mask, a / keep, jnp.zeros((), a.dtype))

    out = block_aggregate(enc["conv2"], a, block,
                          materialize_relation_weights)
    out = jnp.where((block.out_ids == n)[:, None],
                    jnp.zeros((), out.dtype), out)
    emb = jnp.take(out, batch.seed_gather, axis=0).astype(jnp.float32)
    return emb, new_cache


# ============================================================================
# Inline smoke tests, runnable as `python -m primekg_rgcn_tpu.models.rgcn`
# (parity with the reference's self-test entry point, rgcn.py:422-643; the
# real test suite lives in tests/).
# ============================================================================

def _smoke():  # pragma: no cover - exercised manually
    import numpy as np

    from primekg_rgcn_tpu.data.graph import build_rel_graph

    print("=" * 70)
    print("RGCN model smoke tests")
    print("=" * 70)

    num_nodes, num_relations, num_edges, batch = 100, 3, 500, 32
    rng = np.random.default_rng(0)
    graph = build_rel_graph(rng.integers(0, num_nodes, num_edges),
                            rng.integers(0, num_nodes, num_edges),
                            rng.integers(0, num_relations, num_edges),
                            num_nodes, num_relations, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=num_nodes, num_relations=num_relations)
    params = init_params(jax.random.PRNGKey(0), cfg)

    emb = encoder_apply(params, graph, cfg)
    assert emb.shape == (num_nodes, cfg.hidden_dim)
    print(f"  encoder: {emb.shape}, range [{float(emb.min()):.3f}, "
          f"{float(emb.max()):.3f}]  OK")

    heads = jnp.asarray(rng.integers(0, num_nodes, batch))
    tails = jnp.asarray(rng.integers(0, num_nodes, batch))
    rels = jnp.asarray(rng.integers(0, num_relations, batch))
    scores = model_apply(params, graph, heads, tails, rels, cfg,
                         train=True, dropout_rng=jax.random.PRNGKey(1))
    assert scores.shape == (batch,)
    print(f"  train forward: {scores.shape}  OK")

    pred = predict(params, graph, heads, tails, rels, cfg)
    all_scores = predict_all_tails(params, graph, heads, rels, cfg)
    assert pred.shape == (batch,)
    assert all_scores.shape == (batch, num_nodes)
    print(f"  predict: {pred.shape}, all-tails: {all_scores.shape}  OK")

    n_params = count_params(params)
    print(f"  parameters: {n_params:,}")
    full = count_params(init_params(jax.random.PRNGKey(0),
                                    ModelConfig(num_nodes=30926,
                                                num_relations=3)))
    assert full == 2_078_208, full
    print(f"  default PrimeKG config parameters: {full:,} "
          "(matches reference)  OK")
    print("=" * 70)
    print("All smoke tests passed")


if __name__ == "__main__":  # pragma: no cover
    _smoke()
