"""Mini-batch (neighbor-sampled) training step.

Greenfield capability (the reference trains full-graph only; SURVEY.md §5
"long-context" row): each step samples the L-hop neighborhoods of the batch's
candidate endpoints on device and differentiates through the sampled
encoder — O(B * fanout^L) instead of O(E) per step, which is what makes the
100M-edge configs in BASELINE.json trainable.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.sampling import CsrCache, sample_batch
from primekg_rgcn_tpu.models.rgcn import encoder_apply_sampled
from primekg_rgcn_tpu.ops.distmult import distmult_score
from primekg_rgcn_tpu.train.loop import TrainState
from primekg_rgcn_tpu.train.neg_sampling import bce_stats, candidate_batch


def resolve_sampler(graph_or_csr, fanouts, layout: str = "auto",
                    mode: str = "uniform"):
    """Pick the pick-tensor layout for this graph's relation sparsity.

    "per-relation" ([R, M, f] picks) is right when most (node, relation)
    pairs have edges; "combined" (merged-neighborhood budget with relation
    tags + importance weights) is right for relation-sparse graphs, where
    per-relation fanout materializes R*f mostly-sentinel slots per node
    (measured 2,970 ms/step on 30-relation full PrimeKG vs ~60 ms combined).
    "auto" switches to combined when avg present relations per node is under
    half the relation count. Returns (csr_like, budgets, use_combined).

    ``mode="block"`` additionally puts a slim packed CSR into granule-pairs
    form (host-side reshape) so the window fetch never needs the unsafe
    on-device narrow-dim reshape (data/sampling.build_combined_csr).
    """
    from primekg_rgcn_tpu.data.sampling import (
        CombinedCsr, _window_fetch_enabled, build_combined_csr,
        build_csr_cache, csr_to_pairs_form, parse_sample_mode)

    base_mode = parse_sample_mode(mode)[0]
    want_pairs = base_mode == "block" and _window_fetch_enabled()

    fanouts = tuple(int(f) for f in fanouts)
    if isinstance(graph_or_csr, (CsrCache, CombinedCsr)):
        csr = graph_or_csr
        graph = None
    else:
        graph = graph_or_csr
        csr = None

    if layout == "per-relation" or isinstance(csr, CsrCache):
        if csr is None:
            csr = build_csr_cache(graph)
        return csr, fanouts, False
    if csr is None:
        ccsr = build_combined_csr(graph, window_pairs=want_pairs)
        # Block modes REQUIRE the combined layout (contiguous windows ride
        # the merged CSR), so the relation-density heuristic only applies
        # to the other modes — without this, --sample_mode block on a
        # relation-dense graph routed to the per-relation layout and
        # failed there.
        if layout == "auto" and base_mode != "block" and \
                ccsr.avg_present_relations >= 0.5 * ccsr.num_relations:
            return build_csr_cache(graph), fanouts, False
    else:
        ccsr = csr
        if want_pairs:
            ccsr = csr_to_pairs_form(ccsr)
    # Budget: the per-relation fanout times the graph's typical number of
    # PRESENT relations per node — equal effective sample size without the
    # R*f sentinel blowup. Rounded up to a lane-friendly multiple of 8 and
    # capped at 48: beyond that the estimator-variance gain is marginal
    # while frontier memory grows linearly (the cap is what lets the
    # 10M-node/100M-edge config train on ONE 16 GB chip).
    factor = max(1.0, ccsr.avg_present_relations)
    budgets = tuple(min(-(-int(np.ceil(f * factor)) // 8) * 8, 48)
                    for f in fanouts)
    return ccsr, budgets, True


def _csr_operands(csr, use_combined):
    """(flat array tuple, rebuild fn) so CSR tables enter jit as ARGUMENTS.

    On the hosted TPU backend, large captured constants are materialized in
    HOST memory and re-copied (plus gathered host-side) EVERY step —
    profiling showed ~400 ms/step of S(1)-space copies on the full-PrimeKG
    tables. Passed-in jax.Arrays stay device-resident.
    """
    if use_combined:
        packed = csr.packed if csr.packed is not None \
            else jnp.zeros((0, 2), jnp.int32)
        arrays = (csr.row_start, csr.col, csr.rel, csr.edge_deg,
                  csr.deg_total, csr.deg_rel_flat, packed)

        def rebuild(a):
            return csr._replace(row_start=a[0], col=a[1], rel=a[2],
                                edge_deg=a[3], deg_total=a[4],
                                deg_rel_flat=a[5], packed=a[6])
    else:
        arrays = (csr.row_start, csr.row_count, csr.col)

        def rebuild(a):
            return csr._replace(row_start=a[0], row_count=a[1], col=a[2])
    return arrays, rebuild


def build_sampled_train_step(
    csr,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    *,
    fanouts: Sequence[int] = (15, 10),
    mode: str = "uniform",
    layout: str = "auto",
    sparse_emb: bool = False,
    table_opt: str = "sgd",
    cache_layer1: bool = False,
    cache_init=None,
):
    """Returns jitted ``step(state, pos_edges [B, 3], key)``.

    ``csr`` may be a CsrCache (per-relation layout), a CombinedCsr, or a
    RelGraph (layout resolved per :func:`resolve_sampler`).

    ``sparse_emb=True`` differentiates with respect to the GATHERED
    frontier rows instead of the full embedding table, so the table's
    gradient/update never materializes as a dense [N, D] array — at 10M
    nodes that is 2.56 GB of gradient buffer plus a full-table update
    stream removed from every step. The table update is plain
    SGD(train_cfg.lr) applied as a unique-row scatter-add; ``optimizer``
    applies to the remaining (dense) params only, so it must be a rule
    whose table update would also be ``-lr * g`` and must not couple
    leaves across the split (use plain ``optax.sgd``; global-norm clipping
    or adam would change semantics vs the dense step).

    ``table_opt="adafactor"`` (sparse_emb only) gives the TABLE an
    adaptive optimizer on ONE chip: dense adam needs 3 table-sized
    states (m, v, update — 7.7 GB at 10M nodes, and this backend
    declines donation so input+output coexist), which is why the
    single-chip sampled config runs SGD. Adafactor's FACTORED second
    moment is [N] + [D] (~40 MB at 10M x 64) — the TPU-idiomatic
    memory-efficient adaptive rule for huge embedding tables. Its
    relative-step updates also fix plain SGD's scale problem at 10M
    nodes (Xavier-over-N init makes DistMult gradients ~1e-7; adaptive
    normalization restores useful step sizes). State rides in
    ``TrainState.opt_state`` as ``(rest_state, table_state)``; use the
    returned step's ``init_state(params)``.
    """
    from primekg_rgcn_tpu.data.sampling import (
        sample_batch_combined, table_gather_sorted)

    if cache_layer1 and layout == "auto":
        # The hop's frontier global ids address the history table: the
        # cached step needs the combined layout even on relation-dense
        # graphs where the auto heuristic would pick per-relation.
        layout = "combined"
    csr, fanouts, use_combined = resolve_sampler(csr, fanouts, layout, mode)

    csr_arrays, _rebuild = _csr_operands(csr, use_combined)

    # Historical-embedding mode (encoder_apply_cached): ONE sampled hop
    # serves both convolutions; conv2 reads layer-1 histories from an
    # [N, hidden] cache that rides in opt_state as (base_opt_state, cache).
    # Single-chip sparse-embedding path only: the sharded layouts keep
    # frontier-sized collectives and would need a sharded history table.
    if cache_layer1:
        if not sparse_emb:
            raise ValueError("cache_layer1 requires sparse_emb (the "
                             "single-chip memory mode)")
        if not use_combined:
            raise ValueError(
                "cache_layer1 needs the combined pick layout (the hop's "
                "frontier global ids address the history table); pass "
                "layout='combined'")
        cache_fanouts = fanouts[:1]
    else:
        cache_fanouts = None

    def loss_fn(params, pos, key, csr):
        k_neg, k_sample, k_drop = jax.random.split(key, 3)
        heads, tails, rels, labels, weights = candidate_batch(
            k_neg, pos[:, 0], pos[:, 1], pos[:, 2], model_cfg.num_nodes,
            train_cfg.num_neg_samples)

        # One shared sampled block for every endpoint in the batch.
        seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
        if use_combined:
            batch = sample_batch_combined(k_sample, csr, seeds, fanouts,
                                          mode=mode, allow_ident=True)
        else:
            batch = sample_batch(k_sample, csr, seeds, fanouts, mode=mode)
        emb = encoder_apply_sampled(params, batch, model_cfg, train=True,
                                    dropout_rng=k_drop)
        m = heads.shape[0]
        head_emb, tail_emb = emb[:m], emb[m:]
        rel_emb = jnp.take(params["decoder"]["rel_emb"], rels, axis=0)
        scores = distmult_score(head_emb, tail_emb, rel_emb)
        loss_sum, correct, count = bce_stats(scores, labels, weights)
        return loss_sum / count, correct / count

    # Donating the state halves resident memory (params + adam moments are
    # 7.7 GB at 10M nodes; without aliasing, input and output state coexist
    # and the 10M config cannot fit). Harmless no-op if the backend
    # declines donation.
    @partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, pos_edges, key, csr_arrays):
        (loss, acc), grads = jax.value_and_grad(
            lambda p, e, k: loss_fn(p, e, k, _rebuild(csr_arrays)),
            has_aux=True)(state.params, pos_edges, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), (loss, acc)

    n = model_cfg.num_nodes

    if table_opt == "adafactor":
        if not sparse_emb:
            raise ValueError("table_opt='adafactor' requires sparse_emb")
        # Explicit lr, no parameter-scale multiplier: Xavier-over-N init
        # puts table rows at ~1/sqrt(N) RMS (4e-4 at 10M nodes), so the
        # relative-step default would shrink updates right back to the
        # SGD scale the adaptive rule exists to escape. The rule (see
        # factored_rows_update / factored_slice_update) is exactly
        # optax.adafactor(lr, min_dim_size_to_factor=2,
        # multiply_by_parameter_scale=False) on the dense gradient, but
        # applied from the sparse row gradient at any frontier coverage.
        table_factored = True
    elif table_opt == "sgd":
        table_factored = False
    else:
        raise ValueError(f"unknown table_opt {table_opt!r}")

    def init_state(params) -> TrainState:
        if table_factored:
            emb, rest = _split_emb(params)
            opt_state = (optimizer.init(rest),
                         factored_slice_init(int(emb.shape[0]),
                                             int(emb.shape[1])))
        else:
            opt_state = optimizer.init(params)
        if cache_layer1:
            cdt = (jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
            if cache_init is not None:
                h_cache = jnp.asarray(cache_init, dtype=cdt)
                if h_cache.shape != (n, model_cfg.hidden_dim):
                    raise ValueError(
                        f"cache_init shape {h_cache.shape} != "
                        f"{(n, model_cfg.hidden_dim)}")
            else:
                # Cold start: zero histories warm up as nodes appear as
                # seeds (~one full refresh per N/|seeds| steps). Warm
                # initialization (one full-batch conv1) is the trainer's
                # job where the graph fits (SampledTrainer).
                h_cache = jnp.zeros((n, model_cfg.hidden_dim), cdt)
            opt_state = (opt_state, h_cache)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    @partial(jax.jit, donate_argnums=(0,))
    def _step_sparse(state: TrainState, pos_edges, key, csr_arrays):
        csr_l = _rebuild(csr_arrays)
        # Same RNG-stream structure as loss_fn, so dense and sparse steps
        # draw identical candidates / picks / dropout masks.
        k_neg, k_sample, k_drop = jax.random.split(key, 3)
        heads, tails, rels, labels, weights = candidate_batch(
            k_neg, pos_edges[:, 0], pos_edges[:, 1], pos_edges[:, 2],
            model_cfg.num_nodes, train_cfg.num_neg_samples)
        seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
        if cache_layer1:
            base_opt_state, h_cache = state.opt_state
            # ONE hop, dedup frontier (its global ids address the history
            # table; ident mode has no frontier at all).
            batch = sample_batch_combined(k_sample, csr_l, seeds,
                                          cache_fanouts, mode=mode,
                                          allow_ident=False)
        elif use_combined:
            base_opt_state, h_cache = state.opt_state, None
            batch = sample_batch_combined(k_sample, csr_l, seeds, fanouts,
                                          mode=mode, allow_ident=True)
        else:
            base_opt_state, h_cache = state.opt_state, None
            batch = sample_batch(k_sample, csr_l, seeds, fanouts,
                                 mode=mode)
        emb_table, rest = _split_emb(state.params)
        ident0 = bool(getattr(batch.blocks[0], "ident", False))
        if ident0:
            # Near-saturated frontier: differentiate w.r.t. the TABLE
            # itself (the identity block gathers from it directly); the
            # update is the dense SGD triad — at ~98% node coverage a
            # "sparse" row scatter would touch the same rows anyway.
            rows = emb_table
        else:
            sentinel = (batch.frontier == n)[:, None]
            rows = table_gather_sorted(emb_table,
                                       jnp.minimum(batch.frontier, n - 1))
            rows = jnp.where(sentinel, jnp.zeros((), rows.dtype), rows)

        def loss_from_rows(rows_v, rest_v):
            if cache_layer1:
                from primekg_rgcn_tpu.models.rgcn import encoder_apply_cached

                emb, new_cache = encoder_apply_cached(
                    _merge_emb(rest_v, None), batch, h_cache, model_cfg,
                    train=True, dropout_rng=k_drop, x0=rows_v)
            else:
                emb = encoder_apply_sampled(
                    _merge_emb(rest_v, None), batch, model_cfg, train=True,
                    dropout_rng=k_drop, x0=rows_v)
                new_cache = None
            m = heads.shape[0]
            head_emb, tail_emb = emb[:m], emb[m:]
            rel_emb = jnp.take(rest_v["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(head_emb, tail_emb, rel_emb)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum / count, (correct / count, new_cache)

        (loss, (acc, new_cache)), (g_rows, g_rest) = jax.value_and_grad(
            loss_from_rows, argnums=(0, 1), has_aux=True)(rows, rest)
        rest_state = base_opt_state[0] if table_factored \
            else base_opt_state
        updates, rest_state = optimizer.update(g_rest, rest_state, rest)
        rest = optax.apply_updates(rest, updates)
        if table_factored:
            if ident0:
                # Saturated frontier: g_rows IS the dense [N, D] gradient.
                tupd, table_state = factored_slice_update(
                    g_rows, base_opt_state[1], axis_name=None,
                    row_valid=jnp.ones((n,), jnp.float32), n_valid=n,
                    lr=train_cfg.lr)
                emb_table = emb_table + tupd.astype(emb_table.dtype)
            else:
                # Sparse row gradient: exact factored update at any
                # frontier coverage (see factored_rows_update).
                emb_table, table_state = factored_rows_update(
                    g_rows, batch.frontier, emb_table,
                    base_opt_state[1], lr=train_cfg.lr)
            opt_state = (rest_state, table_state)
        elif ident0:
            emb_table = emb_table - (train_cfg.lr * g_rows).astype(
                emb_table.dtype)
            opt_state = rest_state
        else:
            # Frontier ids are sorted-UNIQUE (fill value n), so the
            # scatter-add applies each row's gradient exactly once and
            # fill slots fall out of bounds and are dropped.
            emb_table = emb_table.at[batch.frontier].add(
                (-train_cfg.lr * g_rows).astype(emb_table.dtype),
                mode="drop")
            opt_state = rest_state
        if cache_layer1:
            opt_state = (opt_state, new_cache)
        params = _merge_emb(rest, emb_table)
        return TrainState(params, opt_state, state.step + 1), (loss, acc)

    inner = _step_sparse if sparse_emb else _step

    def step(state: TrainState, pos_edges, key):
        return inner(state, pos_edges, key, csr_arrays)

    # K steps per dispatch: on the hosted TPU frontend each jit call costs
    # ~15-30 ms of dispatch + fetch latency (docs/KERNELS.md "hosted-backend
    # pathologies"), which at reference scale is ~30% of the 84 ms step.
    # lax.scan over K batches amortizes that to one dispatch per chunk.
    # RNG parity: chunk_keys() reproduces the trainer's exact per-step
    # ``key, k = split(key)`` chain, so chunked and per-step runs are
    # bit-identical (tested).
    @partial(jax.jit, donate_argnums=(0,))
    def _chunk(state: TrainState, pos_chunks, keys, csr_arrays):
        def body(s, bk):
            s2, stats = inner(s, bk[0], bk[1], csr_arrays)
            return s2, stats

        return jax.lax.scan(body, state, (pos_chunks, keys))

    @partial(jax.jit, static_argnums=(1,))
    def chunk_keys(key, k_steps: int):
        def body(k, _):
            k2, sub = jax.random.split(k)
            return k2, sub

        return jax.lax.scan(body, key, None, length=k_steps)

    def chunk(state: TrainState, pos_chunks, keys):
        """Run ``pos_chunks.shape[0]`` steps in one dispatch.

        pos_chunks: int32[K, B, 3]; keys: uint32[K, 2] from chunk_keys.
        Returns (state, (losses [K], accs [K])).
        """
        return _chunk(state, pos_chunks, keys, csr_arrays)

    step.init_state = init_state
    step.chunk = chunk
    step.chunk_keys = chunk_keys
    return step


def build_sampled_eval_epoch(csr, val_edges, model_cfg: ModelConfig,
                             train_cfg: TrainConfig, *,
                             fanouts: Sequence[int] = (15, 10),
                             mode: str = "uniform", layout: str = "auto"):
    """Sampled-encoder validation: O(frontier) per batch, no full encode.

    The standard val path (train/loop.build_eval_epoch) encodes the whole
    graph once per epoch — impossible exactly where sampling matters (the
    10M-node configs whose [E, D] message stream exceeds HBM). This one
    scores each val batch against its sampled neighborhood encode
    (deterministic: no dropout; the sampling noise is pinned by the epoch
    key). Messages ride the TRAINING graph's CSR — the reference's
    full-graph-messages validation quirk requires a full-batch encode the
    target scale forbids.

    Returns ``eval_fn(params, key) -> (val_loss, val_acc)``, the same
    contract as build_eval_epoch. Padding batches are mask-weighted, so
    totals are exact over the val set.
    """
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    csr, fanouts, use_combined = resolve_sampler(csr, fanouts, layout, mode)
    csr_arrays, _rebuild = _csr_operands(csr, use_combined)
    edges = np.asarray(val_edges, dtype=np.int32)
    num_edges = int(edges.shape[0])
    b = train_cfg.batch_size
    n_steps = max(-(-num_edges // b), 1)
    # Val arrays enter jit as ARGUMENTS like the CSR tables (captured
    # constants are rematerialized host-side every call on the hosted
    # backend — see _csr_operands).
    edges_pad = jnp.asarray(
        np.concatenate([edges, np.zeros((1, 3), np.int32)], axis=0))
    idx = np.concatenate([
        np.arange(num_edges, dtype=np.int32),
        np.full(n_steps * b - num_edges, num_edges, dtype=np.int32),
    ]).reshape(n_steps, b)
    idx = jnp.asarray(idx)

    @jax.jit
    def _eval(params, key, csr_arrs, edges_pad, idx):
        csr_l = _rebuild(csr_arrs)

        def scan_step(stats, inp):
            batch_idx, k = inp
            mask = batch_idx < num_edges
            batch = jnp.take(edges_pad, batch_idx, axis=0)
            k_neg, k_sample = jax.random.split(k)
            heads, tails, rels, labels, weights = candidate_batch(
                k_neg, batch[:, 0], batch[:, 1], batch[:, 2],
                model_cfg.num_nodes, train_cfg.num_neg_samples, mask=mask)
            seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
            if use_combined:
                sb = sample_batch_combined(k_sample, csr_l, seeds, fanouts,
                                           mode=mode, allow_ident=True)
            else:
                sb = sample_batch(k_sample, csr_l, seeds, fanouts,
                                  mode=mode)
            emb = encoder_apply_sampled(params, sb, model_cfg, train=False)
            m = heads.shape[0]
            rel_emb = jnp.take(params["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(emb[:m], emb[m:], rel_emb)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return (stats[0] + loss_sum, stats[1] + correct,
                    stats[2] + count), None

        keys = jax.random.split(key, n_steps)
        stats0 = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        (loss_sum, correct, count), _ = jax.lax.scan(
            scan_step, stats0, (idx, keys))
        denom = jnp.maximum(count, 1.0)
        return loss_sum / denom, correct / denom

    def eval_fn(params, key):
        return _eval(params, key, csr_arrays, edges_pad, idx)

    return eval_fn


def build_sampled_train_step_dp(
    csr,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    *,
    fanouts: Sequence[int] = (15, 10),
    mode: str = "uniform",
    layout: str = "auto",
    axis_name: str = "data",
):
    """Data-parallel sampled step over a device mesh.

    Sampling cost is per-seed independent, so the batch splits cleanly:
    each device samples the L-hop frontiers of ITS B/n seeds, encodes them,
    and scores its candidate slice; ONE psum combines the loss-sum
    gradients (exact global masked-mean, same plumbing as
    parallel/edge_shard.py). The frontier — the memory- and time-dominant
    object in sampled mode — shrinks n-fold per device, which is the
    scaling the single-chip path cannot offer (greenfield; the reference
    has neither sampling nor any parallelism, SURVEY.md §2.4).

    CSR tables are replicated operands (graph structure, read-only);
    params/optimizer state are replicated with psummed gradients.
    Returns jitted ``step(state, pos_edges [B, 3], key)``; B must divide by
    the mesh size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    csr, fanouts, use_combined = resolve_sampler(csr, fanouts, layout, mode)
    csr_arrays, _rebuild = _csr_operands(csr, use_combined)

    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(axis_name), P()),
             out_specs=(P(), P(), (P(), P())),
             check_vma=True)
    def _step(params, opt_state, csr_arrs, batch_shard, key):
        pos = batch_shard[0]  # [B/n, 3] this device's seed slice
        vary = lambda a: jax.lax.pcast(a, axis_name, to="varying")
        csr_local = _rebuild(jax.tree_util.tree_map(vary, csr_arrs))
        dev_key = jax.random.fold_in(vary(key),
                                     jax.lax.axis_index(axis_name))
        # Differentiate w.r.t. the varying params and combine grads with ONE
        # flat psum below (one latency-bound collective instead of one per
        # parameter leaf via the pcast transpose).
        pv = jax.tree_util.tree_map(vary, params)

        def loss_sums(p):
            k_neg, k_sample, k_drop = jax.random.split(dev_key, 3)
            heads, tails, rels, labels, weights = candidate_batch(
                k_neg, pos[:, 0], pos[:, 1], pos[:, 2],
                model_cfg.num_nodes, train_cfg.num_neg_samples)
            seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
            if use_combined:
                batch = sample_batch_combined(k_sample, csr_local, seeds,
                                              fanouts, mode=mode)
            else:
                batch = sample_batch(k_sample, csr_local, seeds, fanouts,
                                     mode=mode)
            emb = encoder_apply_sampled(p, batch, model_cfg, train=True,
                                        dropout_rng=k_drop)
            m = heads.shape[0]
            rel_emb = jnp.take(p["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(emb[:m], emb[m:], rel_emb)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum, (correct, count)

        (loss_sum, (correct, count)), grads = jax.value_and_grad(
            loss_sums, has_aux=True)(pv)
        from jax.flatten_util import ravel_pytree

        trio = jax.lax.psum(jnp.stack([loss_sum, correct, count]),
                            axis_name)
        total_count = jnp.maximum(trio[2], 1.0)
        flat, unravel = ravel_pytree(grads)
        grads = jax.tree_util.tree_map(
            lambda g: g / total_count,
            unravel(jax.lax.psum(flat, axis_name)))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss = trio[0] / total_count
        acc = trio[1] / total_count
        return params, opt_state, (loss, acc)

    @partial(jax.jit, donate_argnums=(0,))
    def _jit_step(state: TrainState, batch_dm, key, csr_arrs):
        params, opt_state, (loss, acc) = _step(
            state.params, state.opt_state, csr_arrs, batch_dm, key)
        return TrainState(params, opt_state, state.step + 1), (loss, acc)

    def step(state: TrainState, pos_edges, key):
        b = pos_edges.shape[0]
        if b % n_dev:
            raise ValueError(
                f"batch size {b} must divide by the {n_dev}-device mesh")
        batch_dm = pos_edges.reshape(n_dev, b // n_dev, 3)
        return _jit_step(state, batch_dm, key, csr_arrays)

    return step


def _split_emb(tree):
    """(node_emb leaf, tree with that leaf removed)."""
    emb = tree["encoder"]["node_emb"]
    rest = dict(tree)
    rest["encoder"] = dict(tree["encoder"])
    rest["encoder"]["node_emb"] = None
    return emb, rest


def _merge_emb(rest, emb):
    out = dict(rest)
    out["encoder"] = dict(rest["encoder"])
    out["encoder"]["node_emb"] = emb
    return out


def build_sampled_train_step_zero1(
    csr,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh,
    *,
    fanouts: Sequence[int] = (15, 10),
    mode: str = "uniform",
    layout: str = "auto",
    axis_name: str = "data",
):
    """Data-parallel sampled step with ZeRO-1 sharding of the embedding
    optimizer state.

    The node embedding table is ~97% of the parameters, and dense Adam
    triples its footprint — the measured single-chip blocker at BASELINE
    config 5 scale (10M x 64 f32: params 2.56 GB, moments +5.1 GB; with the
    hosted backend declining donation the in/out copies exceed one chip,
    docs/KERNELS.md). Classic TPU answer: keep params replicated, shard the
    OPTIMIZER STATE row-wise over the mesh. Each device updates only its
    1/n row slice of the table (gradients arrive globally psummed via the
    pcast transpose, so the slice update is exact) and one
    ``all_gather`` rebuilds the replicated table. Per-device moment memory
    drops n-fold; ICI cost is one [N/n, D] all-gather per step.

    Gradient clipping uses the FULL pytree's global norm before the split
    (exactly optax's clip_by_global_norm semantics), then the clip-free
    chain (train/loop.py make_optimizer(include_clip=False)) runs per
    shard. Bitwise-equivalent to the unsharded DP step up to reduction
    order.

    Returns ``(init_state, step)``; ``init_state(params) -> TrainState``
    whose opt_state is ``(rest_state, emb_state_sharded)`` with the
    embedding Adam moments stored device-major [n, n_loc, D].
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primekg_rgcn_tpu.data.sampling import sample_batch_combined
    from primekg_rgcn_tpu.train.loop import make_optimizer

    csr, fanouts, use_combined = resolve_sampler(csr, fanouts, layout, mode)
    csr_arrays, _rebuild = _csr_operands(csr, use_combined)

    inner = make_optimizer(train_cfg, include_clip=False)
    n_dev = mesh.devices.size
    n_nodes = model_cfg.num_nodes
    n_loc = -(-n_nodes // n_dev)
    pad_rows = n_dev * n_loc - n_nodes

    def init_state(params) -> TrainState:
        emb, rest = _split_emb(params)
        rest_state = inner.init(rest)
        # Per-slice moment init, stacked device-major and placed sharded.
        slice_zero = jnp.zeros((n_loc, emb.shape[1]), emb.dtype)
        one = inner.init(slice_zero)
        emb_state = jax.tree_util.tree_map(
            lambda a: (jnp.broadcast_to(a, (n_dev,) + a.shape)
                       if getattr(a, "ndim", None) is not None and a.ndim
                       else jnp.broadcast_to(jnp.asarray(a),
                                             (n_dev,))),
            one)
        sharded = NamedSharding(mesh, P(axis_name))
        emb_state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharded), emb_state)
        return TrainState(params, (rest_state, emb_state),
                          jnp.zeros((), jnp.int32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis_name), P(), P(axis_name), P()),
             out_specs=(P(), P(), P(axis_name), (P(), P())),
             check_vma=True)
    def _step(params, rest_state, emb_state, csr_arrs, batch_shard, key):
        pos = batch_shard[0]
        vary = lambda a: jax.lax.pcast(a, axis_name, to="varying")
        csr_local = _rebuild(jax.tree_util.tree_map(vary, csr_arrs))
        my = jax.lax.axis_index(axis_name)
        dev_key = jax.random.fold_in(vary(key), my)
        emb_state_loc = jax.tree_util.tree_map(lambda a: a[0], emb_state)
        pv = jax.tree_util.tree_map(vary, params)

        def loss_sums(p):
            k_neg, k_sample, k_drop = jax.random.split(dev_key, 3)
            heads, tails, rels, labels, weights = candidate_batch(
                k_neg, pos[:, 0], pos[:, 1], pos[:, 2],
                model_cfg.num_nodes, train_cfg.num_neg_samples)
            seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
            if use_combined:
                batch = sample_batch_combined(k_sample, csr_local, seeds,
                                              fanouts, mode=mode)
            else:
                batch = sample_batch(k_sample, csr_local, seeds, fanouts,
                                     mode=mode)
            emb = encoder_apply_sampled(p, batch, model_cfg, train=True,
                                        dropout_rng=k_drop)
            m = heads.shape[0]
            rel_emb = jnp.take(p["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(emb[:m], emb[m:], rel_emb)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum, (correct, count)

        (loss_sum, (correct, count)), grads = jax.value_and_grad(
            loss_sums, has_aux=True)(pv)
        from jax.flatten_util import ravel_pytree

        trio = jax.lax.psum(jnp.stack([loss_sum, correct, count]),
                            axis_name)
        total_count = trio[2]
        flat, unravel = ravel_pytree(grads)
        grads = jax.tree_util.tree_map(
            lambda g: g / jnp.maximum(total_count, 1.0),
            unravel(jax.lax.psum(flat, axis_name)))

        if train_cfg.grad_clip and train_cfg.grad_clip > 0:
            # Global norm over the FULL pytree, exactly as
            # optax.clip_by_global_norm would see it.
            gnorm = optax.global_norm(grads)
            scale = train_cfg.grad_clip / jnp.maximum(gnorm,
                                                      train_cfg.grad_clip)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        g_emb, g_rest = _split_emb(grads)
        p_emb, p_rest = _split_emb(params)

        # --- embedding: update only this device's row slice (ZeRO-1).
        if pad_rows:
            g_emb = jnp.concatenate(
                [g_emb, jnp.zeros((pad_rows, g_emb.shape[1]),
                                  g_emb.dtype)], axis=0)
            p_emb_pad = jnp.concatenate(
                [p_emb, jnp.zeros((pad_rows, p_emb.shape[1]),
                                  p_emb.dtype)], axis=0)
        else:
            p_emb_pad = p_emb
        g_slice = jax.lax.dynamic_slice_in_dim(vary(g_emb), my * n_loc,
                                               n_loc, axis=0)
        p_slice = jax.lax.dynamic_slice_in_dim(vary(p_emb_pad), my * n_loc,
                                               n_loc, axis=0)
        upd_slice, emb_state_loc = inner.update(g_slice, emb_state_loc,
                                                p_slice)
        new_slice = optax.apply_updates(p_slice, upd_slice)
        # Varying -> Invariant gather: every device contributed its slice,
        # the concatenation is identical everywhere, and the vma checker
        # needs that stated (plain all_gather types its output varying).
        from jax._src.lax.parallel import all_gather_invariant

        new_emb = all_gather_invariant(new_slice, axis_name,
                                       tiled=True)[:n_nodes]

        # --- everything else: replicated update (tiny).
        upd_rest, rest_state = inner.update(g_rest, rest_state, p_rest)
        p_rest = optax.apply_updates(p_rest, upd_rest)
        params = _merge_emb(p_rest, new_emb)

        loss = trio[0] / jnp.maximum(total_count, 1.0)
        acc = trio[1] / jnp.maximum(total_count, 1.0)
        emb_state_out = jax.tree_util.tree_map(lambda a: a[None],
                                               emb_state_loc)
        return params, rest_state, emb_state_out, (loss, acc)

    @partial(jax.jit, donate_argnums=(0,))
    def _jit_step(state: TrainState, batch_dm, key, csr_arrs):
        rest_state, emb_state = state.opt_state
        params, rest_state, emb_state, (loss, acc) = _step(
            state.params, rest_state, emb_state, csr_arrs, batch_dm, key)
        return (TrainState(params, (rest_state, emb_state), state.step + 1),
                (loss, acc))

    def step(state: TrainState, pos_edges, key):
        b = pos_edges.shape[0]
        if b % n_dev:
            raise ValueError(
                f"batch size {b} must divide by the {n_dev}-device mesh")
        batch_dm = pos_edges.reshape(n_dev, b // n_dev, 3)
        return _jit_step(state, batch_dm, key, csr_arrays)

    return init_state, step


def _make_sharded_row_fetch(axis_name: str, n_dev: int):
    """Sharded-table row fetch with a TPU-friendly hand-written backward.

    Forward: owner-masked local gather + one ``psum_scatter`` routes each
    requester its rows. Plain AD would transpose this correctly but lower
    the owner-side accumulation as an UNSORTED scatter-add of n*cap rows
    (~50 ns/update on TPU — ~0.8 s/step at config-5 frontier caps). Each
    requester's id chunk is sorted (frontiers are sorted-unique), so the
    backward instead runs n_dev SORTED segment-sums into the slice — the
    same sortedness trick as the single-chip transpose-graph kernels.
    """

    @jax.custom_vjp
    def fetch(emb_loc, owned, loc_ids):
        contrib = jnp.where(owned[:, None],
                            jnp.take(emb_loc, loc_ids, axis=0),
                            jnp.zeros((), emb_loc.dtype))
        return jax.lax.psum_scatter(contrib, axis_name,
                                    scatter_dimension=0, tiled=True)

    def _fwd(emb_loc, owned, loc_ids):
        return fetch(emb_loc, owned, loc_ids), (owned, loc_ids,
                                                emb_loc.shape)

    def _bwd(res, g_rows):
        from primekg_rgcn_tpu.data.sampling import _sorted_accumulate

        owned, loc_ids, shape = res
        # psum_scatter^T = tiled all_gather: every requester's row
        # cotangents, stacked in the same order as the forward's requests.
        g_all = jax.lax.all_gather(g_rows, axis_name, tiled=True)
        g_all = jnp.where(owned[:, None], g_all,
                          jnp.zeros((), g_all.dtype))
        cap = g_all.shape[0] // n_dev
        dt = jnp.zeros(shape, g_all.dtype)
        for d in range(n_dev):
            # _sorted_accumulate routes big slices through the dense
            # Pallas kernel (XLA scatter costs ~200 ns/row at HBM-scale
            # targets); small/test slices keep the XLA segment-sum.
            dt = dt + _sorted_accumulate(
                g_all[d * cap:(d + 1) * cap],
                loc_ids[d * cap:(d + 1) * cap],
                shape[0]).astype(g_all.dtype)
        return (dt, np.zeros(owned.shape, jax.dtypes.float0),
                np.zeros(loc_ids.shape, jax.dtypes.float0))

    fetch.defvjp(_fwd, _bwd)
    return fetch


def factored_slice_init(n_loc: int, d: int):
    """Per-slice state for :func:`factored_slice_update` (zeros, step 0)."""
    return {"v_row": jnp.zeros((d,), jnp.float32),
            "v_col": jnp.zeros((n_loc,), jnp.float32),
            "count": jnp.zeros((), jnp.int32)}


def factored_slice_update(g, state, *, axis_name, row_valid, n_valid, lr,
                          decay_rate=0.8, eps=1e-30, clip_threshold=1.0):
    """Adafactor update of one row-slice of a sharded [N, D] table.

    Mesh-size-INVARIANT: the two statistics that couple rows across slices
    — the [D] column second moment (optax calls it ``v_row``: the mean of
    ``g**2 + eps`` over all N rows) and the block-RMS update clip — are
    computed with one [D] psum and one scalar psum over ``axis_name``, so
    applying this to every slice of a row-sharded table equals
    ``optax.adafactor(learning_rate=lr, min_dim_size_to_factor=2,
    multiply_by_parameter_scale=False)`` on the UNPADDED dense [N, D]
    table (up to float reduction order), for any slicing. That keeps the
    zero3 layouts' "flat (n,) == hierarchical (dp, tp)" bit-compatibility
    and makes --table_opt adafactor mean the same rule on one chip
    (train/sampled.py single-chip path) and on a pod.

    Per-slice state (see :func:`factored_slice_init`): ``v_row`` [D]
    (identical on every slice), ``v_col`` [n_loc] (this slice's per-row
    stat), ``count`` scalar. Memory O(N/n + D) vs adam's 2 table-sized
    moments — the reason adafactor exists (Shazeer & Stern 2018).

    ``row_valid`` float32[n_loc] masks the padded tail rows of the last
    slice out of every cross-row statistic and out of the update;
    ``n_valid`` is the TRUE row count N (not n_tp * n_loc).

    ``axis_name=None`` is the single-device (unsharded) form: the slice is
    the whole table and the psums degenerate to local sums — used by the
    sparse single-chip path's saturated-frontier (identity) batches so one
    rule/state serves every layout.
    """
    psum = (lambda x: x) if axis_name is None else (
        lambda x: jax.lax.psum(x, axis_name))
    g = g.astype(jnp.float32)
    # optax._src.factorized._decay_rate_pow(count): t = count + 1.
    t = (state["count"] + 1).astype(jnp.float32)
    decay = 1.0 - t ** (-decay_rate)
    gsq = jnp.square(g) + eps                            # [n_loc, D]
    col_stat_sum = psum(jnp.sum(gsq * row_valid[:, None], axis=0))
    new_v_row = decay * state["v_row"] + (1.0 - decay) * (
        col_stat_sum / n_valid)                          # [D], global
    new_v_col = decay * state["v_col"] + (1.0 - decay) * jnp.mean(
        gsq, axis=1)                                     # [n_loc], local
    row_col_mean = jnp.mean(new_v_row)                   # scalar over D
    row_factor = (new_v_row / row_col_mean) ** -0.5      # [D]
    col_factor = new_v_col ** -0.5                       # [n_loc]
    u = g * row_factor[None, :] * col_factor[:, None] * row_valid[:, None]
    # optax clip_by_block_rms over the whole (virtual) table.
    ms = psum(jnp.sum(jnp.square(u))) / (n_valid * g.shape[1])
    u = u / jnp.maximum(1.0, jnp.sqrt(ms) / clip_threshold)
    new_state = {"v_row": new_v_row, "v_col": new_v_col,
                 "count": state["count"] + 1}
    return -lr * u, new_state


def factored_rows_update(g_rows, frontier, table, state, *, lr,
                         decay_rate=0.8, eps=1e-30, clip_threshold=1.0):
    """Adafactor update of a table from a SPARSE row gradient — exact.

    The factored second-moment statistics are fully recoverable from the
    touched rows alone, because every untouched row's squared gradient is
    exactly ``eps``:

    - the [D] column stat's dense update ``mean_N(g^2 + eps)`` equals
      ``(sum_touched(g^2) + N * eps) / N``;
    - the [N] row stat's dense update is the affine map
      ``v_col <- decay * v_col + (1 - decay) * eps`` everywhere, plus a
      ``(1 - decay) * mean_D(g^2)`` scatter-add at the touched rows;
    - the update itself and its block-RMS are zero outside touched rows.

    So the rule == ``optax.adafactor(lr, min_dim_size_to_factor=2,
    multiply_by_parameter_scale=False)`` on the dense [N, D] gradient
    (tested exactly), at O(cap * D + N) cost per step with no dense
    gradient, update, or [N, D] stat anywhere — this is what lets
    --table_opt adafactor run at ANY batch/fanout coverage instead of
    only near-saturated (identity-mode) frontiers.

    Args:
        g_rows: [cap, D] gradient w.r.t. the gathered frontier rows.
        frontier: int32[cap] sorted-UNIQUE row ids, fill value == N
            (sentinel rows' gradients are dropped, as in the SGD path).
        table: [N, D] the embedding table.
        state: see :func:`factored_slice_init` (v_col sized [N]).

    Returns ``(new_table, new_state)``.
    """
    n, d = table.shape
    g = g_rows.astype(jnp.float32)
    valid = (frontier < n)[:, None]
    g = jnp.where(valid, g, 0.0)
    t = (state["count"] + 1).astype(jnp.float32)
    decay = 1.0 - t ** (-decay_rate)
    gsq = jnp.square(g)                                  # [cap, D]
    new_v_row = decay * state["v_row"] + (1.0 - decay) * (
        (jnp.sum(gsq, axis=0) + n * eps) / n)            # [D]
    new_v_col = decay * state["v_col"] + (1.0 - decay) * eps  # [N] affine
    new_v_col = new_v_col.at[frontier].add(
        (1.0 - decay) * jnp.mean(gsq, axis=1), mode="drop")
    row_col_mean = jnp.mean(new_v_row)
    row_factor = (new_v_row / row_col_mean) ** -0.5      # [D]
    col_rows = jnp.take(new_v_col, jnp.minimum(frontier, n - 1)) ** -0.5
    u = g * row_factor[None, :] * col_rows[:, None]
    u = jnp.where(valid, u, 0.0)
    ms = jnp.sum(jnp.square(u)) / (n * d)
    u = u / jnp.maximum(1.0, jnp.sqrt(ms) / clip_threshold)
    new_table = table.at[frontier].add((-lr * u).astype(table.dtype),
                                       mode="drop")
    new_state = {"v_row": new_v_row, "v_col": new_v_col,
                 "count": state["count"] + 1}
    return new_table, new_state


def build_sampled_train_step_zero3(
    csr,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh,
    *,
    fanouts: Sequence[int] = (15, 10),
    mode: str = "uniform",
    layout: str = "auto",
    axis_name: str = "data",
    dp_axis: str = None,
    table_opt: str = "sgd",
):
    """Fully-sharded embedding table ("ZeRO-3" for the 97%-of-params leaf).

    zero1 shards only the adam moments: the table stays replicated, a
    dense [N, D] gradient is all-reduced, and the updated table is
    re-gathered every step — three table-sized objects (~2.5 GB each at
    BASELINE config-5 scale) per device per step. Here the TABLE itself is
    sharded row-wise over the mesh and every table-shaped object stays
    local:

    - fetch: devices all-gather the mesh's frontier ids (ints, tiny), each
      serves the requested rows it owns from its slice, and one
      ``psum_scatter`` routes each requester its [cap, D] rows — ICI
      volume scales with the sampled frontier, not with N;
    - backward: JAX transposes the fetch automatically (all-gather of the
      row cotangents, owner-masked scatter-add), so each device receives
      exactly the global gradient of ITS rows and nothing else;
    - update: adam moments and the weight update are slice-local; there is
      no table-sized collective, gradient, or replica anywhere, so
      per-device memory is O(N/n + frontier) and graphs whose table alone
      exceeds one chip become trainable with dense adam.

    Semantics match zero1/DP exactly (same RNG streams, global-batch mean
    loss, full-pytree global-norm clip) up to float reduction order.

    Returns ``(init_state, step, to_full, to_sharded)``: params carry the
    node table as a device-major [n_tp, n_loc, D] leaf; ``to_full`` /
    ``to_sharded`` convert that leaf for eval/checkpoint interchange.

    ``dp_axis`` turns this hierarchical: on a 2-D mesh (``dp_axis``,
    ``axis_name``) the table shards over ``axis_name`` (lay it on ICI) and
    the batch additionally splits over ``dp_axis`` (DCN across pods). The
    heavy frontier-row fetch then stays pod-internal; the ONLY cross-pod
    traffic is the slice-gradient psum ([N/n_tp, D]) plus the tiny dense
    leaves — the scaling-book recipe of keeping fat collectives on ICI.
    Bit-compatible with the flat layout: an (n_dp, n_tp) mesh reproduces a
    flat n_dp*n_tp run up to reduction order.

    ``table_opt="adafactor"`` swaps the table slices' dense-adam update
    for :func:`factored_slice_update` — per-slice factored second moments
    ([N/n] + [D] state instead of two table-sized moments), with the
    cross-slice stats psum'd so the rule equals dense adafactor on the
    full table for ANY mesh shape. Cuts zero3's optimizer memory from
    2 x O(N/n * D) to O(N/n + D) and matches the single-chip
    ``--sparse_emb --table_opt adafactor`` rule exactly.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primekg_rgcn_tpu.data.sampling import sample_batch_combined
    from primekg_rgcn_tpu.train.loop import make_optimizer

    csr, fanouts, use_combined = resolve_sampler(csr, fanouts, layout, mode)
    csr_arrays, _rebuild = _csr_operands(csr, use_combined)

    inner = make_optimizer(train_cfg, include_clip=False)
    if table_opt not in ("sgd", "adafactor"):
        raise ValueError(f"unknown table_opt {table_opt!r}")
    table_factored = table_opt == "adafactor"
    if table_factored and train_cfg.grad_clip:
        # Same restriction as the single-chip --table_opt path: the
        # factored rule has its own block-RMS update clip; composing it
        # with a global-norm gradient clip would train a different rule
        # than the qualified single-chip one.
        raise ValueError(
            "--table_opt adafactor cannot honor global-norm grad_clip; "
            "disable --grad_clip")
    n_tp = int(mesh.shape[axis_name])
    n_dp = int(mesh.shape[dp_axis]) if dp_axis else 1
    n_dev = n_dp * n_tp
    axes = (dp_axis, axis_name) if dp_axis else (axis_name,)
    n_nodes = model_cfg.num_nodes
    n_loc = -(-n_nodes // n_tp)
    pad_rows = n_tp * n_loc - n_nodes
    _fetch = _make_sharded_row_fetch(axis_name, n_tp)

    def vary(a):
        for ax in axes:
            a = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, ax, to="varying"), a)
        return a

    def to_sharded(emb_full):
        if pad_rows:
            emb_full = jnp.concatenate(
                [emb_full, jnp.zeros((pad_rows, emb_full.shape[1]),
                                     emb_full.dtype)], axis=0)
        return emb_full.reshape(n_tp, n_loc, emb_full.shape[1])

    def to_full(emb_dm):
        return emb_dm.reshape(n_tp * n_loc, -1)[:n_nodes]

    def init_state(params) -> TrainState:
        emb, rest = _split_emb(params)
        rest_state = inner.init(rest)
        slice_zero = jnp.zeros((n_loc, emb.shape[1]), emb.dtype)
        one = (factored_slice_init(n_loc, int(emb.shape[1]))
               if table_factored else inner.init(slice_zero))
        emb_state = jax.tree_util.tree_map(
            lambda a: (jnp.broadcast_to(a, (n_tp,) + a.shape)
                       if getattr(a, "ndim", None) is not None and a.ndim
                       else jnp.broadcast_to(jnp.asarray(a), (n_tp,))),
            one)
        sharded = NamedSharding(mesh, P(axis_name))
        emb_state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharded), emb_state)
        params_s = _merge_emb(
            rest, jax.device_put(to_sharded(emb), sharded))
        return TrainState(params_s, (rest_state, emb_state),
                          jnp.zeros((), jnp.int32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(), P(), P(axis_name), P(),
                       P(axes), P()),
             out_specs=(P(axis_name), P(), P(), P(axis_name), (P(), P())),
             check_vma=True)
    def _step(emb_dm, rest, rest_state, emb_state, csr_arrs, batch_shard,
              key):
        pos = batch_shard[0]
        csr_local = _rebuild(jax.tree_util.tree_map(vary, csr_arrs))
        my = jax.lax.axis_index(axis_name)
        dev_idx = my if not dp_axis else (
            my + n_tp * jax.lax.axis_index(dp_axis))
        dev_key = jax.random.fold_in(vary(key), dev_idx)
        emb_loc = emb_dm[0]                          # [n_loc, D] varying
        emb_state_loc = jax.tree_util.tree_map(lambda a: a[0], emb_state)
        rest_v = jax.tree_util.tree_map(vary, rest)

        k_neg, k_sample, k_drop = jax.random.split(dev_key, 3)
        heads, tails, rels, labels, weights = candidate_batch(
            k_neg, pos[:, 0], pos[:, 1], pos[:, 2], model_cfg.num_nodes,
            train_cfg.num_neg_samples)
        seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
        if use_combined:
            batch = sample_batch_combined(k_sample, csr_local, seeds,
                                          fanouts, mode=mode)
        else:
            batch = sample_batch(k_sample, csr_local, seeds, fanouts,
                                 mode=mode)
        frontier = batch.frontier          # [cap] sorted unique, fill = N
        all_ids = jax.lax.all_gather(frontier, axis_name, tiled=True)
        off = my * n_loc
        # Sentinel ids (== n_nodes) and padded tail rows are owned by
        # nobody: their fetched rows psum to zero, their cotangents are
        # masked out, exactly matching the dense paths' sentinel zeroing.
        owned = (all_ids >= off) & (
            all_ids < jnp.minimum(off + n_loc, n_nodes))
        loc_ids = jnp.clip(all_ids - off, 0, n_loc - 1)

        def loss_sums(emb_loc_v, rest_p):
            rows = _fetch(emb_loc_v, owned, loc_ids)
            emb = encoder_apply_sampled(
                _merge_emb(rest_p, None), batch, model_cfg, train=True,
                dropout_rng=k_drop, x0=rows)
            m = heads.shape[0]
            rel_emb = jnp.take(rest_p["decoder"]["rel_emb"], rels, axis=0)
            scores = distmult_score(emb[:m], emb[m:], rel_emb)
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return loss_sum, (correct, count)

        # Differentiate w.r.t. a dp-VARYING view of the slice (like rest_v):
        # inside loss_sums everything then carries identical (dp, data)
        # varying-manual-axes, so every custom-VJP backward (dedup_gather,
        # the sharded row fetch) returns cotangents whose vma matches its
        # primal — required by strict vma checking. The pcast happens
        # OUTSIDE the grad, so g_emb stays the per-dp-replica partial
        # gradient and the explicit dp psum below remains the (single)
        # cross-pod reduction.
        emb_in = emb_loc if not dp_axis else jax.lax.pcast(
            emb_loc, dp_axis, to="varying")
        (loss_sum, (correct, count)), (g_emb, g_rest) = jax.value_and_grad(
            loss_sums, argnums=(0, 1), has_aux=True)(emb_in, rest_v)
        from jax.flatten_util import ravel_pytree

        trio = jax.lax.psum(jnp.stack([loss_sum, correct, count]), axes)
        total_count = jnp.maximum(trio[2], 1.0)
        # g_emb carries the POD-global gradient of this device's rows (the
        # fetch's transpose all-gathers the pod's row cotangents and
        # owner-masks them); hierarchical mode adds one cross-pod psum of
        # the [n_loc, D] slice — the only fat DCN collective. The small
        # dense leaves psum over everything.
        g_emb = g_emb / total_count
        if dp_axis:
            g_emb = jax.lax.psum(g_emb, dp_axis)
        flat, unravel = ravel_pytree(g_rest)
        g_rest = unravel(jax.lax.psum(flat, axes) / total_count)

        if train_cfg.grad_clip and train_cfg.grad_clip > 0:
            # Global norm over the full (virtual) pytree: slice sqnorms
            # psum to the dense-table sqnorm because the slices partition
            # the rows.
            sq_emb = jax.lax.psum(jnp.sum(jnp.square(g_emb)), axis_name)
            gnorm = jnp.sqrt(sq_emb + optax.global_norm(g_rest) ** 2)
            scale = train_cfg.grad_clip / jnp.maximum(gnorm,
                                                      train_cfg.grad_clip)
            g_emb = g_emb * scale
            g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)

        if table_factored:
            row_valid = ((off + jnp.arange(n_loc)) < n_nodes).astype(
                jnp.float32)
            upd_slice, emb_state_loc = factored_slice_update(
                g_emb, emb_state_loc, axis_name=axis_name,
                row_valid=row_valid, n_valid=n_nodes, lr=train_cfg.lr)
            upd_slice = upd_slice.astype(emb_loc.dtype)
        else:
            upd_slice, emb_state_loc = inner.update(g_emb, emb_state_loc,
                                                    emb_loc)
        new_loc = optax.apply_updates(emb_loc, upd_slice)

        upd_rest, rest_state = inner.update(g_rest, rest_state, rest)
        p_rest = optax.apply_updates(rest, upd_rest)

        loss = trio[0] / total_count
        acc = trio[1] / total_count
        emb_state_out = jax.tree_util.tree_map(lambda a: a[None],
                                               emb_state_loc)
        return (new_loc[None], p_rest, rest_state, emb_state_out,
                (loss, acc))

    @partial(jax.jit, donate_argnums=(0,))
    def _jit_step(state: TrainState, batch_dm, key, csr_arrs):
        emb_dm, rest = _split_emb(state.params)
        rest_state, emb_state = state.opt_state
        emb_dm, rest, rest_state, emb_state, (loss, acc) = _step(
            emb_dm, rest, rest_state, emb_state, csr_arrs, batch_dm, key)
        return (TrainState(_merge_emb(rest, emb_dm),
                           (rest_state, emb_state), state.step + 1),
                (loss, acc))

    def step(state: TrainState, pos_edges, key):
        b = pos_edges.shape[0]
        if b % n_dev:
            raise ValueError(
                f"batch size {b} must divide by the {n_dev}-device mesh")
        batch_dm = pos_edges.reshape(n_dev, b // n_dev, 3)
        return _jit_step(state, batch_dm, key, csr_arrays)

    # --- sampled validation twin: same sharded fetch, no grad/update; the
    # table never materializes, so zero3 runs CAN validate at scale.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(), P(), P(axes), P()),
             out_specs=P(), check_vma=True)
    def _eval_shard(emb_dm, rest, csr_arrs, batch_shard, key):
        bm = batch_shard[0]
        pos, mask = bm[:, :3], bm[:, 3] > 0
        csr_local = _rebuild(jax.tree_util.tree_map(vary, csr_arrs))
        my = jax.lax.axis_index(axis_name)
        dev_idx = my if not dp_axis else (
            my + n_tp * jax.lax.axis_index(dp_axis))
        dev_key = jax.random.fold_in(vary(key), dev_idx)
        emb_loc = emb_dm[0]

        k_neg, k_sample = jax.random.split(dev_key)
        heads, tails, rels, labels, weights = candidate_batch(
            k_neg, pos[:, 0], pos[:, 1], pos[:, 2], model_cfg.num_nodes,
            train_cfg.num_neg_samples, mask=mask)
        seeds = jnp.concatenate([heads, tails]).astype(jnp.int32)
        if use_combined:
            batch = sample_batch_combined(k_sample, csr_local, seeds,
                                          fanouts, mode=mode)
        else:
            batch = sample_batch(k_sample, csr_local, seeds, fanouts,
                                 mode=mode)
        frontier = batch.frontier
        all_ids = jax.lax.all_gather(frontier, axis_name, tiled=True)
        off = my * n_loc
        owned = (all_ids >= off) & (
            all_ids < jnp.minimum(off + n_loc, n_nodes))
        loc_ids = jnp.clip(all_ids - off, 0, n_loc - 1)
        rows = _fetch(emb_loc, owned, loc_ids)
        rest_v = jax.tree_util.tree_map(vary, rest)
        emb = encoder_apply_sampled(_merge_emb(rest_v, None), batch,
                                    model_cfg, train=False, x0=rows)
        m = heads.shape[0]
        rel_emb = jnp.take(rest_v["decoder"]["rel_emb"], rels, axis=0)
        scores = distmult_score(emb[:m], emb[m:], rel_emb)
        loss_sum, correct, count = bce_stats(scores, labels, weights)
        return jax.lax.psum(jnp.stack([loss_sum, correct, count]), axes)

    @jax.jit
    def _jit_eval(params, batch_dm, key, csr_arrs):
        emb_dm, rest = _split_emb(params)
        return _eval_shard(emb_dm, rest, csr_arrs, batch_dm, key)

    def eval_batch(params, pos_mask, key):
        """(loss_sum, correct, count) for one [B, 4] (src,dst,rel,valid)
        batch; aggregate across batches on the host for exact epoch
        means."""
        b = pos_mask.shape[0]
        if b % n_dev:
            raise ValueError(
                f"batch size {b} must divide by the {n_dev}-device mesh")
        batch_dm = pos_mask.reshape(n_dev, b // n_dev, 4)
        return _jit_eval(params, batch_dm, key, csr_arrays)

    step.eval_batch = eval_batch
    return init_state, step, to_full, to_sharded


class SampledTrainer:
    """Host-driven mini-batch trainer over sampled neighborhoods.

    For graphs where the full-batch epoch scan is impractical. Reuses the
    Trainer's checkpoint/metrics conventions; validation still scores
    against the full graph (cheap: one encode per epoch).
    """

    def __init__(self, model_cfg, train_cfg, graph, full_graph, train_edges,
                 val_edges, output_dir, *, fanouts=(15, 10), mode="uniform",
                 n_devices=None, zero1=False, zero3=False, dp_pods=0,
                 sparse_emb=False, val_sampled=False, table_opt="sgd",
                 cache_layer1=False):
        import numpy as np
        from pathlib import Path

        from primekg_rgcn_tpu.data.sampling import build_csr_cache
        from primekg_rgcn_tpu.models.rgcn import init_params
        from primekg_rgcn_tpu.train.loop import (
            build_eval_epoch,
            make_optimizer,
        )
        from primekg_rgcn_tpu.utils.telemetry import MetricsLogger

        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.train_edges = np.asarray(train_edges, dtype=np.int32)
        self.output_dir = Path(output_dir)
        self.model_dir = self.output_dir / "models"
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.metrics = MetricsLogger(self.output_dir / "metrics.jsonl")

        self.optimizer = make_optimizer(train_cfg)
        key = jax.random.PRNGKey(train_cfg.seed)
        self.key, k_init = jax.random.split(key)
        params = init_params(k_init, model_cfg)
        # Identity param converters; zero3 swaps in sharded<->full ones.
        self._to_full_params = lambda p: p
        self._to_sharded_params = lambda p: p
        self._zero3 = False
        multi = bool(n_devices and n_devices > 1)
        self._multi = multi
        # Steps fused per dispatch on a single device (lax.scan chunk);
        # train_cfg.steps_per_scan overrides, 0 = the measured default.
        self._chunk_steps = getattr(train_cfg, "steps_per_scan", 0) or 32
        # Sharding flags must not degrade silently: a user asking for a
        # sharded optimizer on a 1-device run would otherwise train a
        # different program than requested.
        if (zero1 or zero3 or dp_pods) and not multi:
            raise ValueError(
                "--zero1/--zero3/--dp_pods need a multi-device mesh: pass "
                "--shard (and --n_devices > 1) to enable one")
        if sparse_emb and multi:
            raise ValueError(
                "--sparse_emb is the single-chip memory mode; the "
                "multi-device analogue is --zero3 (sharded table)")
        if cache_layer1 and multi:
            raise ValueError(
                "--cache_layer1 is the single-chip historical-embedding "
                "mode; sharded layouts keep exact frontier collectives "
                "(a sharded history table is future work)")
        if cache_layer1 and not sparse_emb:
            raise ValueError("--cache_layer1 requires --sparse_emb (it "
                             "extends the single-chip sparse-table step)")
        if table_opt != "sgd" and multi and not zero3:
            # Above the single/multi split so a requested table optimizer
            # can never be silently ignored by a sharded layout that
            # carries its own update rule (zero1/dp train the dense
            # optimizer; only zero3 supports per-slice table optimizers).
            raise ValueError(
                "--table_opt with a multi-device mesh requires --zero3 "
                "(per-slice factored stats); --zero1/--dp layouts train "
                "the dense optimizer and would ignore it")
        if dp_pods and dp_pods > 1 and not zero3:
            raise ValueError("--dp_pods requires --zero3")
        # Resolve the pick layout ONCE; every builder (train step, sampled
        # val) then shares the same CSR instead of rebuilding it (the
        # combined CSR costs ~90 s + 700 MB at the 100M-edge config).
        # cache_layer1 requires the combined layout regardless of relation
        # density (the hop's frontier global ids address the history
        # table), so it overrides the auto heuristic like block mode does.
        csr_like = resolve_sampler(
            graph, fanouts, "combined" if cache_layer1 else "auto",
            mode=mode)[0]
        if multi:
            from primekg_rgcn_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_devices)
            if zero1 and zero3:
                raise ValueError("--zero1 and --zero3 are exclusive")
            if zero3:
                dp_kw = {}
                if dp_pods and dp_pods > 1:
                    if n_devices % dp_pods:
                        raise ValueError(
                            f"--dp_pods {dp_pods} must divide the "
                            f"{n_devices}-device mesh")
                    from primekg_rgcn_tpu.parallel.mesh import make_mesh_2d

                    mesh = make_mesh_2d(dp_pods, n_devices // dp_pods)
                    dp_kw["dp_axis"] = "dp"
                (init_state, self.step_fn, to_full,
                 to_sharded) = build_sampled_train_step_zero3(
                    csr_like, model_cfg, train_cfg, mesh, fanouts=fanouts,
                    mode=mode, table_opt=table_opt, **dp_kw)
                self.state = init_state(params)
                self._zero3 = True

                def _full(p):
                    emb, rest = _split_emb(p)
                    return _merge_emb(rest, to_full(emb))

                def _shard(p):
                    emb, rest = _split_emb(p)
                    return _merge_emb(rest, to_sharded(jnp.asarray(emb)))

                self._to_full_params = _full
                self._to_sharded_params = _shard
            elif zero1:
                init_state, self.step_fn = build_sampled_train_step_zero1(
                    csr_like, model_cfg, train_cfg, mesh, fanouts=fanouts,
                    mode=mode)
                self.state = init_state(params)
            else:
                self.step_fn = build_sampled_train_step_dp(
                    csr_like, model_cfg, train_cfg, self.optimizer, mesh,
                    fanouts=fanouts, mode=mode)
                self.state = TrainState(params, self.optimizer.init(params),
                                        jnp.zeros((), jnp.int32))
        else:
            if table_opt != "sgd" and not sparse_emb:
                raise ValueError("--table_opt needs --sparse_emb")
            if sparse_emb and table_opt == "sgd" and (
                    train_cfg.optimizer != "sgd" or train_cfg.grad_clip
                    or train_cfg.weight_decay):
                raise ValueError(
                    "sparse_emb requires --optimizer sgd with grad_clip "
                    "disabled: the embedding update is a -lr*g scatter, so "
                    "any rule coupling the table with other leaves (adam "
                    "moments, global-norm clip) would diverge from the "
                    "dense step — or pass --table_opt adafactor, whose "
                    "factored adaptive rule lifts the restriction on the "
                    "rest params")
            if sparse_emb and table_opt != "sgd" and train_cfg.grad_clip:
                raise ValueError(
                    "--table_opt adafactor cannot honor global-norm "
                    "grad_clip (the table gradient is updated separately "
                    "from the rest); disable --grad_clip")
            cache_init = None
            if cache_layer1 and graph is not None and \
                    getattr(graph, "padded_num_edges", 1 << 62) <= 20_000_000:
                # Warm start: one full-batch conv1 pass fills every history
                # row exactly (instead of a zero cold start whose first
                # ~N/|seeds| steps aggregate zero neighbor messages). Only
                # where the full-graph layer fits comfortably; the 100M-edge
                # config starts cold and warms within its first epoch.
                from primekg_rgcn_tpu.ops.rgcn_segment import \
                    rgcn_layer_segment

                cdt = (jnp.bfloat16
                       if model_cfg.compute_dtype == "bfloat16"
                       else jnp.float32)
                cache_init = jax.jit(
                    lambda p: rgcn_layer_segment(
                        p["encoder"]["conv1"], p["encoder"]["node_emb"],
                        graph, compute_dtype=cdt))(params)
            self.step_fn = build_sampled_train_step(
                csr_like, model_cfg, train_cfg, self.optimizer,
                fanouts=fanouts, mode=mode, sparse_emb=sparse_emb,
                table_opt=table_opt, cache_layer1=cache_layer1,
                cache_init=cache_init)
            self.state = self.step_fn.init_state(params)
        if val_sampled and self._zero3:
            # Sharded sampled validation: the table never materializes.
            edges_v = np.asarray(val_edges, dtype=np.int32)
            b = train_cfg.batch_size
            n_val_steps = max(-(-len(edges_v) // b), 1)
            padded = np.zeros((n_val_steps * b, 4), np.int32)
            padded[:len(edges_v), :3] = edges_v
            padded[:len(edges_v), 3] = 1
            val_batches = jnp.asarray(padded.reshape(n_val_steps, b, 4))
            eval_batch = self.step_fn.eval_batch

            def eval_fn(params, key):
                tot = np.zeros(3)
                for i in range(n_val_steps):
                    tot += np.asarray(
                        eval_batch(params, val_batches[i],
                                   jax.random.fold_in(key, i)))
                denom = max(tot[2], 1.0)
                return tot[0] / denom, tot[1] / denom

            self.eval_fn = eval_fn
        elif val_sampled:
            self.eval_fn = build_sampled_eval_epoch(
                csr_like, val_edges, model_cfg, train_cfg, fanouts=fanouts,
                mode=mode)
        else:
            from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

            base_eval = build_eval_epoch(full_graph, np.asarray(val_edges),
                                         model_cfg, train_cfg,
                                         layer_fn=rgcn_layer_segment)
            if self._zero3:
                self.eval_fn = lambda p, k: base_eval(
                    self._to_full_params(p), k)
            else:
                self.eval_fn = base_eval
        self.best_val_loss = float("inf")
        self.history = {"train_losses": [], "val_losses": []}
        self.start_epoch = 0

    def resume(self, path):
        """Continue a run from a checkpoint written by this trainer (same
        payload contract as train/loop.Trainer.resume; works for plain,
        DP, and ZeRO-1 states — the optimizer-state pytree round-trips
        whatever structure it was saved with)."""
        from primekg_rgcn_tpu.train import checkpoint as ckpt_lib

        if self._zero3:
            # Checkpoints store the FULL table (the one-step eval/analyze
            # contract), so the sharded template can't deserialize it
            # directly: take the raw restore, re-shard the table leaf, and
            # map the optimizer state-dict back onto the live (rest_state,
            # sharded emb_state) structure.
            from flax import serialization as _ser

            payload = ckpt_lib.load(path, raw=True)
            raw = payload["state"]
            self.state = TrainState(
                self._to_sharded_params(raw.params),
                _ser.from_state_dict(self.state.opt_state, raw.opt_state),
                jnp.asarray(raw.step))
        else:
            payload = ckpt_lib.load(path, example_state=self.state)
            self.state = payload["state"]
        self.start_epoch = payload["epoch"]
        self.best_val_loss = payload["best_val_loss"]
        self.history = payload["history"]
        if "rng_key" in payload:
            self.key = jnp.asarray(payload["rng_key"], dtype=jnp.uint32)

    def train(self):
        import logging
        import time

        import numpy as np

        log = logging.getLogger(__name__)
        cfg = self.train_cfg
        b = cfg.batch_size
        n = len(self.train_edges)
        steps = -(-n // b)
        rng = np.random.default_rng(cfg.seed + self.start_epoch)
        for epoch in range(self.start_epoch + 1, cfg.epochs + 1):
            t0 = time.time()
            perm = rng.permutation(n)
            losses = []
            chunk = None if self._multi else getattr(
                self.step_fn, "chunk", None)
            n_full = n // b  # chunks need whole batches; remainder pads
            k_chunk = min(self._chunk_steps, n_full) if chunk else 0
            s = 0
            if k_chunk > 1:
                # Single device: scan K steps per dispatch — per-step jit
                # calls pay ~15-30 ms of hosted-frontend dispatch + fetch
                # each (measured 138 -> 97 s/epoch at reference scale).
                # chunk_keys reproduces the per-step split chain exactly,
                # so the RNG stream (and thus every loss) is bit-identical
                # to the unchunked loop.
                while s + k_chunk <= n_full:
                    idx = perm[s * b:(s + k_chunk) * b]
                    self.key, ks = self.step_fn.chunk_keys(self.key,
                                                           k_chunk)
                    self.state, (ls, _) = chunk(
                        self.state,
                        jnp.asarray(self.train_edges[idx]).reshape(
                            k_chunk, b, -1), ks)
                    losses.extend(np.asarray(ls).tolist())
                    s += k_chunk
            for s in range(s, steps):
                idx = perm[s * b:(s + 1) * b]
                if len(idx) < b:  # pad by wrapping (sampled mode tolerates)
                    idx = np.concatenate([idx, perm[: b - len(idx)]])
                self.key, k = jax.random.split(self.key)
                self.state, (loss, acc) = self.step_fn(
                    self.state, jnp.asarray(self.train_edges[idx]), k)
                # Fetch eagerly: in DP mode a deep queue of 8-participant
                # collectives on an oversubscribed host trips XLA's 40 s
                # rendezvous termination (observed on the 4-core CI host).
                losses.append(float(loss))
            tr_loss = float(np.mean(losses))
            self.key, k_val = jax.random.split(self.key)
            val_loss, val_acc = self.eval_fn(self.state.params, k_val)
            dt = time.time() - t0
            log.info("Epoch %d/%d | %.1fs | sampled train loss %.4f | "
                     "val loss %.4f acc %.4f", epoch, cfg.epochs, dt,
                     tr_loss, float(val_loss), float(val_acc))
            self.metrics.log("epoch", epoch=epoch, train_loss=tr_loss,
                             val_loss=float(val_loss),
                             val_acc=float(val_acc), epoch_time_s=round(dt, 2))
            self.history["train_losses"].append(tr_loss)
            self.history["val_losses"].append(float(val_loss))
            from primekg_rgcn_tpu.train import checkpoint as ckpt_lib

            is_best = float(val_loss) < self.best_val_loss
            if is_best:
                self.best_val_loss = float(val_loss)
            # zero3 checkpoints store the FULL table (the eval/analyze
            # one-step-load contract); moments stay in their sharded
            # device-major form and resume() re-shards the table.
            save_state = TrainState(
                self._to_full_params(self.state.params),
                self.state.opt_state, self.state.step)
            payload = {"epoch": epoch, "state": save_state,
                       "best_val_loss": self.best_val_loss,
                       "best_val_acc": 0.0, "history": self.history,
                       "rng_key": np.asarray(self.key).tolist(),
                       "model_config": self.model_cfg.to_dict(),
                       "train_config": self.train_cfg.to_dict()}
            if is_best:
                ckpt_lib.save(self.model_dir / "best_model", payload)
            ckpt_lib.save(self.model_dir / "final_model", payload)
            # Windowed early stopping, same quirk-preserving semantics as
            # the full-batch Trainer (reference: src/train.py:523-530 —
            # stop when no element of the window improves on its FIRST
            # element).
            if cfg.early_stopping > 0 and \
                    len(self.history["val_losses"]) > cfg.early_stopping:
                recent = self.history["val_losses"][-cfg.early_stopping:]
                if all(r >= recent[0] for r in recent):
                    log.info("Early stopping at epoch %d", epoch)
                    break
        return self.history
