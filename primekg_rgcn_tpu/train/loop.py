"""Jit-compiled training runtime.

Re-designs the reference trainer (reference: src/train.py:100-547) TPU-first:

- The reference runs ~1,600 Python-dispatched batches per epoch, each doing a
  full-graph PyG encode, host-side shuffling, and per-batch host sync. Here an
  **entire epoch is one jitted ``lax.scan``**: shuffling
  (``jax.random.permutation``), negative sampling, the full-graph encode,
  BCE loss, gradient accumulation, clipping and the optax update all stay on
  device; the host sees one (loss, accuracy) pair per epoch.
- Semantics preserved exactly: every batch differentiates through the
  **full-graph** encoder forward (reference: src/train.py:290-297), the last
  partial batch is handled with masked means, gradient accumulation averages
  micro-batch gradients (reference divides each loss by ``accumulation_steps``
  at src/train.py:303), clipping is global-norm on the accumulated gradient
  (src/train.py:311-315), and optimizers match torch Adam/AdamW
  (coupled/decoupled weight decay).
- Validation scores against the full message-passing graph, like the reference
  (src/train.py:388-395).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.models.rgcn import model_apply
from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
from primekg_rgcn_tpu.train.neg_sampling import bce_stats, candidate_batch

logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar, global update count


def make_optimizer(cfg: TrainConfig,
                   include_clip: bool = True) -> optax.GradientTransformation:
    """Optax chain matching the reference's optimizer semantics.

    torch.optim.Adam applies *coupled* L2 (weight decay added to the gradient
    before the moment updates); AdamW decouples it. Clipping happens on the
    raw accumulated gradient before the step (reference: src/train.py:311-317).

    include_clip=False omits the global-norm clip stage: callers that shard
    the optimizer state (train/sampled.py ZeRO-1) must clip on the FULL
    gradient pytree before splitting it (the norm is global), then apply the
    clip-free chain per shard.
    """
    parts = []
    if include_clip and cfg.grad_clip and cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.optimizer == "adam":
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_adam())
        parts.append(optax.scale(-cfg.lr))
    elif cfg.optimizer == "adamw":
        parts.append(optax.scale_by_adam())
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale(-cfg.lr))
    elif cfg.optimizer == "sgd":
        # TPU extra (not a reference option): plain SGD is the memory-spec
        # optimizer at 10M-node scale (adam moments are +2x params) and the
        # rule the sparse-embedding-update sampled step mirrors exactly.
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale(-cfg.lr))
    else:
        raise ValueError(f"Unknown optimizer: {cfg.optimizer}")
    return optax.chain(*parts)


def _batch_loss(
    params,
    graph: RelGraph,
    edges_pad: jnp.ndarray,       # [E+1, 3]; row E is a masked sentinel
    batch_idx: jnp.ndarray,       # [B] indices into edges_pad (E = padding)
    key: jax.Array,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    *,
    train: bool,
    layer_fn,
    final_plan=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Masked BCE-with-logits loss over positives + sampled negatives.

    Returns (loss_mean, (num_correct, num_samples)). Padding slots carry zero
    weight in both the loss and the accuracy, reproducing the reference's
    smaller final batch without dynamic shapes.
    """
    num_edges = edges_pad.shape[0] - 1
    k_neg, k_drop = jax.random.split(key)
    mask = batch_idx < num_edges

    batch = jnp.take(edges_pad, batch_idx, axis=0)
    heads, tails, rels, labels, weights = candidate_batch(
        k_neg, batch[:, 0], batch[:, 1], batch[:, 2], graph.num_nodes,
        train_cfg.num_neg_samples, mask=mask)

    scores = model_apply(
        params, graph, heads, tails, rels, model_cfg,
        train=train, dropout_rng=k_drop if train else None, layer_fn=layer_fn,
        final_plan=final_plan,
    )

    loss_sum, correct, count = bce_stats(scores, labels, weights)
    loss = loss_sum / jnp.maximum(count, 1.0)
    return loss, (correct, count)


def build_train_epoch(
    graph: RelGraph,
    edges: np.ndarray,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    layer_fn,
):
    """Compile one full training epoch as device-resident scans.

    ``edges`` is the [E, 3] (head, tail, rel) int32 array of real train edges.
    Returns ``epoch_fn(state, key) -> (state, (loss, acc))``.

    ``train_cfg.steps_per_scan`` > 0 splits the epoch into several jitted
    scan segments (at most two compiled variants: full-size and remainder).
    The default (0) fuses the whole epoch into one device execution; both
    modes are validated on the hosted TPU frontend (earlier fused-mode
    crashes were root-caused to buffer donation, which is auto-disabled
    there). Segmented mode compiles much faster and allows host-side
    progress hooks; fused mode minimizes dispatch overhead.
    """
    num_edges = int(edges.shape[0])
    b = train_cfg.batch_size
    accum = max(int(train_cfg.gradient_accumulation_steps), 1)
    n_steps = -(-num_edges // b)                    # ceil
    n_updates = -(-n_steps // accum)
    pad_steps = n_updates * accum

    edges_pad = jnp.asarray(
        np.concatenate([edges.astype(np.int32),
                        np.zeros((1, 3), np.int32)], axis=0)
    )

    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    final_plan = None
    if layer_fn is rgcn_layer_segment:
        from primekg_rgcn_tpu.ops.rgcn_final_layer import resolve_final_plan

        final_plan = resolve_final_plan(
            graph, edges, b, train_cfg.num_neg_samples,
            seed=train_cfg.seed,
            mode=getattr(train_cfg, "restrict_final", "auto"))

    grad_fn = jax.value_and_grad(
        lambda p, bi, k: _batch_loss(
            p, graph, edges_pad, bi, k, model_cfg, train_cfg,
            train=True, layer_fn=layer_fn, final_plan=final_plan),
        has_aux=True,
    )

    def micro_step(carry, inp):
        params, grad_acc, stats = carry
        batch_idx, key = inp
        (loss, (correct, count)), grads = grad_fn(params, batch_idx, key)
        grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
        stats = (stats[0] + loss * count, stats[1] + correct, stats[2] + count)
        return (params, grad_acc, stats), None

    def update_step(carry, inp):
        state, stats = carry
        batch_indices, keys = inp  # [accum, B], [accum, 2]
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (_, grad_acc, stats), _ = jax.lax.scan(
            micro_step, (state.params, zero_grads, stats),
            (batch_indices, keys))
        # Average micro-batch gradients (reference scales each loss by
        # 1/accumulation_steps before backward, src/train.py:303).
        grad_acc = jax.tree_util.tree_map(lambda g: g / accum, grad_acc)
        updates, opt_state = optimizer.update(grad_acc, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1), stats), None

    def _prep(key):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, num_edges)
        perm = jnp.concatenate([
            perm,
            jnp.full((pad_steps * b - num_edges,), num_edges, dtype=perm.dtype),
        ])
        batch_indices = perm.reshape(n_updates, accum, b)
        keys = jax.random.split(k_steps, n_updates * accum).reshape(
            n_updates, accum, -1)
        return batch_indices, keys

    def _segment(state, stats, batch_indices, keys):
        (state, stats), _ = jax.lax.scan(
            update_step, (state, stats), (batch_indices, keys))
        return state, stats

    def _fresh_stats():
        # Fresh buffers each epoch: the segmented path donates its stats
        # carry, so a shared closure constant would be consumed by epoch 1.
        return (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

    seg = int(train_cfg.steps_per_scan)
    # Buffer donation is unreliable on the hosted axon TPU frontend
    # (InvalidArgument on the epoch after a donated execution); detect it
    # via the PJRT platform_version (the backend itself reports "tpu").
    try:
        _pv = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        _pv = ""
    donate = "axon" not in str(_pv).lower()

    if seg <= 0 or seg >= n_updates:
        def epoch_fn(state: TrainState, key: jax.Array):
            batch_indices, keys = _prep(key)
            state, stats = _segment(state, _fresh_stats(), batch_indices,
                                    keys)
            loss_sum, correct, count = stats
            return state, (loss_sum / count, correct / count)

        return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())

    # Segmented epoch: host loop over at most two compiled scan sizes.
    n_full = n_updates // seg
    rem = n_updates - n_full * seg
    prep_jit = jax.jit(_prep)
    seg_jit = jax.jit(_segment, donate_argnums=(0, 1) if donate else ())

    def epoch_fn(state: TrainState, key: jax.Array):
        batch_indices, keys = prep_jit(key)
        stats = _fresh_stats()
        for i in range(n_full):
            s = i * seg
            state, stats = seg_jit(state, stats,
                                   jax.lax.slice_in_dim(batch_indices, s, s + seg),
                                   jax.lax.slice_in_dim(keys, s, s + seg))
        if rem:
            s = n_full * seg
            state, stats = seg_jit(state, stats,
                                   jax.lax.slice_in_dim(batch_indices, s, s + rem),
                                   jax.lax.slice_in_dim(keys, s, s + rem))
        loss_sum, correct, count = stats
        return state, (loss_sum / count, correct / count)

    return epoch_fn


def build_eval_epoch(
    graph: RelGraph,
    edges: np.ndarray,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    layer_fn,
):
    """Compile a validation epoch (no shuffle, no dropout, full-graph encode).

    ``graph`` should be the *full* message-passing graph, matching the
    reference's validate() (src/train.py:388-395). Unlike the reference —
    which re-runs the full-graph encoder for every validation batch
    (src/train.py:389-395) — eval mode is deterministic (no dropout), so the
    graph is encoded ONCE per epoch and every batch scores against the cached
    node embeddings. Results are bit-identical; the epoch costs one encode
    plus O(edges) scoring instead of n_batches encodes.
    """
    from primekg_rgcn_tpu.models.rgcn import encoder_apply
    from primekg_rgcn_tpu.ops.distmult import distmult_score

    num_edges = int(edges.shape[0])
    b = train_cfg.batch_size
    n_steps = -(-num_edges // b)

    edges_pad = jnp.asarray(
        np.concatenate([edges.astype(np.int32),
                        np.zeros((1, 3), np.int32)], axis=0)
    )
    idx = np.concatenate([
        np.arange(num_edges, dtype=np.int32),
        np.full(n_steps * b - num_edges, num_edges, dtype=np.int32),
    ]).reshape(n_steps, b)
    idx = jnp.asarray(idx)

    def eval_fn(params, key):
        node_emb = encoder_apply(params, graph, model_cfg, train=False,
                                 layer_fn=layer_fn)
        rel_table = params["decoder"]["rel_emb"]

        def step(stats, inp):
            batch_idx, k = inp
            mask = batch_idx < num_edges
            batch = jnp.take(edges_pad, batch_idx, axis=0)
            # Same key split as _batch_loss so the sampled negatives (and
            # hence the reported val loss) are bit-identical to the
            # encode-per-batch formulation.
            k_neg, _ = jax.random.split(k)
            heads, tails, rels, labels, weights = candidate_batch(
                k_neg, batch[:, 0], batch[:, 1], batch[:, 2], graph.num_nodes,
                train_cfg.num_neg_samples, mask=mask)
            scores = distmult_score(
                jnp.take(node_emb, heads, axis=0),
                jnp.take(node_emb, tails, axis=0),
                jnp.take(rel_table, rels, axis=0))
            loss_sum, correct, count = bce_stats(scores, labels, weights)
            return (stats[0] + loss_sum, stats[1] + correct,
                    stats[2] + count), None

        keys = jax.random.split(key, n_steps)
        stats0 = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        stats, _ = jax.lax.scan(step, stats0, (idx, keys))
        loss_sum, correct, count = stats
        return loss_sum / count, correct / count

    return jax.jit(eval_fn)


class Trainer:
    """Orchestrates epochs, checkpointing and early stopping.

    Host-side counterpart of the reference Trainer (src/train.py:100-547):
    per-epoch logging, best/periodic/final checkpoints, windowed early
    stopping. Adds resume-from-checkpoint, which the reference lacks
    (SURVEY.md §5).
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        train_graph: RelGraph,
        full_graph: RelGraph,
        train_edges: np.ndarray,
        val_edges: np.ndarray,
        output_dir: str,
        *,
        layer_fn=None,
    ):
        from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment
        from primekg_rgcn_tpu.models.rgcn import init_params

        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        layer_fn = layer_fn or rgcn_layer_segment

        self.output_dir = Path(output_dir)
        self.checkpoint_dir = self.output_dir / "checkpoints"
        self.model_dir = self.output_dir / "models"
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.model_dir.mkdir(parents=True, exist_ok=True)

        self.optimizer = make_optimizer(train_cfg)
        key = jax.random.PRNGKey(train_cfg.seed)
        self.key, k_init = jax.random.split(key)
        params = init_params(k_init, model_cfg)
        self.state = TrainState(params, self.optimizer.init(params),
                                jnp.zeros((), jnp.int32))

        self.train_epoch_fn = build_train_epoch(
            train_graph, train_edges, model_cfg, train_cfg, self.optimizer,
            layer_fn)
        self.eval_epoch_fn = build_eval_epoch(
            full_graph, val_edges, model_cfg, train_cfg, layer_fn)

        self.best_val_loss = float("inf")
        self.best_val_acc = 0.0
        self.history: Dict[str, list] = {
            "train_losses": [], "val_losses": [],
            "train_accs": [], "val_accs": [],
        }
        self.epoch = 0
        self.num_train_edges = int(train_edges.shape[0])

        from primekg_rgcn_tpu.utils.telemetry import MetricsLogger

        self.metrics = MetricsLogger(self.output_dir / "metrics.jsonl")

    # -- checkpoint plumbing -------------------------------------------------
    def _checkpoint_payload(self) -> Dict[str, Any]:
        return {
            "epoch": self.epoch,
            "state": self.state,
            "best_val_loss": self.best_val_loss,
            "best_val_acc": self.best_val_acc,
            "history": self.history,
            # RNG position so a resumed run continues the stream instead of
            # replaying the shuffles/negatives/dropout of earlier epochs.
            "rng_key": np.asarray(self.key).tolist(),
            "model_config": self.model_cfg.to_dict(),
            "train_config": self.train_cfg.to_dict(),
        }

    def save_checkpoint(self, *, is_best=False, is_final=False,
                        filename: Optional[str] = None):
        payload = self._checkpoint_payload()
        # Mid-training snapshots go through the async writer: the snapshot
        # transfers to host immediately, serialization/disk IO overlaps the
        # next epochs (a blocking save is seconds of stall at large N).
        # Writes are atomic-rename, and the single writer thread keeps them
        # ordered. The final save is synchronous and drains the queue.
        if not is_best and not is_final:
            name = filename or f"checkpoint_epoch_{self.epoch}"
            ckpt_lib.save_async(self.checkpoint_dir / name, payload)
        if is_best:
            ckpt_lib.save_async(self.model_dir / "best_model", payload)
        if is_final:
            ckpt_lib.save(self.model_dir / "final_model", payload)
            ckpt_lib.wait_for_saves()

    def resume(self, path: str):
        payload = ckpt_lib.load(path, example_state=self.state)
        self.state = payload["state"]
        self.epoch = payload["epoch"]
        self.best_val_loss = payload["best_val_loss"]
        self.best_val_acc = payload["best_val_acc"]
        self.history = payload["history"]
        if "rng_key" in payload:
            self.key = jnp.asarray(payload["rng_key"], dtype=jnp.uint32)

    # -- main loop -----------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        cfg = self.train_cfg
        logger.info("Starting training for %d epochs (batch %d, lr %g)",
                    cfg.epochs, cfg.batch_size, cfg.lr)
        t0 = time.time()
        epoch_times = []
        for epoch in range(self.epoch + 1, cfg.epochs + 1):
            self.epoch = epoch
            te = time.time()
            self.key, k_train, k_val = jax.random.split(self.key, 3)
            self.state, (tr_loss, tr_acc) = self.train_epoch_fn(
                self.state, k_train)
            val_loss, val_acc = self.eval_epoch_fn(self.state.params, k_val)
            tr_loss, tr_acc = float(tr_loss), float(tr_acc)
            val_loss, val_acc = float(val_loss), float(val_acc)
            epoch_time = time.time() - te
            epoch_times.append(epoch_time)

            self.history["train_losses"].append(tr_loss)
            self.history["val_losses"].append(val_loss)
            self.history["train_accs"].append(tr_acc)
            self.history["val_accs"].append(val_acc)

            edges_per_s = self.num_train_edges / max(epoch_time, 1e-9)
            logger.info(
                "Epoch %d/%d | Time: %.2fs | Train Loss: %.4f | Train Acc: "
                "%.4f | Val Loss: %.4f | Val Acc: %.4f | %.0f edges/s",
                epoch, cfg.epochs, epoch_time, tr_loss, tr_acc, val_loss,
                val_acc, edges_per_s)

            from primekg_rgcn_tpu.utils.telemetry import device_memory_stats

            self.metrics.log(
                "epoch", epoch=epoch, train_loss=tr_loss, train_acc=tr_acc,
                val_loss=val_loss, val_acc=val_acc,
                epoch_time_s=round(epoch_time, 3),
                edges_per_s=round(edges_per_s, 1),
                **{f"mem_{k}": v for k, v in device_memory_stats().items()})

            is_best = val_loss < self.best_val_loss
            if is_best:
                self.best_val_loss = val_loss
            self.best_val_acc = max(self.best_val_acc, val_acc)
            # Unlike the reference (whose periodic file is skipped whenever
            # the epoch is also a new best, src/train.py:444-455), write the
            # periodic snapshot unconditionally on its schedule so resume
            # points have no gaps.
            if epoch % cfg.save_every == 0:
                self.save_checkpoint()
            if is_best:
                self.save_checkpoint(is_best=True)

            # Preserved reference quirk (src/train.py:523-530): the window
            # compares against its own first element, so patience=1 always
            # stops at the first eligible epoch. Kept for parity.
            if cfg.early_stopping > 0 and \
                    len(self.history["val_losses"]) > cfg.early_stopping:
                recent = self.history["val_losses"][-cfg.early_stopping:]
                if all(r >= recent[0] for r in recent):
                    logger.info("Early stopping at epoch %d", epoch)
                    break

        total = time.time() - t0
        logger.info("Training completed in %.2fs (best val loss %.4f)",
                    total, self.best_val_loss)
        self.save_checkpoint(is_final=True)
        return {
            "total_time_s": total,
            "epoch_times_s": epoch_times,
            "best_val_loss": self.best_val_loss,
            "best_val_acc": self.best_val_acc,
            "history": self.history,
        }
