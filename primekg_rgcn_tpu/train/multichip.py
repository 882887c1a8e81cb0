"""Multi-chip training driver: the CLI-reachable face of parallel/*.

The reference is strictly single-device (reference: src/train.py:758-761);
this module is greenfield TPU design (SURVEY.md §2.4): it drives the
shard_map training steps from ``parallel/edge_shard.py`` (replicated
features, edge-partitioned aggregation, psum) and ``parallel/node_shard.py``
(node-partitioned features, halo exchange) through the same epoch /
checkpoint / early-stop orchestration as the single-device ``Trainer``, so

    python -m primekg_rgcn_tpu.train.cli --shard edge ...

is a full multi-epoch multi-chip training run. Validation reuses the
single-device full-graph eval (parameters are replicated, so evaluating on
one logical program is exact).

Batches are data-parallel along the same mesh axis in BOTH layouts: each
device samples negatives for and scores only its slice of every batch.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
from primekg_rgcn_tpu.data.graph import RelGraph
from primekg_rgcn_tpu.parallel.mesh import make_mesh
from primekg_rgcn_tpu.train.loop import Trainer, TrainState

logger = logging.getLogger(__name__)


def _build_step(shard: str, mesh, train_graph: RelGraph,
                model_cfg: ModelConfig, train_cfg: TrainConfig, optimizer,
                halo_impl: str = "xla", agg_impl: str = "auto"):
    """Uniform ``step(state, batch, key) -> (state, (loss, acc))``."""
    if shard == "edge":
        from primekg_rgcn_tpu.parallel.edge_shard import (
            build_sharded_train_step,
            shard_rel_graph,
        )

        # Host-precomputed per-device Pallas schedules let the sharded step
        # keep the run-compaction kernel (index arrays are traced inside
        # shard_map, so the kernel cannot derive them there). "auto" enables
        # them on TPU; on the simulated CPU mesh only an explicit "pallas"
        # asks for them (the interpreted kernel adds nothing to a CPU run).
        use_pallas = (agg_impl == "pallas" or
                      (agg_impl == "auto" and
                       jax.default_backend() != "cpu"))
        sg = shard_rel_graph(train_graph, mesh.devices.size,
                             pallas=use_pallas)
        raw = build_sharded_train_step(
            mesh, sg, model_cfg, train_cfg, optimizer,
            accum_steps=train_cfg.gradient_accumulation_steps)

        def step(state: TrainState, batch, key):
            params, opt_state, (loss, acc) = raw(
                state.params, state.opt_state, batch, key)
            return TrainState(params, opt_state, state.step + 1), (loss, acc)

        return step
    if shard == "node":
        from primekg_rgcn_tpu.parallel.node_shard import (
            build_node_sharded_train_step,
            partition_nodes,
        )

        if train_cfg.gradient_accumulation_steps > 1:
            logger.warning(
                "gradient_accumulation_steps ignored by the node-sharded "
                "step (memory already scales with the partition; raise "
                "batch_size instead)")

        # Both layer variants take schedules: the unrolled path per
        # relation, the scan path as one stacked [R, ...] set.
        use_pallas = (agg_impl == "pallas" or
                      (agg_impl == "auto" and
                       jax.default_backend() != "cpu"))
        sg = partition_nodes(train_graph, mesh.devices.size,
                             pallas=use_pallas)
        return build_node_sharded_train_step(mesh, sg, model_cfg, train_cfg,
                                             optimizer, halo_impl=halo_impl)
    raise ValueError(f"unknown shard layout: {shard!r}")


class ShardedTrainer(Trainer):
    """Trainer whose train epochs run the shard_map step over a device mesh.

    ``shard`` picks the layout: "edge" (features replicated, edges
    partitioned — right at PrimeKG scale) or "node" (features partitioned,
    halo exchange — the memory-scaling layout). Checkpoints, metrics,
    early stopping and validation are inherited unchanged.
    """

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 train_graph: RelGraph, full_graph: RelGraph,
                 train_edges: np.ndarray, val_edges: np.ndarray,
                 output_dir: str, *, shard: str = "edge",
                 n_devices: Optional[int] = None, halo_impl: str = "xla",
                 agg_impl: str = "auto", layer_fn=None):
        super().__init__(model_cfg, train_cfg, train_graph, full_graph,
                         train_edges, val_edges, output_dir,
                         layer_fn=layer_fn)
        n = n_devices or len(jax.devices())
        self.mesh = make_mesh(n)
        self.shard = shard
        self._sharded_step = _build_step(
            shard, self.mesh, train_graph, model_cfg, train_cfg,
            self.optimizer, halo_impl=halo_impl, agg_impl=agg_impl)

        edges = train_edges.astype(np.int32)
        b = train_cfg.batch_size
        if b % n:
            raise ValueError(
                f"batch_size {b} must divide by the {n}-device mesh")
        self._edges = edges
        self._num_edges = int(edges.shape[0])
        logger.info("ShardedTrainer: %s layout over %d devices "
                    "(%d train edges)", shard, n, self._num_edges)

        # Replace the single-device epoch with the sharded per-batch loop.
        self.train_epoch_fn = self._sharded_epoch

    def _sharded_epoch(self, state: TrainState, key: jax.Array):
        b = self.train_cfg.batch_size
        e = self._num_edges
        n_steps = -(-e // b)
        # Edge layout accumulates inside the compiled step (reference
        # semantics, parallel/edge_shard.py); node layout updates per batch.
        accum = (max(self.train_cfg.gradient_accumulation_steps, 1)
                 if self.shard == "edge" else 1)
        n_updates = -(-n_steps // accum)
        k_perm, k_steps = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(k_perm, e))

        loss_sum = acc_sum = weight = 0.0
        neg = self.train_cfg.num_neg_samples
        for u in range(n_updates):
            group = np.zeros((accum, b, 4), np.int32)
            real_total = 0
            for j in range(accum):
                i = u * accum + j
                idx = perm[i * b:(i + 1) * b]
                real = idx.shape[0]
                group[j, :real, :3] = self._edges[idx]
                group[j, :real, 3] = 1
                real_total += real
            k = jax.random.fold_in(k_steps, u)
            batch = group[0] if accum == 1 else group
            state, (loss, acc) = self._sharded_step(
                state, jnp.asarray(batch), k)
            count = real_total * (1 + neg)
            loss_sum += float(loss) * count
            acc_sum += float(acc) * count
            weight += count
        return state, (loss_sum / weight, acc_sum / weight)


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    With no arguments, JAX auto-detects the cluster from the environment
    (TPU pod metadata / SLURM / Open MPI). Returns True when a multi-process
    runtime is active afterwards. Safe to call twice (no-op if already
    initialized). On a multi-host pod every process then sees its local
    devices plus the global mesh via ``jax.devices()``; the shard_map
    layouts in parallel/* are SPMD and need no further changes — each
    process feeds the device-major global arrays through
    ``jax.make_array_from_process_local_data`` (the per-process slicing of
    batches is the caller's responsibility at true pod scale).
    """
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # already initialized
        logger.info("jax.distributed.initialize: %s", exc)
    except Exception as exc:  # noqa: BLE001 - single-host / no cluster env
        logger.warning("jax.distributed.initialize failed (%s); "
                       "continuing single-process", exc)
        return False
    return jax.process_count() > 1
