"""Configuration dataclasses for the framework.

The reference uses per-script argparse namespaces persisted inside torch
checkpoints (reference: src/train.py:635-770, args stored at train.py:441 and
read back at evaluate.py:672-708). Here every subsystem shares typed dataclass
configs that serialize to plain dicts, so checkpoints are self-describing in
the same spirit while staying framework-native.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the RGCN encoder + DistMult decoder.

    Defaults mirror the reference model (reference: src/models/rgcn.py:51-58,
    src/train.py:662-691): 64-dim learnable node embeddings, two RGCN layers
    to 128 dims, dropout 0.5 between them, optional basis decomposition.
    """

    num_nodes: int
    num_relations: int
    embedding_dim: int = 64
    hidden_dim: int = 128
    dropout: float = 0.5
    decoder_dropout: float = 0.0
    num_bases: Optional[int] = None
    # TPU-specific: compute dtype for matmuls ("float32" or "bfloat16").
    # Params are always stored in float32.
    compute_dtype: str = "float32"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    Defaults mirror the reference CLI surface (reference: src/train.py:635-770):
    adam, lr 1e-3, batch 1024, 1 negative per positive, grad-clip 1.0,
    gradient accumulation, periodic checkpointing, optional early stopping.
    """

    epochs: int = 100
    batch_size: int = 1024
    lr: float = 1e-3
    weight_decay: float = 0.0
    optimizer: str = "adam"  # "adam" | "adamw" | "sgd" (TPU extra)
    num_neg_samples: int = 1
    grad_clip: float = 1.0
    gradient_accumulation_steps: int = 1
    save_every: int = 10
    early_stopping: int = 0
    seed: int = 42
    # TPU-specific: how many train steps to fuse into one jitted lax.scan
    # segment. 0 = whole epoch in one scan (fastest; no host sync mid-epoch).
    steps_per_scan: int = 0
    # Implementation of the message-passing op: "segment" (XLA gather +
    # segment_sum), "dense" (oracle, small graphs only), "pallas".
    impl: str = "segment"
    # TPU-specific: evaluate the final RGCN layer only at the batch's
    # head/tail rows (mathematically exact — see ops/rgcn_final_layer.py).
    # "auto" (default) enables it only when the graph's edge count is >= 6x
    # the batch neighborhood's static capacity: measured on v5e it LOSES at
    # north-star scale (1.7M edges, ratio 3.5: 26.6 vs 24.9 ms/step — the
    # dynamic bookkeeping + uncompacted gathers cost more than the Pallas
    # full-graph layer saves) but WINS 1.71x at full-PrimeKG scale (4.6M
    # edges, ratio 7.4: 128 vs 220 ms/step). "on"/"off" (or True/False)
    # force either path; docs/KERNELS.md records the measurements.
    restrict_final: Any = "auto"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation options (reference: src/evaluate.py:778-837)."""

    batch_size: int = 1024
    num_neg_samples: int = 1
    k_values: Tuple[int, ...] = (10, 50)
    seed: int = 42
    impl: str = "segment"

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["k_values"] = list(self.k_values)
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "EvalConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        if "k_values" in d:
            d["k_values"] = tuple(d["k_values"])
        return cls(**d)


@dataclass(frozen=True)
class ShardConfig:
    """Multi-chip execution layout.

    The reference is strictly single-device (reference: src/train.py:758-761);
    this is greenfield. Edges are partitioned across the ``data`` mesh axis and
    partial per-node aggregations are combined with psum; candidate batches are
    data-parallel along the same axis.
    """

    num_devices: int = 1
    mesh_axis: str = "data"
    # "edge": partition edge buckets, replicate node features (fits PrimeKG
    # scale); "node": node-sharded features with halo exchange (large graphs).
    partition: str = "edge"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class DataConfig:
    """Preprocessing options (reference: src/preprocess.py:456-496)."""

    raw_data: str = "data/raw/kg.csv"
    processed_dir: str = "data/processed"
    train_ratio: float = 0.7
    val_ratio: float = 0.15
    test_ratio: float = 0.15
    seed: int = 42
    target_relation: str = "drug-gene"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)
