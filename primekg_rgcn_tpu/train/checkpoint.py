"""Self-describing checkpoints.

The reference persists a torch pickle holding model+optimizer state, metric
histories and the full argparse namespace, and loaders rebuild the model
architecture from it (reference: src/train.py:418-462, src/evaluate.py:655-730).
Same contract here, framework-native: the parameter/optimizer pytree is
serialized with flax msgpack next to a JSON sidecar carrying the configs and
scalar metadata, so a checkpoint is loadable without knowing the architecture
in advance and stays debuggable with a text editor.

Layout for ``save(path)``:
    path.msgpack  — pytree state (params, opt_state, step)
    path.json     — {"epoch", "best_val_loss", "best_val_acc", "history",
                     "model_config", "train_config"}
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import serialization


def _state_to_host(state):
    """Device -> host snapshot that is multi-process safe.

    In a multi-host run, sharded arrays are only PARTIALLY addressable per
    process — np conversion would throw. Such leaves are first resharded
    to replicated (an XLA all-gather every process participates in), after
    which each process reads its local full copy. Single-process arrays
    take the plain device_get path.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    def one(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            rep = NamedSharding(a.sharding.mesh, PartitionSpec())
            a = jax.jit(lambda x: x, out_shardings=rep)(a)
        return jax.device_get(a)

    return jax.tree_util.tree_map(one, state)


def save(path, payload: Dict[str, Any]) -> None:
    """Write a checkpoint. ``payload`` must contain "state" plus JSON-safe
    metadata fields.

    Both files are written to temporaries and atomically renamed, so a
    SIGKILL mid-save can never leave a torn checkpoint (the kill-and-resume
    drill in tests/test_kill_resume.py relies on this).

    Multi-process: call from EVERY process (the host snapshot may involve
    collectives); only process 0 touches the filesystem.
    """
    path = Path(path)
    state = _state_to_host(payload["state"])
    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(state)
    tmp = path.with_suffix(".msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    tmp.replace(path.with_suffix(".msgpack"))
    meta = {k: v for k, v in payload.items() if k != "state"}
    tmp = path.with_suffix(".json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    tmp.replace(path.with_suffix(".json"))


_async_pool = None
_pending = []


def save_async(path, payload: Dict[str, Any]):
    """Non-blocking :func:`save`.

    The device->host transfer happens NOW (a consistent snapshot —
    subsequent training steps cannot mutate what gets written; donated
    buffers would otherwise be dead by write time), while serialization and
    the disk write run on a single background thread. At 10M-node scale the
    state is gigabytes and a blocking save stalls the step loop for
    seconds; this is the flat-msgpack analogue of Orbax's async checkpoint.
    Returns a future; call :func:`wait_for_saves` (or .result()) to drain —
    the trainer drains at exit and before overwriting the same path.
    """
    global _async_pool
    from concurrent.futures import ThreadPoolExecutor

    if _async_pool is None:
        _async_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save")
    snapshot = dict(payload, state=_state_to_host(payload["state"]))
    fut = _async_pool.submit(save, path, snapshot)
    _pending.append(fut)
    return fut


def wait_for_saves() -> None:
    """Block until every outstanding :func:`save_async` has hit disk (and
    re-raise the first writer error, if any)."""
    global _pending
    pending, _pending = _pending, []
    for fut in pending:
        fut.result()


def _is_torch_checkpoint(path: Path) -> bool:
    """True for a reference ``.pt`` torch pickle (zip or legacy format)."""
    if path.suffix in (".pt", ".pth"):
        return path.is_file()
    if not path.is_file():
        return False
    try:
        with open(path, "rb") as f:
            magic = f.read(2)
    except OSError:
        return False
    # torch.save zip container ("PK") or legacy pickle protocol-2 header.
    return magic in (b"PK", b"\x80\x02")


def _load_torch(path: Path) -> Dict[str, Any]:
    """Route a reference ``.pt`` through torch_interop into the native
    payload shape, so evaluate/analyze CLIs load reference checkpoints in one
    step (the reference's evaluator rebuilds straight from the .pt,
    reference: src/evaluate.py:655-730)."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.torch_interop import import_torch_checkpoint

    params, cfg, meta = import_torch_checkpoint(path)
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

    train_cfg = TrainConfig()
    opt_state = make_optimizer(train_cfg).init(params)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    return {
        "state": state,
        "epoch": meta.get("epoch", 0),
        "best_val_loss": meta.get("best_val_loss", float("inf")),
        "best_val_acc": meta.get("best_val_acc", 0.0),
        "history": {"train_losses": [], "val_losses": [],
                    "train_accs": [], "val_accs": []},
        "model_config": cfg.to_dict(),
        "train_config": train_cfg.to_dict(),
    }


def load(path, example_state: Optional[Any] = None,
         raw: bool = False) -> Dict[str, Any]:
    """Read a checkpoint saved by :func:`save`, or a reference ``.pt``.

    Torch checkpoints are auto-detected (by suffix or file magic) and
    imported via torch_interop, so every loader in the framework accepts a
    reference-trained model directly.

    If ``example_state`` (a pytree of the right structure) is given, the
    restored arrays adopt its exact structure/dtypes; otherwise the model is
    rebuilt from the stored model_config, mirroring the reference's
    shape-driven reconstruction (reference: src/evaluate.py:672-708).

    ``raw=True`` skips template construction entirely and returns the
    msgpack state-dict wrapped in a TrainState — for callers that re-map
    the structure themselves (zero3 resume) it avoids allocating a full
    dense params+optimizer template (2.56 GB params + 5.1 GB adam moments
    at 10M nodes) that would only be discarded.
    """
    # Read-after-write consistency with the async writer: drain any queued
    # save before opening (no-op when nothing is pending).
    wait_for_saves()
    path = Path(path)
    if _is_torch_checkpoint(path):
        return _load_torch(path)
    if path.suffix in (".msgpack", ".json"):
        path = path.with_suffix("")
    with open(path.with_suffix(".json")) as f:
        meta = json.load(f)

    if raw:
        from primekg_rgcn_tpu.train.loop import TrainState

        with open(path.with_suffix(".msgpack"), "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        meta["state"] = TrainState(restored["params"],
                                   restored.get("opt_state"),
                                   jnp.asarray(restored.get("step", 0)))
        return meta

    if example_state is None:
        from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
        from primekg_rgcn_tpu.models.rgcn import init_params
        from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

        model_cfg = ModelConfig.from_dict(meta["model_config"])
        train_cfg = TrainConfig.from_dict(meta.get("train_config", {}))
        params = init_params(jax.random.PRNGKey(0), model_cfg)
        opt_state = make_optimizer(train_cfg).init(params)
        example_state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    with open(path.with_suffix(".msgpack"), "rb") as f:
        blob = f.read()
    try:
        state = serialization.from_bytes(example_state, blob)
    except (ValueError, KeyError):
        # Optimizer-state structure differs from the default-adam template
        # (e.g. ZeRO-1's (rest_state, sharded emb_state) tuple,
        # train/sampled.py). Restore template-free: params keep their exact
        # tree; the raw opt-state dict is enough for evaluation/analysis and
        # is re-placed by the step's shardings if training resumes through
        # a matching trainer.
        from primekg_rgcn_tpu.train.loop import TrainState

        raw = serialization.msgpack_restore(blob)
        state = TrainState(raw["params"], raw.get("opt_state"),
                           jnp.asarray(raw.get("step", 0)))
    meta["state"] = state
    return meta


def load_params_and_config(path):
    """Convenience: (params, ModelConfig) from a checkpoint path."""
    from primekg_rgcn_tpu.config import ModelConfig

    payload = load(path)
    return payload["state"].params, ModelConfig.from_dict(payload["model_config"])
