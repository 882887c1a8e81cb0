"""Kill-and-resume drill: failure recovery the reference lacks.

Launches a real training run as a subprocess, SIGKILLs it the moment a
periodic checkpoint lands (simulating preemption — the dominant failure mode
on TPU fleets), then resumes from that checkpoint via the CLI's ``--resume``
and verifies the run completes with the full epoch history and a loss
continuing from (not restarting above) the pre-kill trajectory.
(SURVEY.md §5 failure detection/recovery; VERDICT.md round-1 item 10.)
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _cli(out_dir, extra):
    return [sys.executable, "-m", "primekg_rgcn_tpu.train.cli",
            "--synthetic", "--synthetic_scale", "0.02",
            "--batch_size", "64", "--embedding_dim", "8",
            "--hidden_dim", "8", "--save_every", "1", "--seed", "5",
            "--output_dir", str(out_dir)] + extra


@pytest.mark.slow
def test_kill_mid_training_then_resume(tmp_path):
    env = dict(os.environ, PRIMEKG_FORCE_CPU="1",
               PYTHONPATH=str(REPO) + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = tmp_path / "run"
    ckpt_dir = out / "checkpoints"

    # Epoch-granular periodic checkpoints: checkpoint_epoch_N.msgpack.
    proc = subprocess.Popen(_cli(out, ["--epochs", "30"]), env=env,
                            cwd=tmp_path,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 300
        target = None
        while time.time() < deadline:
            snaps = sorted(ckpt_dir.glob("checkpoint_epoch_*.msgpack"))
            # Wait for >= 2 epochs so the resumed run demonstrably continues
            # a stream, then kill hard (no cleanup handler runs).
            if len(snaps) >= 2:
                target = snaps[-1]
                proc.send_signal(signal.SIGKILL)
                break
            if proc.poll() is not None:
                pytest.fail("training exited before any checkpoint")
            time.sleep(0.5)
        assert target is not None, "no periodic checkpoint within timeout"
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()

    # The kill may have raced a later in-progress snapshot; resume from the
    # newest COMPLETE checkpoint (json + msgpack both present).
    complete = [p for p in sorted(ckpt_dir.glob(
        "checkpoint_epoch_*.msgpack"))
        if p.with_suffix(".json").exists()]
    assert complete, "no complete checkpoint survived the kill"
    resume_from = complete[-1].with_suffix("")
    killed_epoch = int(str(resume_from).rsplit("_", 1)[1])

    out2 = tmp_path / "resumed"
    total_epochs = killed_epoch + 2
    r = subprocess.run(
        _cli(out2, ["--epochs", str(total_epochs),
                    "--resume", str(resume_from)]),
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    final_meta = json.loads(
        (out2 / "models" / "final_model.json").read_text())
    assert final_meta["epoch"] == total_epochs
    losses = final_meta["history"]["train_losses"]
    # Resume continues the epoch count: only the remaining epochs run, and
    # the full history (pre-kill + post-resume) is preserved.
    assert len(losses) == total_epochs
    # The resumed segment must continue improving on the restored state, not
    # restart from a fresh init (fresh-init first-epoch loss ~0.693).
    assert losses[-1] < losses[0]


def test_async_save_round_trip_and_drain(tmp_path):
    """save_async writes the same loadable checkpoint as save; the snapshot
    is taken at call time (later state mutations don't leak into the file);
    wait_for_saves drains and surfaces writer errors."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
    from primekg_rgcn_tpu.train.loop import TrainState

    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    state = TrainState(params, {"m": jnp.zeros(8)}, jnp.zeros((), jnp.int32))
    payload = {"epoch": 1, "state": state, "best_val_loss": 0.5,
               "best_val_acc": 0.0, "history": {"train_losses": [0.5]},
               "model_config": {}, "train_config": {}}
    fut = ckpt_lib.save_async(tmp_path / "ck", payload)
    # Mutate AFTER submitting: the file must hold the original values.
    params["w"] = params["w"] * 0
    ckpt_lib.wait_for_saves()
    assert fut.done() and fut.exception() is None

    import json
    meta = json.load(open(tmp_path / "ck.json"))
    assert meta["epoch"] == 1
    from flax import serialization

    raw = serialization.msgpack_restore(
        open(tmp_path / "ck.msgpack", "rb").read())
    np.testing.assert_array_equal(raw["params"]["w"],
                                  np.arange(8, dtype=np.float32))
