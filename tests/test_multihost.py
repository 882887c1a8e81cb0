"""Multi-host validation without a pod: 2 OS processes, 2 CPU devices each,
XLA cross-process collectives over Gloo (the same jax.distributed path a
real pod uses). The zero3 sampled step must match the single-process
4-device run exactly — fetch psum_scatter, cotangent all-gather, loss
psums, and the slice-local adam update all cross a process boundary.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "multihost_drill.py"


def test_two_process_zero3_matches_single_process(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO),
               DRILL_COORD="localhost:23987")
    # Drop the parent's forced single-platform config; the drill sets its
    # own device counts.
    env.pop("XLA_FLAGS", None)

    solo = subprocess.run(
        [sys.executable, str(SCRIPT), "solo", "1", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=280)
    assert solo.returncode == 0, solo.stderr[-2000:]

    procs = [subprocess.Popen(
        [sys.executable, str(SCRIPT), str(i), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    try:
        for p in procs:
            out, err = p.communicate(timeout=280)
            assert p.returncode == 0, err[-2000:]
    finally:
        # A hung rendezvous must not leave the sibling rank alive (the
        # per-process communicate timeouts bound the wait; this bounds the
        # cleanup — no pytest-timeout plugin exists in this environment).
        for p in procs:
            if p.poll() is None:
                p.kill()

    ref = np.load(tmp_path / "drill_p0_solo.npz")
    mh0 = np.load(tmp_path / "drill_p0_mh.npz")
    mh1 = np.load(tmp_path / "drill_p1_mh.npz")
    assert float(ref["loss"]) == pytest.approx(float(mh0["loss"]), rel=1e-5)
    for k in ("0", "1"):
        np.testing.assert_allclose(ref[k], mh0[k], rtol=2e-6, atol=2e-7)
    for k in ("2", "3"):
        np.testing.assert_allclose(ref[k], mh1[k], rtol=2e-6, atol=2e-7)


def test_distributed_cli_matches_single_process(tmp_path):
    """train.cli --distributed across 2 processes == the same run on one
    process with the same 4-device mesh, bit-for-bit (val-loss history).
    Regression: the distributed init must run BEFORE graph building — a
    late init silently no-ops (backend already live) and each process
    trains an independent local-mesh run."""
    base = [sys.executable, "-m", "primekg_rgcn_tpu.train.cli",
            "--synthetic", "--synthetic_scale", "0.02", "--epochs", "2",
            "--batch_size", "64", "--embedding_dim", "8",
            "--hidden_dim", "8", "--shard", "edge"]

    def env(ndev):
        e = dict(os.environ, PYTHONPATH=str(REPO), PRIMEKG_FORCE_CPU="1",
                 XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        return e

    solo_dir = tmp_path / "solo"
    r = subprocess.run(base + ["--n_devices", "4", "--output_dir",
                               str(solo_dir)],
                       env=env(4), cwd=tmp_path, capture_output=True,
                       text=True, timeout=280)
    assert r.returncode == 0, r.stderr[-2000:]

    procs = []
    for i in range(2):
        d = tmp_path / f"mh{i}"
        d.mkdir()
        procs.append(subprocess.Popen(
            base + ["--distributed", "--coordinator_address",
                    "localhost:24917", "--num_processes", "2",
                    "--process_id", str(i), "--output_dir", str(d / "out")],
            env=env(2), cwd=d, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    try:
        for p in procs:
            out, err = p.communicate(timeout=280)
            assert p.returncode == 0, err[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    import json

    a = json.loads((tmp_path / "mh0" / "out" / "models" /
                    "final_model.json").read_text())
    b = json.loads((solo_dir / "models" / "final_model.json").read_text())
    # Cross-process collective add-order differs from single-process at
    # float rounding level (~1e-8 per step); everything else must agree.
    for k in ("train_losses", "val_losses", "train_accs", "val_accs"):
        np.testing.assert_allclose(a["history"][k], b["history"][k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    # Rank gating: only process 0 writes checkpoints.
    assert not (tmp_path / "mh1" / "out" / "models" /
                "final_model.json").exists()
