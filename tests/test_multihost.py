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


@pytest.mark.timeout(600)
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
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, err[-2000:]

    ref = np.load(tmp_path / "drill_p0_solo.npz")
    mh0 = np.load(tmp_path / "drill_p0_mh.npz")
    mh1 = np.load(tmp_path / "drill_p1_mh.npz")
    assert float(ref["loss"]) == pytest.approx(float(mh0["loss"]), rel=1e-5)
    for k in ("0", "1"):
        np.testing.assert_allclose(ref[k], mh0[k], rtol=2e-6, atol=2e-7)
    for k in ("2", "3"):
        np.testing.assert_allclose(ref[k], mh1[k], rtol=2e-6, atol=2e-7)
