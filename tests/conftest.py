"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so that every sharding /
collective path is exercised without TPU pod hardware, per the multi-host test
strategy in SURVEY.md §4. Environment must be set before jax is imported
anywhere, hence the os.environ writes at module import time.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The hosted axon TPU plugin registers itself via sitecustomize and pins
# JAX_PLATFORMS=axon; the env var alone cannot force CPU. The config update
# below must happen after `import jax` but before any backend initialization.
import jax  # noqa: E402

if os.environ.get("PRIMEKG_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = Path("/root/reference/data/processed")


@pytest.fixture(scope="session")
def tiny_graph():
    """Small random heterogeneous graph shared across op/model tests."""
    from primekg_rgcn_tpu.data.graph import build_rel_graph

    rng = np.random.default_rng(0)
    num_nodes, num_relations, num_edges = 50, 3, 400
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    rel = rng.integers(0, num_relations, num_edges)
    graph = build_rel_graph(src, dst, rel, num_nodes, num_relations,
                            bucket_pad_multiple=32)
    return {"graph": graph, "src": src, "dst": dst, "rel": rel,
            "num_nodes": num_nodes, "num_relations": num_relations}


@pytest.fixture(scope="session")
def reference_artifacts_available():
    return (REFERENCE_DATA / "val_data.pt").exists()
