"""Device mesh construction.

The reference is single-device only (reference: src/train.py:758-761, the sole
device logic anywhere); this subsystem is greenfield TPU design: a 1-D mesh
whose axis carries both the edge partition of the graph and the data-parallel
batch split, with XLA collectives (psum) riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``num_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
