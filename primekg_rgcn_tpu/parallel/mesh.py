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


def make_mesh_2d(n_dp: int, n_tp: int, dp_axis: str = "dp",
                 axis_name: str = "data",
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D (dp, tp) mesh for hierarchical layouts.

    Lay ``axis_name`` (the table/tensor axis — fat collectives) on ICI and
    ``dp_axis`` (data parallel — one slice-gradient psum) across DCN: the
    device array is (n_dp, n_tp) row-major, so consecutive devices (same
    host/pod) share a tp group.
    """
    if devices is None:
        devices = jax.devices()
    if n_dp * n_tp > len(devices):
        raise ValueError(
            f"requested {n_dp}x{n_tp} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:n_dp * n_tp]).reshape(n_dp, n_tp),
                (dp_axis, axis_name))
