"""Device-mesh helpers for the multi-chip layers.

The reference is single-GPU (SURVEY.md §2.7: no distributed communication of
any kind); the multi-chip layer is the north-star extension. Meshes are
standard ``jax.sharding.Mesh`` over ICI; the scenario axis is the data
parallel axis ("dp"), with room for a knot axis when the parallel-Riccati
time decomposition is sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("dp",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def dp_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """NamedSharding that splits array axis ``axis`` across the dp mesh axis."""
    spec = [None] * ndim
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))
