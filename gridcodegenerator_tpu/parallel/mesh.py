"""Device-mesh helpers for the multi-chip / multi-host layers.

The reference is single-GPU (SURVEY.md §2.7: no distributed communication of
any kind); the multi-chip layer is the north-star extension. Meshes are
standard ``jax.sharding.Mesh``; the scenario axis is the data-parallel axis
("dp"), the knot/horizon axis ("kp") carries the parallel-Riccati time
decomposition.

Multi-host layout (BASELINE.md: ">=80% scaling efficiency, 2-host v5p"):
``make_hybrid_mesh`` places "dp" as the OUTER (slowest-varying, cross-host /
DCN) axis and "kp" inner (within-host / ICI). The only cross-host traffic in
the scenario-tree MPC step is the (n,)-vector consensus ``psum`` — a few
hundred bytes per solve, bandwidth-trivial on DCN — while the latency-bound
log-depth ``ppermute`` rounds of the knot-sharded Riccati reduce stay on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry: initialize the JAX distributed runtime.

    Call once per host process before any jax op (the TPU-pod analog of the
    reference's single-GPU ``init_grid``, ``GRiDCodeGenerator.py:215-250``).
    With no arguments, relies on cluster auto-detection (TPU pod slices and
    standard cloud environments populate the coordinator automatically); on a
    hand-rolled cluster pass the coordinator host:port and process layout.

    No-ops when the runtime is already initialized, so library code may call
    it defensively.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


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


def make_hybrid_mesh(axis_names: Tuple[str, ...] = ("dp", "kp"),
                     kp_size: int = 1,
                     n_devices: Optional[int] = None) -> Mesh:
    """DCN-aware 2-axis mesh: ("dp", "kp") with dp outermost.

    Single-process: a plain reshape of the device list (dp slowest-varying,
    so contiguous ICI neighbors share a kp group). Multi-process (one process
    per host): ``mesh_utils.create_hybrid_device_mesh`` keeps each host's
    devices in one dp slice, so the kp ``ppermute`` chains never cross DCN
    and dp collectives reduce hierarchically (ICI within host, DCN across).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    ndev = len(devs)
    assert ndev % kp_size == 0, (ndev, kp_size)
    dp_size = ndev // kp_size
    n_hosts = jax.process_count()
    if n_hosts > 1 and n_devices is None:
        from jax.experimental import mesh_utils

        per_host = ndev // n_hosts
        assert per_host % kp_size == 0, (
            "kp (ICI) axis must fit within one host", kp_size, per_host)
        assert dp_size % n_hosts == 0, (dp_size, n_hosts)
        # The DCN granule must tile dcn_mesh_shape=(n_hosts, 1): use TPU
        # slice_index when the devices actually span n_hosts slices
        # (multislice pods), else fall back to one-granule-per-process
        # (multi-host single slice, and the multi-process CPU proof
        # harness benchmarks/multihost.py, where every device reports
        # slice_index 0).
        n_slices = len({getattr(d, "slice_index", None) for d in devs})
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp_size // n_hosts, kp_size),   # per-host (ICI)
            dcn_mesh_shape=(n_hosts, 1),                # dp spans DCN
            devices=devs, process_is_granule=(n_slices != n_hosts))
    else:
        arr = np.asarray(devs).reshape(dp_size, kp_size)
    return Mesh(arr, axis_names)


def dp_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """NamedSharding that splits array axis ``axis`` across the dp mesh
    axis (and any further mesh axes jointly, for multi-axis meshes)."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names if len(mesh.axis_names) > 1 else "dp"
    return NamedSharding(mesh, P(*spec))
