"""Staged-intermediate debugging: the DEBUG_MODE analog.

The reference threads printf dumps of every intermediate through its kernels
(``DEBUG_MODE``/``NEED_PRINT_MAT``, ``GRiDCodeGenerator.py:58-59,289-306``;
e.g. ``_inverse_dynamics.py:73-83``) to be eye-diffed against the NumPy
oracle prints. Here the same capability is structured: ``*_stages`` return
every intermediate as named arrays, ``print_stages`` renders them like the
oracle's dumps, and ``diff_stages`` automates the diff the reference does by
eye (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from ..ops.common import DEFAULT_GRAVITY
from ..ops.rnea import rnea_bpass, rnea_fpass
from ..ops.xforms import all_xmats
from ..reference import oracle as _oracle
from ..topology.robot import RobotTopology


def rnea_stages(model: RobotModel, q, qd, qdd=None,
                GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """All RNEA intermediates for lane-major inputs: X, v, a, f_body,
    f_accumulated, c — the reference's per-stage dump set."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    c, f_acc = rnea_bpass(model, Xs, qd, f)
    return {
        "X": np.stack([np.asarray(X) for X in Xs]),
        "v": np.stack([np.asarray(x) for x in v]),
        "a": np.stack([np.asarray(x) for x in a]),
        "f_body": np.stack([np.asarray(x) for x in f]),
        "f": np.stack([np.asarray(x) for x in f_acc]),
        "c": np.asarray(c),
    }


def oracle_rnea_stages(topo: RobotTopology, q, qd, qdd=None,
                       GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """The float64 oracle's intermediates for one sample (same keys)."""
    n = topo.get_num_joints()
    v, a, f_body = _oracle.rnea_fpass(topo, q, qd, qdd, GRAVITY)
    c, f_acc = _oracle.rnea_bpass(topo, q, qd, f_body)
    return {
        "X": np.stack([topo.get_Xmat_Func_by_id(i)(q[i])
                       for i in range(n)])[..., None],
        "v": v.T[:, :, None],
        "a": a.T[:, :, None],
        "f_body": f_body.T[:, :, None],
        "f": f_acc.T[:, :, None],
        "c": c[:, None],
    }


def print_stages(stages: Dict[str, np.ndarray], lane: int = 0,
                 precision: int = 4) -> None:
    """Render staged dumps in the reference's per-joint print style."""
    with np.printoptions(precision=precision, suppress=True, linewidth=100):
        for key, arr in stages.items():
            if arr.ndim >= 3:  # per joint
                for i in range(arr.shape[0]):
                    print(f"{key}[{i}] =")
                    print(arr[i, ..., lane])
            else:
                print(f"{key} =")
                print(arr[..., lane] if arr.ndim > 1 else arr)


def diff_stages(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
                atol: float = 1e-5, lane: int = 0) -> Dict[str, float]:
    """Max abs difference per stage; raises nothing — returns the report."""
    report = {}
    for key in a:
        if key not in b:
            continue
        xa = a[key][..., lane] if a[key].ndim > 1 else a[key]
        xb = b[key][..., lane] if b[key].ndim > 1 else b[key]
        xa, xb = np.broadcast_arrays(np.squeeze(xa), np.squeeze(xb))
        report[key] = float(np.abs(xa - xb).max())
    return report
