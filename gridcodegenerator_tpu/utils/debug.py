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


def _np_stages(stages) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in stages.items()}


def _check_stage_capable(model: RobotModel):
    if model.floating_base:
        raise NotImplementedError(
            "staged dumps beyond RNEA are fixed-base (the floating 6-dof "
            "block's per-joint intermediates have mixed shapes)")


def minv_stages(model: RobotModel, q) -> Dict[str, np.ndarray]:
    """Direct-Minv intermediates (lane-major inputs): per-joint U, Dinv,
    final F columns, the SYMMETRIC_UPPER factor and the dense inverse —
    the reference's DEBUG set (``_direct_minv.py:72-79``)."""
    from ..ops.minv import densify, minv_factors

    _check_stage_capable(model)
    Mu, extras = minv_factors(model, q)
    return _np_stages({
        "U": jnp.stack(extras["U"]),          # (n, 6, B)
        "Dinv": jnp.stack(extras["Dinv"]),    # (n, B)
        "F": jnp.stack(extras["F"]),          # (n, 6, nv, B)
        "Minv_upper": Mu,
        "Minv": densify(Mu),
    })


def oracle_minv_stages(topo: RobotTopology, q) -> Dict[str, np.ndarray]:
    """The float64 oracle's Minv intermediates for one sample (same keys)."""
    _, st = _oracle.minv(topo, q, return_stages=True)
    return {k: np.asarray(v)[..., None] for k, v in st.items()}


def id_grad_stages(model: RobotModel, q, qd, qdd=None,
                   GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """ID-gradient intermediates: dv/du, da/du, df/du (body + accumulated)
    and dc_du — the reference's staged DEBUG dumps
    (``_inverse_dynamics_gradient.py:100-171``). Layout (n, 6, nv, B):
    [joint, component, column, lane]."""
    from ..ops.id_grad import id_grad_inner
    from ..ops.rnea import rnea_bpass, rnea_fpass

    _check_stage_capable(model)
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    _, f_acc = rnea_bpass(model, Xs, qd, f)
    _, st = id_grad_inner(model, Xs, qd, v, a, f_acc, GRAVITY,
                          return_stages=True)
    return _np_stages(st)


def oracle_id_grad_stages(topo: RobotTopology, q, qd, qdd=None,
                          GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """The oracle's ID-gradient intermediates for one sample (same keys,
    transposed from the oracle's (6, col, joint) into (joint, 6, col))."""
    _, v, a, f = _oracle.rnea(topo, q, qd, qdd, GRAVITY)
    _, _, st = _oracle.rnea_grad_inner(topo, q, qd, v, a, f, GRAVITY,
                                       return_stages=True)
    out = {}
    for k, arr in st.items():
        if k.startswith(("dv_", "da_", "df_")):
            out[k] = np.transpose(arr, (2, 0, 1))[..., None]
        else:
            out[k] = np.asarray(arr)[..., None]
    return out


def aba_stages(model: RobotModel, q, qd, u,
               GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """ABA intermediates: v, cbias, accumulated pA, U, Dinv, uu, a, qdd —
    the reference's DEBUG sites through ``_aba.py``'s three passes."""
    from ..ops.aba import aba as _aba

    _check_stage_capable(model)
    _, st = _aba(model, q, qd, u, GRAVITY, return_stages=True)
    return _np_stages(st)


def oracle_aba_stages(topo: RobotTopology, q, qd, u,
                      GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """The oracle's ABA intermediates for one sample (same keys)."""
    _, st = _oracle.aba(topo, q, qd, u, GRAVITY, return_stages=True)
    out = {}
    for k, arr in st.items():
        arr = np.asarray(arr)
        if arr.ndim == 2 and arr.shape[0] == 6:  # (6, n) -> (n, 6)
            arr = arr.T
        out[k] = arr[..., None]
    return out


def so_stages(model: RobotModel, q, qd, qdd=None,
              GRAVITY=DEFAULT_GRAVITY) -> Dict[str, np.ndarray]:
    """IDSVA-SO intermediates from the analytical route: forward kinematic
    quantities (v, a, psid, psidd, Sd), composite IC/BC/f, the T1-T4
    vectors, and the stacked output tensors. No independent oracle computes
    these stage-for-stage; localize numerical divergence by diffing against
    an f64 model's stages (``diff_stages(so_stages(m32, ...),
    so_stages(m64, ...))``) — the same per-pass isolation the reference's
    DEBUG dumps provide for its SO kernel (``_idsva_so.py`` stages)."""
    from ..ops.so import idsva_so_analytical

    _check_stage_capable(model)
    _, st = idsva_so_analytical(model, q, qd, qdd, GRAVITY,
                                return_stages=True)
    return _np_stages(st)


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
