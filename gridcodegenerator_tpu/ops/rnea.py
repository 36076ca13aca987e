"""RNEA inverse dynamics, batched over trailing lanes.

TPU-native re-design of the reference's generated ID kernel
(``/root/reference/algorithms/_inverse_dynamics.py:33-321``): the BFS-wave
forward pass, the all-joints-parallel body-force stage, and the backward
force accumulation all unroll at trace time over the static topology; the
CUDA thread-parallel loops become (6, B) lane ops and the repeated-parent
``atomicAdd`` becomes an associative tree of adds (XLA is race-free by
construction — SURVEY.md §5).

Variants mirror the reference's four inner templates
(``_inverse_dynamics.py:514-519``): with/without qdd, and ``_vaf`` exposing
(v, a, f) for the gradient pass.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY, e_vec, gravity_accel, vel_layout
from .spatial import Xv, XTv, cross_fv, cross_mv, Mv, mxS
from .xforms import all_xmats


def rnea_fpass(
    model: RobotModel,
    Xs: List[jnp.ndarray],
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray],
    GRAVITY: float = DEFAULT_GRAVITY,
) -> Tuple[list, list, list]:
    """Forward pass -> per-joint lists of (6, B) v, a, f."""
    B = qd.shape[-1]
    g = gravity_accel(GRAVITY, B, qd.dtype)
    vl = vel_layout(model)
    v: List[jnp.ndarray] = [None] * model.n
    a: List[jnp.ndarray] = [None] * model.n
    f: List[jnp.ndarray] = [None] * model.n
    for lvl in model.bfs_levels:
        for i in lvl:
            off, d = vl[i]
            p = model.parent[i]
            if d == 1:
                vJ = e_vec(model.S_ind[i], qd[off])
            else:
                vJ = qd[off:off + 6]
            if p == -1:
                v[i] = vJ
                a[i] = Xv(Xs[i], g)
            else:
                v[i] = Xv(Xs[i], v[p]) + vJ
                a[i] = Xv(Xs[i], a[p]) + cross_mv(v[i], vJ)
            if qdd is not None:
                if d == 1:
                    a[i] = a[i] + e_vec(model.S_ind[i], qdd[off])
                else:
                    a[i] = a[i] + qdd[off:off + 6]
    for i in range(model.n):
        Iv = Mv(model.Imat[i], v[i])
        Ia = Mv(model.Imat[i], a[i])
        f[i] = Ia + cross_fv(v[i], Iv)
    return v, a, f


def rnea_bpass(
    model: RobotModel,
    Xs: List[jnp.ndarray],
    qd: jnp.ndarray,
    f: List[jnp.ndarray],
) -> Tuple[jnp.ndarray, list]:
    """Backward pass -> (c (num_vel, B), accumulated per-joint forces)."""
    f = list(f)
    vl = vel_layout(model)
    c_rows: List[jnp.ndarray] = [None] * model.n
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            p = model.parent[i]
            if p != -1:
                f[p] = f[p] + XTv(Xs[i], f[i])
    for i in range(model.n):
        off, d = vl[i]
        if d == 1:
            c_rows[i] = (f[i][model.S_ind[i]]
                         + model.damping[i] * qd[off])[None]
        else:
            c_rows[i] = f[i]
    return jnp.concatenate(c_rows, axis=0), f


def rnea(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """c(q, qd[, qdd]): (num_vel, B) joint torques/forces."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    c, _ = rnea_bpass(model, Xs, qd, f)
    return c


def rnea_vaf(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
):
    """The ``_vaf`` variant: returns (c, v, a, f_accumulated, Xs) for the
    gradient pass (reference ``inverse_dynamics_inner_vaf``)."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    c, f_acc = rnea_bpass(model, Xs, qd, f)
    return c, v, a, f_acc, Xs
