"""Articulated-body algorithm forward dynamics, batched over trailing lanes.

TPU-native re-design of the reference's generated ABA kernel
(``/root/reference/algorithms/_aba.py``): three passes in BFS waves (bias
velocities/articulated quantities, backward articulated-inertia reduction,
forward acceleration recovery), unrolled at trace time. The reference's
hard-coded ``mx2_scaled`` regardless of joint axis (``_aba.py:123`` — a known
quirk, SURVEY.md §7) is replaced by the correct per-joint S cross product.
Joint damping enters as a bias torque so ABA is the exact inverse of RNEA
with damped joints. 1-dof joints are einsum-free (Pallas/Mosaic-compatible);
the floating block keeps einsum on the XLA path.
"""

from __future__ import annotations

import functools

from typing import List

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .common import (DEFAULT_GRAVITY, S_matrix, const_mat_b, e_vec,
                     gravity_accel, vel_layout)
from .minv import _inv66
from .spatial import Mv, XTMX, XTv, Xv, cross_fv, cross_mv, dot6, outer6
from .xforms import all_xmats

# einsum pinned to full f32 accumulation: TPU dot_general defaults to
# bf16 MXU precision, unacceptable for dynamics (see ops/xforms.py)
_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def aba(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
    Xs=None,
    return_stages: bool = False,
) -> jnp.ndarray:
    """qdd = ABA(q, qd, u): (nv, B)."""
    n = model.n
    if Xs is None:
        Xs = all_xmats(model, q)
    B = Xs[0].shape[-1]
    dtype = Xs[0].dtype
    vl = vel_layout(model)
    g = gravity_accel(GRAVITY, B, dtype, qd.ndim + 1)

    # pass 1: velocities, velocity-product bias, initial articulated force
    v: List[jnp.ndarray] = [None] * n
    cb: List[jnp.ndarray] = [None] * n
    pA: List[jnp.ndarray] = [None] * n
    tz = Xs[0][0, 0] * 0.0  # traced zero: materialize constant broadcasts
    IA = [const_mat_b(model.Imat[i].astype(dtype), tz) for i in range(n)]
    for lvl in model.bfs_levels:
        for i in lvl:
            off, d = vl[i]
            vJ = e_vec(model.S_ind[i], qd[off]) if d == 1 else qd[off:off + 6]
            p = model.parent[i]
            v[i] = vJ if p == -1 else Xv(Xs[i], v[p]) + vJ
            cb[i] = cross_mv(v[i], vJ)
            pA[i] = cross_fv(v[i], Mv(model.Imat[i], v[i]))

    # pass 2: backward articulated reduction
    U: List[jnp.ndarray] = [None] * n
    Dinv: List[jnp.ndarray] = [None] * n
    uu: List[jnp.ndarray] = [None] * n
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            off, d = vl[i]
            p = model.parent[i]
            if d == 1:
                s = model.S_ind[i]
                Ui = IA[i][:, s]                     # (6, B)
                Dinv_i = 1.0 / Ui[s]                 # (B,)
                tau_i = u[off] - model.damping[i] * qd[off]
                uu_i = tau_i - pA[i][s]
                U[i], Dinv[i], uu[i] = Ui, Dinv_i, uu_i
                if p != -1:
                    Ia = IA[i] - outer6(Ui * Dinv_i, Ui)
                    pa = pA[i] + Xv(Ia, cb[i]) + Ui * (Dinv_i * uu_i)
                    IA[p] = IA[p] + XTMX(Xs[i], Ia)
                    pA[p] = pA[p] + XTv(Xs[i], pa)
            else:
                S = jnp.asarray(S_matrix(model, i), dtype)
                Ui = _es("ijb,jk->ikb", IA[i], S)
                Di = _es("jk,jlb->klb", S, Ui)
                Dinv_i = _inv66(Di)
                uu_i = u[off:off + 6] - _es("jk,jb->kb", S, pA[i])
                U[i], Dinv[i], uu[i] = Ui, Dinv_i, uu_i
                if p != -1:
                    Ia = IA[i] - _es("ikb,klb,jlb->ijb", Ui, Dinv_i, Ui)
                    pa = (pA[i] + Xv(Ia, cb[i])
                          + _es("ikb,klb,lb->ib", Ui, Dinv_i, uu_i))
                    IA[p] = IA[p] + XTMX(Xs[i], Ia)
                    pA[p] = pA[p] + XTv(Xs[i], pa)

    # pass 3: forward acceleration recovery
    a: List[jnp.ndarray] = [None] * n
    qdd_rows: List[jnp.ndarray] = [None] * n
    for lvl in model.bfs_levels:
        for i in lvl:
            off, d = vl[i]
            p = model.parent[i]
            a_p = Xv(Xs[i], g if p == -1 else a[p]) + cb[i]
            if d == 1:
                qdd_i = Dinv[i] * (uu[i] - dot6(U[i], a_p))
                a[i] = a_p + e_vec(model.S_ind[i], qdd_i)
                qdd_rows[i] = qdd_i[None]
            else:
                rhs = uu[i] - _es("ikb,ib->kb", U[i], a_p)
                qdd_i = _es("klb,lb->kb", Dinv[i], rhs)
                a[i] = a_p + qdd_i
                qdd_rows[i] = qdd_i
    qdd = jnp.concatenate(qdd_rows, axis=0)
    if return_stages:
        # staged-dump hook (utils/debug.py; reference DEBUG_MODE sites in
        # _aba.py). Fixed-base only: the floating block's U/Dinv/uu have
        # 6-wide shapes that do not stack per joint.
        stages = {
            "v": jnp.stack(v), "cbias": jnp.stack(cb),
            "pA": jnp.stack(pA), "U": jnp.stack(U),
            "Dinv": jnp.stack(Dinv), "uu": jnp.stack(uu),
            "a": jnp.stack(a), "qdd": qdd,
        }
        return qdd, stages
    return qdd
