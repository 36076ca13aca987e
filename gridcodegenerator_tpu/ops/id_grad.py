"""Analytical inverse-dynamics gradient dc/d(q, qd), batched over lanes.

TPU-native re-design of the reference's generated ID-gradient kernel
(``/root/reference/algorithms/_inverse_dynamics_gradient.py``). Structure of
the computation is the same five stages (temp comps; forward dv/du waves;
da/du; df/du; backward df accumulation + S^T extraction), but the data layout
is redesigned for the VPU:

* the reference stores sparsity-compressed gradient columns
  (ancestors+self / ancestors+subtree, ``_inverse_dynamics_gradient.py:61-98``)
  addressed through emitted index maps; here each joint carries DENSE
  ``(6, nv, B)`` column blocks — the column axis rides the vector unit next
  to the batch lanes, sparsity appears as structural zeros, and no gather
  indices exist at all (SURVEY.md §7 hard-part 2: dense is right on TPU for
  nv <= ~40);
* per-column cross products reuse the component-unrolled spatial ops, which
  broadcast over (col, batch) trailing axes unchanged;
* the backward-pass self-column correction uses the general
  ``X^T crf(S) f`` form (valid for prismatic too) instead of the reference's
  revolute-only ``-X^T crm(f) S`` (see reference/oracle.py).

Fixed-base robots (the reference emits floating-base gradients too — slated
for the floating-base round; the gradient chart there is the Lie-algebra
tangent, not raw q).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY, eye2d, gravity_accel, onehot
from .rnea import rnea_bpass, rnea_fpass
from .spatial import (Mcols as _Mcols, Mv, Xcols as _Xcols,
                      XTcols as _XTcols, XTv, Xv, cross_fv, cross_mv,
                      crfS_f, mxS)
from .xforms import all_xmats


def id_grad_inner(
    model: RobotModel,
    Xs: List[jnp.ndarray],
    qd: jnp.ndarray,
    v: List[jnp.ndarray],
    a: List[jnp.ndarray],
    f: List[jnp.ndarray],
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """dc_du (nv, 2*nv, B) given RNEA intermediates (accumulated f)."""
    if model.floating_base:
        raise NotImplementedError(
            "floating-base analytical gradients land with the floating round")
    n = nv = model.n
    B = qd.shape[-1]
    dtype = qd.dtype
    g = gravity_accel(GRAVITY, B, dtype)
    tz = Xs[0][0, 0] * 0.0  # traced zero: materialize constant broadcasts

    # ---- stage 1: temporaries (all-joint parallel) -----------------------
    Iv = [Mv(model.Imat[i], v[i]) for i in range(n)]
    MxXv, MxXa, Mxv, FxvI = [], [], [], []
    for i in range(n):
        p = model.parent[i]
        Xv_p = Xv(Xs[i], v[p]) if p != -1 else None
        Xa_p = Xv(Xs[i], a[p] if p != -1 else g)
        s = model.S_ind[i]
        MxXv.append(mxS(s, Xv_p) if p != -1 else None)
        MxXa.append(mxS(s, Xa_p))
        Mxv.append(mxS(s, v[i]))
        # crf(v) @ I as a (6,6,B) operator: columns are cross_fv(v, I[:,k])
        Icols = [model.Imat[i][:, k][:, None] + tz for k in range(6)]
        FxvI.append(jnp.stack([cross_fv(v[i], col) for col in Icols], axis=1))

    # column-add helper: X + e_col ⊗ val (scatter-free; Mosaic-safe)
    def col_add(D, col, val):
        return D + onehot(col, nv, dtype)[None, :, :] * val[:, None, :]

    # ---- stage 2: forward dv/du waves ------------------------------------
    Dvq: List[jnp.ndarray] = [None] * n   # (6, nv, B) each
    Dvqd: List[jnp.ndarray] = [None] * n
    for lvl in model.bfs_levels:
        for i in lvl:
            p = model.parent[i]
            if p == -1:
                Dq = jnp.zeros((6, nv, B), dtype)
                Dd = jnp.zeros((6, nv, B), dtype)
            else:
                Dq = col_add(_Xcols(Xs[i], Dvq[p]), i, MxXv[i])
                Dd = _Xcols(Xs[i], Dvqd[p])
            Sd = onehot(model.S_ind[i], 6, dtype) + tz  # materialized (6, B)
            Dvq[i] = Dq
            Dvqd[i] = col_add(Dd, i, Sd)

    # ---- stage 3: da/du = crm(dv/du) S qd + self terms + X da_parent/du --
    Daq: List[jnp.ndarray] = [None] * n
    Dad: List[jnp.ndarray] = [None] * n
    for lvl in model.bfs_levels:
        for i in lvl:
            s = model.S_ind[i]
            qdi = qd[i][None]  # broadcast over columns
            Aq = col_add(mxS(s, Dvq[i], qdi), i, MxXa[i])
            Ad = col_add(mxS(s, Dvqd[i], qdi), i, Mxv[i])
            p = model.parent[i]
            if p != -1:
                Aq = Aq + _Xcols(Xs[i], Daq[p])
                Ad = Ad + _Xcols(Xs[i], Dad[p])
            Daq[i], Dad[i] = Aq, Ad

    # ---- stage 4: df/du = crf(dv/du) Iv + I da/du + (crf(v) I) dv/du -----
    Dfq: List[jnp.ndarray] = [None] * n
    Dfd: List[jnp.ndarray] = [None] * n
    for i in range(n):
        Iv_b = Iv[i][:, None, :]  # (6,1,B) broadcasts over columns
        Dfq[i] = (cross_fv(Dvq[i], Iv_b) + _Mcols(model.Imat[i], Daq[i])
                  + _Xcols(FxvI[i], Dvq[i]))
        Dfd[i] = (cross_fv(Dvqd[i], Iv_b) + _Mcols(model.Imat[i], Dad[i])
                  + _Xcols(FxvI[i], Dvqd[i]))

    # ---- stage 5: backward df accumulation + extraction ------------------
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            p = model.parent[i]
            if p == -1:
                continue
            corr = XTv(Xs[i], crfS_f(model.S_ind[i], f[i]))
            Dfq[p] = col_add(Dfq[p] + _XTcols(Xs[i], Dfq[i]), i, corr)
            Dfd[p] = Dfd[p] + _XTcols(Xs[i], Dfd[i])

    dcq = jnp.stack([Dfq[i][model.S_ind[i]] for i in range(n)])   # (nv,nv,B)
    # damping enters the dqd diagonal per row (scalar * one-hot — no
    # lane-to-sublane reshape of the damping vector, Mosaic-safe)
    dcd = jnp.stack([Dfd[i][model.S_ind[i]]
                     + model.damping[i] * onehot(i, nv, dtype)
                     for i in range(n)])
    return jnp.concatenate([dcq, dcd], axis=1)  # (nv, 2nv, B)


def id_grad(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """dc_du = [dc/dq | dc/dqd]: (nv, 2*nv, B)."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    _, f_acc = rnea_bpass(model, Xs, qd, f)
    return id_grad_inner(model, Xs, qd, v, a, f_acc, GRAVITY)
