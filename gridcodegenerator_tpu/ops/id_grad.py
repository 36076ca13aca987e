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

Floating-base robots use :func:`id_grad_seeded`: the same analytical
derivative obtained by JVP-seeding the RNEA through the joint transforms,
with the base's six derivative directions taken in the body-frame tangent
chart (``dX = -crm(e_j) X`` per direction — the chart under which the
reference's floating-base gradient emits ``dv/dq = 0`` at the base and
``mx_j(X a_parent)`` self-terms, ``_inverse_dynamics_gradient.py:206-258``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .common import (DEFAULT_GRAVITY, eye_nd, gravity_accel,
                     onehot_nd)
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
    return_stages: bool = False,
) -> jnp.ndarray:
    """dc_du (nv, 2*nv, B) given RNEA intermediates (accumulated f).

    Floating base: the base joint contributes a 6-wide column block
    (columns 0..5) in the body-frame tangent chart — ``dv/dq = 0`` at the
    base, ``da0/dq_j = mx_j(X g)`` self terms, and the base's six torque
    rows extracted whole, mirroring the reference's floating branches
    (``_inverse_dynamics_gradient.py:206-230,308,383,450,500,543``)."""
    from .common import vel_layout

    n = model.n
    nv = model.num_vel
    vl = vel_layout(model)
    B = qd.shape[-1]
    bshape = qd.shape[1:]   # trailing batch shape: (B,) or (sub, L)
    nb = len(bshape)
    dtype = qd.dtype
    g = gravity_accel(GRAVITY, B, dtype, 1 + nb)
    tz = Xs[0][0, 0] * 0.0  # traced zero: materialize constant broadcasts

    # ---- stage 1: temporaries (all-joint parallel) -----------------------
    Iv = [Mv(model.Imat[i], v[i]) for i in range(n)]
    MxXv, MxXa, Mxv, FxvI = [], [], [], []
    for i in range(n):
        p = model.parent[i]
        _, d = vl[i]
        Xv_p = Xv(Xs[i], v[p]) if p != -1 else None
        Xa_p = Xv(Xs[i], a[p] if p != -1 else g)
        if d == 1:
            s = model.S_ind[i]
            MxXv.append(mxS(s, Xv_p) if p != -1 else None)
            MxXa.append(mxS(s, Xa_p))
            Mxv.append(mxS(s, v[i]))
        else:  # floating base: six tangent directions; a0 = X g has no
            #    crm(v) vJ term, so there is no Mx(v) self contribution
            MxXv.append(None)
            MxXa.append(jnp.stack([mxS(j, Xa_p) for j in range(6)], axis=1))
            Mxv.append(None)
        # crf(v) @ I as a (6,6,B) operator: columns are cross_fv(v, I[:,k])
        if nb == 1:   # flat batch: vectorized column broadcast
            Icols = [model.Imat[i][:, k][:, None] + tz for k in range(6)]
        else:         # 2-D tiles: scalar extracts (rank-free)
            Icols = [jnp.stack([model.Imat[i][r, k] + tz
                                for r in range(6)]) for k in range(6)]
        FxvI.append(jnp.stack([cross_fv(v[i], col) for col in Icols], axis=1))

    # column-add helpers: X + e_col ⊗ val (scatter-free; Mosaic-safe)
    def col_add(D, col, val):
        oh = onehot_nd(col, nv, dtype, 2 + nb)   # (nv, 1, 1...)
        return D + jnp.swapaxes(oh, 0, 1) * val[:, None]

    def col_put6(D, start, val6):  # val6 (6, 6, B) into columns start..start+5
        for j in range(6):
            D = col_add(D, start + j, val6[:, j])
        return D

    # ---- stage 2: forward dv/du waves ------------------------------------
    Dvq: List[jnp.ndarray] = [None] * n   # (6, nv, B) each
    Dvqd: List[jnp.ndarray] = [None] * n
    for lvl in model.bfs_levels:
        for i in lvl:
            p = model.parent[i]
            off, d = vl[i]
            if p == -1:
                Dq = jnp.zeros((6, nv) + bshape, dtype)
                Dd = jnp.zeros((6, nv) + bshape, dtype)
            else:
                Dq = col_add(_Xcols(Xs[i], Dvq[p]), off, MxXv[i])
                Dd = _Xcols(Xs[i], Dvqd[p])
            Dvq[i] = Dq
            if d == 1:
                Sd = onehot_nd(model.S_ind[i], 6, dtype, 1 + nb) + tz
                Dvqd[i] = col_add(Dd, off, Sd)
            else:  # dv0/dqd = S = I6
                Dvqd[i] = col_put6(Dd, off, eye_nd(6, dtype, 2 + nb) + tz)

    # ---- stage 3: da/du = crm(dv/du) S qd + self terms + X da_parent/du --
    Daq: List[jnp.ndarray] = [None] * n
    Dad: List[jnp.ndarray] = [None] * n
    for lvl in model.bfs_levels:
        for i in lvl:
            off, d = vl[i]
            if d == 6:  # base: a0 = X(q) g (+ const qdd) — only MxXa terms
                Daq[i] = col_put6(jnp.zeros((6, nv) + bshape, dtype), off,
                                  MxXa[i])
                Dad[i] = jnp.zeros((6, nv) + bshape, dtype)
                continue
            s = model.S_ind[i]
            qdi = qd[off][None]  # broadcast over columns
            Aq = col_add(mxS(s, Dvq[i], qdi), off, MxXa[i])
            Ad = col_add(mxS(s, Dvqd[i], qdi), off, Mxv[i])
            p = model.parent[i]
            if p != -1:
                Aq = Aq + _Xcols(Xs[i], Daq[p])
                Ad = Ad + _Xcols(Xs[i], Dad[p])
            Daq[i], Dad[i] = Aq, Ad

    # ---- stage 4: df/du = crf(dv/du) Iv + I da/du + (crf(v) I) dv/du -----
    Dfq: List[jnp.ndarray] = [None] * n
    Dfd: List[jnp.ndarray] = [None] * n
    for i in range(n):
        Iv_b = Iv[i][:, None]  # (6,1,B...) broadcasts over columns
        Dfq[i] = (cross_fv(Dvq[i], Iv_b) + _Mcols(model.Imat[i], Daq[i])
                  + _Xcols(FxvI[i], Dvq[i]))
        Dfd[i] = (cross_fv(Dvqd[i], Iv_b) + _Mcols(model.Imat[i], Dad[i])
                  + _Xcols(FxvI[i], Dvqd[i]))

    # ---- stage 5: backward df accumulation + extraction ------------------
    Dfq_body, Dfd_body = list(Dfq), list(Dfd)  # pre-accumulation snapshot
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            p = model.parent[i]
            if p == -1:
                continue
            off, _ = vl[i]
            corr = XTv(Xs[i], crfS_f(model.S_ind[i], f[i]))
            Dfq[p] = col_add(Dfq[p] + _XTcols(Xs[i], Dfq[i]), off, corr)
            Dfd[p] = Dfd[p] + _XTcols(Xs[i], Dfd[i])

    dcq_rows, dcd_rows = [], []
    for i in range(n):
        off, d = vl[i]
        if d == 6:  # base torque rows come out whole
            dcq_rows.append(Dfq[i])
            dcd_rows.append(Dfd[i])
        else:
            dcq_rows.append(Dfq[i][model.S_ind[i]][None])
            # damping enters the dqd diagonal per row (scalar * one-hot — no
            # lane-to-sublane reshape of the damping vector, Mosaic-safe)
            dcd_rows.append((Dfd[i][model.S_ind[i]]
                             + model.damping[i]
                             * onehot_nd(off, nv, dtype, 1 + nb))[None])
    dcq = jnp.concatenate(dcq_rows, axis=0)   # (nv, nv, B)
    dcd = jnp.concatenate(dcd_rows, axis=0)
    dc_du = jnp.concatenate([dcq, dcd], axis=1)  # (nv, 2nv, B)
    if return_stages:
        # staged-dump hook (utils/debug.py, the reference's DEBUG_MODE
        # analog for this kernel, _inverse_dynamics_gradient.py:100-171)
        stages = {
            "dv_dq": jnp.stack(Dvq), "dv_dqd": jnp.stack(Dvqd),
            "da_dq": jnp.stack(Daq), "da_dqd": jnp.stack(Dad),
            "df_dq_body": jnp.stack(Dfq_body),
            "df_dqd_body": jnp.stack(Dfd_body),
            "df_dq": jnp.stack(Dfq), "df_dqd": jnp.stack(Dfd),
            "dc_du": dc_du,
        }
        return dc_du, stages
    return dc_du


def id_grad_seeded(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
    Xs: Optional[List[jnp.ndarray]] = None,
) -> jnp.ndarray:
    """dc_du by JVP-seeding RNEA through the joint transforms (floating-base
    capable).

    Each configuration column seeds the owning joint's transform with its
    chart tangent ``dX = crm(X[:,c]) e_j`` per column c (equivalently
    ``-crm(e_j) X``): for 1-dof joints j is the joint axis (identical math
    to :func:`id_grad_inner` — parity-tested), for the floating base j runs
    over all six body-frame directions. Velocity columns seed ``qd``
    directly. Derivatives are taken at fixed ``qdd`` (the dc_du semantics).
    """
    from .common import vel_layout

    n, nv = model.n, model.num_vel
    if Xs is None:
        Xs = all_xmats(model, q)
    vl = vel_layout(model)

    def c_of(Xs_t, qd_):
        v, a, f = rnea_fpass(model, list(Xs_t), qd_, qdd, GRAVITY)
        c, _ = rnea_bpass(model, list(Xs_t), qd_, f)
        return c

    Xs_t = tuple(Xs)
    zX = tuple(jnp.zeros_like(X) for X in Xs)
    zqd = jnp.zeros_like(qd)
    rows = jnp.arange(nv, dtype=jnp.int32)
    cols = []
    for i in range(n):  # dc/dq columns (chart tangents)
        _, d = vl[i]
        dirs = range(6) if d == 6 else [model.S_ind[i]]
        for j in dirs:
            tX = list(zX)
            tX[i] = mxS(j, Xs[i])
            _, t = jax.jvp(c_of, (Xs_t, qd), (tuple(tX), zqd))
            cols.append(t)
    for col in range(nv):  # dc/dqd columns
        tqd = jnp.broadcast_to(
            (rows == col).astype(qd.dtype)[:, None], qd.shape)
        _, t = jax.jvp(c_of, (Xs_t, qd), (zX, tqd))
        cols.append(t)
    return jnp.stack(cols, axis=1)  # (nv, 2nv, B)


def id_grad(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """dc_du = [dc/dq | dc/dqd]: (nv, 2*nv, B).

    Floating base: q-columns are body-frame tangent directions (local
    chart), matching the reference's floating-base gradient columns."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    _, f_acc = rnea_bpass(model, Xs, qd, f)
    return id_grad_inner(model, Xs, qd, v, a, f_acc, GRAVITY)
