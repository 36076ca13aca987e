"""Direct M^-1: Carpentier analytical inverse, batched over trailing lanes.

TPU-native re-design of the reference's generated Minv kernel
(``/root/reference/algorithms/_direct_minv.py``): reverse-BFS articulated
pass, then the forward pass that is *serial over joints* with growing column
ranges (``_direct_minv.py:364-453``; oracle ``_test.py:191`` "CANNOT BE IN
PARALLEL") — here an unrolled trace-time loop with static column slices.

TPU design choices (SURVEY.md §7 hard-parts 1-2):
  * subtree column updates use static 0/1 masks over dense (nv,) columns
    instead of compressed ranges — dense+masked is lane-friendly and avoids
    gathers; VMEM/HBM headroom is ample for nv <= ~40;
  * all contractions on the 1-dof path are one-hot column selects and
    unrolled elementwise sums (no dot_general) so the identical trace also
    lowers inside Pallas kernels via Mosaic;
  * the floating-base 6x6 D block is inverted with the same lane-major
    pivot-free Gauss-Jordan as everything else (the reference calls its
    ``invert_matrix``, ``_direct_minv.py:104-122``) — floating robots take
    the XLA tier, and ``jnp.linalg.inv`` is avoided there (see ``_inv66``).

Output is the dense symmetric matrix by default; ``dense=False`` returns the
upper-triangular factor exactly as the reference's SYMMETRIC_UPPER layout.
"""

from __future__ import annotations

import functools

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from .common import (S_matrix, const_mat_b, eye_nd, onehot_nd,
                     rowmask_ge, vel_layout)
from .linalg import gj_inverse
from .spatial import XTMX, XTcols, Xcols, XTv, outer6
from .xforms import all_xmats

# einsum pinned to full f32 accumulation: TPU dot_general defaults to
# bf16 MXU precision, unacceptable for dynamics (see ops/xforms.py)
_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def _inv66(D):
    """Batched 6x6 inverse: (6, 6, B) -> (6, 6, B), lane-major Gauss-Jordan.

    The articulated/composite base inertia block is SPD, so the pivot-free
    reduction is valid (same assumption as the reference's
    ``invert_matrix``, ``_direct_minv.py:104-122``). NOT ``jnp.linalg.inv``
    on (B, 6, 6): XLA-TPU lowers tiny batched LU to a sequential
    dynamic-slice loop — measured 1.7-2.5 ms/call at B=1024 (~300x the
    whole fixed-base kernel) before the r4 switch; gj stays fused on the
    VPU lanes."""
    return gj_inverse(D)


def minv_factors(model: RobotModel, q: jnp.ndarray, Xs=None):
    """Run both passes; returns (Minv_upper (nv, nv, B), extras dict).

    extras carries U, Dinv, F, Xs for reuse by FD/ABA-adjacent compositions.
    """
    n, nv = model.n, model.num_vel
    if Xs is None:
        Xs = all_xmats(model, q)
    B = Xs[0].shape[-1]
    bshape = Xs[0].shape[2:]   # trailing batch shape: (B,) or (sub, L)
    nb = len(bshape)
    dtype = Xs[0].dtype
    vl = vel_layout(model)

    # subtree masks over velocity columns, (nv, 1...) each — synthesized
    # in-trace from the STATIC subtree index sets (broadcasted_iota sums),
    # so no loaded constant ever needs rank expansion (Mosaic-safe at any
    # batch rank) and the mask costs no kernel input
    def _smask(i):
        sel = set()
        for j in model.subtree[i]:
            off_j, d_j = vl[j]
            sel.update(range(off_j, off_j + d_j))
        m = onehot_nd(min(sel), nv, dtype, 1 + nb)
        for r in sorted(sel)[1:]:
            m = m + onehot_nd(r, nv, dtype, 1 + nb)
        return m

    sub_mask = [_smask(i) for i in range(n)]

    def oh1(k, size):
        return onehot_nd(k, size, dtype, 1 + nb)       # (size, 1...)

    def oh2(k, size):
        return onehot_nd(k, size, dtype, 2 + nb)       # (size, 1, 1...)

    Minv = jnp.zeros((nv, nv) + bshape, dtype)
    F: List[Optional[jnp.ndarray]] = [None] * n  # per joint (6, nv, B...)
    U: List[Optional[jnp.ndarray]] = [None] * n
    Dinv: List[Optional[jnp.ndarray]] = [None] * n
    # traced zero: materializes constant broadcasts so Mosaic lays them out
    # as real vectors (a constant-zero add would be folded away)
    tz = Xs[0][0, 0] * 0.0
    IA = [const_mat_b(model.Imat[i].astype(dtype), tz) for i in range(n)]

    def zeros_F():
        return jnp.zeros((6, nv) + bshape, dtype)

    # ---- backward pass (reverse BFS waves) -------------------------------
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            off, d = vl[i]
            p = model.parent[i]
            if F[i] is None:
                F[i] = zeros_F()
            if d == 1:
                s = model.S_ind[i]
                Ui = IA[i][:, s]                      # (6, B)
                Dinv_i = 1.0 / Ui[s]                  # (B,)
                U[i], Dinv[i] = Ui, Dinv_i
                row = -Dinv_i * F[i][s] * sub_mask[i]           # (nv, B...)
                row = row + oh1(off, nv) * Dinv_i
                Minv = Minv + oh2(off, nv) * row[None]
                if p != -1:
                    Fi = F[i] + (Ui[:, None] * Minv[off][None]
                                 * sub_mask[i][None])
                    F[i] = Fi
                    if F[p] is None:
                        F[p] = zeros_F()
                    F[p] = F[p] + XTcols(Xs[i], Fi)
                    Ia = IA[i] - outer6(Ui * Dinv_i, Ui)
                    IA[p] = IA[p] + XTMX(Xs[i], Ia)
            else:  # floating 6-dof block (XLA path)
                S = jnp.asarray(S_matrix(model, i), dtype)
                Ui = _es("ijb,jk->ikb", IA[i], S)
                Di = _es("jk,jlb->klb", S, Ui)
                Dinv_i = _inv66(Di)
                U[i], Dinv[i] = Ui, Dinv_i
                SF = _es("jk,jcb->kcb", S, F[i])
                rows = -_es("klb,lcb->kcb", Dinv_i, SF)
                rows = rows * sub_mask[i][None]
                # keep the SYMMETRIC_UPPER convention: store only the upper
                # triangle of the (symmetric) diagonal block, else densify
                # would double its off-diagonals
                triu = jnp.asarray(np.triu(np.ones((d, d))), dtype)[:, :, None]
                rows = rows.at[:, off:off + d].add(Dinv_i * triu)
                Minv = Minv.at[off:off + d].add(rows)
                if p != -1:
                    Fi = F[i] + _es(
                        "ikb,kcb->icb", Ui,
                        Minv[off:off + d]) * sub_mask[i][None]
                    F[i] = Fi
                    if F[p] is None:
                        F[p] = zeros_F()
                    F[p] = F[p] + XTcols(Xs[i], Fi)
                    UDUt = _es("ikb,klb,jlb->ijb", Ui, Dinv_i, Ui)
                    IA[p] = IA[p] + XTMX(Xs[i], IA[i] - UDUt)

    # ---- forward pass (serial over joints; full-width compute masked to the
    # growing column range, scatter-free) -----------------------------------
    for i in range(n):
        off, d = vl[i]
        p = model.parent[i]
        if d == 1:
            s = model.S_ind[i]
            cmask = rowmask_ge(off, nv, dtype, 1 + nb)  # (nv,1...) >= off
            if p != -1:
                UX = XTv(Xs[i], U[i])                 # (6, B) row U^T X
                contr = UX[0][None] * F[p][0]
                for j in range(1, 6):
                    contr = contr + UX[j][None] * F[p][j]
                delta = -Dinv[i] * contr * cmask      # (nv, B...)
                Minv = Minv + oh2(off, nv) * delta[None]
                Fi_new = Xcols(Xs[i], F[p])
            else:
                Fi_new = jnp.zeros((6, nv) + bshape, dtype)
            Fi_new = Fi_new + oh2(s, 6) * Minv[off][None]
            F[i] = F[i] * (1.0 - cmask)[None] + Fi_new * cmask[None]
        else:
            cols = slice(off, nv)
            S = jnp.asarray(S_matrix(model, i), dtype)
            if p != -1:
                UX = _es("ikb,ijb->kjb", U[i], Xs[i])
                corr = _es("klb,ljb,jcb->kcb",
                                  Dinv[i], UX, F[p][:, cols])
                Minv = Minv.at[off:off + d, cols].add(-corr)
                Fi_new = (_es("jk,kcb->jcb", S, Minv[off:off + d, cols])
                          + Xcols(Xs[i], F[p][:, cols]))
            else:
                Fi_new = _es("jk,kcb->jcb", S, Minv[off:off + d, cols])
            F[i] = F[i].at[:, cols].set(Fi_new)

    extras = dict(U=U, Dinv=Dinv, F=F, Xs=Xs)
    return Minv, extras


def densify(Minv_upper: jnp.ndarray) -> jnp.ndarray:
    """Mirror the upper triangle into the lower (reference ``test_densify_Minv``).

    Implemented as M + M^T - diag(M) on the upper factor — pure elementwise
    (Pallas-compatible), no index scatter.
    """
    nv = Minv_upper.shape[0]
    eye = eye_nd(nv, Minv_upper.dtype, Minv_upper.ndim)
    return (Minv_upper + jnp.swapaxes(Minv_upper, 0, 1)
            - Minv_upper * eye)


def minv(model: RobotModel, q: jnp.ndarray, dense: bool = True,
         Xs=None) -> jnp.ndarray:
    """M(q)^-1: (nv, nv, B); symmetric dense or upper-triangular factor."""
    Mu, _ = minv_factors(model, q, Xs=Xs)
    return densify(Mu) if dense else Mu
