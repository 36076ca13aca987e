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
  * the floating-base 6x6 D block is inverted with a batched closed-form
    solve (the reference calls its Gauss-Jordan ``invert_matrix``,
    ``_direct_minv.py:104-122``).

Output is the dense symmetric matrix by default; ``dense=False`` returns the
upper-triangular factor exactly as the reference's SYMMETRIC_UPPER layout.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY, S_matrix, vel_layout
from .spatial import XTMX
from .xforms import all_xmats


def _inv66(D):
    """Batched 6x6 inverse: (6, 6, B) -> (6, 6, B) via linalg on (B, 6, 6)."""
    Db = jnp.moveaxis(D, -1, 0)
    return jnp.moveaxis(jnp.linalg.inv(Db), 0, -1)


def minv_factors(model: RobotModel, q: jnp.ndarray, Xs=None):
    """Run both passes; returns (Minv_upper (nv, nv, B), extras dict).

    extras carries U, Dinv, F, Xs for reuse by FD/ABA-adjacent compositions.
    """
    n, nv = model.n, model.num_vel
    if Xs is None:
        Xs = all_xmats(model, q)
    B = Xs[0].shape[-1]
    dtype = Xs[0].dtype
    vl = vel_layout(model)

    # static subtree masks over velocity columns
    sub_mask = []
    for i in range(n):
        m = np.zeros(nv)
        for j in model.subtree[i]:
            off, d = vl[j]
            m[off:off + d] = 1.0
        sub_mask.append(jnp.asarray(m, dtype)[:, None])  # (nv, 1)

    Minv = jnp.zeros((nv, nv, B), dtype)
    F: List[Optional[jnp.ndarray]] = [None] * n  # per joint (6, nv, B)
    U: List[Optional[jnp.ndarray]] = [None] * n  # (6, d, B)
    Dinv: List[Optional[jnp.ndarray]] = [None] * n  # (d, d, B)
    IA = [jnp.broadcast_to(model.Imat[i][:, :, None], (6, 6, B)).astype(dtype)
          for i in range(n)]

    def zeros_F():
        return jnp.zeros((6, nv, B), dtype)

    # ---- backward pass (reverse BFS waves) -------------------------------
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            off, d = vl[i]
            S = jnp.asarray(S_matrix(model, i), dtype)        # (6, d)
            Ui = jnp.einsum("ijb,jk->ikb", IA[i], S)          # (6, d, B)
            Di = jnp.einsum("jk,jlb->klb", S, Ui)             # (d, d, B)
            Dinv_i = (1.0 / Di) if d == 1 else _inv66(Di)
            U[i], Dinv[i] = Ui, Dinv_i
            if F[i] is None:
                F[i] = zeros_F()
            # Minv rows of joint i: Dinv on the diagonal block, then the
            # subtree correction -Dinv S^T F_i (masked dense columns)
            SF = jnp.einsum("jk,jcb->kcb", S, F[i])           # (d, nv, B)
            rows = -jnp.einsum("klb,lcb->kcb", Dinv_i, SF)    # (d, nv, B)
            rows = rows * sub_mask[i][None, :, 0:1]  # zero outside subtree
            rows = rows.at[:, off:off + d].add(Dinv_i)
            Minv = Minv.at[off:off + d].add(rows)
            p = model.parent[i]
            if p != -1:
                Fi = F[i] + jnp.einsum(
                    "ikb,kcb->icb", Ui, Minv[off:off + d]) * sub_mask[i][None]
                F[i] = Fi
                if F[p] is None:
                    F[p] = zeros_F()
                F[p] = F[p] + jnp.einsum("jib,jcb->icb", Xs[i], Fi)
                UDUt = jnp.einsum("ikb,klb,jlb->ijb", Ui, Dinv_i, Ui)
                IA[p] = IA[p] + XTMX(Xs[i], IA[i] - UDUt)

    # ---- forward pass (serial over joints, static growing slices) --------
    for i in range(n):
        off, d = vl[i]
        S = jnp.asarray(S_matrix(model, i), dtype)
        p = model.parent[i]
        cols = slice(off, nv)
        if p != -1:
            UX = jnp.einsum("ikb,ijb->kjb", U[i], Xs[i])      # (d, 6, B)
            corr = jnp.einsum("klb,ljb,jcb->kcb",
                              Dinv[i], UX, F[p][:, cols])
            Minv = Minv.at[off:off + d, cols].add(-corr)
        Fi_new = jnp.einsum("jk,kcb->jcb", S, Minv[off:off + d, cols])
        if p != -1:
            Fi_new = Fi_new + jnp.einsum("ijb,jcb->icb", Xs[i], F[p][:, cols])
        F[i] = F[i].at[:, cols].set(Fi_new) if F[i] is not None else None
        if F[i] is None:
            F[i] = zeros_F().at[:, cols].set(Fi_new)

    extras = dict(U=U, Dinv=Dinv, F=F, Xs=Xs)
    return Minv, extras


def densify(Minv_upper: jnp.ndarray) -> jnp.ndarray:
    """Mirror the upper triangle into the lower (reference ``test_densify_Minv``)."""
    nv = Minv_upper.shape[0]
    iu = np.triu_indices(nv, 1)
    upper = Minv_upper[iu[0], iu[1]]
    return Minv_upper.at[iu[1], iu[0]].set(upper)


def minv(model: RobotModel, q: jnp.ndarray, dense: bool = True,
         Xs=None) -> jnp.ndarray:
    """M(q)^-1: (nv, nv, B); symmetric dense or upper-triangular factor."""
    Mu, _ = minv_factors(model, q, Xs=Xs)
    return densify(Mu) if dense else Mu
