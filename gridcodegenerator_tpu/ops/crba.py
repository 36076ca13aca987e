"""CRBA mass matrix, batched over trailing lanes.

TPU-native re-design of the reference's generated CRBA kernel
(``/root/reference/algorithms/_crba.py``): composite-inertia accumulation up
the tree in reverse BFS waves, diagonal extraction, then ancestor-chain walks
for the off-diagonal entries — all unrolled at trace time. Unlike the
reference (which mutates its shared-memory XImats inertia blocks in place,
``_crba.py:117`` — a quirk not replicated per SURVEY.md §7), composite
inertias are functional values here. 1-dof joints use one-hot column selects
(Pallas/Mosaic-compatible); the floating block keeps einsum on the XLA path.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.model import RobotModel
from .common import S_matrix, vel_layout
from .spatial import XTMX, XTv
from .xforms import all_xmats


def crba(model: RobotModel, q: jnp.ndarray, Xs=None) -> jnp.ndarray:
    """M(q): (nv, nv, B) dense symmetric mass matrix."""
    n, nv = model.n, model.num_vel
    if Xs is None:
        Xs = all_xmats(model, q)
    B = Xs[0].shape[-1]
    dtype = Xs[0].dtype
    vl = vel_layout(model)

    Ic = [jnp.broadcast_to(model.Imat[i][:, :, None], (6, 6, B)).astype(dtype)
          for i in range(n)]
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            p = model.parent[i]
            if p != -1:
                Ic[p] = Ic[p] + XTMX(Xs[i], Ic[i])

    M = jnp.zeros((nv, nv, B), dtype)
    for i in range(n):
        off_i, d_i = vl[i]
        if d_i == 1:
            s_i = model.S_ind[i]
            fh = Ic[i][:, s_i]                        # (6, B)
            M = M.at[off_i, off_i].set(fh[s_i])
            j = i
            while model.parent[j] != -1:
                fh = XTv(Xs[j], fh)
                j = model.parent[j]
                off_j, d_j = vl[j]
                if d_j == 1:
                    blk = fh[model.S_ind[j]]          # (B,)
                    M = M.at[off_j, off_i].set(blk)
                    M = M.at[off_i, off_j].set(blk)
                else:
                    M = M.at[off_j:off_j + 6, off_i].set(fh)
                    M = M.at[off_i, off_j:off_j + 6].set(fh)
        else:
            S_i = jnp.asarray(S_matrix(model, i), dtype)
            fh = jnp.einsum("ijb,jk->ikb", Ic[i], S_i)
            diag = jnp.einsum("jk,jlb->klb", S_i, fh)
            M = M.at[off_i:off_i + d_i, off_i:off_i + d_i].set(diag)
            j = i
            while model.parent[j] != -1:
                fh = jnp.einsum("jib,jkb->ikb", Xs[j], fh)
                j = model.parent[j]
                off_j, d_j = vl[j]
                S_j = jnp.asarray(S_matrix(model, j), dtype)
                blk = jnp.einsum("jk,jlb->klb", S_j, fh)
                M = M.at[off_j:off_j + d_j, off_i:off_i + d_i].set(blk)
                M = M.at[off_i:off_i + d_i, off_j:off_j + d_j].set(
                    jnp.swapaxes(blk, 0, 1))
    return M
