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

import functools

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .common import S_matrix, const_mat_b, eye_nd, vel_layout
from .spatial import XTMX, XTv
from .xforms import all_xmats

# einsum pinned to full f32 accumulation: TPU dot_general defaults to
# bf16 MXU precision, unacceptable for dynamics (see ops/xforms.py)
_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def crba(model: RobotModel, q: jnp.ndarray, Xs=None) -> jnp.ndarray:
    """M(q): (nv, nv, B) dense symmetric mass matrix."""
    n, nv = model.n, model.num_vel
    if Xs is None:
        Xs = all_xmats(model, q)
    B = Xs[0].shape[-1]
    dtype = Xs[0].dtype
    vl = vel_layout(model)

    bshape = Xs[0].shape[2:]
    tz = Xs[0][0, 0] * 0.0  # traced zero: materialize constant broadcasts
    Ic = [const_mat_b(model.Imat[i].astype(dtype), tz) for i in range(n)]
    for lvl in reversed(model.bfs_levels):
        for i in lvl:
            p = model.parent[i]
            if p != -1:
                Ic[p] = Ic[p] + XTMX(Xs[i], Ic[i])

    if all(d == 1 for _, d in vl):
        # scatter-free column-stack construction: column i holds entries at
        # ancestors+self (rows j <= i, upper triangle), mirrored elementwise
        zero = jnp.zeros(bshape, dtype)
        cols = []
        for i in range(n):
            s_i = model.S_ind[i]
            fh = Ic[i][:, s_i]                        # (6, B)
            entries = {i: fh[s_i]}
            j = i
            while model.parent[j] != -1:
                fh = XTv(Xs[j], fh)
                j = model.parent[j]
                entries[j] = fh[model.S_ind[j]]
            cols.append(jnp.stack([entries.get(r, zero) for r in range(n)]))
        Mu = jnp.stack(cols, axis=1)                  # (nv, nv, B...) upper
        eye = eye_nd(nv, dtype, Mu.ndim)
        return Mu + jnp.swapaxes(Mu, 0, 1) - Mu * eye

    # floating-base general path (XLA only)
    M = jnp.zeros((nv, nv, B), dtype)
    for i in range(n):
        off_i, d_i = vl[i]
        S_i = jnp.asarray(S_matrix(model, i), dtype)
        fh = _es("ijb,jk->ikb", Ic[i], S_i)
        diag = _es("jk,jlb->klb", S_i, fh)
        M = M.at[off_i:off_i + d_i, off_i:off_i + d_i].set(diag)
        j = i
        while model.parent[j] != -1:
            fh = _es("jib,jkb->ikb", Xs[j], fh)
            j = model.parent[j]
            off_j, d_j = vl[j]
            S_j = jnp.asarray(S_matrix(model, j), dtype)
            blk = _es("jk,jlb->klb", S_j, fh)
            M = M.at[off_j:off_j + d_j, off_i:off_i + d_i].set(blk)
            M = M.at[off_i:off_i + d_i, off_j:off_j + d_j].set(
                jnp.swapaxes(blk, 0, 1))
    return M
