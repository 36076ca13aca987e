"""Batched joint transform construction: X_i(q_i) for all joints, (n, 6, 6, B).

TPU analog of the reference's ``load_update_XImats_helpers``
(``/root/reference/helpers/_topology_helpers.py:155-331``): where the reference
bakes the constant entries of sympy X(q) matrices and rewrites only the
sin/cos-dependent ones per knot, here each joint's ``X = X_joint(q) @ X_tree``
is expressed so XLA constant-folds the fixed part and fuses the trig rewrite
across the batch lanes. sin/cos are evaluated once per joint per knot — the
same economy as the reference's ``s_temp`` sin/cos scratch
(``_topology_helpers.py:120-122``).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from jax import lax

from ..models.model import RobotModel


def _mm3_const(E, M):
    """(3, 3, B...) x (3, m) constant -> (3, m, B...), unrolled over the
    3-wide contraction (B... is any trailing batch shape — one axis on the
    XLA tier, (sub, lane) inside the 2-D-tiled fused kernels). Never an
    einsum: on TPU a dot_general defaults to bf16 MXU precision, which
    would inject ~1e-3 relative error into every X(q) and poison the whole
    dynamics suite; unrolled elementwise ops stay exact f32 on the VPU
    (and lower through Mosaic inside the fused kernels)."""
    # Flat batch: vectorized slice form (explicit lax slices, NOT mixed
    # slice/newaxis indexing — that rewrites to a gather Mosaic rejects).
    # 2-D batch tiles: scalar M[k, j] extracts, the only rank-free constant
    # access Mosaic lowers (rank-expanding a loaded 2-D constant is an
    # unsupported relayout; the scalar form on FLAT tiles measured ~1.6x
    # slower on the humanoids, so both forms stay).
    if E.ndim == 3:
        Mb = lax.expand_dims(M, (2,))                   # (3, m, 1)
        terms = [lax.slice_in_dim(E, k, k + 1, axis=1)
                 * lax.slice_in_dim(Mb, k, k + 1, axis=0) for k in range(3)]
        return terms[0] + terms[1] + terms[2]
    m = M.shape[1]
    rows = []
    for i in range(3):
        cols = []
        for j in range(m):
            acc = E[i, 0] * M[0, j]
            acc = acc + E[i, 1] * M[1, j]
            acc = acc + E[i, 2] * M[2, j]
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _mm3_batched(E, sk):
    """(3, 3, B) x (3, 3, B) -> (3, 3, B), unrolled (same rationale)."""
    terms = [lax.slice_in_dim(E, k, k + 1, axis=1)
             * lax.slice_in_dim(sk, k, k + 1, axis=0) for k in range(3)]
    return terms[0] + terms[1] + terms[2]


def _rot_E(axis: int, c, s):
    """Coordinate-rotation E = R_axis(q)^T as a (3, 3, B) stack."""
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    if axis == 0:
        rows = [[o, z, z], [z, c, s], [z, -s, c]]
    elif axis == 1:
        rows = [[c, z, -s], [z, o, z], [s, z, c]]
    else:
        rows = [[c, s, z], [-s, c, z], [z, z, o]]
    return jnp.stack([jnp.stack(r) for r in rows])


def joint_xmat(model: RobotModel, i: int, qi) -> jnp.ndarray:
    """X_i(q_i) for one joint: qi (B,) -> (6, 6, B)."""
    XT = model.Xtree[i]  # (6, 6) constant
    if model.jtype[i] == "revolute":
        c, s = jnp.cos(qi), jnp.sin(qi)
        E = _rot_E(model.S_ind[i] % 3, c, s)      # (3,3,B)
        top = _mm3_const(E, XT[:3, :])   # (3,6,B)
        bot = _mm3_const(E, XT[3:, :])
        return jnp.concatenate([top, bot], axis=0)
    if model.jtype[i] == "prismatic":
        # X = [[I,0],[-skew(q e_k), I]] @ XT
        k = model.S_ind[i] - 3
        z = jnp.zeros_like(qi)
        sk_rows = {
            0: [[z, z, z], [z, z, -qi], [z, qi, z]],
            1: [[z, z, qi], [z, z, z], [-qi, z, z]],
            2: [[z, -qi, z], [qi, z, z], [z, z, z]],
        }[k]
        sk = jnp.stack([jnp.stack(r) for r in sk_rows])  # (3,3,B)
        # scalar-indexed constant rows (rank-free; see _mm3_const)
        zb = jnp.zeros_like(qi)
        top = jnp.stack([jnp.stack([XT[r, c] + zb for c in range(6)])
                         for r in range(3)])
        XT_bot = jnp.stack([jnp.stack([XT[r, c] + zb for c in range(6)])
                            for r in range(3, 6)])
        bot = XT_bot - _mm3_const(sk, XT[:3, :])
        return jnp.concatenate([top, bot], axis=0)
    raise NotImplementedError(model.jtype[i])


def floating_xmat(q7) -> jnp.ndarray:
    """Floating joint X from q = [x,y,z,qx,qy,qz,qw] (7, B) -> (6, 6, B)."""
    p = q7[:3]
    x, y, z, w = q7[3], q7[4], q7[5], q7[6]
    nrm = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / nrm, y / nrm, z / nrm, w / nrm
    # R rotates child-frame vectors into the parent frame; E = R^T
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
    ])  # (3,3,B)
    E = jnp.swapaxes(R, 0, 1)
    zz = jnp.zeros_like(p[0])
    sk = jnp.stack([
        jnp.stack([zz, -p[2], p[1]]),
        jnp.stack([p[2], zz, -p[0]]),
        jnp.stack([-p[1], p[0], zz]),
    ])
    bl = -_mm3_batched(E, sk)
    z36 = jnp.zeros_like(bl)
    top = jnp.concatenate([E, z36], axis=1)
    bot = jnp.concatenate([bl, E], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def all_xmats(model: RobotModel, q) -> List[jnp.ndarray]:
    """Per-joint X(q) list; q is (num_pos, B).

    Returns a Python list (static length n) of (6, 6, B) arrays — joints stay
    unrolled at trace time, mirroring the reference's per-joint emission.
    """
    xs = []
    off = 0
    for i in range(model.n):
        if model.jtype[i] == "floating":
            xs.append(floating_xmat(q[off:off + 7]))
            off += 7
        else:
            xs.append(joint_xmat(model, i, q[off]))
            off += 1
    return xs
