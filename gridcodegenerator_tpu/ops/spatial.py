"""Lane-vectorized spatial algebra: batch trailing, VPU-shaped.

This is the TPU analog of the reference's emitted device helpers
(``/root/reference/helpers/_spatial_algebra_helpers.py``: ``mx0..mx5``,
``mxX``, ``fx``, ``fx_times_v``, ``vcross``, ``icrf``, ``dot_prod``). Where
the reference unrolls per-thread scalar index math, here every op acts on
``(6, B)`` / ``(6, 6, B)`` arrays whose trailing batch axis maps onto the
8x128 VPU lanes; the per-joint 6-component structure is unrolled into
elementwise adds/multiplies at trace time (no gathers, no dynamic control
flow), which is what XLA fuses best.

All functions are pure jnp and differentiable, so the same code path serves
(a) jit entry points, (b) vjp/jvp-derived derivatives, (c) Pallas kernel
bodies (they trace fine inside ``pallas_call``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# cross-product action ops (inputs (6, B); outputs (6, B))
# ---------------------------------------------------------------------------

def cross_mv(a, b):
    """crm(a) @ b — motion cross product, components unrolled."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return jnp.stack([
        a1 * b2 - a2 * b1,
        a2 * b0 - a0 * b2,
        a0 * b1 - a1 * b0,
        a4 * b2 - a5 * b1 + a1 * b5 - a2 * b4,
        a5 * b0 - a3 * b2 + a2 * b3 - a0 * b5,
        a3 * b1 - a4 * b0 + a0 * b4 - a1 * b3,
    ])


def cross_fv(a, b):
    """crf(a) @ b — force cross product (crf(a) = -crm(a)^T)."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return jnp.stack([
        a1 * b2 - a2 * b1 + a4 * b5 - a5 * b4,
        a2 * b0 - a0 * b2 + a5 * b3 - a3 * b5,
        a0 * b1 - a1 * b0 + a3 * b4 - a4 * b3,
        a1 * b5 - a2 * b4,
        a2 * b3 - a0 * b5,
        a0 * b4 - a1 * b3,
    ])


def icrf_v(f, v):
    """icrf(f) @ v == crf(v) @ f — the inverse-force-cross action
    (reference ``_spatial_algebra_helpers.py:392-450``)."""
    return cross_fv(v, f)


def mxS(S_ind: int, v, alpha=None):
    """crm(v) @ (e_{S_ind} * alpha): column S_ind of the motion cross matrix.

    The static one-hot S selection — reference ``mx0..mx5`` and their
    ``_scaled`` variants (``_spatial_algebra_helpers.py:149-234``) — resolved
    at trace time instead of emitted as C++ switches.
    """
    z = jnp.zeros_like(v[0])
    v0, v1, v2, v3, v4, v5 = v
    cols = {
        0: (z, v2, -v1, z, v5, -v4),
        1: (-v2, z, v0, -v5, z, v3),
        2: (v1, -v0, z, v4, -v3, z),
        3: (z, z, z, z, v2, -v1),
        4: (z, z, z, -v2, z, v0),
        5: (z, z, z, v1, -v0, z),
    }[S_ind]
    out = jnp.stack(cols)
    return out if alpha is None else out * alpha


def fxS(S_ind: int, v, alpha=None):
    """crf(v) @ e_{S_ind} * alpha (force-cross column select)."""
    z = jnp.zeros_like(v[0])
    v0, v1, v2, v3, v4, v5 = v
    cols = {
        0: (z, v2, -v1, z, z, z),
        1: (-v2, z, v0, z, z, z),
        2: (v1, -v0, z, z, z, z),
        3: (z, v5, -v4, z, v2, -v1),
        4: (-v5, z, v3, -v2, z, v0),
        5: (v4, -v3, z, v1, -v0, z),
    }[S_ind]
    out = jnp.stack(cols)
    return out if alpha is None else out * alpha


def crfS_f(S_ind: int, f):
    """crf(e_{S_ind}) @ f == icrf(f) @ e_{S_ind}: the gradient backward-pass
    correction direction, valid for revolute AND prismatic S (generalizes the
    reference's ``-mxS(S, f)``, see oracle.rnea_grad_inner)."""
    z = jnp.zeros_like(f[0])
    f0, f1, f2, f3, f4, f5 = f
    cols = {
        0: (z, -f2, f1, z, -f5, f4),
        1: (f2, z, -f0, f5, z, -f3),
        2: (-f1, f0, z, -f4, f3, z),
        3: (z, -f5, f4, z, z, z),
        4: (f5, z, -f3, z, z, z),
        5: (-f4, f3, z, z, z, z),
    }[S_ind]
    return jnp.stack(cols)


# ---------------------------------------------------------------------------
# 6x6 operator actions (X: (6, 6, B) or (6, 6); v: (6, B))
#
# All contractions are unrolled over the length-6 structural index as sums of
# elementwise products — no dot_general, no large broadcast temporaries.
# This keeps every op a pure VPU elementwise chain that (a) XLA fuses across
# the batch lanes and (b) Mosaic lowers directly inside Pallas kernels (the
# reference's ``dot_prod`` device helper plays the same role,
# ``_spatial_algebra_helpers.py:122-143``).
# ---------------------------------------------------------------------------

def Xv(X, v):
    """X @ v with trailing batch: (6,6,B),(6,B)->(6,B) (or unbatched X)."""
    if X.ndim == 2:
        X = X[:, :, None]
    out = X[:, 0] * v[0]
    for j in range(1, 6):
        out = out + X[:, j] * v[j]
    return out


def XTv(X, v):
    """X^T @ v with trailing batch."""
    if X.ndim == 2:
        X = X[:, :, None]
    out = X[0] * v[0]
    for j in range(1, 6):
        out = out + X[j] * v[j]
    return out


def XM(X, M):
    """X @ M for (6,6,B) operands -> (6,6,B)."""
    out = X[:, 0][:, None] * M[0][None]
    for j in range(1, 6):
        out = out + X[:, j][:, None] * M[j][None]
    return out


def XTM(X, M):
    """X^T @ M for (6,6,B) operands."""
    out = X[0][:, None] * M[0][None]
    for j in range(1, 6):
        out = out + X[j][:, None] * M[j][None]
    return out


def MX(M, X):
    """M @ X for (6,6,B) operands."""
    out = M[:, 0][:, None] * X[0][None]
    for j in range(1, 6):
        out = out + M[:, j][:, None] * X[j][None]
    return out


def XTMX(X, M):
    """X^T @ M @ X for (6,6,B) operands (articulated-inertia propagation)."""
    return MX(XTM(X, M), X)


def Mv(M, v):
    """M @ v where M is an unbatched (6,6) constant (inertia) and v (6,B...)
    with any trailing batch shape. Flat batch keeps the vectorized (6,1)
    column form (fewer, wider Mosaic ops — the scalar form measured ~1.6x
    slower on the flat-tier humanoids, r5); 2-D batch tiles use scalar
    extracts, the only rank-free constant access Mosaic lowers."""
    if v.ndim == 2:
        out = M[:, 0][:, None] * v[0]
        for j in range(1, 6):
            out = out + M[:, j][:, None] * v[j]
        return out
    rows = []
    for i in range(6):
        acc = M[i, 0] * v[0]
        for j in range(1, 6):
            acc = acc + M[i, j] * v[j]
        rows.append(acc)
    return jnp.stack(rows)


def Xcols(X, D):
    """Apply X (6,6,B) to every column of a (6,C,B) block -> (6,C,B)."""
    out = X[:, 0][:, None] * D[0][None]
    for j in range(1, 6):
        out = out + X[:, j][:, None] * D[j][None]
    return out


def XTcols(X, D):
    """Apply X^T to every column of a (6,C,B) block."""
    out = X[0][:, None] * D[0][None]
    for j in range(1, 6):
        out = out + X[j][:, None] * D[j][None]
    return out


def Mcols(M, D):
    """Constant (6,6) matrix times every column of (6,C,B...).
    Vectorized for flat batch, scalar-indexed for 2-D tiles (see Mv)."""
    if D.ndim == 3:
        out = M[:, 0][:, None, None] * D[0][None]
        for j in range(1, 6):
            out = out + M[:, j][:, None, None] * D[j][None]
        return out
    rows = []
    for i in range(6):
        acc = M[i, 0] * D[0]
        for j in range(1, 6):
            acc = acc + M[i, j] * D[j]
        rows.append(acc)
    return jnp.stack(rows)


def bmm(A, B):
    """Generic trailing-batch matmul (m,k,B),(k,c,B)->(m,c,B), unrolled over k."""
    k = A.shape[1]
    out = A[:, 0][:, None] * B[0][None]
    for j in range(1, k):
        out = out + A[:, j][:, None] * B[j][None]
    return out


def bmv(A, x):
    """Generic trailing-batch matvec (m,k,B),(k,B)->(m,B), unrolled over k."""
    k = A.shape[1]
    out = A[:, 0] * x[0]
    for j in range(1, k):
        out = out + A[:, j] * x[j]
    return out


def outer6(a, b):
    """a b^T with trailing batch: (6,B...),(6,B...)->(6,6,B...)."""
    return a[:, None] * b[None]


def dot6(a, b):
    """a^T b with trailing batch: (6,B),(6,B)->(B,)."""
    out = a[0] * b[0]
    for j in range(1, 6):
        out = out + a[j] * b[j]
    return out
