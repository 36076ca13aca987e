"""Shared helpers for the batched algorithm implementations.

Everything here must lower inside Pallas/Mosaic as well as plain XLA: no
scatter (`.at[]` updates), no captured array constants — one-hot masks and
identity matrices are built in-trace from ``broadcasted_iota``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel

DEFAULT_GRAVITY = -9.81


def onehot(k: int, size: int, dtype) -> jnp.ndarray:
    """(size, 1) one-hot column e_k, built in-trace (Mosaic-safe)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
    return (i == k).astype(dtype)


def eye2d(size: int, dtype) -> jnp.ndarray:
    """(size, size) identity built in-trace."""
    r = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return (r == c).astype(dtype)


def eye_nd(size: int, dtype, ndim: int) -> jnp.ndarray:
    """(size, size, 1, ...) identity at rank ``ndim``, built in-trace at the
    target rank — Mosaic rejects the 2-D->N-D shape cast a post-hoc
    ``[:, :, None, ...]`` would need."""
    shape = (size, size) + (1,) * (ndim - 2)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r == c).astype(dtype)


def onehot_nd(k: int, size: int, dtype, ndim: int) -> jnp.ndarray:
    """(size, 1, ...) one-hot e_k at rank ``ndim`` (see :func:`eye_nd`)."""
    shape = (size,) + (1,) * (ndim - 1)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (i == k).astype(dtype)


def rowmask_ge(off: int, size: int, dtype, ndim: int = 2) -> jnp.ndarray:
    """(size, 1...) mask of rows >= off at rank ``ndim``, built in-trace."""
    i = jax.lax.broadcasted_iota(jnp.int32, (size,) + (1,) * (ndim - 1), 0)
    return (i >= off).astype(dtype)


def gravity_accel(GRAVITY: float, B: int, dtype, ndim: int = 2) -> jnp.ndarray:
    """The fictitious base acceleration [0,0,0,0,0,-GRAVITY] as a
    (6, 1...) column at rank ``ndim`` (broadcasts over any trailing batch
    shape; reference oracle ``_test.py:13-14``)."""
    return onehot_nd(5, 6, dtype, ndim) * jnp.asarray(-GRAVITY, dtype)


def vel_layout(model: RobotModel) -> List[Tuple[int, int]]:
    """Per-joint (velocity offset, dof) — dof is 6 for the floating joint."""
    out, off = [], 0
    for i in range(model.n):
        d = 6 if model.jtype[i] == "floating" else 1
        out.append((off, d))
        off += d
    return out


def pos_layout(model: RobotModel) -> List[Tuple[int, int]]:
    """Per-joint (position offset, npos) — npos is 7 for the floating joint."""
    out, off = [], 0
    for i in range(model.n):
        k = 7 if model.jtype[i] == "floating" else 1
        out.append((off, k))
        off += k
    return out


def S_matrix(model: RobotModel, i: int) -> np.ndarray:
    """Constant (6, dof) motion subspace for joint i."""
    if model.jtype[i] == "floating":
        return np.eye(6)
    S = np.zeros((6, 1))
    S[model.S_ind[i], 0] = 1.0
    return S


def const_mat_b(M, tz) -> jnp.ndarray:
    """Materialize an unbatched (r, c) constant against a traced zero ``tz``
    of the batch shape: (r, c, B...) via scalar splats. Rank-free: Mosaic
    cannot rank-expand a loaded 2-D constant into 2-D batch tiles, but a
    scalar extract broadcasts at any rank (and XLA folds this identically
    to the reshape form on the flat tiers)."""
    r, c = M.shape
    if tz.ndim == 1:                       # flat batch: one rank-3 broadcast
        return M[:, :, None] + tz
    return jnp.stack([jnp.stack([M[i, j] + tz for j in range(c)])
                      for i in range(r)])


def set_row(v6b: jnp.ndarray, k: int, val) -> jnp.ndarray:
    """Functionally set row k of a (6, B) array (static index)."""
    return v6b.at[k].set(val)


def e_vec(k: int, x) -> jnp.ndarray:
    """(6, B) array equal to e_k * x for x of shape (B,)."""
    z = jnp.zeros_like(x)
    return jnp.stack([x if j == k else z for j in range(6)])
