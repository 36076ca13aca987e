"""Shared helpers for the batched algorithm implementations."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel

DEFAULT_GRAVITY = -9.81


def gravity_accel(GRAVITY: float, B: int, dtype) -> jnp.ndarray:
    """The fictitious base acceleration [0,0,0,0,0,-GRAVITY] broadcast to (6,B)
    (reference oracle ``_test.py:13-14``)."""
    g = jnp.zeros((6, B), dtype=dtype)
    return g.at[5].set(-GRAVITY)


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


def set_row(v6b: jnp.ndarray, k: int, val) -> jnp.ndarray:
    """Functionally set row k of a (6, B) array (static index)."""
    return v6b.at[k].set(val)


def e_vec(k: int, x) -> jnp.ndarray:
    """(6, B) array equal to e_k * x for x of shape (B,)."""
    z = jnp.zeros_like(x)
    return jnp.stack([x if j == k else z for j in range(6)])
