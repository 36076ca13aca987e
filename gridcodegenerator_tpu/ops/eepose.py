"""End-effector pose, gradient, and Hessian.

TPU-native re-design of the reference's EE suite
(``/root/reference/algorithms/_eepose_gradient_hessian.py``): pose = chained
homogeneous transforms root->EE with xyz + ZYX-Euler rpy extraction matching
the reference exactly (``:151-157``: roll = atan2(R21, R22),
pitch = -atan2(R20, sqrt(R21^2+R22^2)), yaw = atan2(R10, R00)).

Where the reference triplicates hand-emitted chain products with dXhom /
d2Xhom substitutions and hand-rolled atan2 quotient rules (``:400-509``,
``:774-983``, ``:1028-1056``), here the gradient and Hessian are
forward-mode autodiff (jacfwd) of the traced FK chain — semantically the same
n / n^2 chain-product structure, produced by the transform system instead of
string emission, and batched with vmap.

End-effectors default to the robot's fixed-joint frames when present (the
reference's ``fixed_target_name`` mechanism, ``:1400-1405``) and otherwise to
the leaf links.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .common import pos_layout


def ee_chains(model: RobotModel,
              targets: Optional[Sequence[str]] = None) -> List[Tuple[Tuple[int, ...], Optional[int]]]:
    """Per-EE (joint chain root->parent, fixed-joint index or None)."""
    chains = []
    if targets is not None:
        for t in targets:
            fid = model.fixed_names.index(t)
            j = model.fixed_parent[fid]
            chain = (model.ancestors[j] + (j,)) if j >= 0 else ()
            chains.append((chain, fid))
        return chains
    if model.fixed_parent:
        for fid, j in enumerate(model.fixed_parent):
            chain = (model.ancestors[j] + (j,)) if j >= 0 else ()
            chains.append((chain, fid))
    else:
        for leaf in model.leaves:
            chains.append((model.ancestors[leaf] + (leaf,), None))
    return chains


def num_ees(model: RobotModel, targets: Optional[Sequence[str]] = None) -> int:
    return len(ee_chains(model, targets))


def _joint_T(model: RobotModel, i: int, qi):
    """Per-sample homogeneous transform link->parent: scalar qi -> (4, 4)."""
    TT = model.Ttree[i]
    if model.jtype[i] == "revolute":
        c, s = jnp.cos(qi), jnp.sin(qi)
        ax = model.S_ind[i] % 3
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        if ax == 0:
            R = jnp.stack([jnp.stack([o, z, z]), jnp.stack([z, c, -s]),
                           jnp.stack([z, s, c])])
        elif ax == 1:
            R = jnp.stack([jnp.stack([c, z, s]), jnp.stack([z, o, z]),
                           jnp.stack([-s, z, c])])
        else:
            R = jnp.stack([jnp.stack([c, -s, z]), jnp.stack([s, c, z]),
                           jnp.stack([z, z, o])])
        Tj = jnp.eye(4, dtype=TT.dtype).at[:3, :3].set(R)
    elif model.jtype[i] == "prismatic":
        Tj = jnp.eye(4, dtype=TT.dtype).at[model.S_ind[i] - 3, 3].set(qi)
    else:  # floating: qi is (7,)
        p, quat = qi[:3], qi[3:7]
        x, y, z, w = quat / jnp.linalg.norm(quat)
        R = jnp.stack([
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
        ])
        return jnp.eye(4, dtype=TT.dtype).at[:3, :3].set(R).at[:3, 3].set(p)
    return TT @ Tj


def _pose_from_T(T):
    """(4,4) -> (6,) [xyz, roll, pitch, yaw], reference extraction order."""
    R = T[:3, :3]
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = -jnp.arctan2(R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.concatenate([T[:3, 3], jnp.stack([roll, pitch, yaw])])


def eepos_sample(model: RobotModel, q, targets: Optional[Sequence[str]] = None):
    """Per-sample EE poses: q (num_pos,) -> (num_ees * 6,)."""
    pl = pos_layout(model)
    Ts = []
    for i in range(model.n):
        off, k = pl[i]
        Ts.append(_joint_T(model, i, q[off] if k == 1 else q[off:off + k]))
    poses = []
    for chain, fid in ee_chains(model, targets):
        T = jnp.eye(4, dtype=model.Ttree.dtype)
        for j in chain:
            T = T @ Ts[j]
        if fid is not None:
            T = T @ model.Tfixed[fid]
        poses.append(_pose_from_T(T))
    return jnp.concatenate(poses)


def eepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None):
    """Batched EE poses: q (num_pos, B) -> (num_ees*6, B)."""
    fn = lambda qs: eepos_sample(model, qs, targets)
    return jax.vmap(fn, in_axes=-1, out_axes=-1)(q)


def deepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None):
    """Batched EE pose Jacobian: (num_ees*6, num_pos, B)."""
    fn = jax.jacfwd(lambda qs: eepos_sample(model, qs, targets))
    return jax.vmap(fn, in_axes=-1, out_axes=-1)(q)


def d2eepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None):
    """Batched EE pose Hessian: (num_ees*6, num_pos, num_pos, B)."""
    fn = jax.jacfwd(jax.jacfwd(lambda qs: eepos_sample(model, qs, targets)))
    return jax.vmap(fn, in_axes=-1, out_axes=-1)(q)
