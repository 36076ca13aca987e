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


def _hom(R, p):
    """(3,3) rotation + (3,) translation -> (4,4), built by concatenation so
    vmap lowers it to concats (``.at[].set`` under vmap becomes a scatter,
    which Mosaic cannot lower)."""
    top = jnp.concatenate([R, p[:, None]], axis=1)
    # built from broadcasts, not a literal ndarray (Pallas kernels cannot
    # close over materialized array constants)
    bottom = jnp.concatenate([jnp.zeros((1, 3), R.dtype),
                              jnp.ones((1, 1), R.dtype)], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


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
        Tj = _hom(R, jnp.zeros((3,), TT.dtype))
    elif model.jtype[i] == "prismatic":
        ax = model.S_ind[i] - 3
        shift = (jnp.arange(3) == ax).astype(TT.dtype) * qi
        Tj = _hom(jnp.eye(3, dtype=TT.dtype), shift)
    else:  # floating: qi is (7,)
        p, quat = qi[:3], qi[3:7]
        x, y, z, w = quat / jnp.linalg.norm(quat)
        R = jnp.stack([
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
        ])
        return _hom(R.astype(TT.dtype), p.astype(TT.dtype))
    return TT @ Tj


def _pose_from_T(T, atan2=jnp.arctan2):
    """(4,4) -> (6,) [xyz, roll, pitch, yaw], reference extraction order."""
    R = T[:3, :3]
    roll = atan2(R[2, 1], R[2, 2])
    pitch = -atan2(R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    yaw = atan2(R[1, 0], R[0, 0])
    return jnp.concatenate([T[:3, 3], jnp.stack([roll, pitch, yaw])])


def eepos_sample(model: RobotModel, q, targets: Optional[Sequence[str]] = None,
                 poly_atan2: bool = False):
    """Per-sample EE poses: q (num_pos,) -> (num_ees * 6,).

    ``poly_atan2`` selects the Mosaic-lowerable polynomial atan2 (used by the
    fused Pallas kernels; Mosaic has no atan lowering) — same accuracy class
    as the CUDA ``atan2f`` the reference's generated code calls.
    """
    from .mathx import atan2_poly
    atan2 = atan2_poly if poly_atan2 else jnp.arctan2
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
        poses.append(_pose_from_T(T, atan2))
    return jnp.concatenate(poses)


def _mm44(A, B):
    """Unrolled 4x4 product over the trailing lane axis: operands are
    (4, 4, B) or constant (4, 4); Mosaic has no batched ``dot_general``
    (batch dim must be leading), so the product is 64 lane-wise mul-adds —
    the direct analog of the reference's per-element ``dot_prod<T,4,...>``
    chain products (``_eepose_gradient_hessian.py:79-140``)."""
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            s = A[i, 0] * B[0, j]
            for k in range(1, 4):
                s = s + A[i, k] * B[k, j]
            cols.append(s)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _joint_T_lanes(model: RobotModel, i: int, qi):
    """Lane-major joint transform: qi (B,) (or (k, B) floating) -> (4,4,B)."""
    TT = model.Ttree[i]
    dt = TT.dtype
    if model.jtype[i] == "revolute":
        c, s = jnp.cos(qi), jnp.sin(qi)
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        ax = model.S_ind[i] % 3
        if ax == 0:
            R = [[o, z, z], [z, c, -s], [z, s, c]]
        elif ax == 1:
            R = [[c, z, s], [z, o, z], [-s, z, c]]
        else:
            R = [[c, -s, z], [s, c, z], [z, z, o]]
        Tj = jnp.stack([jnp.stack(R[0] + [z]), jnp.stack(R[1] + [z]),
                        jnp.stack(R[2] + [z]), jnp.stack([z, z, z, o])])
    elif model.jtype[i] == "prismatic":
        ax = model.S_ind[i] - 3
        z = jnp.zeros_like(qi)
        o = jnp.ones_like(qi)
        col = [z, z, z]
        col[ax] = qi
        Tj = jnp.stack([jnp.stack([o, z, z, col[0]]),
                        jnp.stack([z, o, z, col[1]]),
                        jnp.stack([z, z, o, col[2]]),
                        jnp.stack([z, z, z, o])])
    else:  # floating: qi (7, B) = [xyz, quat xyzw]
        p, quat = qi[:3], qi[3:7]
        nq = jnp.sqrt(quat[0] ** 2 + quat[1] ** 2 + quat[2] ** 2
                      + quat[3] ** 2)
        x, y, z_, w = (quat[k] / nq for k in range(4))
        zz = jnp.zeros_like(x)
        oo = jnp.ones_like(x)
        return jnp.stack([
            jnp.stack([1 - 2 * (y * y + z_ * z_), 2 * (x * y - z_ * w),
                       2 * (x * z_ + y * w), p[0]]),
            jnp.stack([2 * (x * y + z_ * w), 1 - 2 * (x * x + z_ * z_),
                       2 * (y * z_ - x * w), p[1]]),
            jnp.stack([2 * (x * z_ - y * w), 2 * (y * z_ + x * w),
                       1 - 2 * (x * x + y * y), p[2]]),
            jnp.stack([zz, zz, zz, oo])]).astype(dt)
    return _mm44(TT, Tj)


def _pose_from_T_lanes(T, atan2):
    """(4,4,B) -> (6,B) [xyz, roll, pitch, yaw], reference extraction order."""
    roll = atan2(T[2, 1], T[2, 2])
    pitch = -atan2(T[2, 0], jnp.sqrt(T[2, 1] ** 2 + T[2, 2] ** 2))
    yaw = atan2(T[1, 0], T[0, 0])
    return jnp.concatenate(
        [T[:3, 3], jnp.stack([roll, pitch, yaw])], axis=0)


def eepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None,
          poly_atan2: bool = False):
    """Batched EE poses, lane-major: q (num_pos, B) -> (num_ees*6, B)."""
    from .mathx import atan2_poly
    atan2 = atan2_poly if poly_atan2 else jnp.arctan2
    pl = pos_layout(model)
    B = q.shape[-1]
    Ts = {}
    needed = set()
    chains = ee_chains(model, targets)
    for chain, _ in chains:
        needed.update(chain)
    for i in sorted(needed):
        off, k = pl[i]
        Ts[i] = _joint_T_lanes(model, i, q[off] if k == 1 else q[off:off + k])
    poses = []
    for chain, fid in chains:
        if chain:
            T = Ts[chain[0]]
            for j in chain[1:]:
                T = _mm44(T, Ts[j])
            if fid is not None:
                T = _mm44(T, model.Tfixed[fid])
        else:
            T = jnp.broadcast_to(
                model.Tfixed[fid][:, :, None], (4, 4, B))
        poses.append(_pose_from_T_lanes(T, atan2))
    return jnp.concatenate(poses, axis=0)


def deepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None,
           poly_atan2: bool = False):
    """Batched EE pose Jacobian: (num_ees*6, num_pos, B)."""
    fn = jax.jacfwd(lambda qs: eepos_sample(model, qs, targets, poly_atan2))
    return jax.vmap(fn, in_axes=-1, out_axes=-1)(q)


def d2eepos(model: RobotModel, q, targets: Optional[Sequence[str]] = None,
            poly_atan2: bool = False):
    """Batched EE pose Hessian: (num_ees*6, num_pos, num_pos, B)."""
    fn = jax.jacfwd(jax.jacfwd(
        lambda qs: eepos_sample(model, qs, targets, poly_atan2)))
    return jax.vmap(fn, in_axes=-1, out_axes=-1)(q)


# ---------------------------------------------------------------------------
# Mosaic-lowerable unrolled variants (bound by the fused Pallas kernels)
# ---------------------------------------------------------------------------

def deepos_unrolled(model: RobotModel, q,
                    targets: Optional[Sequence[str]] = None,
                    poly_atan2: bool = False):
    """``deepos`` with the jacfwd seed axis unrolled (see ``ops.seedjac``)."""
    from .seedjac import seed_jac
    return seed_jac(lambda a: eepos(model, a, targets, poly_atan2), q)


def d2eepos_unrolled(model: RobotModel, q,
                     targets: Optional[Sequence[str]] = None,
                     poly_atan2: bool = False):
    """``d2eepos`` with both jacfwd seed axes unrolled."""
    from .seedjac import seed_jac
    return seed_jac(lambda a: deepos_unrolled(model, a, targets, poly_atan2), q)


def fk(model: RobotModel, q):
    """Batched forward kinematics: world homogeneous transforms of EVERY
    joint frame, lane-major: q (num_pos, B) -> (n, 4, 4, B).

    The public per-link FK accumulator — the analog of the reference's
    standalone ``X_single_thread`` / ``X_warp`` chain-multiply device
    functions (``/root/reference/algorithms/_eepose_gradient_hessian.py:
    1226-1398``), which expose the accumulated transforms rather than just
    the end-effector poses. Parent transforms are computed once and reused
    down the tree (trace-time unrolled over the topology).
    """
    pl = pos_layout(model)
    n = model.n
    Tw = [None] * n
    for i in range(n):  # ids are topologically ordered (parent < child)
        off, k = pl[i]
        Ti = _joint_T_lanes(model, i, q[off] if k == 1 else q[off:off + k])
        p = model.parent[i]
        Tw[i] = Ti if p < 0 else _mm44(Tw[p], Ti)
    return jnp.stack(Tw)
