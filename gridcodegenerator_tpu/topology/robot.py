"""RobotTopology: the static robot-model object every kernel is specialized over.

This replaces the external ``URDFParser`` package the reference depends on
(``/root/reference/README.md:8-13``). The accessor surface mirrors the census of
``self.robot.*`` calls made by the reference generator (SURVEY.md §2.6), so the
algorithm layer can be written against the same vocabulary: parents, BFS levels,
ancestors/subtrees, joint motion subspaces S, spatial transforms X(q), spatial
inertias I, fixed joints, damping, joint limits, floating base.

Unlike the reference (which carries sympy expressions and emits CUDA strings),
everything here is *static numpy data* plus plain-Python structure: the JAX/Pallas
layer closes over it at trace time, which is the TPU-native analog of the
reference's per-robot string specialization (``/root/reference/GRiDCodeGenerator.py:309-437``).

Conventions (Featherstone spatial algebra, matching the reference oracle
``/root/reference/_test.py``):
  * spatial vectors are 6-vectors ``[angular; linear]``
  * ``X_i(q_i)`` is the 6x6 motion transform taking parent-link-frame motion
    vectors into link-i frame coordinates; ``X = X_joint(q) @ X_tree``
  * ``S_i`` is a one-hot 6-vector selecting the joint's free axis
    (0/1/2 = revolute x/y/z, 3/4/5 = prismatic x/y/z)
  * link spatial inertia ``I = [[Ibar, m*cx],[m*cx^T, m*1]]`` with
    ``Ibar = I_com_in_link_frame + m*cx*cx^T``
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# small 3D / spatial helpers (numpy, float64)
# ---------------------------------------------------------------------------

def skew(p: np.ndarray) -> np.ndarray:
    """3x3 skew-symmetric matrix such that skew(p) @ x == cross(p, x)."""
    return np.array(
        [[0.0, -p[2], p[1]],
         [p[2], 0.0, -p[0]],
         [-p[1], p[0], 0.0]], dtype=np.float64)


def rot_axis(axis: int, theta: float) -> np.ndarray:
    """Rotation matrix rotating vectors by ``theta`` about world axis 0/1/2."""
    c, s = np.cos(theta), np.sin(theta)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def rpy_to_R(rpy: Sequence[float]) -> np.ndarray:
    """URDF fixed-axis roll-pitch-yaw to a rotation matrix (vectors child->parent)."""
    r, p, y = rpy
    return rot_axis(2, y) @ rot_axis(1, p) @ rot_axis(0, r)


def xform_from_E_p(E: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Spatial motion transform ``[[E,0],[-E*skew(p),E]]``.

    ``E`` is the coordinate rotation (rows of the child frame in parent coords,
    i.e. E = R^T where R rotates child vectors into the parent frame) and ``p``
    is the child origin expressed in the parent frame.
    """
    X = np.zeros((6, 6), dtype=np.float64)
    X[:3, :3] = E
    X[3:, 3:] = E
    X[3:, :3] = -E @ skew(p)
    return X


def xform_hom_from_R_p(R: np.ndarray, p: np.ndarray) -> np.ndarray:
    """4x4 homogeneous transform child->parent (points): [[R,p],[0,1]]."""
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = p
    return T


def spatial_inertia(mass: float, com: np.ndarray, I_com: np.ndarray) -> np.ndarray:
    """6x6 spatial inertia about the link frame origin, angular-first."""
    C = skew(com)
    I6 = np.zeros((6, 6), dtype=np.float64)
    I6[:3, :3] = I_com + mass * (C @ C.T)
    I6[:3, 3:] = mass * C
    I6[3:, :3] = mass * C.T
    I6[3:, 3:] = mass * np.eye(3)
    return I6


# ---------------------------------------------------------------------------
# joint / fixed-joint records
# ---------------------------------------------------------------------------

REVOLUTE_AXIS_TO_S = {0: 0, 1: 1, 2: 2}
PRISMATIC_AXIS_TO_S = {0: 3, 1: 4, 2: 5}


@dataclasses.dataclass
class Joint:
    """A movable joint (revolute, prismatic, or the synthetic floating joint)."""
    name: str
    jid: int
    parent_id: int          # -1 for joints whose parent link is the base
    jtype: str              # 'revolute' | 'prismatic' | 'floating'
    S_ind: int              # 0..5 for 1-dof joints; -1 for floating
    Xtree: np.ndarray       # (6,6) fixed motion transform parent-link -> joint frame
    Ttree: np.ndarray       # (4,4) fixed homogeneous transform joint frame -> parent-link
    damping: float = 0.0
    limit_lower: float = -np.inf
    limit_upper: float = np.inf
    effort_limit: float = np.inf      # max |tau| (URDF <limit effort>)
    velocity_limit: float = np.inf    # max |qd|  (URDF <limit velocity>)
    parent_link: str = ""
    child_link: str = ""

    @property
    def S(self) -> np.ndarray:
        S = np.zeros(6, dtype=np.float64)
        if self.S_ind >= 0:
            S[self.S_ind] = 1.0
        return S

    def num_pos(self) -> int:
        return 7 if self.jtype == "floating" else 1

    def num_vel(self) -> int:
        return 6 if self.jtype == "floating" else 1

    # -- numeric X(q), T(q) --------------------------------------------------
    def Xmat(self, q) -> np.ndarray:
        """6x6 motion transform parent-link-frame -> link frame at position q."""
        if self.jtype == "floating":
            q = np.asarray(q, dtype=np.float64)
            p, quat = q[:3], q[3:7]  # quat = (x, y, z, w)
            R = quat_to_R(quat)
            return xform_from_E_p(R.T, p)
        q = float(np.asarray(q).reshape(()))
        ax = self.S_ind % 3
        if self.jtype == "revolute":
            Xj = np.zeros((6, 6), dtype=np.float64)
            E = rot_axis(ax, q).T
            Xj[:3, :3] = E
            Xj[3:, 3:] = E
            return Xj @ self.Xtree
        # prismatic: translate q along the joint axis in the joint frame
        p = np.zeros(3)
        p[self.S_ind - 3] = q
        return xform_from_E_p(np.eye(3), p) @ self.Xtree

    def Tmat(self, q) -> np.ndarray:
        """4x4 homogeneous transform link frame -> parent-link frame."""
        if self.jtype == "floating":
            q = np.asarray(q, dtype=np.float64)
            return xform_hom_from_R_p(quat_to_R(q[3:7]), q[:3])
        q = float(np.asarray(q).reshape(()))
        if self.jtype == "revolute":
            Tj = np.eye(4)
            Tj[:3, :3] = rot_axis(self.S_ind % 3, q)
        else:
            Tj = np.eye(4)
            Tj[self.S_ind - 3, 3] = q
        return self.Ttree @ Tj

    def dTmat(self, q) -> np.ndarray:
        """d/dq of Tmat (1-dof joints only)."""
        q = float(np.asarray(q).reshape(()))
        if self.jtype == "revolute":
            ax = self.S_ind % 3
            c, s = np.cos(q), np.sin(q)
            dR = np.zeros((3, 3))
            if ax == 0:
                dR[1:, 1:] = [[-s, -c], [c, -s]]
            elif ax == 1:
                dR[0, 0], dR[0, 2], dR[2, 0], dR[2, 2] = -s, c, -c, -s
            else:
                dR[:2, :2] = [[-s, -c], [c, -s]]
            dT = np.zeros((4, 4))
            dT[:3, :3] = dR
            return self.Ttree @ dT
        dT = np.zeros((4, 4))
        dT[self.S_ind - 3, 3] = 1.0
        return self.Ttree @ dT

    def d2Tmat(self, q) -> np.ndarray:
        """d2/dq2 of Tmat (1-dof joints only)."""
        if self.jtype == "prismatic":
            return np.zeros((4, 4))
        q = float(np.asarray(q).reshape(()))
        ax = self.S_ind % 3
        c, s = np.cos(q), np.sin(q)
        d2R = np.zeros((3, 3))
        if ax == 0:
            d2R[1:, 1:] = [[-c, s], [-s, -c]]
        elif ax == 1:
            d2R[0, 0], d2R[0, 2], d2R[2, 0], d2R[2, 2] = -c, -s, s, -c
        else:
            d2R[:2, :2] = [[-c, s], [-s, -c]]
        d2T = np.zeros((4, 4))
        d2T[:3, :3] = d2R
        return self.Ttree @ d2T


def quat_to_R(quat: np.ndarray) -> np.ndarray:
    """Quaternion (x,y,z,w) to rotation matrix (rotates child vectors to parent)."""
    x, y, z, w = quat
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float64)


@dataclasses.dataclass
class FixedJoint:
    """A fixed URDF joint, retained as a kinematic target for end-effector code.

    Mirrors the reference's fixed-joint handling for ``fixed_target_name``
    (``/root/reference/algorithms/_eepose_gradient_hessian.py:1400-1405``).
    """
    name: str
    fid: int
    parent_jid: int         # movable joint id of the parent link (-1 = base)
    Ttree: np.ndarray       # (4,4) homogeneous: fixed frame -> parent-link frame
    parent_link: str = ""
    child_link: str = ""


# ---------------------------------------------------------------------------
# RobotTopology
# ---------------------------------------------------------------------------

class RobotTopology:
    """Static robot structure exposing the reference's robot-object API surface.

    Construct via :func:`gridcodegenerator_tpu.topology.urdf.parse_urdf` (or the
    model zoo). All derived structure (BFS levels, ancestors, subtrees, sparsity
    running sums) is precomputed here as plain numpy so downstream JAX code can
    close over it statically.
    """

    def __init__(
        self,
        name: str,
        joints: List[Joint],
        Imats: List[np.ndarray],          # per movable joint/link, in link frame
        base_inertia: Optional[np.ndarray] = None,
        fixed_joints: Optional[List[FixedJoint]] = None,
        floating_base: bool = False,
    ):
        self.name = name
        self.joints = joints
        self.floating_base = floating_base
        self.fixed_joints = fixed_joints or []
        self._Imats = [np.asarray(I, dtype=np.float64) for I in Imats]
        self._base_inertia = (
            np.zeros((6, 6)) if base_inertia is None
            else np.asarray(base_inertia, dtype=np.float64))

        n = len(joints)
        self._n = n
        self._parent = np.array([j.parent_id for j in joints], dtype=np.int64)
        # sanity: ids are topologically ordered (parent < child)
        for j in joints:
            assert j.jid < n and j.parent_id < j.jid, (j.name, j.jid, j.parent_id)

        # -- BFS levels ------------------------------------------------------
        self._bfs_level = np.zeros(n, dtype=np.int64)
        for i in range(n):
            p = self._parent[i]
            self._bfs_level[i] = 0 if p == -1 else self._bfs_level[p] + 1
        self._max_bfs = int(self._bfs_level.max()) if n else 0
        self._ids_by_level = [
            [i for i in range(n) if self._bfs_level[i] == lvl]
            for lvl in range(self._max_bfs + 1)
        ]

        # -- ancestors / subtrees -------------------------------------------
        self._ancestors: List[List[int]] = []
        for i in range(n):
            anc, p = [], self._parent[i]
            while p != -1:
                anc.append(int(p))
                p = self._parent[p]
            self._ancestors.append(sorted(anc))
        self._subtree: List[List[int]] = [[] for _ in range(n)]
        for i in range(n):
            self._subtree[i].append(i)
            for a in self._ancestors[i]:
                self._subtree[a].append(i)
        for i in range(n):
            self._subtree[i] = sorted(self._subtree[i])
        self._leaves = [i for i in range(n) if len(self._subtree[i]) == 1]

        # num_pos / num_vel (floating base: 7 pos, 6 vel for joint 0)
        self._num_pos = sum(j.num_pos() for j in joints)
        self._num_vel = sum(j.num_vel() for j in joints)

    # ------------------------------------------------------------------
    # reference-parity accessor surface (SURVEY.md §2.6)
    # ------------------------------------------------------------------
    def get_num_joints(self) -> int:
        return self._n

    def get_num_pos(self) -> int:
        return self._num_pos

    def get_num_vel(self) -> int:
        return self._num_vel

    def get_num_fixed_joints(self) -> int:
        return len(self.fixed_joints)

    def get_parent_id(self, jid: int) -> int:
        return int(self._parent[jid])

    def get_parent_id_array(self) -> np.ndarray:
        return self._parent.copy()

    def get_unique_parent_ids(self, inds: Sequence[int]) -> List[int]:
        return sorted({int(self._parent[i]) for i in inds})

    def has_repeated_parents(self, inds: Optional[Sequence[int]] = None) -> bool:
        if inds is None:
            inds = range(self._n)
        ps = [int(self._parent[i]) for i in inds]
        return len(ps) != len(set(ps))

    def is_serial_chain(self) -> bool:
        return all(int(self._parent[i]) == i - 1 for i in range(self._n))

    def get_bfs_level_by_id(self, jid: int) -> int:
        return int(self._bfs_level[jid])

    def get_max_bfs_level(self) -> int:
        return self._max_bfs

    def get_ids_by_bfs_level(self, level: int) -> List[int]:
        return list(self._ids_by_level[level]) if level <= self._max_bfs else []

    def get_max_bfs_width(self) -> int:
        return max(len(l) for l in self._ids_by_level)

    def get_ancestors_by_id(self, jid: int) -> List[int]:
        return list(self._ancestors[jid])

    def get_num_ancestors(self, jid: int) -> int:
        return len(self._ancestors[jid])

    def get_max_num_ancestors(self) -> int:
        return max((len(a) for a in self._ancestors), default=0)

    def get_total_ancestor_count(self) -> int:
        return sum(len(a) for a in self._ancestors)

    def get_subtree_by_id(self, jid: int) -> List[int]:
        return list(self._subtree[jid])

    def get_total_subtree_count(self) -> int:
        return sum(len(s) for s in self._subtree)

    def get_is_ancestor_of(self, jid: int, jid_of: int) -> bool:
        return jid in self._ancestors[jid_of]

    def get_is_in_subtree_of(self, jid: int, jid_of: int) -> bool:
        return jid in self._subtree[jid_of]

    def get_leaf_nodes(self) -> List[int]:
        return list(self._leaves)

    def get_total_leaf_nodes(self) -> int:
        return len(self._leaves)

    def get_jid_ancestor_ids(self, include_self: bool = True) -> List[Tuple[int, int]]:
        """Flat (jid, ancestor) pair list, per reference IDSVA-SO index maps."""
        pairs = []
        for i in range(self._n):
            cols = self._ancestors[i] + ([i] if include_self else [])
            for c in sorted(cols):
                pairs.append((i, c))
        return pairs

    def get_jid_ancestor_st_ids(self, include_self: bool = True) -> List[Tuple[int, int]]:
        """Flat (jid, ancestor-or-subtree) pair list (gradient df sparsity)."""
        pairs = []
        for i in range(self._n):
            cols = sorted(set(self._ancestors[i]) | set(self._subtree[i]))
            if not include_self:
                cols = [c for c in cols if c != i]
            for c in cols:
                pairs.append((i, c))
        return pairs

    # S / joint accessors ------------------------------------------------
    def get_S_by_id(self, jid: int) -> np.ndarray:
        return self.joints[jid].S

    def get_S_ind_by_id(self, jid: int) -> int:
        return self.joints[jid].S_ind

    def get_S_inds(self) -> List[int]:
        return [j.S_ind for j in self.joints]

    def are_Ss_identical(self, inds: Optional[Sequence[int]] = None) -> bool:
        if inds is None:
            inds = range(self._n)
        s = {self.joints[i].S_ind for i in inds}
        return len(s) <= 1

    def get_joint_by_id(self, jid: int) -> Joint:
        return self.joints[jid]

    def get_joint_by_name(self, name: str) -> Optional[Joint]:
        for j in self.joints:
            if j.name == name:
                return j
        return None

    def get_joints_ordered_by_id(self) -> List[Joint]:
        return list(self.joints)

    def get_link_by_id(self, jid: int) -> str:
        return self.joints[jid].child_link

    def get_damping_by_id(self, jid: int) -> float:
        return self.joints[jid].damping

    def get_joint_limits(self) -> np.ndarray:
        """(n, 2) array of [lower, upper] per joint (±inf where unset)."""
        return np.array(
            [[j.limit_lower, j.limit_upper] for j in self.joints], dtype=np.float64)

    def get_effort_limits(self) -> np.ndarray:
        """(num_vel,) max |tau| per velocity dof (URDF <limit effort>;
        +inf where unset — the floating joint's 6 dofs are unbounded)."""
        out = []
        for j in self.joints:
            out.extend([j.effort_limit] * j.num_vel())
        return np.array(out, dtype=np.float64)

    def get_velocity_limits(self) -> np.ndarray:
        """(num_vel,) max |qd| per velocity dof (URDF <limit velocity>)."""
        out = []
        for j in self.joints:
            out.extend([j.velocity_limit] * j.num_vel())
        return np.array(out, dtype=np.float64)

    # fixed joints -------------------------------------------------------
    def get_fixed_joint_by_name(self, name: str) -> Optional[FixedJoint]:
        for f in self.fixed_joints:
            if f.name == name:
                return f
        return None

    def get_fixed_joint_by_id(self, fid: int) -> FixedJoint:
        return self.fixed_joints[fid]

    # transforms / inertias ---------------------------------------------
    def get_Xmat_Func_by_id(self, jid: int) -> Callable:
        return self.joints[jid].Xmat

    def get_Xmat_Funcs_ordered_by_id(self) -> List[Callable]:
        return [j.Xmat for j in self.joints]

    def get_Xmats_ordered_by_id(self, q: np.ndarray) -> List[np.ndarray]:
        return [j.Xmat(qj) for j, qj in zip(self.joints, self._split_q(q))]

    def get_Xmats_hom_ordered_by_id(self, q: np.ndarray) -> List[np.ndarray]:
        return [j.Tmat(qj) for j, qj in zip(self.joints, self._split_q(q))]

    def get_dXmats_hom_ordered_by_id(self, q: np.ndarray) -> List[np.ndarray]:
        return [j.dTmat(qj) for j, qj in zip(self.joints, self._split_q(q))]

    def get_d2Xmats_hom_ordered_by_id(self, q: np.ndarray) -> List[np.ndarray]:
        return [j.d2Tmat(qj) for j, qj in zip(self.joints, self._split_q(q))]

    def get_Imat_by_id(self, jid: int) -> np.ndarray:
        return self._Imats[jid].copy()

    def get_Imats_ordered_by_id(self) -> List[np.ndarray]:
        """[base_inertia, I_0, I_1, ...] — index 0 is the base, as in reference
        (``/root/reference/_test.py:17`` slices ``[1:]``)."""
        return [self._base_inertia.copy()] + [I.copy() for I in self._Imats]

    def get_Imats_dict_by_id(self) -> Dict[int, np.ndarray]:
        return {i: self._Imats[i].copy() for i in range(self._n)}

    def _split_q(self, q: np.ndarray):
        """Split the flat q vector into per-joint slices (floating base: 7)."""
        q = np.asarray(q)
        out, off = [], 0
        for j in self.joints:
            k = j.num_pos()
            out.append(q[off] if k == 1 else q[off:off + k])
            off += k
        return out

    # ------------------------------------------------------------------
    def __repr__(self) -> str:
        return (f"RobotTopology({self.name!r}, n={self._n}, "
                f"serial={self.is_serial_chain()}, floating={self.floating_base}, "
                f"max_bfs={self._max_bfs})")
