"""RobotModel: the frozen per-robot pytree every kernel closes over.

TPU-native analog of the reference's ``robotModel<T>`` device struct plus the
baked constants of the generated header (``/root/reference/GRiDCodeGenerator.py:86-158``,
``helpers/_topology_helpers.py:27-118,544-590``): spatial inertias and fixed
tree transforms live as device arrays; all *topology* (parents, BFS waves,
ancestor/subtree sets, S indices, sparsity running sums) is static Python data
in the pytree aux, so ``jit`` re-specializes per robot exactly where the
reference re-generates CUDA per robot.

Layout convention for the compute layer: the rollout/knot batch is the
TRAILING axis (TPU lanes); per-joint 6-vectors are ``(6, B)`` and 6x6
operators ``(6, 6, B)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..topology.robot import RobotTopology


def _tt(x) -> Tuple:
    """Nested list -> nested tuple (hashable static aux)."""
    if isinstance(x, (list, tuple)):
        return tuple(_tt(v) for v in x)
    return x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotModel:
    # ---- array leaves (device-resident constants; ≙ d_XImats / d_topology) --
    Xtree: jax.Array          # (n, 6, 6) fixed parent->joint motion transforms
    Imat: jax.Array           # (n, 6, 6) spatial inertias in link frames
    damping: jax.Array        # (n,)
    joint_limits: jax.Array   # (n, 2) lower/upper (±inf where unset)
    effort_limit: jax.Array   # (num_vel,) max |tau| (+inf where unset) —
                              # ≙ the reference baking joint limits into the
                              # device blob (_topology_helpers.py:732-778)
    velocity_limit: jax.Array  # (num_vel,) max |qd| (+inf where unset)
    base_inertia: jax.Array   # (6, 6) fixed-base link inertia — baked into
                              # the constant pytree when build_model is
                              # called with include_base_inertia=True,
                              # zeros otherwise; ≙ the reference's
                              # include_base_inertia XI-blob option
                              # ("X[0..N], Ibase, I[0..N]",
                              # _topology_helpers.py:27-33,
                              # GRiDCodeGenerator.py:309)
    Ttree: jax.Array          # (n, 4, 4) fixed homogeneous transforms (FK)
    Tfixed: jax.Array         # (n_fixed, 4, 4) fixed-joint target frames
    subtree_mask: jax.Array   # (n, nv) 0/1 over velocity columns (Minv sparsity)
    # ---- static topology (pytree aux; drives trace-time specialization) ----
    name: str = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    num_pos: int = dataclasses.field(metadata=dict(static=True))
    num_vel: int = dataclasses.field(metadata=dict(static=True))
    parent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    S_ind: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    jtype: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    bfs_levels: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True))
    ancestors: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True))
    subtree: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True))
    leaves: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    floating_base: bool = dataclasses.field(metadata=dict(static=True))
    fixed_parent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    fixed_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------
    @property
    def is_serial_chain(self) -> bool:
        return all(p == i - 1 for i, p in enumerate(self.parent))

    def ancestors_and_self(self, i: int) -> Tuple[int, ...]:
        return self.ancestors[i] + (i,)

    def grad_cols(self, i: int) -> Tuple[int, ...]:
        """df/dc gradient sparsity columns: ancestors ∪ subtree (sorted)."""
        return tuple(sorted(set(self.ancestors[i]) | set(self.subtree[i])))


def build_model(topo: RobotTopology, dtype=jnp.float32,
                include_base_inertia: bool = False) -> RobotModel:
    """Bake a RobotTopology into a device-resident RobotModel."""
    n = topo.get_num_joints()
    Xtree = np.stack([topo.joints[i].Xtree for i in range(n)])
    Imat = np.stack([topo.get_Imat_by_id(i) for i in range(n)])
    Ttree = np.stack([topo.joints[i].Ttree for i in range(n)])
    damping = np.array([topo.get_damping_by_id(i) for i in range(n)])
    limits = topo.get_joint_limits()
    if topo.fixed_joints:
        Tfixed = np.stack([f.Ttree for f in topo.fixed_joints])
        fixed_parent = tuple(f.parent_jid for f in topo.fixed_joints)
        fixed_names = tuple(f.name for f in topo.fixed_joints)
    else:
        Tfixed = np.zeros((0, 4, 4))
        fixed_parent = ()
        fixed_names = ()
    levels = [tuple(topo.get_ids_by_bfs_level(l))
              for l in range(topo.get_max_bfs_level() + 1)]
    # velocity-column subtree masks (drives dense+masked Minv updates)
    nv = topo.get_num_vel()
    voff, off = [], 0
    for i in range(n):
        d = 6 if topo.joints[i].jtype == "floating" else 1
        voff.append((off, d))
        off += d
    sub_mask = np.zeros((n, nv))
    for i in range(n):
        for j in topo.get_subtree_by_id(i):
            o, d = voff[j]
            sub_mask[i, o:o + d] = 1.0
    return RobotModel(
        Xtree=jnp.asarray(Xtree, dtype),
        Imat=jnp.asarray(Imat, dtype),
        damping=jnp.asarray(damping, dtype),
        joint_limits=jnp.asarray(limits, dtype),
        effort_limit=jnp.asarray(topo.get_effort_limits(), dtype),
        velocity_limit=jnp.asarray(topo.get_velocity_limits(), dtype),
        base_inertia=jnp.asarray(
            topo.get_Imats_ordered_by_id()[0] if include_base_inertia
            else np.zeros((6, 6)), dtype),
        Ttree=jnp.asarray(Ttree, dtype),
        Tfixed=jnp.asarray(Tfixed, dtype),
        subtree_mask=jnp.asarray(sub_mask, dtype),
        name=topo.name,
        n=n,
        num_pos=topo.get_num_pos(),
        num_vel=topo.get_num_vel(),
        parent=tuple(int(p) for p in topo.get_parent_id_array()),
        S_ind=tuple(topo.get_S_ind_by_id(i) for i in range(n)),
        jtype=tuple(topo.joints[i].jtype for i in range(n)),
        bfs_levels=_tt(levels),
        ancestors=_tt([topo.get_ancestors_by_id(i) for i in range(n)]),
        subtree=_tt([topo.get_subtree_by_id(i) for i in range(n)]),
        leaves=tuple(topo.get_leaf_nodes()),
        floating_base=topo.floating_base,
        fixed_parent=fixed_parent,
        fixed_names=fixed_names,
    )
