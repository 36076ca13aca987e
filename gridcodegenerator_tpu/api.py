"""Public API: per-robot compiled dynamics suite.

This layer is the TPU-native analog of the reference's *generated* runtime API
(``/root/reference/README.md:24-29``, ``GRiDCodeGenerator.py:309-437``). The
reference emits a ``grid.cuh`` with four tiers per algorithm
(``_inner`` / ``_device`` / ``_kernel`` / host); here the tiers are:

* **inner**  — the traced builders in ``gridcodegenerator_tpu.ops.*``
  (pure functions on lane-major ``(dim, B)`` arrays, composable and
  differentiable — the ``_inner``/``_device`` analog);
* **kernel** — jit-compiled, per-robot-specialized batched callables cached on
  this class (the ``_kernel`` analog; compilation at first call replaces
  CUDA codegen + nvcc);
* **host**   — the methods below: accept/return batch-major ``(B, dim)`` (or
  unbatched ``(dim,)``) numpy/JAX arrays, handle layout, dtype, and packed
  ``q_qd_u`` inputs (the host-wrapper analog of ``inverse_dynamics<T>(...)``
  + ``gridData`` packing, ``GRiDCodeGenerator.py:120-213``).

Example::

    from gridcodegenerator_tpu import GRiD
    grid = GRiD("iiwa")                       # or GRiD(urdf_path/xml/topology)
    c     = grid.id(q, qd, qdd)               # RNEA         (B, n)
    Minv  = grid.minv(q)                      # (B, n, n)
    qdd   = grid.fd(q, qd, u)                 # Minv route
    qdd   = grid.aba(q, qd, u)                # ABA route
    M     = grid.crba(q)
    dc_du = grid.id_du(q, qd, qdd)            # (B, n, 2n)
    df_du = grid.fd_du(q, qd, u)              # (B, n, 2n)
    so    = grid.idsva_so(q, qd, qdd)         # (B, 4, n, n, n)
    pose  = grid.eepos(q)                     # (B, 6*num_ees)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import RobotModel, build_model
from .models.zoo import list_robots, load_robot
from .ops import aba as _aba
from .ops import crba as _crba
from .ops import eepose as _eepose
from .ops import fd as _fd
from .ops import fd_grad as _fd_grad
from .ops import id_grad as _id_grad
from .ops import minv as _minv
from .ops import rnea as _rnea
from .ops import so as _so
from .ops.common import DEFAULT_GRAVITY
from .ops.pallas import kernels as _pk
from .topology.robot import RobotTopology
from .topology.urdf import parse_urdf


def init_robot(source: Union[str, RobotTopology],
               floating_base: bool = False) -> RobotTopology:
    """Load a robot: zoo name, URDF path, or URDF XML string.

    The ``init_robotModel`` analog (``/root/reference/helpers/
    _topology_helpers.py:715-730``) — everything device-side is then baked by
    :class:`GRiD` / :func:`build_model`.
    """
    if isinstance(source, RobotTopology):
        return source
    if "<robot" in source:
        return parse_urdf(source, floating_base=floating_base)
    if source.replace("_floating", "") in [
            n.replace("_floating", "") for n in list_robots()]:
        return load_robot(source + ("_floating" if floating_base
                                    and not source.endswith("_floating")
                                    else ""))
    return parse_urdf(source, floating_base=floating_base)


class GRiD:
    """Per-robot compiled dynamics suite (the generated-header analog)."""

    def __init__(
        self,
        robot: Union[str, RobotTopology],
        dtype=jnp.float32,
        gravity: float = DEFAULT_GRAVITY,
        floating_base: bool = False,
        use_pallas: Optional[bool] = None,
        block_b: Optional[int] = None,
        ee_targets: Optional[Sequence[str]] = None,
    ):
        """``use_pallas``: run the fused single-kernel tier (default: auto —
        on for fixed-base robots on TPU backends, off elsewhere). Batches not
        divisible by ``block_b`` fall back to the XLA path for that call.

        ``ee_targets``: fixed-joint frame names to treat as end effectors
        (the reference's ``fixed_target_name`` mechanism, incl. passing every
        fixed joint — the default when the robot has fixed joints)."""
        self.topology = init_robot(robot, floating_base=floating_base)
        self.model: RobotModel = build_model(self.topology, dtype=dtype)
        self.dtype = dtype
        self.gravity = float(gravity)
        self.n = self.model.n
        self.num_pos = self.model.num_pos
        self.num_vel = self.model.num_vel
        self.ee_targets = tuple(ee_targets) if ee_targets is not None else None
        self.num_ees = _eepose.num_ees(self.model, self.ee_targets)
        if use_pallas is None:
            use_pallas = (not self.model.floating_base
                          and jax.default_backend() == "tpu")
        self.use_pallas = bool(use_pallas) and not self.model.floating_base
        self.block_b = _pk.default_block_b(self.model, block_b)

    # ------------------------------------------------------------------
    # layout shims: user (B, dim) <-> kernel (dim, B)
    # ------------------------------------------------------------------
    def _in(self, x, dim):
        x = jnp.asarray(x, self.dtype)
        if x.ndim == 1:
            assert x.shape[0] == dim, (x.shape, dim)
            return x[:, None], True
        assert x.shape[-1] == dim, (x.shape, dim)
        return x.T, False

    @staticmethod
    def _out(x, unbatched):
        # kernel output (..., B) -> user (B, ...) or unbatched (...)
        x = jnp.moveaxis(x, -1, 0)
        return x[0] if unbatched else x

    # ------------------------------------------------------------------
    # fused Pallas kernel tier (cached; fixed-base TPU hot path)
    # ------------------------------------------------------------------
    def _pallas(self, name, builder):
        cache = self.__dict__.setdefault("_pallas_cache", {})
        if name not in cache:
            cache[name] = jax.jit(builder())
        return cache[name]

    def _run(self, xla_fn, pallas_name, pallas_builder, args, block=None,
             enabled=True):
        B = args[0].shape[-1]
        if enabled and self.use_pallas and B % (block or self.block_b) == 0:
            return self._pallas(pallas_name, pallas_builder)(*args)
        return xla_fn(*args)

    # ------------------------------------------------------------------
    # jitted kernel tier (cached per algorithm)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _id(self):
        return jax.jit(lambda q, qd, qdd: _rnea.rnea(
            self.model, q, qd, qdd, self.gravity))

    @functools.cached_property
    def _id_nq(self):
        return jax.jit(lambda q, qd: _rnea.rnea(
            self.model, q, qd, None, self.gravity))

    @functools.cached_property
    def _minv(self):
        return jax.jit(lambda q: _minv.minv(self.model, q, True))

    @functools.cached_property
    def _minv_upper(self):
        return jax.jit(lambda q: _minv.minv(self.model, q, False))

    @functools.cached_property
    def _fd(self):
        return jax.jit(lambda q, qd, u: _fd.forward_dynamics(
            self.model, q, qd, u, self.gravity))

    @functools.cached_property
    def _aba(self):
        return jax.jit(lambda q, qd, u: _aba.aba(
            self.model, q, qd, u, self.gravity))

    @functools.cached_property
    def _crba(self):
        return jax.jit(lambda q: _crba.crba(self.model, q))

    @functools.cached_property
    def _id_du(self):
        return jax.jit(lambda q, qd, qdd: _id_grad.id_grad(
            self.model, q, qd, qdd, self.gravity))

    @functools.cached_property
    def _fd_du(self):
        return jax.jit(lambda q, qd, u: _fd_grad.fd_grad(
            self.model, q, qd, u, self.gravity))

    @functools.cached_property
    def _idsva_so(self):
        return jax.jit(lambda q, qd, qdd: _so.idsva_so(
            self.model, q, qd, qdd, self.gravity))

    @functools.cached_property
    def _fdsva_so(self):
        return jax.jit(lambda q, qd, u: _so.fdsva_so(
            self.model, q, qd, u, self.gravity))

    @functools.cached_property
    def _eepos(self):
        return jax.jit(lambda q: _eepose.eepos(self.model, q, self.ee_targets))

    @functools.cached_property
    def _deepos(self):
        return jax.jit(lambda q: _eepose.deepos(
            self.model, q, self.ee_targets))

    @functools.cached_property
    def _d2eepos(self):
        return jax.jit(lambda q: _eepose.d2eepos(
            self.model, q, self.ee_targets))

    # ------------------------------------------------------------------
    # host tier
    # ------------------------------------------------------------------
    def id(self, q, qd, qdd=None):
        """RNEA inverse dynamics c(q, qd[, qdd]): (B, nv)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        if qdd is None:
            out = self._run(self._id_nq, "id_nq",
                            lambda: _pk.rnea_pallas(
                                self.model, self.gravity, with_qdd=False,
                                block_b=self.block_b), (qk, qdk))
            return self._out(out, ub)
        qddk, _ = self._in(qdd, self.num_vel)
        out = self._run(self._id, "id",
                        lambda: _pk.rnea_pallas(
                            self.model, self.gravity, block_b=self.block_b),
                        (qk, qdk, qddk))
        return self._out(out, ub)

    def minv(self, q, dense: bool = True):
        """M(q)^-1: (B, nv, nv); ``dense=False`` gives the upper factor."""
        qk, ub = self._in(q, self.num_pos)
        fn = self._minv if dense else self._minv_upper
        out = self._run(fn, f"minv_{dense}",
                        lambda: _pk.minv_pallas(
                            self.model, dense, block_b=self.block_b), (qk,))
        return self._out(out, ub)

    def fd(self, q, qd, u):
        """Forward dynamics qdd via the Minv route: (B, nv)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        uk, _ = self._in(u, self.num_vel)
        out = self._run(self._fd, "fd",
                        lambda: _pk.fd_pallas(
                            self.model, self.gravity, block_b=self.block_b),
                        (qk, qdk, uk))
        return self._out(out, ub)

    def aba(self, q, qd, u):
        """Forward dynamics qdd via the articulated-body algorithm: (B, nv)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        uk, _ = self._in(u, self.num_vel)
        out = self._run(self._aba, "aba",
                        lambda: _pk.aba_pallas(
                            self.model, self.gravity, block_b=self.block_b),
                        (qk, qdk, uk))
        return self._out(out, ub)

    def crba(self, q):
        """Mass matrix M(q): (B, nv, nv)."""
        qk, ub = self._in(q, self.num_pos)
        out = self._run(self._crba, "crba",
                        lambda: _pk.crba_pallas(
                            self.model, block_b=self.block_b), (qk,))
        return self._out(out, ub)

    def id_du(self, q, qd, qdd=None):
        """Analytical dc/d[q|qd]: (B, nv, 2*nv)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        qddk = (jnp.zeros_like(qdk) if qdd is None
                else self._in(qdd, self.num_vel)[0])
        out = self._run(self._id_du, "id_du",
                        lambda: _pk.id_du_pallas(
                            self.model, self.gravity, block_b=self.block_b),
                        (qk, qdk, qddk))
        return self._out(out, ub)

    def fd_du(self, q, qd, u):
        """Analytical dqdd/d[q|qd]: (B, nv, 2*nv). dqdd/dtau is minv(q)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        uk, _ = self._in(u, self.num_vel)
        out = self._run(self._fd_du, "fd_du",
                        lambda: _pk.fd_du_pallas(
                            self.model, self.gravity, block_b=self.block_b),
                        (qk, qdk, uk))
        return self._out(out, ub)

    def idsva_so(self, q, qd, qdd=None):
        """Second-order ID tensors [d2tau/dq2, d2tau/dqd2, cross, dM/dq]:
        (B, 4, nv, nv, nv).

        ``qdd`` defaults to ZEROS. The reference's kernels take the realized
        accelerations — pass qdd (e.g. from :meth:`fd`) whenever the tensors
        must be consistent with a trajectory."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        qddk = (jnp.zeros_like(qdk) if qdd is None
                else self._in(qdd, self.num_vel)[0])
        out = self._run(self._idsva_so, "idsva_so",
                        lambda: _pk.idsva_so_pallas(self.model, self.gravity),
                        (qk, qdk, qddk),
                        block=_pk.so_block_b(self.model),
                        enabled=_pk.so_prefer_fused(self.model))
        return self._out(out, ub)

    def fdsva_so(self, q, qd, u):
        """Second-order FD tensors [d2qdd/dq2, d2qdd/dqd2, cross, dMinv/dq]:
        (B, 4, nv, nv, nv)."""
        qk, ub = self._in(q, self.num_pos)
        qdk, _ = self._in(qd, self.num_vel)
        uk, _ = self._in(u, self.num_vel)
        out = self._run(self._fdsva_so, "fdsva_so",
                        lambda: _pk.fdsva_so_pallas(self.model, self.gravity),
                        (qk, qdk, uk),
                        block=_pk.so_block_b(self.model),
                        enabled=_pk.so_prefer_fused(self.model, "fdsva_so"))
        return self._out(out, ub)

    def eepos(self, q):
        """End-effector poses [xyz, rpy] per EE: (B, 6*num_ees)."""
        qk, ub = self._in(q, self.num_pos)
        out = self._run(self._eepos, "eepos",
                        lambda: _pk.eepos_pallas(
                            self.model, self.ee_targets,
                            block_b=self.block_b), (qk,))
        return self._out(out, ub)

    def deepos(self, q):
        """EE pose Jacobians: (B, 6*num_ees, num_pos)."""
        qk, ub = self._in(q, self.num_pos)
        out = self._run(self._deepos, "deepos",
                        lambda: _pk.deepos_pallas(
                            self.model, self.ee_targets,
                            block_b=self.block_b), (qk,))
        return self._out(out, ub)

    def d2eepos(self, q):
        """EE pose Hessians: (B, 6*num_ees, num_pos, num_pos)."""
        qk, ub = self._in(q, self.num_pos)
        out = self._run(self._d2eepos, "d2eepos",
                        lambda: _pk.d2eepos_pallas(self.model,
                                                   self.ee_targets),
                        (qk,), block=_pk.so_block_b(self.model),
                        enabled=_pk.ee_hess_fits(self.model, self.num_ees))
        return self._out(out, ub)

    # -- packed-input convenience (gridData q_qd_u layout parity) ---------
    def fk(self, q):
        """World homogeneous transforms of every joint frame: (B, n, 4, 4)
        (the reference's ``X_single_thread`` / ``X_warp`` FK accumulators)."""
        qk, ub = self._in(q, self.num_pos)
        return self._out(self._fk(qk), ub)

    @functools.cached_property
    def _fk(self):
        return jax.jit(lambda q: _eepose.fk(self.model, q))

    def fd_du_packed(self, q_qd_u):
        """Packed (B, num_pos + 2*num_vel) input, as the reference's
        ``d_q_qd_u`` stride-3n buffer (``GRiDCodeGenerator.py:163-183``)."""
        np_, nv = self.num_pos, self.num_vel
        q = q_qd_u[..., :np_]
        qd = q_qd_u[..., np_:np_ + nv]
        u = q_qd_u[..., np_ + nv:]
        return self.fd_du(q, qd, u)

    def id_packed(self, q_qd_qdd):
        np_, nv = self.num_pos, self.num_vel
        return self.id(q_qd_qdd[..., :np_], q_qd_qdd[..., np_:np_ + nv],
                       q_qd_qdd[..., np_ + nv:])

    def _unpack3(self, q_qd_u):
        np_, nv = self.num_pos, self.num_vel
        return (q_qd_u[..., :np_], q_qd_u[..., np_:np_ + nv],
                q_qd_u[..., np_ + nv:])

    def aba_packed(self, q_qd_u):
        """Packed stride-(num_pos+2nv) input (USE_COMPRESSED_MEM analog)."""
        return self.aba(*self._unpack3(q_qd_u))

    def fd_packed(self, q_qd_u):
        return self.fd(*self._unpack3(q_qd_u))

    def idsva_so_packed(self, q_qd_qdd):
        return self.idsva_so(*self._unpack3(q_qd_qdd))

    def fdsva_so_packed(self, q_qd_u):
        return self.fdsva_so(*self._unpack3(q_qd_u))

    # ------------------------------------------------------------------
    def joint_limits(self) -> np.ndarray:
        return np.asarray(self.model.joint_limits)

    def __repr__(self):
        return (f"GRiD({self.model.name!r}, n={self.n}, "
                f"dtype={jnp.dtype(self.dtype).name}, "
                f"floating={self.model.floating_base})")
