"""Cost models for the trajectory optimizers.

The optimizers consume a ``CostModel`` exposing stage/terminal values and
their quadratic expansions on lane-major batched states x = [q; qd] (2n, B)
and controls u (n, B). Provided models:

* :class:`QuadCost` — diagonal quadratic tracking cost (closed-form
  expansions; the standard benchmark cost);
* :class:`EEReachCost` — end-effector reach: 0.5*||ee_xyz(q) - goal||^2_W
  with Gauss-Newton Hessian via the analytical FK Jacobian, plus quadratic
  velocity/control regularizers (the iLQR point-to-point reach task of
  BASELINE.md config 3).
"""

from __future__ import annotations

import functools

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import RobotModel
from ..ops import eepose as _eepose

# einsum pinned to full f32 accumulation: TPU dot_general defaults to
# bf16 MXU precision, unacceptable for dynamics (see ops/xforms.py)
_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



class CostModel:
    """Interface: all arrays lane-major, t is the knot index (static int)."""

    # True when the stage-cost curvature (lxx, luu, lux) is independent of
    # (x, u, t): lets the fused Riccati kernel take a single curvature block
    # instead of an (N, ...) stack
    stationary_curvature = False

    # True when stage()/stage_expansion() ignore t: the solver folds the
    # horizon into the lane axis and evaluates ONE stage call over (N*B)
    # lanes instead of N unrolled calls — essential for FK-based costs
    # (EEReachCost), whose per-knot expansion would otherwise duplicate the
    # whole kinematic-chain trace N times (compile blow-up) and leave the
    # VPU lanes N-times under-filled at runtime
    time_invariant = False

    def stage(self, x, u, t):
        """-> scalar cost per lane (B,)."""
        raise NotImplementedError

    def terminal(self, x):
        raise NotImplementedError

    def stage_expansion(self, x, u, t):
        """-> (l, lx (2n,B), lu (n,B), lxx (2n,2n,B), luu (n,n,B),
        lux (n,2n,B))."""
        raise NotImplementedError

    def terminal_expansion(self, x):
        """-> (l, lx, lxx)."""
        raise NotImplementedError


@dataclasses.dataclass
class QuadCost(CostModel):
    """0.5 (x-xg)^T Q (x-xg) + 0.5 u^T R u, terminal Qf; diagonal weights."""

    Q: jnp.ndarray       # (2n,)
    R: jnp.ndarray       # (n,)
    Qf: jnp.ndarray      # (2n,)
    x_goal: jnp.ndarray  # (2n,) or (2n, B)

    stationary_curvature = True

    @property
    def time_invariant(self):
        # a (2n, B) per-problem goal cannot broadcast against the solver's
        # (2n, N*B) folded lanes; only the shared-goal form folds
        return jnp.asarray(self.x_goal).ndim == 1

    def _xg(self, x):
        xg = self.x_goal
        return xg[:, None] if xg.ndim == 1 else xg

    def stage(self, x, u, t):
        dx = x - self._xg(x)
        return (0.5 * jnp.sum(self.Q[:, None] * dx * dx, axis=0)
                + 0.5 * jnp.sum(self.R[:, None] * u * u, axis=0))

    def terminal(self, x):
        dx = x - self._xg(x)
        return 0.5 * jnp.sum(self.Qf[:, None] * dx * dx, axis=0)

    def stage_expansion(self, x, u, t):
        B = x.shape[-1]
        dx = x - self._xg(x)
        lx = self.Q[:, None] * dx
        lu = self.R[:, None] * u
        lxx = jnp.diag(self.Q)[:, :, None] + jnp.zeros((1, 1, B), x.dtype)
        luu = jnp.diag(self.R)[:, :, None] + jnp.zeros((1, 1, B), x.dtype)
        lux = jnp.zeros((u.shape[0], x.shape[0], B), x.dtype)
        return self.stage(x, u, t), lx, lu, lxx, luu, lux

    def terminal_expansion(self, x):
        B = x.shape[-1]
        dx = x - self._xg(x)
        lxx = jnp.diag(self.Qf)[:, :, None] + jnp.zeros((1, 1, B), x.dtype)
        return self.terminal(x), self.Qf[:, None] * dx, lxx

    # -- in-kernel cost hooks (fused line-search rollout) ------------------
    # (consts, stage_fn, terminal_fn): arrays ride as kernel inputs
    # (Pallas rejects captured array constants); closures are jnp-traceable
    # on lane-major (d, bb) blocks inside Mosaic. All leading-axis sums are
    # UNROLLED row-by-row — Mosaic rejects sublane reductions over offset
    # slices, and the row counts are tiny static ints (nx, n, 3).
    def pallas_cost(self):
        if not self.time_invariant:
            return None
        xg = jnp.asarray(self.x_goal)[:, None]
        consts = (jnp.asarray(self.Q)[:, None], jnp.asarray(self.R)[:, None],
                  jnp.asarray(self.Qf)[:, None], xg)
        nx = int(np.shape(self.Q)[0])
        nu = int(np.shape(self.R)[0])

        # [i, 0] scalar extracts (not [i] -> (1,)-shaped rows): a scalar
        # splat broadcasts into any batch-tile rank inside Mosaic; a (1,)
        # vector cannot reach the 2-D (8, 128) tiles
        def stage(cv, x, u):
            Q, R, _, xg_ = cv
            acc = None
            for i in range(nx):
                d = x[i] - xg_[i, 0]
                t = Q[i, 0] * d * d
                acc = t if acc is None else acc + t
            for i in range(nu):
                acc = acc + R[i, 0] * u[i] * u[i]
            return 0.5 * acc

        def term(cv, x):
            _, _, Qf, xg_ = cv
            acc = None
            for i in range(nx):
                d = x[i] - xg_[i, 0]
                t = Qf[i, 0] * d * d
                acc = t if acc is None else acc + t
            return 0.5 * acc

        return consts, stage, term


@dataclasses.dataclass
class EEReachCost(CostModel):
    """Reach an EE xyz goal: stage/terminal GN cost on FK + regularizers."""

    model: RobotModel
    goal_xyz: jnp.ndarray        # (3,) or (3, B)
    w_pos: float = 1.0           # stage EE weight
    w_pos_f: float = 100.0       # terminal EE weight
    w_vel: float = 1e-2
    w_u: float = 1e-4
    ee_index: int = 0

    @property
    def time_invariant(self):
        # lets the solver fold the horizon into the lane axis: ONE
        # FK + Jacobian evaluation over (N*B) lanes per sweep instead of N
        # unrolled chain traces (see ilqr.make_ilqr)
        return jnp.asarray(self.goal_xyz).ndim == 1

    def _err_jac(self, q):
        """EE xyz error (3,B) + Jacobian (3,n,B) for EE ``ee_index``."""
        pose = _eepose.eepos(self.model, q)
        J = _eepose.deepos(self.model, q)
        k = 6 * self.ee_index
        g = self.goal_xyz
        g = g[:, None] if g.ndim == 1 else g
        return pose[k:k + 3] - g, J[k:k + 3]

    def stage(self, x, u, t):
        n = self.model.num_vel
        q, qd = x[:n], x[n:]
        e, _ = self._err_jac(q)
        return (0.5 * self.w_pos * jnp.sum(e * e, axis=0)
                + 0.5 * self.w_vel * jnp.sum(qd * qd, axis=0)
                + 0.5 * self.w_u * jnp.sum(u * u, axis=0))

    def terminal(self, x):
        n = self.model.num_vel
        q, qd = x[:n], x[n:]
        e, _ = self._err_jac(q)
        return (0.5 * self.w_pos_f * jnp.sum(e * e, axis=0)
                + 0.5 * self.w_vel * jnp.sum(qd * qd, axis=0))

    def _expand(self, x, w_pos):
        n = self.model.num_vel
        B = x.shape[-1]
        dtype = x.dtype
        q, qd = x[:n], x[n:]
        e, J = self._err_jac(q)
        # gradient: [w J^T e ; w_vel qd]; GN Hessian: [w J^T J, 0; 0, w_vel I]
        JTe = jnp.sum(J * e[:, None, :], axis=0)              # (n, B)
        JTJ = _es("kib,kjb->ijb", J, J)
        lx = jnp.concatenate([w_pos * JTe, self.w_vel * qd], axis=0)
        eye_n = jnp.eye(n, dtype=dtype)[:, :, None] + jnp.zeros((1, 1, B), dtype)
        z = jnp.zeros((n, n, B), dtype)
        top = jnp.concatenate([w_pos * JTJ, z], axis=1)
        bot = jnp.concatenate([z, self.w_vel * eye_n], axis=1)
        lxx = jnp.concatenate([top, bot], axis=0)
        return lx, lxx

    def stage_expansion(self, x, u, t):
        n = self.model.num_vel
        B = x.shape[-1]
        lx, lxx = self._expand(x, self.w_pos)
        lu = self.w_u * u
        luu = (self.w_u * jnp.eye(n, dtype=x.dtype)[:, :, None]
               + jnp.zeros((1, 1, B), x.dtype))
        lux = jnp.zeros((n, 2 * n, B), x.dtype)
        return self.stage(x, u, t), lx, lu, lxx, luu, lux

    # -- Gauss-Newton factor protocol (factored fused Riccati) ------------
    # lxx = blkdiag(Jw^T Jw, qd_diag*I), luu = u_diag*I, lux = 0: the
    # solver streams the (rank, n) factor into the backward kernel instead
    # of materializing the dense (nx, nx, N*B) curvature (~17 ms/sweep of
    # HBM traffic at MPC sizes — 3x the Riccati kernel itself).
    gn_factor_rank = 3

    @property
    def gn_factor_diags(self):
        return (self.w_vel, self.w_u)

    def gn_stage_factor(self, x, u, t):
        """(Jw (rank, n, B), lx (2n, B), lu (n, B)); see gn_factor_rank."""
        n = self.model.num_vel
        q, qd = x[:n], x[n:]
        e, J = self._err_jac(q)
        JTe = jnp.sum(J * e[:, None, :], axis=0)
        lx = jnp.concatenate([self.w_pos * JTe, self.w_vel * qd], axis=0)
        lu = self.w_u * u
        Jw = jnp.sqrt(jnp.asarray(self.w_pos, x.dtype)) * J
        return Jw, lx, lu

    # -- in-kernel cost hooks (fused line-search rollout) ------------------
    def pallas_cost(self):
        if not self.time_invariant:
            return None
        import dataclasses as _dc
        m = self.model
        g = jnp.asarray(self.goal_xyz)[:, None]
        consts = (m.Ttree, m.Tfixed, g)
        n = m.num_vel
        w_pos, w_pos_f = self.w_pos, self.w_pos_f
        w_vel, w_u = self.w_vel, self.w_u

        kx = 3 * self.ee_index

        def _sq(cv, x):
            # unrolled row sums (Mosaic rejects sublane reductions over
            # offset slices; rows are tiny static counts)
            mm = _dc.replace(m, Ttree=cv[0], Tfixed=cv[1])
            xyz = _eepose.eexyz(mm, x[:n])  # position-only FK: no atan2
            e2 = None
            for i in range(3):
                d = xyz[kx + i] - cv[2][i, 0]   # scalar extract (2-D tiles)
                t = d * d
                e2 = t if e2 is None else e2 + t
            v2 = None
            for i in range(n):
                r = x[n + i]
                t = r * r
                v2 = t if v2 is None else v2 + t
            return e2, v2

        def stage(cv, x, u):
            e2, v2 = _sq(cv, x)
            u2 = None
            for i in range(n):
                t = u[i] * u[i]
                u2 = t if u2 is None else u2 + t
            return 0.5 * (w_pos * e2 + w_vel * v2 + w_u * u2)

        def term(cv, x):
            e2, v2 = _sq(cv, x)
            return 0.5 * (w_pos_f * e2 + w_vel * v2)

        return consts, stage, term

    def terminal_expansion(self, x):
        lx, lxx = self._expand(x, self.w_pos_f)
        return self.terminal(x), lx, lxx
