"""Batched iLQR / DDP over the TPU dynamics-gradient suite.

The trajectory-optimization layer named in the north star (BASELINE.md
configs 3-4) — nothing to mirror in the reference repo itself, which stops at
the dynamics kernels; this is what those kernels exist to serve (the GRiD
wrapper's downstream MPC use case).

TPU-native design:
  * the solver is *batched over problems*: every array carries a trailing
    lane axis B (independent MPC problems / scenario rollouts), so even the
    sequential Riccati sweep and rollouts keep the VPU lanes full;
  * per-knot dynamics linearizations for ALL N knots and B problems are one
    fused ``fd_du`` call with the horizon folded into the batch axis
    ((n, N*B) lanes) — the analog of the reference's NUM_TIMESTEPS
    block-per-knot batching;
  * time recursions (rollout, Riccati) are ``lax.scan``; the line search
    evaluates every candidate step size in one widened-batch feedback
    rollout ((n_alpha*B) lanes) and selects the per-problem argmin;
  * DDP mode (``use_second_order=True``) adds the exact second-order
    dynamics contraction V_x . f_xx from the FDSVA-SO tensor suite
    (BASELINE.md config 4).

Integrator: semi-implicit Euler — qd' = qd + dt*qdd, q' = q + dt*qd'.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from ..ops import fd_grad as _fd_grad
from ..ops import so as _so
from ..ops.aba import aba as _aba_fn
from ..ops.common import DEFAULT_GRAVITY
from ..ops.linalg import gj_inverse
from ..ops.spatial import bmm, bmv
from .cost import CostModel


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    N: int = 64                   # knot points (horizon)
    dt: float = 0.01
    iters: int = 10
    reg: float = 1e-6             # Quu Levenberg regularization
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    ls_two_stage: bool = False    # OPT-IN adaptive two-stage line search on
                                  # the fused-kernel path: roll out
                                  # ls_coarse, then ONE extra rollout at a
                                  # per-problem refined step size
                                  # (ls_fine_factor x the coarse argmin).
                                  # Measured r5 @B=2048 iiwa EE-reach, 5
                                  # iters: 4+1 rollouts -> 43.7k solves/s
                                  # but 12% worse final cost vs the full
                                  # alphas grid at 40.9k — with the 2-D
                                  # sweep tiles the full grid is cheap
                                  # enough that exactness wins by default;
                                  # flip this on when iteration throughput
                                  # matters more than per-iteration decrease
    ls_coarse: Tuple[float, ...] = (1.0, 0.5, 0.15, 0.02)
    ls_fine_factor: float = 0.45
    use_second_order: bool = False
    gravity: float = DEFAULT_GRAVITY
    u_min: object = None          # control box bounds (projected rollouts):
    u_max: object = None          # scalar, per-dof (n,) array, or None.
                                  # When BOTH are None, make_ilqr derives
                                  # them from the robot's URDF effort limits
                                  # (±effort per joint; no clamping if the
                                  # model has none) — the reference bakes
                                  # joint limits into the device blob the
                                  # same way (_topology_helpers.py:732-778)
    use_pallas: bool = None       # fused kernels in the hot loops (None =
                                  # auto: TPU backend + fixed-base robot)
    pallas_block: int = 256       # fused-kernel batch tile
    parallel_riccati: bool = False  # associative-scan backward sweep:
                                  # depth N -> log2(N), ~2x FLOPs (see
                                  # trajopt/priccati.py); first-order only
    fused_sweeps: bool = True     # run whole rollout / Riccati sweeps as
                                  # single Pallas kernels (horizon loop
                                  # inside the kernel — kills the per-knot
                                  # dispatch overhead of scan-of-kernels)
    knot_axis: str = None         # mesh axis name for the knot-sharded
                                  # backward pass: the solver must then run
                                  # INSIDE a shard_map providing this axis
                                  # (parallel/scenario.py drives it); each
                                  # device linearizes + Riccati-sweeps only
                                  # its N/D knot chunk, the value recursion
                                  # reduces over ICI in ceil(log2 D)
                                  # ppermute rounds (parallel/knot_riccati),
                                  # and the small (N, n, ...) gains are
                                  # all-gathered for the replicated rollout
    knot_axis_size: int = 1       # size D of that axis (static)

    def clamp(self, u):
        if self.u_min is None and self.u_max is None:
            return u
        return jnp.clip(u, *_lane_bounds(self.u_min, self.u_max))


def _lane_bounds(u_min, u_max):
    """Normalize scalar / (n,) / (n,1) bounds to broadcast against (n, B)."""
    import numpy as _np

    def norm(b):
        if b is None or _np.isscalar(b):
            return b
        b = _np.asarray(b, _np.float32)
        return b.reshape(-1, 1) if b.ndim == 1 else b

    return norm(u_min), norm(u_max)


def resolve_control_bounds(model: RobotModel, cfg: "ILQRConfig"):
    """Effective (u_min, u_max): the config's if set, else the robot's
    effort limits (±tau_max per dof); (None, None) when unbounded."""
    import numpy as _np
    if cfg.u_min is not None or cfg.u_max is not None:
        return _lane_bounds(cfg.u_min, cfg.u_max)
    eff = _np.asarray(model.effort_limit, _np.float64)
    if not _np.isfinite(eff).any():
        return None, None
    eff32 = eff.astype(_np.float32).reshape(-1, 1)
    return -eff32, eff32


class ILQRResult(NamedTuple):
    X: jnp.ndarray           # (N+1, 2n, B) optimized state trajectory
    U: jnp.ndarray           # (N, n, B) optimized controls
    cost: jnp.ndarray        # (B,) final cost
    cost_trace: jnp.ndarray  # (iters+1, B)
    K: jnp.ndarray           # (N, n, 2n, B) final feedback gains
    k: jnp.ndarray           # (N, n, B) final feedforward


def dynamics_step(model: RobotModel, x, u, dt, gravity=DEFAULT_GRAVITY):
    """Semi-implicit Euler step on lane-major x = [q; qd] (2n, B)."""
    n = model.num_vel
    q, qd = x[:n], x[n:]
    qdd = _aba_fn(model, q, qd, u, gravity)
    qd_new = qd + dt * qdd
    return jnp.concatenate([q + dt * qd_new, qd_new], axis=0)


def make_ilqr(model: RobotModel, cost: CostModel, cfg: ILQRConfig,
              expose_parts: bool = False):
    """Build a batched solver: solve(x0 (2n,B), U0 (N,n,B)) -> ILQRResult.

    ``expose_parts=True`` additionally returns the internal phase closures
    ({rollout, linearize, backward, forward, total_cost}) so the benchmark
    driver can time each solver phase in isolation (the per-phase
    decomposition of the headline solves/s metric).

    The returned callable is pure and jittable (callers should wrap in
    ``jax.jit``); everything inside specializes on the static config/model.
    """
    if model.floating_base:
        # the state chart here is x = [q; qd] with len(q) == num_vel, which
        # is wrong for a quaternion base (num_pos = num_vel + 1); supporting
        # it needs manifold integration (local SO(3) tangent steps + chart
        # retraction in rollout/linearize). Fail loudly instead of slicing
        # garbage. The dynamics/gradient kernels themselves are floating-
        # capable (XLA tier) — only the trajopt state chart is fixed-base.
        raise NotImplementedError(
            "make_ilqr requires a fixed-base model: the solver's state is "
            "[q; qd] with num_pos == num_vel. Floating-base trajopt needs "
            "quaternion-manifold integration (planned; see README roadmap).")
    n = model.num_vel
    u_lo, u_hi = resolve_control_bounds(model, cfg)

    def clamp(u):
        if u_lo is None and u_hi is None:
            return u
        return jnp.clip(u, u_lo, u_hi)
    nx = 2 * n
    N, dt = cfg.N, cfg.dt
    na = len(cfg.alphas)

    # fused Pallas kernels for the two hot loops (linearization + rollouts);
    # calls fall back to the XLA builders whenever the lane count is not a
    # multiple of the tile (e.g. the CPU-mesh dry run's tiny shapes)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and not model.floating_base)
    blk = cfg.pallas_block
    fused_fd_du = fused_aba = fused_so = None
    fused_roll = fused_fb = fused_fb_fine = fused_ric = fused_ric_gn = None
    fb_with_cost = two_stage = False
    so_blk = roll_blk = ric_blk = None
    stationary_cost = getattr(cost, "stationary_curvature", False)
    fold_t = getattr(cost, "time_invariant", False)
    if use_pallas and not model.floating_base:
        from ..ops.pallas import kernels as _pk
        from ..ops.pallas import sweeps as _ps
        fused_fd_du = _pk.fd_du_pallas(model, cfg.gravity, block_b=blk,
                                       with_extras=True)
        fused_aba = _pk.aba_pallas(model, cfg.gravity, block_b=blk)
        if cfg.use_second_order and _pk.so_prefer_fused(model, "fdsva_so"):
            so_blk = _pk.so_block_b(model)
            fused_so = _pk.fdsva_so_pallas(model, cfg.gravity)
        if cfg.fused_sweeps:
            roll_blk = _ps.rollout_block_b(model)
            fused_roll = _ps.rollout_pallas(
                model, N, dt, cfg.gravity, u_lo, u_hi,
                block_b=roll_blk)
            # in-kernel cost accumulation (see sweeps.linesearch_rollout_
            # pallas): the widened (na*N*B)-lane trajectory is never
            # re-read by a separate cost/FK pass
            pc = getattr(cost, "pallas_cost", lambda: None)()
            fb_kw = {}
            if pc is not None:
                ccv, _stage, _term = pc
                fb_kw = dict(cost_consts=ccv, stage_cost=_stage,
                             terminal_cost=_term)
            fb_with_cost = bool(fb_kw)
            two_stage = cfg.ls_two_stage and fb_with_cost
            fused_fb = _ps.linesearch_rollout_pallas(
                model, N, dt, cfg.gravity,
                cfg.ls_coarse if two_stage else cfg.alphas, u_lo, u_hi,
                block_b=roll_blk, **fb_kw)
            if two_stage:
                fused_fb_fine = _ps.linesearch_rollout_pallas(
                    model, N, dt, cfg.gravity, (1.0,), u_lo, u_hi,
                    block_b=roll_blk, **fb_kw)
            if (not cfg.use_second_order and not cfg.parallel_riccati
                    and cfg.knot_axis is None
                    and _ps.riccati_fits(n, N, stationary_cost)):
                # the streamed kernel adapts its (sub,128) tile to the lane
                # count; callers only need B to tile into 128-lane groups
                ric_blk = 128
                if (fold_t and not stationary_cost
                        and hasattr(cost, "gn_stage_factor")):
                    # Gauss-Newton-factored curvature: stream the (r, n)
                    # cost factor instead of dense (nx, nx, N*B) blocks
                    qd_d, u_d = cost.gn_factor_diags
                    fused_ric_gn = _ps.riccati_pallas_factored(
                        n, N, cfg.reg, cost.gn_factor_rank,
                        float(qd_d), float(u_d), dtype=model.Imat.dtype)
                else:
                    fused_ric = _ps.riccati_pallas(
                        n, N, cfg.reg, dtype=model.Imat.dtype,
                        stationary_curvature=stationary_cost)

    def step(x, u):
        """Semi-implicit Euler step, fused-ABA when the lanes tile."""
        if fused_aba is not None and x.shape[-1] % blk == 0:
            q, qd = x[:n], x[n:]
            qd_new = qd + dt * fused_aba(q, qd, u)
            return jnp.concatenate([q + dt * qd_new, qd_new], axis=0)
        return dynamics_step(model, x, u, dt, cfg.gravity)

    # ------------------------------------------------------------------
    def rollout(x0, U):
        if fused_roll is not None and x0.shape[-1] % roll_blk == 0:
            Xs = fused_roll(x0, U)
        else:
            def body(x, u):
                xn = step(x, clamp(u))
                return xn, xn
            _, Xs = jax.lax.scan(body, x0, U)
        return jnp.concatenate([x0[None], Xs], axis=0)  # (N+1, 2n, B)

    def _fold(Z):
        """(N, d, B) -> (d, N*B), knot-major (lane = t*B + b)."""
        return jnp.swapaxes(Z, 0, 1).reshape(Z.shape[1], -1)

    def _unfold(z):
        """(..., N*B) -> (N, ..., B), inverse of :func:`_fold`."""
        B = z.shape[-1] // N
        return jnp.moveaxis(z.reshape(z.shape[:-1] + (N, B)), -2, 0)

    def total_cost(X, U):
        c = cost.terminal(X[N])
        if fold_t:
            # time-invariant cost: ONE stage call over (N*B) lanes — one
            # trace of any FK chain inside the cost instead of N copies
            cs = cost.stage(_fold(X[:N]), _fold(U), 0)
            return c + jnp.sum(cs.reshape(N, -1), axis=0)
        for t in range(N):  # unrolled: t stays static for cost.stage
            c = c + cost.stage(X[t], U[t], t)
        return c

    # ------------------------------------------------------------------
    def linearize(Xs, U):
        """One fused fd_du call over Nk*B lanes -> discrete A, B blocks.

        ``Xs``/``U`` are (Nk, 2n, B)/(Nk, n, B) knot stacks (the full
        horizon, or one device's local chunk in knot-sharded mode). Lane
        layout is KNOT-MAJOR (lane = t*B + b): knot t's problems form one
        contiguous B-block, matching the ``reshape(.., Nk, B)`` unfolds
        below and the per-knot ``dynamic_slice`` of the second-order
        tensors in ``backward``.
        """
        Nk, B = Xs.shape[0], Xs.shape[-1]
        q = jnp.swapaxes(Xs[:, :n], 0, 1).reshape(n, Nk * B)
        qd = jnp.swapaxes(Xs[:, n:], 0, 1).reshape(n, Nk * B)
        u = jnp.swapaxes(U, 0, 1).reshape(n, Nk * B)
        if fused_fd_du is not None and (Nk * B) % blk == 0:
            df_du, _, Mi = fused_fd_du(q, qd, u)
        else:
            df_du, _, Mi = _fd_grad.fd_grad(model, q, qd, u, cfg.gravity,
                                            return_extras=True)
        dfdq, dfdqd = df_du[:, :n], df_du[:, n:]
        I_n = jnp.eye(n, dtype=Xs.dtype)[:, :, None]
        A21 = dt * dfdq                         # dqd'/dq
        A22 = I_n + dt * dfdqd                  # dqd'/dqd
        A11 = I_n + dt * A21                    # dq'/dq
        A12 = dt * A22                          # dq'/dqd
        Bqd = dt * Mi                           # dqd'/du
        Bq = dt * Bqd                           # dq'/du
        Amat = jnp.concatenate([
            jnp.concatenate([A11, A12], axis=1),
            jnp.concatenate([A21, A22], axis=1)], axis=0)    # (2n, 2n, Nk*B)
        Bmat = jnp.concatenate([Bq, Bqd], axis=0)            # (2n, n, Nk*B)
        Amat = jnp.moveaxis(Amat.reshape(nx, nx, Nk, B), 2, 0)
        Bmat = jnp.moveaxis(Bmat.reshape(nx, n, Nk, B), 2, 0)
        return Amat, Bmat, (q, qd, u)

    # ------------------------------------------------------------------
    # knot-sharded backward (cfg.knot_axis): linearization AND Riccati are
    # split over a mesh axis the caller's shard_map provides — each device
    # handles N/D knots, the value recursion reduces over ICI (ppermute),
    # and the gains are all-gathered for the (replicated) forward rollout.
    # BASELINE config 5's "Riccati reduce over ICI", in the solve path.
    knot_sharded = cfg.knot_axis is not None and cfg.knot_axis_size > 1
    if knot_sharded:
        if cfg.use_second_order or cfg.parallel_riccati:
            raise NotImplementedError(
                "knot-sharded backward is first-order and replaces "
                "parallel_riccati")
        if N % cfg.knot_axis_size != 0:
            raise ValueError((N, cfg.knot_axis_size))
        if not getattr(cost, "time_invariant", False):
            raise NotImplementedError(
                "knot-sharded backward needs a time-invariant cost "
                "(local chunks evaluate stage_expansion at t=0)")

    def backward_knot_sharded(X, U):
        D = cfg.knot_axis_size
        N_loc = N // D
        B = X.shape[-1]
        d = jax.lax.axis_index(cfg.knot_axis)
        t0 = d * N_loc
        X_loc = jax.lax.dynamic_slice_in_dim(X, t0, N_loc, 0)
        U_loc = jax.lax.dynamic_slice_in_dim(U, t0, N_loc, 0)
        Amat, Bmat, _ = linearize(X_loc, U_loc)
        dtype = X.dtype
        _, Vx0, Vxx0 = cost.terminal_expansion(X[N])
        Vx0 = Vx0.astype(dtype)
        Vxx0 = (Vxx0 + 0.0 * Vx0[0]).astype(dtype)
        _, lxf, luf, lxxf, luuf, luxf = jax.tree.map(
            lambda z: z.astype(dtype),
            cost.stage_expansion(_fold(X_loc), _fold(U_loc), 0))

        def unf(z):
            return jnp.moveaxis(
                z.reshape(z.shape[:-1] + (N_loc, B)), -2, 0)

        lx, lu = unf(lxf), unf(luf)
        lxx = unf(jnp.broadcast_to(lxxf, (nx, nx, N_loc * B)))
        luu = unf(jnp.broadcast_to(luuf, (n, n, N_loc * B)))
        lux = unf(jnp.broadcast_to(luxf, (n, nx, N_loc * B)))
        from ..parallel.knot_riccati import local_knot_gains
        ks_loc, Ks_loc = local_knot_gains(
            cfg.knot_axis, D, cfg.reg,
            Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0)
        ks = jax.lax.all_gather(ks_loc, cfg.knot_axis, axis=0, tiled=True)
        Ks = jax.lax.all_gather(Ks_loc, cfg.knot_axis, axis=0, tiled=True)
        return ks, Ks

    # ------------------------------------------------------------------
    def backward(X, U, Amat, Bmat, so_t):
        """Riccati sweep (reverse scan over knots), batched over lanes."""
        B = X.shape[-1]
        _, Vx0, Vxx0 = cost.terminal_expansion(X[N])
        # tie the carry to the (possibly shard_map-varying) state so the scan
        # carry types match even when lxx is a broadcast constant
        Vxx0 = Vxx0 + 0.0 * Vx0[0]

        if (fused_ric_gn is not None and so_t is None
                and B % ric_blk == 0):
            # factored fused sweep: the (r, n) GN factor and flat lx/lu
            # ride straight into the kernel in the knot-major lane layout
            # (no (nx, nx, N*B) curvature materialization, no unfolds)
            Jw, lxf, luf = cost.gn_stage_factor(_fold(X[:N]), _fold(U), 0)
            return fused_ric_gn(Amat, Bmat, lxf, luf, Jw, Vx0, Vxx0)

        if fold_t and not stationary_cost:
            # time-invariant non-stationary cost (e.g. EEReachCost): ONE
            # expansion call over (N*B) lanes — one FK/Jacobian trace for
            # the whole horizon, full lane occupancy
            _, lxf, luf, lxxf, luuf, luxf = cost.stage_expansion(
                _fold(X[:N]), _fold(U), 0)
            lx, lu = _unfold(lxf), _unfold(luf)
            lxx = _unfold(jnp.broadcast_to(lxxf, (nx, nx, N * B)))
            luu = _unfold(jnp.broadcast_to(luuf, (n, n, N * B)))
            lux = _unfold(luxf)
        else:
            exps = [cost.stage_expansion(X[t], U[t], t) for t in range(N)]
            lx = jnp.stack([e[1] for e in exps])
            lu = jnp.stack([e[2] for e in exps])
            lxx = luu = lux = None  # filled below unless stationary+fused

        if (fused_ric is not None and so_t is None and B % ric_blk == 0):
            # whole backward sweep in one kernel; stationary-curvature costs
            # pass a single (no-N-axis) lxx/luu/lux so the broadcast never
            # materializes in HBM
            if stationary_cost:
                e0 = exps[0]
                lxx_in = jnp.broadcast_to(e0[3], (nx, nx, B))
                luu_in = jnp.broadcast_to(e0[4], (n, n, B))
                lux_in = jnp.broadcast_to(e0[5], (n, nx, B))
            elif lxx is not None:
                lxx_in, luu_in, lux_in = lxx, luu, lux
            else:
                lxx_in = jnp.stack(
                    [jnp.broadcast_to(e[3], (nx, nx, B)) for e in exps])
                luu_in = jnp.stack(
                    [jnp.broadcast_to(e[4], (n, n, B)) for e in exps])
                lux_in = jnp.stack([e[5] for e in exps])
            return fused_ric(Amat, Bmat, lx, lu, lxx_in, luu_in, lux_in,
                             Vx0, Vxx0)

        if lxx is None:
            lxx = jnp.stack(
                [jnp.broadcast_to(e[3], (nx, nx, B)) for e in exps])
            luu = jnp.stack(
                [jnp.broadcast_to(e[4], (n, n, B)) for e in exps])
            lux = jnp.stack([e[5] for e in exps])

        if cfg.parallel_riccati and not cfg.use_second_order:
            from .priccati import suffix_value_functions
            # reg=0: propagate the exact (unregularized) value recursion, as
            # the sequential scan does — reg enters only the gain solves
            # below, so parallel and sequential sweeps agree to O(reg^2)
            # (V is stationary w.r.t. gains at the unregularized optimum)
            Vx_all, Vxx_all = suffix_value_functions(
                Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0, reg=0.0)

            def gain_t(A, Bm, lu_t, luu_t, lux_t, Vx, Vxx):
                Bt = jnp.swapaxes(Bm, 0, 1)
                Qu = lu_t + bmv(Bt, Vx)
                Qux = lux_t + bmm(bmm(Bt, Vxx), A)
                Quu = luu_t + bmm(bmm(Bt, Vxx), Bm)
                reg_eye = cfg.reg * jnp.eye(n, dtype=Quu.dtype)[:, :, None]
                Quu_inv = gj_inverse(Quu + reg_eye)
                return -bmv(Quu_inv, Qu), -bmm(Quu_inv, Qux)

            ks, Ks = jax.vmap(gain_t, in_axes=0, out_axes=0)(
                Amat, Bmat, lu, luu, lux, Vx_all[1:], Vxx_all[1:])
            return ks, Ks

        scan_in = ((Amat, Bmat, lx, lu, lxx, luu, lux)
                   + ((jnp.arange(N),) if so_t is not None else ()))

        def body(carry, inp):
            Vx, Vxx = carry
            A, Bm = inp[0], inp[1]
            lx_t, lu_t, lxx_t, luu_t, lux_t = inp[2:7]
            At = jnp.swapaxes(A, 0, 1)
            Bt = jnp.swapaxes(Bm, 0, 1)
            Qx = lx_t + bmv(At, Vx)
            Qu = lu_t + bmv(Bt, Vx)
            Qxx = lxx_t + bmm(bmm(At, Vxx), A)
            Qux = lux_t + bmm(bmm(Bt, Vxx), A)
            Quu = luu_t + bmm(bmm(Bt, Vxx), Bm)
            if cfg.use_second_order:
                # exact DDP terms: contract V'_x with the second-order
                # dynamics tensors of the semi-implicit Euler map. The
                # tensors stay in the kernels' flat (n,n,n,N*B) lane layout
                # and are lane-sliced per knot here — transposing them to a
                # (N, ...) scan axis costs ~720 MB of HBM shuffles per
                # solver iteration at MPC sizes
                tix = inp[7]
                d2q_t, d2qd_t, cr_t, dMi_t = (
                    jax.lax.dynamic_slice_in_dim(s, tix * B, B, 3)
                    for s in so_t)
                w = dt * Vx[n:] + dt * dt * Vx[:n]              # (n, B)
                hqq = jnp.sum(w[:, None, None, :] * d2q_t, axis=0)
                hdd = jnp.sum(w[:, None, None, :] * d2qd_t, axis=0)
                hcr = jnp.sum(w[:, None, None, :] * cr_t, axis=0)   # [qd,q]
                hMq = jnp.sum(w[:, None, None, :] * dMi_t, axis=0)  # [u,q]
                Qxx = Qxx + jnp.concatenate([
                    jnp.concatenate([hqq, jnp.swapaxes(hcr, 0, 1)], axis=1),
                    jnp.concatenate([hcr, hdd], axis=1)], axis=0)
                Qux = Qux + jnp.concatenate(
                    [hMq, jnp.zeros_like(hMq)], axis=1)
            reg_eye = cfg.reg * jnp.eye(n, dtype=Quu.dtype)[:, :, None]
            Quu_inv = gj_inverse(Quu + reg_eye)
            k_t = -bmv(Quu_inv, Qu)
            K_t = -bmm(Quu_inv, Qux)
            # FULL value update (not the simplified Qux^T k form): the
            # K^T Quu k / K^T Qu cross terms cancel the regularization to
            # O(reg^2), which keeps this recursion consistent with the
            # knot-sharded exact (unregularized) suffix reduce — the
            # simplified form drifts at O(reg) and breaks that parity.
            # The fused Pallas sweeps use the same full form (lockstep).
            Kt_T = jnp.swapaxes(K_t, 0, 1)
            Qux_T = jnp.swapaxes(Qux, 0, 1)
            Vx_n = (Qx + bmv(Kt_T, bmv(Quu, k_t)) + bmv(Kt_T, Qu)
                    + bmv(Qux_T, k_t))
            Vxx_n = (Qxx + bmm(Kt_T, bmm(Quu, K_t)) + bmm(Kt_T, Qux)
                     + bmm(Qux_T, K_t))
            Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
            return (Vx_n, Vxx_n), (k_t, K_t)

        _, (ks, Ks) = jax.lax.scan(body, (Vx0, Vxx0), scan_in, reverse=True)
        return ks, Ks

    # ------------------------------------------------------------------
    def forward(X, U, ks, Ks):
        """Line search: all alphas in one widened-batch feedback rollout."""
        B = X.shape[-1]
        al = jnp.asarray(cfg.alphas, X.dtype)

        def widen(z):  # (..., B) -> (..., na*B), lane grouping [a0*B | a1*B..]
            return jnp.tile(z, (1,) * (z.ndim - 1) + (na,))
        alpha_w = jnp.repeat(al, B)

        if fused_fb is not None and B % roll_blk == 0:
            # one fused kernel over all step sizes; the alpha-widening
            # happens inside the kernel grid, so the widened Xref/K tiles
            # never materialize in HBM
            if two_stage:
                # stage 1: coarse grid; stage 2: one rollout per problem at
                # ls_fine_factor x its coarse argmin (per-lane alpha rows)
                nc = len(cfg.ls_coarse)
                Xs1, Uw1, c1f = fused_fb(X[0], U, X[:N], ks, Ks)
                c1 = c1f.reshape(nc, B)
                best1 = jnp.argmin(c1, axis=0)                   # (B,)
                a_best = jnp.asarray(cfg.ls_coarse, X.dtype)[best1]
                a_fine = (cfg.ls_fine_factor * a_best)[None, :]  # (1, B)
                Xs2, Uw2, c2f = fused_fb_fine(X[0], U, X[:N], ks, Ks,
                                              a_fine)
                cw = jnp.concatenate([c1, c2f.reshape(1, B)], axis=0)
                XwA = jnp.concatenate(
                    [Xs1.reshape(N, nx, nc, B), Xs2.reshape(N, nx, 1, B)],
                    axis=2)
                UwA = jnp.concatenate(
                    [Uw1.reshape(N, n, nc, B), Uw2.reshape(N, n, 1, B)],
                    axis=2)
                best = jnp.argmin(cw, axis=0)
                idx = best[None, None, None, :]
                Xb = jnp.take_along_axis(XwA, idx, axis=2)[:, :, 0]
                Xb = jnp.concatenate([X[0][None], Xb], axis=0)
                Ub = jnp.take_along_axis(UwA, idx, axis=2)[:, :, 0]
                dtype = X.dtype
                return (Xb.astype(dtype), Ub.astype(dtype),
                        jnp.min(cw, axis=0))
            if fb_with_cost:
                Xs, Uw, cw_flat = fused_fb(X[0], U, X[:N], ks, Ks)
                Xw = jnp.concatenate([widen(X[0])[None], Xs], axis=0)
                cw = cw_flat.reshape(na, B)
                best = jnp.argmin(cw, axis=0)
                XwA = Xw.reshape(N + 1, nx, na, B)
                UwA = Uw.reshape(N, n, na, B)
                idx = best[None, None, None, :]
                Xb = jnp.take_along_axis(XwA, idx, axis=2)[:, :, 0]
                Ub = jnp.take_along_axis(UwA, idx, axis=2)[:, :, 0]
                dtype = X.dtype
                return (Xb.astype(dtype), Ub.astype(dtype),
                        jnp.min(cw, axis=0))
            Xs, Uw = fused_fb(X[0], U, X[:N], ks, Ks)
            Xw = jnp.concatenate([widen(X[0])[None], Xs], axis=0)
        else:
            def body(x, inp):
                x_ref, u_ref, k_t, K_t = inp
                du = alpha_w * widen(k_t) + bmv(widen(K_t), x - widen(x_ref))
                u = clamp(widen(u_ref) + du).astype(x.dtype)
                xn = step(x, u)
                return xn, (xn, u)

            _, (Xw, Uw) = jax.lax.scan(body, widen(X[0]), (X[:N], U, ks, Ks))
            Xw = jnp.concatenate([widen(X[0])[None], Xw], axis=0)
        cw = total_cost(Xw, Uw).reshape(na, B)
        best = jnp.argmin(cw, axis=0)                            # (B,)
        XwA = Xw.reshape(N + 1, nx, na, B)
        UwA = Uw.reshape(N, n, na, B)
        idx = best[None, None, None, :]
        Xb = jnp.take_along_axis(XwA, idx, axis=2)[:, :, 0]
        Ub = jnp.take_along_axis(UwA, idx, axis=2)[:, :, 0]
        dtype = X.dtype
        return Xb.astype(dtype), Ub.astype(dtype), jnp.min(cw, axis=0)

    # ------------------------------------------------------------------
    def solve(x0, U0):
        dtype = model.Imat.dtype
        x0 = x0.astype(dtype)
        U0 = U0.astype(dtype)
        X = rollout(x0, U0)
        c0 = total_cost(X, U0)

        def iteration(carry, _):
            X, U, c = carry
            if knot_sharded:
                ks, Ks = backward_knot_sharded(X, U)
                Xn, Un, cn = forward(X, U, ks, Ks)
                acc = cn < c
                Xn = jnp.where(acc[None, None, :], Xn, X)
                Un = jnp.where(acc[None, None, :], Un, U)
                cn = jnp.where(acc, cn, c)
                return (Xn, Un, cn), (cn, ks, Ks)
            Amat, Bmat, (qf, qdf, uf) = linearize(X[:N], U)
            so_t = None
            if cfg.use_second_order:
                if fused_so is not None and qf.shape[-1] % so_blk == 0:
                    so_flat = fused_so(qf, qdf, uf)
                else:
                    so_flat = _so.fdsva_so(model, qf, qdf, uf, cfg.gravity)
                # keep the flat (n,n,n,N*B) lane layout; backward() slices
                # lanes per knot instead of materializing the transpose
                so_t = tuple(so_flat[i] for i in range(4))
            ks, Ks = backward(X, U, Amat, Bmat, so_t)
            Xn, Un, cn = forward(X, U, ks, Ks)
            acc = cn < c
            Xn = jnp.where(acc[None, None, :], Xn, X)
            Un = jnp.where(acc[None, None, :], Un, U)
            cn = jnp.where(acc, cn, c)
            return (Xn, Un, cn), (cn, ks, Ks)

        (Xf, Uf, cf), (ctrace, ks_all, Ks_all) = jax.lax.scan(
            iteration, (X, U0, c0), None, length=cfg.iters)
        ctrace = jnp.concatenate([c0[None], ctrace], axis=0)
        return ILQRResult(Xf, Uf, cf, ctrace, Ks_all[-1], ks_all[-1])

    if expose_parts:
        return solve, {"rollout": rollout, "linearize": linearize,
                       "backward": backward, "forward": forward,
                       "total_cost": total_cost}
    return solve
