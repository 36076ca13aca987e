"""Fused whole-sweep Pallas kernels for the trajectory optimizers.

The iLQR hot loop is three sweeps over the horizon: the nominal rollout
(sequential dynamics), the Riccati backward pass, and the line-search
feedback rollout. On the XLA path each is a ``lax.scan`` whose per-knot body
is a separate device dispatch — at MPC sizes the per-step launch/dispatch
overhead (~60-100 us) dwarfs the per-knot compute, the same imbalance that
makes the reference run ONE ``__global__`` kernel looping over all
``NUM_TIMESTEPS`` knots instead of one launch per knot
(``/root/reference/helpers/_code_generation_helpers.py:41-55``).

These kernels run the ENTIRE sweep in a single Pallas kernel: the horizon
loop is a ``fori_loop`` inside the kernel, per-knot blocks are loaded and
stored with dynamic time indices on the VMEM refs (Mosaic lowers dynamic
ref indexing, not value-level ``dynamic_slice``), the carry stays
register/VMEM resident, and the problem-batch axis is tiled over the Pallas
grid. Bodies reuse the same oracle-validated jnp builders as everything
else (``ops/aba``, ``ops/linalg.gj_inverse``, lane-major ``bmm``/``bmv``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.model import RobotModel
from .. import aba as _aba
from ..common import eye_nd
from ..linalg import gj_inverse
from ..spatial import bmm, bmv
from .kernels import VMEM_LIMIT, _check

ROLLOUT_BLOCK_B = 256
RICCATI_BLOCK_B = 128  # (N, nx, nx, bb) inputs: halve the tile for VMEM


def riccati_vmem_bytes(n: int, N: int, stationary_curvature: bool,
                       block_b: int) -> int:
    """Estimated VMEM high-water of the TIME-STREAMED fused Riccati kernel
    at batch tile ``block_b`` (f32). Only per-knot blocks are live (double-
    buffered by the pipeline); the horizon never sits in VMEM."""
    nx = 2 * n
    per_knot_in = nx * nx + nx * n + nx + n          # A, B, lx, lu
    curv = nx * nx + n * n + n * nx
    if not stationary_curvature:
        per_knot_in += curv                          # streamed per knot
        curv = 0                                     # nothing resident
    per_knot_out = n + n * nx                        # k, K
    streamed = 2 * (per_knot_in + per_knot_out)      # double-buffered
    resident = curv + nx + nx * nx                   # stat. curv + Vx0/Vxx0
    scratch = nx + nx * nx                           # Vx/Vxx carry
    return 4 * block_b * (streamed + resident + scratch)


def riccati_block_b(n: int, N: int, stationary_curvature: bool,
                    budget: int = VMEM_LIMIT) -> int:
    """Largest (sub*128) batch tile whose streamed working set fits VMEM.
    sub=8 fills full (8,128) f32 vregs; large-nx robots step down."""
    for sub in (8, 4, 2, 1):
        if riccati_vmem_bytes(n, N, stationary_curvature,
                              sub * 128) <= budget:
            return sub * 128
    return 128


def riccati_fits(n: int, N: int, stationary_curvature: bool,
                 block_b: int = None,
                 budget: int = VMEM_LIMIT) -> bool:
    """Gate for the fused Riccati sweep. Streaming means VMEM is per-knot
    only, so the fit is generous; the n cap bounds the trace-time unroll
    (bmm emits ~nx^2 statements per product — humanoid nx=56 blows Mosaic
    compile time; the XLA ``lax.scan`` path serves those)."""
    bb = block_b if block_b is not None else 128
    return (riccati_vmem_bytes(n, N, stationary_curvature, bb) <= budget
            and n <= 16)


def rollout_block_b(model: RobotModel) -> int:
    """n-aware rollout tile: humanoid-scale robots (n > 12) halve the tile
    so the per-lane ABA scratch fits VMEM (atlas at 256 lanes overflows the
    100 MB budget by <1 MB) — the same rule as ``kernels.default_block_b``,
    the reference's dynamic-shared-memory switch (GRiDCodeGenerator.py:61).
    """
    return ROLLOUT_BLOCK_B if model.n <= 12 else ROLLOUT_BLOCK_B // 2


def _ld(ref, t):
    """ref[t] for a (N, ...) VMEM ref with a traced time index."""
    idx = (pl.ds(t, 1),) + (slice(None),) * (len(ref.shape) - 1)
    return ref[idx][0]


def _st(ref, t, v):
    idx = (pl.ds(t, 1),) + (slice(None),) * (len(ref.shape) - 1)
    ref[idx] = v[None]


SWEEP_SUB, SWEEP_LANE = 8, 128


def _sweep2d_fits(in_shapes, out_shapes) -> bool:
    """Whether the (8, 128) 2-D batch tile of a sweep kernel fits VMEM:
    double-buffered streamed blocks at 1024 lanes (the whole per-program
    horizon block is resident in this design)."""
    elems = sum(int(np.prod(s)) for s in list(in_shapes) + list(out_shapes))
    return 4 * 2 * elems * SWEEP_SUB * SWEEP_LANE <= VMEM_LIMIT


def _sweep_call(kernel_body, in_shapes: Sequence[Tuple[int, ...]],
                out_shapes: Sequence[Tuple[int, ...]],
                consts, dtype, block_b: int, interpret: bool):
    """pallas_call wrapper passing INPUT/OUTPUT REFS (not values) to the
    body so the horizon loop can index time dynamically. ``consts`` are
    loaded to values. Tiling is along the trailing batch axis — flat
    ``(block_b,)`` blocks, or 2-D ``(8, 128)`` tiles when the batch divides
    and the working set fits VMEM (full f32 vreg fill; the kernel bodies
    are batch-rank agnostic)."""
    in_shapes = [tuple(s) for s in in_shapes]
    out_shapes = [tuple(s) for s in out_shapes]
    consts = tuple(consts)
    n_const = len(consts)
    can2d = _sweep2d_fits(in_shapes, out_shapes)

    def specs(shapes):
        out = []
        for shp in shapes:
            nlead = len(shp)

            def imap(i, _nlead=nlead):
                return (0,) * _nlead + (i,)

            out.append(pl.BlockSpec(tuple(shp) + (block_b,), imap,
                                    memory_space=pltpu.VMEM))
        return out

    def specs2d(shapes):
        out = []
        for shp in shapes:
            nlead = len(shp)

            def imap(i, _nlead=nlead):
                return (0,) * _nlead + (i, 0)

            out.append(pl.BlockSpec(
                tuple(shp) + (SWEEP_SUB, SWEEP_LANE), imap,
                memory_space=pltpu.VMEM))
        return out

    const_specs = []
    for c in consts:
        nd = c.ndim

        def imap(i, _nd=nd):
            return (0,) * _nd

        const_specs.append(pl.BlockSpec(c.shape, imap,
                                        memory_space=pltpu.VMEM))

    def kernel(*refs):
        cvals = [r[...] for r in refs[:n_const]]
        in_refs = refs[n_const:n_const + len(in_shapes)]
        out_refs = refs[n_const + len(in_shapes):]
        kernel_body(cvals, in_refs, out_refs)

    def call(*arrays):
        B = arrays[0].shape[-1]
        if (can2d and not interpret
                and B % (SWEEP_SUB * SWEEP_LANE) == 0):
            G = B // SWEEP_LANE
            r2 = lambda z: z.reshape(z.shape[:-1] + (G, SWEEP_LANE))
            out = pl.pallas_call(
                kernel,
                grid=(G // SWEEP_SUB,),
                in_specs=const_specs + specs2d(in_shapes),
                out_specs=tuple(specs2d(out_shapes)),
                out_shape=tuple(
                    jax.ShapeDtypeStruct(s + (G, SWEEP_LANE), dtype)
                    for s in out_shapes),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
            )(*consts, *map(r2, arrays))
            flat = lambda z: z.reshape(z.shape[:-2] + (B,))
            if len(out_shapes) > 1:
                return tuple(flat(o) for o in out)
            return flat(out[0])
        assert B % block_b == 0, (B, block_b)
        out = pl.pallas_call(
            kernel,
            grid=(B // block_b,),
            in_specs=const_specs + specs(in_shapes),
            out_specs=tuple(specs(out_shapes)),
            out_shape=tuple(
                jax.ShapeDtypeStruct(s + (B,), dtype) for s in out_shapes),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(*consts, *arrays)
        return out if len(out_shapes) > 1 else out[0]

    return call


def _euler_step(m, x, u, dt, gravity):
    """Semi-implicit Euler on lane-major x=[q;qd] (matches ilqr.dynamics_step)."""
    n = m.num_vel
    q, qd = x[:n], x[n:]
    qd_new = qd + dt * _aba.aba(m, q, qd, u, gravity)
    return jnp.concatenate([q + dt * qd_new, qd_new], axis=0)


def _model_consts(model: RobotModel):
    return (model.Xtree, model.Imat, model.damping, model.subtree_mask)


def _make_clamp(u_min, u_max, dtype):
    """(extra_consts, clamp_fn) for control box bounds.

    Scalar bounds bake into the program; ARRAY bounds (per-dof effort
    limits, shape (n, 1)) must ride as kernel inputs — Pallas rejects
    captured array constants. ``clamp_fn(u, extra_cvals)`` applies whatever
    combination is present; ``clamp_fn`` is None when unbounded."""
    import numpy as np

    if u_min is None and u_max is None:
        return (), None
    is_arr = lambda b: b is not None and not np.isscalar(b)
    extra = []
    lo_i = hi_i = None
    if is_arr(u_min):
        lo_i = len(extra)
        extra.append(jnp.asarray(u_min, dtype))
    if is_arr(u_max):
        hi_i = len(extra)
        extra.append(jnp.asarray(u_max, dtype))

    def clamp(u, cv):
        lo = cv[lo_i] if lo_i is not None else u_min
        hi = cv[hi_i] if hi_i is not None else u_max
        if lo_i is None and hi_i is None:      # scalar bounds: direct clip
            return jnp.clip(u, lo, hi)
        # array bounds arrive as loaded (n, 1) consts: scalar-index per dof
        # row (rank-free — a (n, 1) vector cannot broadcast against the 2-D
        # (n, sub, L) batch tiles, and Mosaic cannot rank-expand it)
        rows = []
        for i in range(u.shape[0]):
            l = lo[i, 0] if lo_i is not None else lo
            h = hi[i, 0] if hi_i is not None else hi
            rows.append(jnp.clip(u[i], l, h))
        return jnp.stack(rows)

    return tuple(extra), clamp


def _rebind(model: RobotModel, cvals):
    Xtree, Imat, damping, subtree_mask = cvals
    return dataclasses.replace(model, Xtree=Xtree, Imat=Imat,
                               damping=damping, subtree_mask=subtree_mask)


def riccati_pallas_factored(n: int, N: int, reg: float, r: int,
                            qd_diag: float, u_diag: float,
                            dtype=jnp.float32, interpret: bool = False):
    """Fused Riccati backward sweep for GAUSS-NEWTON-FACTORED stage costs.

    For costs of the form lxx = blkdiag(Jw^T Jw, qd_diag*I), luu = u_diag*I,
    lux = 0 (e.g. ``EEReachCost``: Jw = sqrt(w_pos) * dEE/dq), materializing
    the dense (nx, nx, N*B) curvature costs ~17 ms/sweep of HBM traffic at
    MPC sizes — 3x the whole Riccati kernel. This variant streams the
    (r, n) factor instead (8x less curvature traffic) and forms Jw^T Jw
    per knot in VMEM.

    Flat-layout inputs: ``lx (nx, N*B)``, ``lu (n, N*B)``, ``Jw (r, n,
    N*B)`` arrive in the solver's knot-major lane layout (lane = t*B + b)
    and are only RESHAPED to (d, N, G, L) — the knot axis is indexed in
    place, no transpose ever materializes. A/B and outputs keep the
    (N, ..., B) layout of :func:`riccati_pallas`.
    """
    nx = 2 * n

    def kernel(A_ref, B_ref, lx_ref, lu_ref, Jw_ref, Vx0_ref, Vxx0_ref,
               ks_ref, Ks_ref, Vx_s, Vxx_s):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            Vx_s[...] = Vx0_ref[...]
            Vxx_s[...] = Vxx0_ref[...]

        Vx = Vx_s[...]
        Vxx = Vxx_s[...]
        A, Bm = A_ref[0], B_ref[0]
        lx_t = lx_ref[:, 0]
        lu_t = lu_ref[:, 0]
        Jw = Jw_ref[:, :, 0]                     # (r, n, sub, L)
        At = jnp.swapaxes(A, 0, 1)
        Bt = jnp.swapaxes(Bm, 0, 1)
        Qx = lx_t + bmv(At, Vx)
        Qu = lu_t + bmv(Bt, Vx)
        VxxA = bmm(Vxx, A)
        Qxx = bmm(At, VxxA)
        # + blkdiag(Jw^T Jw, qd_diag I): JJ is (n, n), qd diag hits rows n:
        JJ = bmm(jnp.swapaxes(Jw, 0, 1), Jw)     # (n, n, sub, L)
        row = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1, 1), 1)
        qd_eye = ((row == col) & (row >= n)).astype(dtype)
        zc = jnp.zeros((n, n) + JJ.shape[2:], dtype)
        JJpad = jnp.concatenate([
            jnp.concatenate([JJ, zc], axis=1),
            jnp.zeros((n, nx) + JJ.shape[2:], dtype)], axis=0)
        Qxx = Qxx + JJpad + qd_diag * qd_eye
        Qux = bmm(Bt, VxxA)                      # lux = 0
        Quu = bmm(Bt, bmm(Vxx, Bm)) + u_diag * eye_nd(n, dtype, 4)
        Quu_inv = gj_inverse(Quu + reg * eye_nd(n, dtype, 4))
        k_t = -bmv(Quu_inv, Qu)
        K_t = -bmm(Quu_inv, Qux)
        # full value update (cancels reg to O(reg^2)) — lockstep with
        # trajopt/ilqr.backward's scan body, parity-tested
        Kt_T = jnp.swapaxes(K_t, 0, 1)
        Qux_T = jnp.swapaxes(Qux, 0, 1)
        Vx_n = (Qx + bmv(Kt_T, bmv(Quu, k_t)) + bmv(Kt_T, Qu)
                + bmv(Qux_T, k_t))
        Vxx_n = (Qxx + bmm(Kt_T, bmm(Quu, K_t)) + bmm(Kt_T, Qux)
                 + bmm(Qux_T, K_t))
        Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
        ks_ref[...] = k_t[None]
        Ks_ref[...] = K_t[None]
        Vx_s[...] = Vx_n
        Vxx_s[...] = Vxx_n

    def call(Amat, Bmat, lx_flat, lu_flat, Jw_flat, Vx0, Vxx0):
        B = Amat.shape[-1]
        if B % 128 == 0:
            L = 128
            G = B // L
            sub = 8 if G % 8 == 0 else G
        else:
            L, G, sub = B, 1, 1
        nb = G // sub

        def r2(x):  # (..., B) -> (..., G, L)
            return x.reshape(x.shape[:-1] + (G, L))

        def rf(x):  # (d..., N*B) -> (d..., N, G, L), knot axis in place
            return x.reshape(x.shape[:-1] + (N, G, L))

        def knot_spec(*dims):   # (N, ...) leading-knot streamed block
            nd = len(dims)

            def imap(b, i, _nd=nd):
                return (N - 1 - i,) + (0,) * _nd + (b, 0)

            return pl.BlockSpec((1,) + dims + (sub, L), imap,
                                memory_space=pltpu.VMEM)

        def flat_spec(*dims):   # (d..., N, G, L) mid-knot streamed block
            nd = len(dims)

            def imap(b, i, _nd=nd):
                return (0,) * _nd + (N - 1 - i, b, 0)

            return pl.BlockSpec(dims + (1, sub, L), imap,
                                memory_space=pltpu.VMEM)

        def fixed_spec(*dims):
            nd = len(dims)

            def imap(b, i, _nd=nd):
                return (0,) * _nd + (b, 0)

            return pl.BlockSpec(dims + (sub, L), imap,
                                memory_space=pltpu.VMEM)

        in_specs = [knot_spec(nx, nx), knot_spec(nx, n), flat_spec(nx),
                    flat_spec(n), flat_spec(r, n), fixed_spec(nx),
                    fixed_spec(nx, nx)]
        out_specs = (knot_spec(n), knot_spec(n, nx))
        outs = pl.pallas_call(
            kernel,
            grid=(nb, N),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((N, n, G, L), dtype),
                jax.ShapeDtypeStruct((N, n, nx, G, L), dtype)),
            scratch_shapes=[pltpu.VMEM((nx, sub, L), dtype),
                            pltpu.VMEM((nx, nx, sub, L), dtype)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT,
                dimension_semantics=("arbitrary", "arbitrary")),
        )(r2(Amat), r2(Bmat), rf(lx_flat), rf(lu_flat), rf(Jw_flat),
          r2(Vx0), r2(Vxx0))
        ks, Ks = outs
        return (ks.reshape(N, n, B), Ks.reshape(N, n, nx, B))

    return call


def rollout_pallas(model: RobotModel, N: int, dt: float, gravity: float,
                   u_min: Optional[float] = None,
                   u_max: Optional[float] = None,
                   block_b: int = ROLLOUT_BLOCK_B, interpret: bool = False):
    """Fused N-step rollout: (x0 (nx,B), U (N,n,B)) -> X (N,nx,B).

    X[t] is the state AFTER step t (callers prepend x0 for the (N+1) array).
    """
    _check(model)
    n = model.num_vel
    nx = 2 * n
    bconsts, clampf = _make_clamp(u_min, u_max, model.Imat.dtype)

    def body(cvals, in_refs, out_refs):
        m = _rebind(model, cvals[:4])
        bcv = cvals[4:]
        x0_ref, U_ref = in_refs
        (X_ref,) = out_refs

        def step(t, x):
            u = _ld(U_ref, t)
            if clampf is not None:
                u = clampf(u, bcv)
            xn = _euler_step(m, x, u, dt, gravity)
            _st(X_ref, t, xn)
            return xn

        jax.lax.fori_loop(0, N, step, x0_ref[...])

    return _sweep_call(body, [(nx,), (N, n)], [(N, nx)],
                       _model_consts(model) + bconsts, model.Imat.dtype,
                       block_b, interpret)


def feedback_rollout_pallas(model: RobotModel, N: int, dt: float,
                            gravity: float,
                            u_min: Optional[float] = None,
                            u_max: Optional[float] = None,
                            block_b: int = ROLLOUT_BLOCK_B,
                            interpret: bool = False):
    """Fused line-search rollout with feedback:

    (x0 (nx,B), Uref (N,n,B), Xref (N,nx,B), kff (N,n,B), K (N,n,nx,B))
      -> (X (N,nx,B), U (N,n,B))

    ``u_t = clamp(Uref_t + kff_t + K_t (x_t - Xref_t))``; the line-search
    step size is pre-folded into ``kff`` (alpha * k), so one call serves all
    widened-alpha lanes at once.
    """
    _check(model)
    n = model.num_vel
    nx = 2 * n
    bconsts, clampf = _make_clamp(u_min, u_max, model.Imat.dtype)

    def body(cvals, in_refs, out_refs):
        m = _rebind(model, cvals[:4])
        bcv = cvals[4:]
        x0_ref, Uref_ref, Xref_ref, kff_ref, K_ref = in_refs
        X_ref, U_ref = out_refs

        def step(t, x):
            du = _ld(kff_ref, t) + bmv(_ld(K_ref, t), x - _ld(Xref_ref, t))
            u = _ld(Uref_ref, t) + du
            if clampf is not None:
                u = clampf(u, bcv)
            xn = _euler_step(m, x, u, dt, gravity)
            _st(X_ref, t, xn)
            _st(U_ref, t, u)
            return xn

        jax.lax.fori_loop(0, N, step, x0_ref[...])

    return _sweep_call(
        body,
        [(nx,), (N, n), (N, nx), (N, n), (N, n, nx)],
        [(N, nx), (N, n)],
        _model_consts(model) + bconsts, model.Imat.dtype, block_b,
        interpret)


def linesearch_rollout_pallas(model: RobotModel, N: int, dt: float,
                              gravity: float, alphas,
                              u_min: Optional[float] = None,
                              u_max: Optional[float] = None,
                              block_b: int = ROLLOUT_BLOCK_B,
                              interpret: bool = False,
                              cost_consts=(), stage_cost=None,
                              terminal_cost=None):
    """Fused line-search rollout over ALL step sizes with in-kernel widening:

    (x0 (nx,B), Uref (N,n,B), Xref (N,nx,B), k (N,n,B), K (N,n,nx,B)
     [, alpha_rows (na, B)])
      -> (X (N,nx,na*B), U (N,n,na*B))

    ``u_t = clamp(Uref_t + alpha_a * k_t + K_t (x_t - Xref_t))``. The grid is
    (na, B/bb): every alpha re-reads the SAME unwidened input blocks and
    writes its own slice of the widened outputs — the (na*B)-lane tiles of
    Xref/K/Uref never materialize in HBM (they cost ~6x the input footprint
    per iteration when widened by XLA ``tile`` ops). Output lane order is
    alpha-major ([a0*B | a1*B | ...]), matching ``ilqr.forward``'s widen().

    ``alphas`` here only fixes the ROW COUNT ``na`` (and provides the
    default row values); the returned callable optionally takes an
    ``alpha_rows (na, B)`` array as its sixth argument, giving every
    problem lane its own step size per row — the two-stage adaptive line
    search (r5) refines per-lane around the coarse argmin this way.

    In-kernel cost: when ``stage_cost(consts, x, u) -> (bb,)`` and
    ``terminal_cost(consts, x) -> (bb,)`` are given (see
    ``trajopt/cost`` ``pallas_cost`` hooks), the per-lane total cost
    accumulates inside the rollout loop and returns as a third output
    (1, na*B) — the widened trajectory is never re-read by a separate
    cost/FK pass over (na*N*B) lanes, which otherwise costs more than the
    rollout itself at MPC sizes. ``cost_consts`` are the array leaves the
    closures read (Pallas rejects captured array constants).
    """
    _check(model)
    n = model.num_vel
    nx = 2 * n
    na = len(alphas)
    dtype = model.Imat.dtype
    bconsts, clampf = _make_clamp(u_min, u_max, dtype)
    alphas_arr = jnp.asarray(alphas, dtype)
    with_cost = stage_cost is not None
    cost_consts = tuple(cost_consts)
    n_bc = len(bconsts)

    model_consts = _model_consts(model) + bconsts + cost_consts
    in_shapes = [(nx,), (N, n), (N, nx), (N, n), (N, n, nx)]
    out_shapes = [(N, nx), (N, n)]

    def in_spec(shp):
        nlead = len(shp)

        def imap(a, i, _nlead=nlead):
            return (0,) * _nlead + (i,)

        return pl.BlockSpec(tuple(shp) + (block_b,), imap,
                            memory_space=pltpu.VMEM)

    def out_spec(shp, nb):
        nlead = len(shp)

        def imap(a, i, _nlead=nlead, _nb=nb):
            return (0,) * _nlead + (a * _nb + i,)

        return pl.BlockSpec(tuple(shp) + (block_b,), imap,
                            memory_space=pltpu.VMEM)

    def in_spec2d(shp):
        nlead = len(shp)

        def imap(a, i, _nlead=nlead):
            return (0,) * _nlead + (i, 0)

        return pl.BlockSpec(tuple(shp) + (SWEEP_SUB, SWEEP_LANE), imap,
                            memory_space=pltpu.VMEM)

    def out_spec2d(shp, nbg):
        nlead = len(shp)

        def imap(a, i, _nlead=nlead, _nbg=nbg):
            return (0,) * _nlead + (a * _nbg + i, 0)

        return pl.BlockSpec(tuple(shp) + (SWEEP_SUB, SWEEP_LANE), imap,
                            memory_space=pltpu.VMEM)

    const_specs = [pl.BlockSpec(c.shape, (lambda a, i, _nd=c.ndim:
                                          (0,) * _nd),
                                memory_space=pltpu.VMEM)
                   for c in model_consts]
    # per-(row, lane) step sizes. Flat path: stored (na, 8, B), row
    # replicated across 8 sublanes so the (1, 8, bb) block satisfies
    # Mosaic's (8, 128)-divisible tile rule (a (1, bb) block of an (na, B)
    # array is rejected). 2-D path: stored (na, G, L) with a natural
    # (1, sub, L) block.
    alpha_spec = pl.BlockSpec((1, 8, block_b), lambda a, i: (a, 0, i),
                              memory_space=pltpu.VMEM)
    alpha_spec2d = pl.BlockSpec((1, SWEEP_SUB, SWEEP_LANE),
                                lambda a, i: (a, i, 0),
                                memory_space=pltpu.VMEM)

    def make_kernel(mode2d):
        def kernel(*refs):
            cvals = [r[...] for r in refs[:len(model_consts)]]
            aref = refs[len(model_consts)]
            alpha = aref[0] if mode2d else aref[0, 0]  # (sub,L) / (bb,)
            x0_ref, Uref_ref, Xref_ref, k_ref, K_ref = refs[
                len(model_consts) + 1:len(model_consts) + 6]
            out_refs = refs[len(model_consts) + 6:]
            X_ref, U_ref = out_refs[0], out_refs[1]
            m = _rebind(model, cvals[:4])
            bcv = cvals[4:4 + n_bc]
            ccv = cvals[4 + n_bc:]

            def step(t, carry):
                x, acc = carry
                du = (alpha * _ld(k_ref, t)
                      + bmv(_ld(K_ref, t), x - _ld(Xref_ref, t)))
                u = _ld(Uref_ref, t) + du
                if clampf is not None:
                    u = clampf(u, bcv)
                if with_cost:
                    acc = acc + stage_cost(ccv, x, u)
                xn = _euler_step(m, x, u, dt, gravity)
                _st(X_ref, t, xn)
                _st(U_ref, t, u)
                return xn, acc

            x0v = x0_ref[...]
            acc0 = jnp.zeros_like(x0v[0])
            xf, acc = jax.lax.fori_loop(0, N, step, (x0v, acc0))
            if with_cost:
                acc = acc + terminal_cost(ccv, xf)
                out_refs[2][...] = acc[None]
        return kernel

    can2d = _sweep2d_fits(in_shapes, out_shapes)

    def call(x0, Uref, Xref, k, K, alpha_rows=None):
        B = x0.shape[-1]
        if alpha_rows is None:
            alpha_rows = jnp.broadcast_to(alphas_arr[:, None], (na, B))
        else:
            assert alpha_rows.shape == (na, B), (alpha_rows.shape, na, B)
            alpha_rows = alpha_rows.astype(dtype)
        use2d = (can2d and not interpret
                 and B % (SWEEP_SUB * SWEEP_LANE) == 0)
        shapes = list(out_shapes)
        if use2d:
            G = B // SWEEP_LANE
            nbg = G // SWEEP_SUB
            r2 = lambda z: z.reshape(z.shape[:-1] + (G, SWEEP_LANE))
            specs = [out_spec2d(s, nbg) for s in shapes]
            osh = [jax.ShapeDtypeStruct(s + (na * G, SWEEP_LANE), dtype)
                   for s in shapes]
            if with_cost:
                specs.append(out_spec2d((1,), nbg))
                osh.append(jax.ShapeDtypeStruct((1, na * G, SWEEP_LANE),
                                                dtype))
            out = pl.pallas_call(
                make_kernel(True),
                grid=(na, nbg),
                in_specs=(const_specs + [alpha_spec2d]
                          + [in_spec2d(s) for s in in_shapes]),
                out_specs=tuple(specs),
                out_shape=tuple(osh),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
            )(*model_consts, r2(alpha_rows), r2(x0), r2(Uref), r2(Xref),
              r2(k), r2(K))
            flat = lambda z: z.reshape(z.shape[:-2] + (na * B,))
            if with_cost:
                return flat(out[0]), flat(out[1]), flat(out[2])[0]
            return flat(out[0]), flat(out[1])
        assert B % block_b == 0, (B, block_b)
        nb = B // block_b
        alpha_rows = jnp.broadcast_to(alpha_rows[:, None, :], (na, 8, B))
        specs = [out_spec(s, nb) for s in shapes]
        osh = [jax.ShapeDtypeStruct(s + (na * B,), dtype)
               for s in shapes]
        if with_cost:
            specs.append(out_spec((1,), nb))
            osh.append(jax.ShapeDtypeStruct((1, na * B), dtype))
        out = pl.pallas_call(
            make_kernel(False),
            grid=(na, nb),
            in_specs=(const_specs + [alpha_spec]
                      + [in_spec(s) for s in in_shapes]),
            out_specs=tuple(specs),
            out_shape=tuple(osh),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(*model_consts, alpha_rows, x0, Uref, Xref, k, K)
        if with_cost:
            return out[0], out[1], out[2][0]
        return out

    return call


def riccati_pallas(n: int, N: int, reg: float, dtype=jnp.float32,
                   stationary_curvature: bool = False,
                   block_b: int = None, interpret: bool = False):
    """Fused first-order Riccati backward sweep, TIME-STREAMED.

    Inputs (lane-major, trailing batch):
      Amat (N,nx,nx,B), Bmat (N,nx,n,B), lx (N,nx,B), lu (N,n,B),
      lxx, luu, lux  — with a leading N axis, or without it when
      ``stationary_curvature`` (time-invariant cost curvature, e.g.
      ``QuadCost``: the (N,nx,nx,B) broadcast never materializes),
      Vx0 (nx,B), Vxx0 (nx,nx,B)  — terminal expansion.
    Outputs: (ks (N,n,B), Ks (N,n,nx,B)).

    Design (this is the solver's hot phase — 51% of the r3 solve):
      * the horizon is the INNER grid dimension: grid = (B/bb, N), the
        per-knot (A, B, lx, lu) blocks stream HBM->VMEM through the Pallas
        pipeline (prefetch overlaps compute) instead of parking the whole
        (N, nx, nx, B) horizon in VMEM — the VMEM fit no longer scales
        with N, so the batch tile grows 128 -> 1024;
      * the batch tile is 2-D (sub=8, 128): every batched MAC is a full
        (8,128) f32 vreg FMA instead of a 14-sublane-padded op — lane AND
        sublane axes are batch;
      * the (Vx, Vxx) carry lives in VMEM scratch across grid steps
        (sequential "arbitrary" grid), initialized from the terminal
        expansion at the first step of each batch block;
      * the value update uses the standard simplified DDP form
        Vx' = Qx + Qux^T k, Vxx' = Qxx + Qux^T K (exact for the
        regularized gains to O(reg); the ``lax.scan`` body in
        ``trajopt/ilqr.backward`` uses the same form — parity-tested).
    """
    nx = 2 * n
    if block_b is None:
        block_b = riccati_block_b(n, N, stationary_curvature)

    def kernel(A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               Vx0_ref, Vxx0_ref, ks_ref, Ks_ref, Vx_s, Vxx_s):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            Vx_s[...] = Vx0_ref[...]
            Vxx_s[...] = Vxx0_ref[...]

        Vx = Vx_s[...]
        Vxx = Vxx_s[...]
        A, Bm = A_ref[0], B_ref[0]
        lx_t, lu_t = lx_ref[0], lu_ref[0]
        if stationary_curvature:
            lxx_t, luu_t, lux_t = lxx_ref[...], luu_ref[...], lux_ref[...]
        else:
            lxx_t, luu_t, lux_t = lxx_ref[0], luu_ref[0], lux_ref[0]
        At = jnp.swapaxes(A, 0, 1)
        Bt = jnp.swapaxes(Bm, 0, 1)
        Qx = lx_t + bmv(At, Vx)
        Qu = lu_t + bmv(Bt, Vx)
        VxxA = bmm(Vxx, A)
        Qxx = lxx_t + bmm(At, VxxA)
        Qux = lux_t + bmm(Bt, VxxA)         # B^T Vxx A reuses Vxx A
        Quu = luu_t + bmm(Bt, bmm(Vxx, Bm))
        reg_eye = reg * eye_nd(n, Quu.dtype, Quu.ndim)
        Quu_inv = gj_inverse(Quu + reg_eye)
        k_t = -bmv(Quu_inv, Qu)
        K_t = -bmm(Quu_inv, Qux)
        # full value update (cancels reg to O(reg^2)) — lockstep with
        # trajopt/ilqr.backward's scan body, parity-tested
        Kt_T = jnp.swapaxes(K_t, 0, 1)
        Qux_T = jnp.swapaxes(Qux, 0, 1)
        Vx_n = (Qx + bmv(Kt_T, bmv(Quu, k_t)) + bmv(Kt_T, Qu)
                + bmv(Qux_T, k_t))
        Vxx_n = (Qxx + bmm(Kt_T, bmm(Quu, K_t)) + bmm(Kt_T, Qux)
                 + bmm(Qux_T, K_t))
        Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
        ks_ref[...] = k_t[None]
        Ks_ref[...] = K_t[None]
        Vx_s[...] = Vx_n
        Vxx_s[...] = Vxx_n

    def call(Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0):
        B = Amat.shape[-1]
        if B % 128 == 0:
            L = 128
            G = B // L
            # Mosaic requires the sublane block to be 8-divisible or the
            # full dim: 8 fills (8,128) f32 vregs; small G takes the whole
            # batch in one block
            sub = 8 if G % 8 == 0 else G
        else:  # tiny interpret-mode shapes (tests / CPU dry runs)
            L, G, sub = B, 1, 1
        nb = G // sub

        def r2(x):  # (..., B) -> (..., G, L)
            return x.reshape(x.shape[:-1] + (G, L))

        def knot_spec(*dims):   # streamed per-knot block, time reversed
            nd = len(dims)

            def imap(b, i, _nd=nd):
                return (N - 1 - i,) + (0,) * _nd + (b, 0)

            return pl.BlockSpec((1,) + dims + (sub, L), imap,
                                memory_space=pltpu.VMEM)

        def fixed_spec(*dims):  # resident block (terminal / stat. curv)
            nd = len(dims)

            def imap(b, i, _nd=nd):
                return (0,) * _nd + (b, 0)

            return pl.BlockSpec(dims + (sub, L), imap,
                                memory_space=pltpu.VMEM)

        curv_spec = fixed_spec if stationary_curvature else knot_spec
        in_specs = [knot_spec(nx, nx), knot_spec(nx, n), knot_spec(nx),
                    knot_spec(n), curv_spec(nx, nx), curv_spec(n, n),
                    curv_spec(n, nx), fixed_spec(nx), fixed_spec(nx, nx)]
        out_specs = (knot_spec(n), knot_spec(n, nx))
        outs = pl.pallas_call(
            kernel,
            grid=(nb, N),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((N, n, G, L), dtype),
                jax.ShapeDtypeStruct((N, n, nx, G, L), dtype)),
            scratch_shapes=[pltpu.VMEM((nx, sub, L), dtype),
                            pltpu.VMEM((nx, nx, sub, L), dtype)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT,
                dimension_semantics=("arbitrary", "arbitrary")),
        )(r2(Amat), r2(Bmat), r2(lx), r2(lu), r2(lxx), r2(luu), r2(lux),
          r2(Vx0), r2(Vxx0))
        ks, Ks = outs
        return (ks.reshape(N, n, B), Ks.reshape(N, n, nx, B))

    return call
