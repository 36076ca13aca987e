"""Parallel (associative-scan) Riccati sweep for the batched LQR backward pass.

The sequential Riccati recursion in ``ilqr.backward`` has depth N (64 knots →
64 dependent scan steps); on TPU each step is a small lane-batched op, so the
sweep is latency-bound, not FLOP-bound. This module reformulates the value
recursion as an **associative suffix scan** over conditional-value-function
elements (the parallel LQT construction of Särkkä & García-Fernández,
"Temporal Parallelization of Dynamic Programming and Linear Quadratic
Tracking"), cutting the sequential depth from N to ceil(log2 N) at the cost
of ~2x the FLOPs — the right trade on TPU, and the same associative element
is what a multi-chip Riccati reduce rides over ICI (``lax.associative_scan``
over a sharded knot axis lowers to log-depth ``ppermute`` rounds).

Nothing analogous exists in the reference (single-GPU kernels only); this is
a north-star addition (BASELINE.md config 5). Cited technique paper:
"The Parallelization of Riccati Recursion" (PAPERS.md).

Element e = (A, b, C, eta, J) encodes the conditional value function between
two knots; the stage element for LQR with cross/linear cost terms follows by
completing the square in u:

    U = luu + reg I,  A~ = A - B U^-1 lux,      b = -B U^-1 lu,
    C = B U^-1 B',    J = lxx - lux' U^-1 lux,  eta = -(lx - lux' U^-1 lu)

and the terminal element is (0, 0, 0, -VxN, VxxN). The inclusive suffix scan
then yields V_t(dx) = 1/2 dx' J_t dx - eta_t' dx for every knot at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linalg import gj_inverse
from ..ops.spatial import bmm, bmv


def _combine(e_early, e_late):
    """Associative combination of two conditional-value elements (both
    trailing-lane batched: matrices (nx, nx, B), vectors (nx, B))."""
    A1, b1, C1, n1, J1 = e_early
    A2, b2, C2, n2, J2 = e_late
    nx = A1.shape[0]
    I = jnp.eye(nx, dtype=A1.dtype)[:, :, None]
    M = gj_inverse(I + bmm(C1, J2))          # (I + C1 J2)^-1
    Nt = gj_inverse(I + bmm(J2, C1))         # (I + J2 C1)^-1
    A1T = jnp.swapaxes(A1, 0, 1)
    A2M = bmm(A2, M)
    A12 = bmm(A2M, A1)
    b12 = bmv(A2M, b1 + bmv(C1, n2)) + b2
    C12 = bmm(bmm(A2M, C1), jnp.swapaxes(A2, 0, 1)) + C2
    n12 = bmv(A1T, bmv(Nt, n2 - bmv(J2, b1))) + n1
    J12 = bmm(A1T, bmm(Nt, bmm(J2, A1))) + J1
    return (A12, b12, C12, n12, J12)


def suffix_value_functions(Amat, Bmat, lx, lu, lxx, luu, lux,
                           VxN, VxxN, reg: float = 0.0):
    """All-knot value functions via one associative suffix scan.

    Inputs are knot-stacked and lane-batched: ``Amat (N, nx, nx, B)``,
    ``Bmat (N, nx, nu, B)``, cost expansions ``lx (N, nx, B)``,
    ``lu (N, nu, B)``, ``lxx (N, nx, nx, B)``, ``luu (N, nu, nu, B)``,
    ``lux (N, nu, nx, B)``; terminal ``VxN (nx, B)``, ``VxxN (nx, nx, B)``.

    Returns ``(Vx, Vxx)`` with shapes ``(N+1, nx, B)`` / ``(N+1, nx, nx, B)``:
    the quadratic value expansion at every knot (index N = terminal).

    ``reg`` folds a Levenberg term into the value PROPAGATION (U = luu +
    reg I inside every element), which differs from a sequential sweep that
    regularizes only the gain inverses — pass ``reg=0`` (as ``ilqr`` does)
    and regularize the final gain solves separately when sequential parity
    matters; keep ``reg>0`` only to rescue a near-singular ``luu``.
    """
    N, nx = Amat.shape[0], Amat.shape[1]
    nu = Bmat.shape[2]
    dtype = Amat.dtype

    def stage_elem(A, B_, lx_t, lu_t, lxx_t, luu_t, lux_t):
        I_u = jnp.eye(nu, dtype=dtype)[:, :, None]
        Uinv = gj_inverse(luu_t + reg * I_u)
        UiW = bmm(Uinv, lux_t)                 # (nu, nx, B)
        Uilu = bmv(Uinv, lu_t)                 # (nu, B)
        BT = jnp.swapaxes(B_, 0, 1)
        WT = jnp.swapaxes(lux_t, 0, 1)
        At = A - bmm(B_, UiW)
        b = -bmv(B_, Uilu)
        C = bmm(B_, bmm(Uinv, BT))
        J = lxx_t - bmm(WT, UiW)
        eta = -(lx_t - bmv(WT, Uilu))
        return (At, b, C, eta, J)

    elems = jax.vmap(stage_elem, in_axes=0, out_axes=0)(
        Amat, Bmat, lx, lu, lxx, luu, lux)
    zeroM = jnp.zeros((1, nx, nx) + Amat.shape[3:], dtype)
    zeroV = jnp.zeros((1, nx) + Amat.shape[3:], dtype)
    terminal = (zeroM, zeroV, zeroM, -VxN[None], VxxN[None])
    elems = tuple(jnp.concatenate([s, t], axis=0)
                  for s, t in zip(elems, terminal))

    # reverse=True feeds the LATER element as fn's first argument (verified:
    # out[0] of a reverse matrix-product scan is M[n-1] @ ... @ M[0]), so the
    # chronological combine takes its operands swapped
    suff = jax.lax.associative_scan(
        jax.vmap(lambda late, early: _combine(early, late),
                 in_axes=0, out_axes=0), elems, reverse=True)
    _, _, _, eta_all, J_all = suff
    return -eta_all, J_all
