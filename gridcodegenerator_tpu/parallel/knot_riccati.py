"""Knot-sharded Riccati reduce over ICI — multi-device LQR backward pass.

The horizon (knot) axis is sharded across a mesh axis; each device combines
its local chunk of conditional-value elements (``trajopt/priccati.py``) with
a local associative suffix scan, the per-chunk aggregates are reduced across
devices in ceil(log2 D) ``ppermute`` rounds (reverse Hillis-Steele scan over
the device axis — the collectives ride ICI), and every device then finishes
its local suffixes and feedback gains independently. Total sequential depth:
O(log N_local + log D) instead of N.

This is the north-star multi-host Riccati reduction (BASELINE.md config 5;
"The Parallelization of Riccati Recursion" in PAPERS.md). The reference has
no distributed layer of any kind (SURVEY.md §2.7). Two entry points:

* :func:`local_knot_gains` — the per-device body, for callers ALREADY under
  a ``shard_map`` (the scenario-tree MPC step runs the whole iLQR solve in
  one shard_map over a hybrid ("dp", "kp") mesh; ``trajopt/ilqr.py`` calls
  this to split its backward sweep over "kp");
* :func:`sharded_lqr_gains` — a standalone shard_map wrapper for direct
  knot-sharded LQR gain computation.

Correctness of the zero-fill: ``ppermute`` delivers zeros to devices with no
source. A zero element (A=b=C=0, eta=0, J=0) acts as a "V=0 terminal": the
combine freezes the left operand's (eta, J) and zeroes its (A, b, C). Zeros
are only ever received once a device's running aggregate already covers
through the last (terminal-augmented) chunk, so frozen aggregates are exactly
the saturated suffixes and (eta, J) — the only fields read out — stay right.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.linalg import gj_inverse
from ..ops.spatial import bmm, bmv
from ..trajopt.priccati import _combine


def _where_tree(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


def local_knot_gains(axis_name: str, D: int, reg: float,
                     Amat, Bmat, lx, lu, lxx, luu, lux, VxN, VxxN):
    """Per-device body of the knot-sharded Riccati reduce.

    MUST execute inside a ``shard_map``/collective context providing mesh
    axis ``axis_name`` of size ``D``. Inputs are the LOCAL knot chunks
    (leading axis N_loc = N/D, knot-ordered: device d holds knots
    [d*N_loc, (d+1)*N_loc)); ``VxN``/``VxxN`` are replicated. Returns the
    local ``(ks, Ks)`` gain chunks.

    ``reg`` enters only the final gain solves; the value propagation uses
    the exact (unregularized) elements so the sweep matches a sequential
    Riccati recursion to O(reg^2) (see ``priccati.suffix_value_functions``).
    """
    nx, nu = Amat.shape[1], Bmat.shape[2]
    dtype = Amat.dtype
    lanes = Amat.shape[3:]

    def stage_elem(A, B_, lx_t, lu_t, lxx_t, luu_t, lux_t):
        Uinv = gj_inverse(luu_t)
        UiW = bmm(Uinv, lux_t)
        Uilu = bmv(Uinv, lu_t)
        BT = jnp.swapaxes(B_, 0, 1)
        WT = jnp.swapaxes(lux_t, 0, 1)
        return (A - bmm(B_, UiW), -bmv(B_, Uilu),
                bmm(B_, bmm(Uinv, BT)), -(lx_t - bmv(WT, Uilu)),
                lxx_t - bmm(WT, UiW))

    elems = jax.vmap(stage_elem, in_axes=0, out_axes=0)(
        Amat, Bmat, lx, lu, lxx, luu, lux)
    # local inclusive suffix scan (reverse=True feeds the later element
    # first — see priccati.py)
    local_suffix = jax.lax.associative_scan(
        jax.vmap(lambda late, early: _combine(early, late)),
        elems, reverse=True)
    agg = jax.tree.map(lambda x: x[0], local_suffix)

    zM = jnp.zeros((nx, nx) + lanes, dtype)
    zV = jnp.zeros((nx,) + lanes, dtype)
    terminal = (zM, zV, zM, -VxN, VxxN)
    d = jax.lax.axis_index(axis_name)
    is_last = d == D - 1
    agg = _where_tree(is_last, _combine(agg, terminal), agg)

    # reverse Hillis-Steele inclusive scan over the device axis
    x = agg
    k = 1
    while k < D:
        y = jax.lax.ppermute(
            x, axis_name, [(i, i - k) for i in range(k, D)])
        x = _where_tree(d + k <= D - 1, _combine(x, y), x)
        k *= 2
    # exclusive aggregate from the right: r_d = x_{d+1}, terminal at the end
    if D > 1:
        r = jax.lax.ppermute(
            x, axis_name, [(i, i - 1) for i in range(1, D)])
        r = _where_tree(is_last, terminal, r)
    else:
        r = terminal

    sg = jax.vmap(lambda e: _combine(e, r))(local_suffix)
    _, _, _, eta_all, J_all = sg
    Vx_all = -eta_all                        # (N_loc, nx, B)
    Vxx_all = J_all
    _, _, _, eta_r, J_r = r
    Vx_next = jnp.concatenate([Vx_all[1:], -eta_r[None]], axis=0)
    Vxx_next = jnp.concatenate([Vxx_all[1:], J_r[None]], axis=0)

    def gain_t(A, Bm, lu_t, luu_t, lux_t, Vx, Vxx):
        Bt = jnp.swapaxes(Bm, 0, 1)
        Qu = lu_t + bmv(Bt, Vx)
        Qux = lux_t + bmm(bmm(Bt, Vxx), A)
        Quu = luu_t + bmm(bmm(Bt, Vxx), Bm)
        reg_eye = reg * jnp.eye(nu, dtype=dtype)[:, :, None]
        Qi = gj_inverse(Quu + reg_eye)
        return -bmv(Qi, Qu), -bmm(Qi, Qux)

    return jax.vmap(gain_t, in_axes=0, out_axes=0)(
        Amat, Bmat, lu, luu, lux, Vx_next, Vxx_next)


def sharded_lqr_gains(mesh: Mesh, axis_name: str = "kp",
                      reg: float = 0.0):
    """Build gains(Amat, Bmat, lx, lu, lxx, luu, lux, VxN, VxxN) with the
    knot-stacked inputs sharded over ``axis_name``.

    Shapes as in ``priccati.suffix_value_functions``; returns ``(ks, Ks)``
    of shapes ``(N, nu, B)`` / ``(N, nu, nx, B)``, knot-sharded.
    """
    D = mesh.shape[axis_name]

    def local_fn(*args):
        return local_knot_gains(axis_name, D, reg, *args)

    knot = lambda nd: P(*((axis_name,) + (None,) * (nd - 1)))
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(knot(4), knot(4), knot(3), knot(3), knot(4), knot(4),
                  knot(4), P(), P()),
        out_specs=(knot(3), knot(4)),
    )

    def checked(*args):
        N = args[0].shape[0]
        if N % D != 0:
            raise ValueError(
                f"knot count {N} must be divisible by mesh axis "
                f"'{axis_name}' size {D}")
        return fn(*args)

    return checked
