"""Unrolled forward-mode Jacobians over the trailing batch axis.

``jax.jacfwd``-of-a-batched-kernel vectorizes the seed axis with ``vmap``,
which XLA handles but Mosaic cannot (the seed axis gets folded into the
128-lane batch dimension via an unsupported shape cast). These helpers unroll
the seed loop at trace time instead — one ``jax.jvp`` per input coordinate,
each evaluating the SAME lane-major batched kernel — so the Pallas kernels
for the second-order tensors (IDSVA-SO/FDSVA-SO analogs,
``/root/reference/algorithms/_idsva_so.py``) and the EE-pose derivatives
(``_eepose_gradient_hessian.py:400-509,774-983``) lower cleanly. The unroll
mirrors the reference's own structure: its generated kernels also unroll the
derivative-direction loop per joint at codegen time.

FLOPs are identical to ``jacfwd`` (n linearized passes either way); only the
batching strategy differs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def seed_jac(f: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of a batched map via unrolled seed jvps.

    ``f(x)`` maps ``(dim, B) -> out_shape + (B,)``; returns
    ``out_shape + (dim, B)`` — the ``jax.jacfwd`` axis layout
    (derivative index second-to-last, batch last).
    """
    dim = x.shape[0]
    rows = jnp.arange(dim, dtype=jnp.int32)
    cols = []
    for k in range(dim):
        # broadcasted one-hot row (no scatter: Mosaic has no scatter lowering)
        tangent = jnp.broadcast_to(
            (rows == k).astype(x.dtype)[:, None], x.shape)
        _, t = jax.jvp(f, (x,), (tangent,))
        cols.append(t)
    return jnp.stack(cols, axis=-2)
