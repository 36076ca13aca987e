"""Math primitives with Mosaic-lowerable implementations.

Mosaic (the Pallas TPU backend) has no ``atan``/``atan2`` lowering, so the
fused EE-pose kernels use a Cephes-style polynomial ``atan2`` — the same
accuracy class (~1-2 ulp in f32) as the hardware ``atan2f`` the reference's
generated CUDA calls for its rpy extraction
(``/root/reference/algorithms/_eepose_gradient_hessian.py:151-157``). The
XLA path keeps ``jnp.arctan2``.
"""

from __future__ import annotations

import jax.numpy as jnp

_TAN_3PI_8 = 2.414213562373095
_TAN_PI_8 = 0.4142135623730950


def atan_poly(x):
    """Polynomial arctan (Cephes atanf range reduction + quartic-in-z core)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (ax > _TAN_PI_8) & ~big
    xr = jnp.where(big, -1.0 / jnp.where(big, ax, 1.0),
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    bias = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = xr * xr
    y = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    y = y * z * xr + xr
    return sign * (y + bias)


def atan2_poly(y, x):
    """Four-quadrant arctan built on ``atan_poly`` (branchless)."""
    safe_x = jnp.where(x == 0, 1.0, x)
    base = atan_poly(y / safe_x)
    halfpi = jnp.pi / 2
    return jnp.where(
        x > 0, base,
        jnp.where(x < 0, base + jnp.where(y < 0, -jnp.pi, jnp.pi),
                  jnp.where(y > 0, halfpi,
                            jnp.where(y < 0, -halfpi,
                                      jnp.zeros_like(base)))))
