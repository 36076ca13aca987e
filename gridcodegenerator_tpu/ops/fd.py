"""Forward dynamics via the Minv route: qdd = Minv(q) (u - c(q, qd)).

Mirrors the reference FD composition (``/root/reference/algorithms/
_forward_dynamics.py:41-49``): direct-Minv inner, RNEA bias inner, then the
symmetric matvec finish. X matrices are computed once and shared across the
sub-algorithms, like the reference's single ``load_update_XImats_helpers``
call per knot.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY
from .minv import densify, minv_factors
from .rnea import rnea_bpass, rnea_fpass
from .spatial import bmv
from .xforms import all_xmats


def forward_dynamics(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
    return_extras: bool = False,
):
    """qdd (nv, B); with ``return_extras`` also (c, Minv_dense, Xs)."""
    Xs = all_xmats(model, q)
    v, a, f = rnea_fpass(model, Xs, qd, None, GRAVITY)
    c, _ = rnea_bpass(model, Xs, qd, f)
    Mu, _ = minv_factors(model, q, Xs=Xs)
    Mi = densify(Mu)
    qdd = bmv(Mi, u - c)
    if return_extras:
        return qdd, c, Mi, Xs
    return qdd
