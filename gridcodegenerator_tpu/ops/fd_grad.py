"""Analytical forward-dynamics gradient, batched over lanes.

The Carpentier identity ``dFD/du = -Minv dID/du`` evaluated at
``qdd = FD(q, qd, u)`` — the same composition as the reference's generated
FD-gradient kernel (``/root/reference/algorithms/_forward_dynamics_gradient.py:7-62``):
minv -> RNEA bias -> qdd finish -> RNEA _vaf at qdd -> ID gradient ->
``-Minv @ dc_du``, with ``df/dtau = Minv``. X matrices are built once and
shared by every sub-algorithm.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY
from .id_grad import id_grad_inner
from .minv import densify, minv_factors
from .rnea import rnea_bpass, rnea_fpass
from .spatial import bmm, bmv
from .xforms import all_xmats


def fd_grad(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
    return_extras: bool = False,
    qdd: Optional[jnp.ndarray] = None,
):
    """df_du = [dqdd/dq | dqdd/dqd]: (nv, 2*nv, B).

    With ``return_extras``: (df_du, qdd, Minv_dense) — Minv is df/dtau.

    ``qdd``: pass the already-realized accelerations to skip the internal
    forward-dynamics solve (bias RNEA + triangular substitution) — the
    reference's ``USE_QDD_MINV_FLAG`` template variant
    (``_forward_dynamics_gradient.py:209``). Minv is still factorized (it
    is the output ``df/dtau`` and the ``-Minv @ dc_du`` projector).
    """
    Xs = all_xmats(model, q)
    Mu, _ = minv_factors(model, q, Xs=Xs)
    Mi = densify(Mu)
    if qdd is None:
        # bias torque at qdd = 0, then qdd = Minv (u - c)
        v0, a0, f0 = rnea_fpass(model, Xs, qd, None, GRAVITY)
        c, _ = rnea_bpass(model, Xs, qd, f0)
        qdd = bmv(Mi, u - c)
    # RNEA intermediates at the realized qdd, then the ID gradient (the
    # wave algorithm covers floating base with a 6-wide base column block)
    v, a, f = rnea_fpass(model, Xs, qd, qdd, GRAVITY)
    _, f_acc = rnea_bpass(model, Xs, qd, f)
    dc_du = id_grad_inner(model, Xs, qd, v, a, f_acc, GRAVITY)
    df_du = -bmm(Mi, dc_du)
    if return_extras:
        return df_du, qdd, Mi
    return df_du
