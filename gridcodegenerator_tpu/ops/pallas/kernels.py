"""Fused Pallas entry points for the dynamics suite.

One VMEM-resident kernel per algorithm — the performance tier matching the
reference's generated ``ALGORITHM_kernel`` launches. Each kernel body is the
oracle-validated jnp builder from ``gridcodegenerator_tpu.ops``; this module
only binds shapes and tiling.

Fixed-base robots only (the floating 6-dof block uses batched linalg on the
XLA path; MPC rollout batching — the hot path these kernels serve — is
fixed-base in the reference benchmarks as well).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp

from ...models.model import RobotModel
from .. import aba as _aba
from .. import crba as _crba
from .. import fd as _fd
from .. import fd_grad as _fd_grad
from .. import id_grad as _id_grad
from .. import minv as _minv
from .. import rnea as _rnea
from .fuse import DEFAULT_BLOCK_B, fuse_batched


def _check(model: RobotModel):
    if model.floating_base:
        raise NotImplementedError(
            "fused Pallas kernels are fixed-base; floating robots use the XLA path")


def _bind(model: RobotModel, algo):
    """Close ``algo(model, *ins)`` over a model whose constant arrays arrive
    as kernel inputs (Pallas cannot capture array constants)."""
    consts = (model.Xtree, model.Imat, model.damping, model.subtree_mask)

    def fn(Xtree, Imat, damping, subtree_mask, *ins):
        m = dataclasses.replace(model, Xtree=Xtree, Imat=Imat,
                                damping=damping, subtree_mask=subtree_mask)
        return algo(m, *ins)

    return fn, consts


def rnea_pallas(model: RobotModel, gravity: float, with_qdd: bool = True,
                block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused RNEA: (q, qd[, qdd]) (n,B) -> c (n,B)."""
    _check(model)
    n = model.n
    if with_qdd:
        fn, consts = _bind(model, lambda m, q, qd, qdd: _rnea.rnea(
            m, q, qd, qdd, gravity))
        ins = [(n,), (n,), (n,)]
    else:
        fn, consts = _bind(model, lambda m, q, qd: _rnea.rnea(
            m, q, qd, None, gravity))
        ins = [(n,), (n,)]
    return fuse_batched(fn, ins, [(n,)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def minv_pallas(model: RobotModel, dense: bool = True,
                block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused direct-Minv: q (n,B) -> Minv (n,n,B)."""
    _check(model)
    n = model.n
    fn, consts = _bind(model, lambda m, q: _minv.minv(m, q, dense))
    return fuse_batched(fn, [(n,)], [(n, n)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def crba_pallas(model: RobotModel, block_b: int = DEFAULT_BLOCK_B,
                interpret: bool = False):
    """Fused CRBA: q (n,B) -> M (n,n,B)."""
    _check(model)
    n = model.n
    fn, consts = _bind(model, lambda m, q: _crba.crba(m, q))
    return fuse_batched(fn, [(n,)], [(n, n)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def fd_pallas(model: RobotModel, gravity: float,
              block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused forward dynamics (Minv route): (q, qd, u) -> qdd (n,B)."""
    _check(model)
    n = model.n
    fn, consts = _bind(model, lambda m, q, qd, u: _fd.forward_dynamics(
        m, q, qd, u, gravity))
    return fuse_batched(fn, [(n,)] * 3, [(n,)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def aba_pallas(model: RobotModel, gravity: float,
               block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused ABA forward dynamics: (q, qd, u) -> qdd (n,B)."""
    _check(model)
    n = model.n
    fn, consts = _bind(model, lambda m, q, qd, u: _aba.aba(
        m, q, qd, u, gravity))
    return fuse_batched(fn, [(n,)] * 3, [(n,)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def id_du_pallas(model: RobotModel, gravity: float,
                 block_b: int = DEFAULT_BLOCK_B, interpret: bool = False):
    """Fused analytical ID gradient: (q, qd, qdd) -> dc_du (n, 2n, B)."""
    _check(model)
    n = model.n
    fn, consts = _bind(model, lambda m, q, qd, qdd: _id_grad.id_grad(
        m, q, qd, qdd, gravity))
    return fuse_batched(fn, [(n,)] * 3, [(n, 2 * n)], consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)


def fd_du_pallas(model: RobotModel, gravity: float,
                 block_b: int = DEFAULT_BLOCK_B, interpret: bool = False,
                 with_extras: bool = False):
    """Fused analytical FD gradient: (q, qd, u) -> df_du (n, 2n, B).

    ``with_extras`` additionally returns qdd (n,B) and Minv (n,n,B) from the
    same fused pass (the MPC hot path needs all three; one kernel, one read
    of the inputs — the reference's compute-only host mode analog).
    """
    _check(model)
    n = model.n
    if with_extras:
        fn, consts = _bind(model, lambda m, q, qd, u: _fd_grad.fd_grad(
            m, q, qd, u, gravity, return_extras=True))
        outs = [(n, 2 * n), (n,), (n, n)]
    else:
        fn, consts = _bind(model, lambda m, q, qd, u: _fd_grad.fd_grad(
            m, q, qd, u, gravity))
        outs = [(n, 2 * n)]
    return fuse_batched(fn, [(n,)] * 3, outs, consts=consts,
                        dtype=model.Imat.dtype, block_b=block_b,
                        interpret=interpret)
