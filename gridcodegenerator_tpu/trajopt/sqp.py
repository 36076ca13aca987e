"""SQP trajectory optimizer with exact second-order dynamics Hessians.

BASELINE.md config 4: "SQP MPC with exact second-order IDSVA-SO/FDSVA-SO
Hessians". Formulation: SINGLE-shooting SQP — each iteration solves the
quadratic subproblem by the Riccati recursion with the second-order
dynamics terms retained, which for the unconstrained subproblem is
algebraically the exact-Hessian DDP backward sweep (the two coincide when
the rollout is feasible by construction, as it is here; a true
multiple-shooting variant with defect constraints is not implemented).
Control box constraints are handled by projected (clamped) rollouts inside
the line search; the bounds default to the robot's URDF effort limits
(``ilqr.resolve_control_bounds``) and may be overridden per-dof via
``SQPConfig.u_min/u_max``.

The second-order tensors come from the FDSVA-SO suite (``ops/so.py``), i.e.
the exact Hessians the config asks for, not a Gauss-Newton approximation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..models.model import RobotModel
from .cost import CostModel
from .ilqr import ILQRConfig, make_ilqr


@dataclasses.dataclass(frozen=True)
class SQPConfig(ILQRConfig):
    use_second_order: bool = True


def make_sqp(model: RobotModel, cost: CostModel, cfg: Optional[SQPConfig] = None,
             **kw):
    """Build the SQP solver (same solve signature as make_ilqr)."""
    if cfg is None:
        cfg = SQPConfig(**kw)
    assert cfg.use_second_order, "SQP requires the exact-Hessian sweep"
    return make_ilqr(model, cost, cfg)
