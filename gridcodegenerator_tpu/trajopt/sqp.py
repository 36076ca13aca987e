"""SQP trajectory optimizer with exact second-order dynamics Hessians.

BASELINE.md config 4: "SQP MPC with exact second-order IDSVA-SO/FDSVA-SO
Hessians". Formulation: multiple-shooting SQP whose block-tridiagonal KKT
system is solved by the Riccati recursion — exactly the DDP backward sweep
with the second-order dynamics terms retained (the two are algebraically
equivalent for the unconstrained subproblem; see e.g. Rawlings/Mayne/Diehl
ch. 8). Control box constraints from the robot's effort limits are handled
by projected (clamped) rollouts inside the line search.

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
