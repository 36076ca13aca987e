"""External ground-truth cross-validation tests (CI subset).

Validates the oracle layer against two sources the builder did not write
(the reference repo's delegation-to-``rbdReference`` pattern,
``/root/reference/README.md:13,59-66``):

* MuJoCo (independent third-party engine): RNEA / CRBA / ABA / ID-gradient
  (finite differences), on serial, branched, prismatic/skew-axis, and
  vendor (iiwa14) robots;
* the reference's own ``_test.py`` NumPy oracle, executed over our
  ``RobotTopology`` (which implements the URDFParser robot surface).

The exhaustive sweep (more samples, floating base, EE frames, atlas) lives
in ``benchmarks/crosscheck.py`` -> ``CROSSCHECK_r03.json``.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

mujoco = pytest.importorskip("mujoco")

from benchmarks import crosscheck as cc  # noqa: E402

SLOW = os.environ.get("GRID_SLOW_TESTS", "") not in ("", "0")


@pytest.mark.parametrize("robot", ["iiwa", "iiwa14", "hyq", "mixed5"]
                         + (["atlas", "pendulum4"] if SLOW else []))
def test_mujoco_fixed_base(robot):
    errs = cc.crosscheck_mujoco_fixed(robot, samples=3)
    for algo in ("rnea", "crba", "minv", "aba"):
        assert errs[algo] < cc.TOL_ANALYTIC, (algo, errs)
    assert errs["id_du"] < cc.TOL_FD, errs


@pytest.mark.parametrize("robot", ["iiwa", "hyq"]
                         + (["atlas", "iiwa14"] if SLOW else []))
def test_reference_oracle(robot):
    ref = cc._load_reference_oracle()
    if ref is None:
        pytest.skip("reference repo not present")
    errs = cc.crosscheck_reference(robot, samples=2, ref_mod=ref)
    for algo in ("rnea", "minv", "rnea_grad", "fd_grad"):
        assert errs[algo] < cc.TOL_ANALYTIC, (algo, errs)


def test_reference_oracle_prismatic_scope():
    """mixed5: values compare clean; gradients are excluded by design (the
    reference's analytical gradient is revolute-only — it fails finite
    differences of its own test_rnea there, ours passes them)."""
    ref = cc._load_reference_oracle()
    if ref is None:
        pytest.skip("reference repo not present")
    errs = cc.crosscheck_reference("mixed5", samples=1, ref_mod=ref)
    assert errs["rnea"] < cc.TOL_ANALYTIC
    assert errs["minv"] < cc.TOL_ANALYTIC
    assert "note" in errs


def test_mujoco_eepos():
    errs = cc.crosscheck_mujoco_eepos("iiwa", samples=2)
    assert errs["eepos_xyz"] < cc.TOL_ANALYTIC
    assert errs["eepos_R"] < cc.TOL_ANALYTIC


@pytest.mark.skipif(not SLOW, reason="floating-base crosscheck is "
                    "compile-heavy; set GRID_SLOW_TESTS=1")
@pytest.mark.parametrize("robot", ["iiwa_floating", "hyq_floating"])
def test_mujoco_floating_base(robot):
    errs = cc.crosscheck_mujoco_floating(robot, samples=2)
    assert errs["rnea"] < cc.TOL_ANALYTIC, errs
    assert errs["aba"] < cc.TOL_ANALYTIC, errs
