"""Codegen emission (gen_all_code analog) and DEBUG_MODE staged dumps."""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np

from gridcodegenerator_tpu.codegen.emit import gen_all_code
from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.utils.debug import (diff_stages,
                                               oracle_rnea_stages,
                                               rnea_stages)


def test_gen_all_code_roundtrip(tmp_path):
    topo = load_robot("pendulum2")
    out = gen_all_code(topo, file_namespace="grid_tpu_pend",
                       path=str(tmp_path / "grid_tpu_pend.py"))
    spec = importlib.util.spec_from_file_location("grid_tpu_pend", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.NUM_JOINTS == 2 and mod.ROBOT_NAME == "pendulum2"
    # baked-literal topology reconstructs identically
    t2 = mod.init_robot()
    np.testing.assert_allclose(t2.joints[1].Xtree, topo.joints[1].Xtree,
                               atol=0)
    # generated API matches the framework API
    q = np.full((3, 2), 0.3, np.float32)
    v = np.full((3, 2), 0.1, np.float32)
    from gridcodegenerator_tpu.api import GRiD
    ref = GRiD(topo, use_pallas=False)
    np.testing.assert_allclose(np.asarray(mod.id(q, v, v)),
                               np.asarray(ref.id(q, v, v)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mod.crba(q)),
                               np.asarray(ref.crba(q)), atol=1e-6)


def test_debug_stage_dump_matches_oracle(capsys):
    topo = load_robot("mixed5")
    model = build_model(topo, dtype=jnp.float64)
    n = model.n
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, n)
    qd = rng.uniform(-1, 1, n)
    qdd = rng.uniform(-1, 1, n)
    st = rnea_stages(model, jnp.asarray(q)[:, None], jnp.asarray(qd)[:, None],
                     jnp.asarray(qdd)[:, None])
    so = oracle_rnea_stages(topo, q, qd, qdd)
    report = diff_stages(st, so)
    assert max(report.values()) < 1e-10, report
    # pretty printer runs
    from gridcodegenerator_tpu.utils.debug import print_stages
    print_stages({"c": st["c"]})
    assert "c =" in capsys.readouterr().out
