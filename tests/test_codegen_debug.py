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


def _sample(topo, seed=0):
    n = topo.get_num_joints()
    rng = np.random.default_rng(seed)
    return (build_model(topo, dtype=jnp.float64),
            rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n))


def _lane(x):
    return jnp.asarray(x)[:, None]


def test_minv_stage_dump_matches_oracle():
    from gridcodegenerator_tpu.utils.debug import (minv_stages,
                                                   oracle_minv_stages)
    for robot in ("mixed5", "hyq"):
        topo = load_robot(robot)
        model, q, _, _ = _sample(topo)
        report = diff_stages(minv_stages(model, _lane(q)),
                             oracle_minv_stages(topo, q))
        assert set(report) == {"U", "Dinv", "F", "Minv_upper", "Minv"}
        assert max(report.values()) < 1e-10, (robot, report)


def test_id_grad_stage_dump_matches_oracle():
    from gridcodegenerator_tpu.utils.debug import (id_grad_stages,
                                                   oracle_id_grad_stages)
    for robot in ("mixed5", "hyq"):
        topo = load_robot(robot)
        model, q, qd, qdd = _sample(topo)
        report = diff_stages(
            id_grad_stages(model, _lane(q), _lane(qd), _lane(qdd)),
            oracle_id_grad_stages(topo, q, qd, qdd))
        # every shared stage (dv, da, accumulated df, dc) localizes
        assert {"dv_dq", "da_dqd", "df_dq", "dc_du"} <= set(report)
        assert max(report.values()) < 1e-10, (robot, report)


def test_aba_stage_dump_matches_oracle():
    from gridcodegenerator_tpu.utils.debug import (aba_stages,
                                                   oracle_aba_stages)
    for robot in ("mixed5", "hyq"):
        topo = load_robot(robot)
        model, q, qd, u = _sample(topo)
        report = diff_stages(aba_stages(model, _lane(q), _lane(qd), _lane(u)),
                             oracle_aba_stages(topo, q, qd, u))
        assert {"v", "pA", "U", "Dinv", "uu", "a", "qdd"} <= set(report)
        assert max(report.values()) < 1e-10, (robot, report)


def test_so_stage_dump_localizes_f32_error():
    """so_stages diffing an f32 model against the f64 model: every stage
    reports a small-but-nonzero error, proving the per-pass localization
    works (the DEBUG_MODE use case for the SO kernel)."""
    from gridcodegenerator_tpu.utils.debug import so_stages
    topo = load_robot("pendulum2")
    m64, q, qd, qdd = _sample(topo)
    m32 = build_model(topo, dtype=jnp.float32)

    def lanes(m, dt):
        return (jnp.asarray(q, dt)[:, None], jnp.asarray(qd, dt)[:, None],
                jnp.asarray(qdd, dt)[:, None])

    s64 = so_stages(m64, *lanes(m64, jnp.float64))
    s32 = so_stages(m32, *lanes(m32, jnp.float32))
    report = diff_stages(s32, s64)
    assert {"v", "a", "psid", "IC", "BC", "T1", "idsva_so"} <= set(report)
    assert max(report.values()) < 1e-4, report
    # and the final tensor agrees with the independent jacfwd oracle in f64
    from gridcodegenerator_tpu.ops.so import idsva_so_jacfwd
    ref = np.asarray(idsva_so_jacfwd(m64, *lanes(m64, jnp.float64)))
    np.testing.assert_allclose(s64["idsva_so"], ref, atol=1e-9)


FOREIGN_URDF = """<?xml version="1.0"?>
<robot name="crane3">
  <link name="base">
    <inertial><origin xyz="0 0 0.05"/><mass value="4.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="tower">
    <inertial><origin xyz="0 0 0.4"/><mass value="2.5"/>
      <inertia ixx="0.14" iyy="0.14" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="jib">
    <inertial><origin xyz="0.5 0 0"/><mass value="1.2"/>
      <inertia ixx="0.004" iyy="0.11" izz="0.11" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="trolley">
    <inertial><origin xyz="0 0 -0.1"/><mass value="0.6"/>
      <inertia ixx="0.006" iyy="0.006" izz="0.002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="hook"/>
  <joint name="slew" type="revolute">
    <parent link="base"/><child link="tower"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.0" upper="3.0" effort="80" velocity="2"/>
    <dynamics damping="0.2"/>
  </joint>
  <joint name="luff" type="revolute">
    <parent link="tower"/><child link="jib"/>
    <origin xyz="0 0 0.8" rpy="0.1 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1.2" upper="1.2" effort="60" velocity="2"/>
  </joint>
  <joint name="trolley_slide" type="prismatic">
    <parent link="jib"/><child link="trolley"/>
    <origin xyz="0.2 0 0" rpy="0 0 0"/><axis xyz="1 0 0"/>
    <limit lower="0.0" upper="0.9" effort="40" velocity="1"/>
    <dynamics damping="0.05"/>
  </joint>
  <joint name="hook_mount" type="fixed">
    <parent link="trolley"/><child link="hook"/>
    <origin xyz="0 0 -0.3" rpy="0 0 0"/>
  </joint>
</robot>
"""


def test_codegen_foreign_urdf(tmp_path):
    """Parser + codegen on an input NOT in the zoo: a raw URDF with a
    revolute/revolute/prismatic chain, a rotated joint origin, damping,
    limits and a fixed end-effector joint — the reference's own usage
    pattern (external URDFParser -> gen_all_code; GRiDCodeGenerator.py:309).
    """
    from gridcodegenerator_tpu.reference import oracle
    from gridcodegenerator_tpu.topology.urdf import parse_urdf

    topo = parse_urdf(FOREIGN_URDF)
    assert topo.get_num_joints() == 3
    assert [j.jtype for j in topo.joints] == [
        "revolute", "revolute", "prismatic"]
    assert len(topo.fixed_joints) == 1 and topo.fixed_joints[0].name == \
        "hook_mount"

    out = gen_all_code(topo, file_namespace="grid_tpu_crane",
                       path=str(tmp_path / "grid_tpu_crane.py"))
    spec = importlib.util.spec_from_file_location("grid_tpu_crane", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.NUM_JOINTS == 3 and mod.NUM_EES == 1

    # dynamics from the generated module vs the float64 oracle
    rng = np.random.default_rng(5)
    q, qd, qdd = (rng.uniform(-0.8, 0.8, 3) for _ in range(3))
    c = np.asarray(mod.id(q[None].astype(np.float32),
                          qd[None].astype(np.float32),
                          qdd[None].astype(np.float32)))[0]
    c_ref, _, _, _ = oracle.rnea(topo, q, qd, qdd)
    np.testing.assert_allclose(c, c_ref, atol=5e-5)
    M = np.asarray(mod.crba(q[None].astype(np.float32)))[0]
    Mi = np.asarray(mod.minv(q[None].astype(np.float32)))[0]
    np.testing.assert_allclose(M @ Mi, np.eye(3), atol=1e-4)

    # kernel-tier binder exists and builds in interpret mode
    kfn = mod.id_kernel(block_b=2, interpret=True)
    lane = lambda x: np.tile(x[:, None].astype(np.float32), (1, 2))
    ck = np.asarray(kfn(lane(q), lane(qd), lane(qdd)))[:, 0]
    np.testing.assert_allclose(ck, c_ref, atol=5e-5)
