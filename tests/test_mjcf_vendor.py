"""Converted gym robots (benchmarks/convert_mjcf.py) vs the ORIGINAL MJCF.

The gym_ant / gym_humanoid URDFs carry MuJoCo-compiled inertial parameters
from the published gymnasium-robotics models; these tests run OUR dynamics
on the emitted URDF against MuJoCo running the original XML (fixed root
weld, joint-name mapping), so any conversion bug — frame shifts, principal-
axis rotations, dummy-link chains, anchor offsets — fails loudly.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.reference import oracle


def _orig_model(xml_file, root_body):
    import os

    if xml_file.startswith("dm_control:"):
        import dm_control
        path = os.path.join(os.path.dirname(dm_control.__file__),
                            xml_file.split(":", 1)[1])
    else:
        import gymnasium_robotics
        path = os.path.join(os.path.dirname(gymnasium_robotics.__file__),
                            "envs", "mujoco", "assets", xml_file)
    spec = mujoco.MjSpec.from_file(path)
    # weld every free joint: the root (so the tree matches our fixed base)
    # and any free prop bodies outside the converted subtree (dm_control's
    # quadruped scene ships a soccer ball)
    for b in spec.bodies:
        for j in list(b.joints):
            if j.type == mujoco.mjtJoint.mjJNT_FREE:
                spec.delete(j)
    m = spec.compile()
    # EQUALITY: dm_control's quadruped couples each leg's pitch/knee/ankle
    # through tendon-equality constraints — a mechanism URDF cannot
    # express; the converted robot is the unconstrained rigid-body tree
    # with the published inertial parameters (documented in the URDF
    # header), so the comparison drops the couplings on the MuJoCo side too
    m.opt.disableflags |= (mujoco.mjtDisableBit.mjDSBL_LIMIT
                           | mujoco.mjtDisableBit.mjDSBL_CONTACT
                           | mujoco.mjtDisableBit.mjDSBL_EQUALITY)
    # rotor inertia / joint springs / Coulomb friction are not
    # representable in URDF (dropped by the converter); zero them so both
    # sides model the same mechanism — rigid-body dynamics + damping
    m.dof_armature[:] = 0
    m.jnt_stiffness[:] = 0
    m.dof_frictionloss[:] = 0
    return m


@pytest.mark.parametrize("name,xml,root", [
    ("gym_ant", "ant.xml", "torso"),
    ("gym_humanoid", "humanoid.xml", "torso"),
    ("dm_quadruped", "dm_control:suite/quadruped.xml", "torso"),
])
def test_converted_dynamics_match_original_mjcf(name, xml, root):
    topo = load_robot(name)
    m = _orig_model(xml, root)
    d = mujoco.MjData(m)
    n = topo.get_num_joints()
    assert m.nv == n, (m.nv, n)
    name_to_dof = {m.joint(i).name: m.jnt_dofadr[i] for i in range(m.njnt)}
    perm = np.array([name_to_dof[j.name] for j in topo.joints])

    rng = np.random.default_rng(0)
    for _ in range(3):
        q = rng.uniform(-0.4, 0.4, n)
        qd = rng.uniform(-1, 1, n)
        qdd = rng.uniform(-1, 1, n)

        d.qpos[:] = 0
        d.qvel[:] = 0
        d.qacc[:] = 0
        d.qpos[perm] = q
        d.qvel[perm] = qd
        d.qacc[perm] = qdd
        mujoco.mj_inverse(m, d)
        c_my = oracle.rnea(topo, q, qd, qdd)[0]
        np.testing.assert_allclose(c_my, d.qfrc_inverse[perm], atol=2e-9)

        M_mj = np.zeros((n, n))
        mujoco.mj_fullM(m, d, M_mj)
        np.testing.assert_allclose(oracle.crba(topo, q),
                                   M_mj[np.ix_(perm, perm)], atol=2e-9)
