"""Native C++ topology builder vs the pure-Python parser (bit-level parity)."""

import numpy as np
import pytest

from gridcodegenerator_tpu.models.zoo import load_robot, robot_urdf
from gridcodegenerator_tpu.runtime.native import (native_available,
                                                  parse_urdf_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")

ROBOTS = ["pendulum2", "iiwa", "mixed5", "hyq", "atlas"]


@pytest.mark.parametrize("name", ROBOTS)
def test_native_matches_python(name):
    tn = parse_urdf_native(robot_urdf(name))
    tp = load_robot(name)
    assert tn.get_num_joints() == tp.get_num_joints()
    assert tn.get_num_fixed_joints() == tp.get_num_fixed_joints()
    for i in range(tn.get_num_joints()):
        jn, jp = tn.joints[i], tp.joints[i]
        assert (jn.name, jn.parent_id, jn.jtype, jn.S_ind) == \
               (jp.name, jp.parent_id, jp.jtype, jp.S_ind)
        np.testing.assert_allclose(jn.Xtree, jp.Xtree, atol=1e-14)
        np.testing.assert_allclose(jn.Ttree, jp.Ttree, atol=1e-14)
        np.testing.assert_allclose(tn.get_Imat_by_id(i), tp.get_Imat_by_id(i),
                                   atol=1e-14)
        assert jn.damping == jp.damping
        assert (jn.limit_lower, jn.limit_upper) == \
               (jp.limit_lower, jp.limit_upper)
        assert (jn.effort_limit, jn.velocity_limit) == \
               (jp.effort_limit, jp.velocity_limit)
    np.testing.assert_allclose(tn.get_Imats_ordered_by_id()[0],
                               tp.get_Imats_ordered_by_id()[0], atol=1e-14)
    for k in range(tn.get_num_fixed_joints()):
        fn, fp = tn.fixed_joints[k], tp.fixed_joints[k]
        assert (fn.name, fn.parent_jid) == (fp.name, fp.parent_jid)
        np.testing.assert_allclose(fn.Ttree, fp.Ttree, atol=1e-14)


def test_native_floating():
    tn = parse_urdf_native(robot_urdf("iiwa"), floating_base=True)
    assert tn.floating_base and tn.get_num_joints() == 8
    assert tn.get_num_pos() == 14 and tn.get_num_vel() == 13


def test_native_derived_structure():
    tn = parse_urdf_native(robot_urdf("hyq"))
    tp = load_robot("hyq")
    assert tn.get_parent_id_array().tolist() == \
           tp.get_parent_id_array().tolist()
    for i in range(tn.get_num_joints()):
        assert tn.get_ancestors_by_id(i) == tp.get_ancestors_by_id(i)
        assert tn.get_subtree_by_id(i) == tp.get_subtree_by_id(i)
    assert tn.get_leaf_nodes() == tp.get_leaf_nodes()
