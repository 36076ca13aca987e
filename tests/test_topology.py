"""Topology-layer tests: URDF parsing and the RobotTopology accessor surface."""

import numpy as np
import pytest

from gridcodegenerator_tpu.models.zoo import list_robots, load_robot


ALL_FIXED = ["pendulum2", "pendulum4", "iiwa", "mixed5", "hyq", "atlas"]


@pytest.mark.parametrize("name", ALL_FIXED)
def test_structure_invariants(name):
    r = load_robot(name)
    n = r.get_num_joints()
    assert r.get_num_pos() == n and r.get_num_vel() == n
    parent = r.get_parent_id_array()
    for i in range(n):
        assert parent[i] < i  # topological ordering
        anc = r.get_ancestors_by_id(i)
        sub = r.get_subtree_by_id(i)
        assert i in sub and i not in anc
        if parent[i] != -1:
            assert parent[i] in anc
            assert r.get_bfs_level_by_id(i) == r.get_bfs_level_by_id(parent[i]) + 1
        else:
            assert r.get_bfs_level_by_id(i) == 0
    # ancestors+self counts match the flat pair lists
    assert len(r.get_jid_ancestor_ids()) == r.get_total_ancestor_count() + n
    # every joint is in each of its ancestors' subtrees
    for i in range(n):
        for a in r.get_ancestors_by_id(i):
            assert r.get_is_in_subtree_of(i, a)
            assert r.get_is_ancestor_of(a, i)
    # bfs level lists partition all ids
    ids = [j for lvl in range(r.get_max_bfs_level() + 1)
           for j in r.get_ids_by_bfs_level(lvl)]
    assert sorted(ids) == list(range(n))


def test_serial_vs_branched():
    assert load_robot("iiwa").is_serial_chain()
    assert not load_robot("hyq").is_serial_chain()
    hyq = load_robot("hyq")
    # 4 legs sharing the base: repeated parents at level 0
    assert hyq.has_repeated_parents(hyq.get_ids_by_bfs_level(0))
    assert hyq.get_total_leaf_nodes() == 4
    assert load_robot("atlas").get_total_leaf_nodes() == 5


def test_xmat_orthogonality_and_S():
    r = load_robot("mixed5")
    q = np.random.default_rng(1).uniform(-1, 1, r.get_num_joints())
    for i in range(r.get_num_joints()):
        X = r.get_Xmat_Func_by_id(i)(q[i])
        E = X[:3, :3]
        assert np.allclose(E @ E.T, np.eye(3), atol=1e-12)
        assert np.allclose(X[:3, 3:], 0.0)
        assert np.allclose(X[3:, 3:], E)
        S = r.get_S_by_id(i)
        assert S.sum() == 1.0 and set(np.unique(S)) <= {0.0, 1.0}


def test_spatial_inertia_structure():
    r = load_robot("iiwa")
    for i in range(r.get_num_joints()):
        I = r.get_Imat_by_id(i)
        assert np.allclose(I, I.T, atol=1e-12)
        m = I[3, 3]
        assert np.allclose(I[3:, 3:], m * np.eye(3))
        evals = np.linalg.eigvalsh(I)
        assert evals.min() >= -1e-10


def test_fixed_joint_targets():
    r = load_robot("iiwa")
    assert r.get_num_fixed_joints() == 1
    fj = r.get_fixed_joint_by_name("ee_fixed")
    assert fj is not None and fj.parent_jid == 6
    assert load_robot("hyq").get_num_fixed_joints() == 4


def test_floating_base_variant():
    r = load_robot("iiwa_floating")
    assert r.floating_base
    assert r.get_num_joints() == 8
    assert r.get_num_pos() == 7 + 7 and r.get_num_vel() == 6 + 7
    assert r.get_parent_id(1) == 0
    # floating joint X at identity pose is the identity
    q0 = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert np.allclose(r.get_Xmat_Func_by_id(0)(q0), np.eye(6))


def test_zoo_listing():
    names = list_robots()
    assert "iiwa" in names and "atlas_floating" in names
