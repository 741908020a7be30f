"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is used only by bench.py; tests must be hermetic and
deterministic, so we force the CPU backend with 8 virtual devices to
exercise the same `jax.sharding.Mesh` code paths as a multi-chip TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the sandbox presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins the 'axon' TPU platform via jax.config
# (which overrides the env var), so force CPU again at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Smoke tier: a sub-2-minute sweep touching every subsystem (lie/camera/
# optimizers/IMU/matching/policy/config/graph/retrieval-logic) for quick
# iteration. The full fast tier (~10 min: golden kernel parity, stereo
# depth, dist-BA equality, CLI drivers) stays the default CI pass.
#   python -m pytest -q -m smoke
import pytest  # noqa: E402

_SMOKE_MODULES = {
    "test_lie.py", "test_camera.py", "test_optim.py", "test_imu.py",
    "test_triangulation_policy.py", "test_settings_io.py",
    "test_landmark_stats.py", "test_loop_confirmation.py",
    "test_native_mapgraph.py", "test_viewer.py", "test_geometry.py",
    "test_loop_opt.py",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.nodeid.split("::")[0].rsplit("/", 1)[-1]
        if mod in _SMOKE_MODULES and not any(
            m.name == "slow" for m in it.iter_markers()
        ):
            it.add_marker(pytest.mark.smoke)
