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
