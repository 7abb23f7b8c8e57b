"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via JAX's standard
trick: XLA_FLAGS=--xla_force_host_platform_device_count=8 creates 8 fake CPU
devices (SURVEY.md section 4.6).  Must run before jax is imported anywhere.
"""

import os

# The ambient environment pins JAX_PLATFORMS to the TPU tunnel ('axon');
# tests must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag
# wins, so set it too.
jax.config.update("jax_platforms", "cpu")
# f32 matmuls keep full precision in tests (TPU default is bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")
