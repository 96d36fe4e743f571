"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax initializes,
so mesh/sharding/collective logic is exercised without TPU hardware (the
multi-device testing strategy the reference lacks — survey §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-import jax with a hardware platform selected (e.g.
# via sitecustomize); backends initialize lazily, so redirecting here still
# works as long as no computation ran yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
