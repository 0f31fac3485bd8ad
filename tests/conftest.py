"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); numeric unit tests also run on CPU for determinism.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", False)
