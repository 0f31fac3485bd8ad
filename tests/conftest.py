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

# The axon TPU plugin (registered at interpreter startup via the
# sitecustomize in /root/.axon_site) forces jax_platforms="axon,cpu" and
# makes backends() initialize its tunnel client even when only CPU is
# requested; if the tunnel is unresponsive, every test hangs in
# make_c_api_client. Tests are CPU-only by design — unregister the factory
# before any backend initializes.
from jax._src import xla_bridge as _xb

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Persistent-compilation-cache isolation: the on-chip tools share
# /tmp/jaxcache (TPU-keyed entries, written through the tunnel). A suite
# run that inherits JAX_COMPILATION_CACHE_DIR pointing there can abort the
# whole process (SIGABRT in compilation_cache.get_executable_and_time) on a
# corrupt/raced entry — observed 2026-08-18, test_policy_variants. Tests
# get their own cache dir: still fast on re-runs, never racing the tools,
# and deletable without losing the TPU cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_cpu_tests")
