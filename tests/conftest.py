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

# Persistent-compilation-cache: DISABLED for tests. Two whole-process
# crashes in the cache layer on this box (SIGABRT in
# get_executable_and_time on a shared dir, then SIGSEGV in
# put_executable_and_time even on an isolated dir — both 2026-08-18,
# test_policy_variants). The suite ran green for rounds 1-3 without a
# persistent cache; re-run speed is not worth a flaky-crash suite. The
# on-chip tools keep their own /tmp/jaxcache (different process, TPU keys).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
jax.config.update("jax_enable_compilation_cache", False)
