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

# Persistent-compilation-cache: DISABLED for tests. The 2026-08-18 suite
# crashes first blamed on it turned out to be an XLA:CPU bug independent
# of the cache (SIGSEGV in backend_compile_and_load with the cache fully
# off — same test, test_policy_variants, after ~100 prior in-process
# compiles; passes in isolation; see CLAUDE.md: the suite is now sharded
# over xdist workers for exactly this reason). Keeping the cache off
# anyway: 4 loadfile workers sharing a cache dir is a write race, and the
# old /tmp/jaxcache entries carry pre-migration CPU features this host
# rejects ("could lead to SIGILL" AOT loader warnings). The on-chip tools
# keep their own /tmp/jaxcache (different process, TPU keys).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
jax.config.update("jax_enable_compilation_cache", False)
