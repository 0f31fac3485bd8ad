"""Shared scaffolding for the per-GEMM weight-store A/B tools.

tools/w4pack_latency.py and tools/wstream_bench.py sweep the same DeiT-S
serving GEMM geometry with different weight stores; the shapes and the
synthetic-constant draw live here once so a geometry or methodology fix
lands in both (same principle as profiling.device_time's single
definition). The chain builders stay per-tool — their arm plumbing
differs (requant int8 outputs vs bf16 outputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (name, K, N, gelu) — DeiT-S encoder GEMMs in serving order
DEIT_S_GEMMS = (
    ("qkv", 384, 1152, False),
    ("proj", 384, 384, False),
    ("fc1", 384, 1536, True),
    ("fc2", 1536, 384, False),
)
DEPTH = 12


def make_consts(rng, k, n, rexp=(-12, -4)):
    """Synthetic per-GEMM constants: int4-valued codes (so every store
    format, incl. packed int4, serves the same weights), PoT row scales
    with exponents in [rexp[0], rexp[1]), and a normal bias."""
    kw, kr, kb = jax.random.split(rng, 3)
    w = jax.random.randint(kw, (n, k), -8, 8, jnp.int8)
    r = 2.0 ** jax.random.randint(kr, (n,), *rexp).astype(jnp.float32)
    b = jax.random.normal(kb, (n,), jnp.float32)
    return w, r, b
