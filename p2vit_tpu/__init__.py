"""p2vit_tpu — a TPU-native fully-quantized Vision Transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of jiho264/P2-ViT
(P²-ViT: Power-of-Two Post-Training Quantization and Acceleration for Fully
Quantized Vision Transformer, TVLSI 2024): PoT-scale post-training
quantization, PoT-rounded SmoothQuant, FQ-ViT integer LayerNorm / Log-Int-
Softmax, Hessian-guided mixed-precision search, PSAQ-ViT data-free
calibration, and an int8 Pallas serving path where every re-quantization is a
bit shift fused into the matmul epilogue.
"""

__version__ = "0.1.0"

import jax as _jax

# Quantization decisions must be computed with true-f32 matmuls: JAX's
# default matmul precision decomposes f32 into bf16 passes (~1e-3 relative
# error on O(1) values — measured 0.11 absolute on a 192-deep reduction),
# which silently perturbs the PoT/PTF searches away from the PyTorch
# reference's float math. bf16-input matmuls (the serving/bf16-baseline hot
# paths) are unaffected by this setting.
_jax.config.update("jax_default_matmul_precision", "highest")

# When the caller explicitly requests CPU (JAX_PLATFORMS=cpu — tests, CLI
# smoke runs, virtual-mesh dry runs), drop the axon TPU plugin before any
# backend initializes: its get_backend hook forces jax_platforms="axon,cpu"
# and initializes the tunnel client inside backends() even for CPU-only use,
# so an unresponsive tunnel would hang the process in make_c_api_client.
import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    from jax._src import xla_bridge as _xb

    if not _xb.backends_are_initialized():
        _xb._backend_factories.pop("axon", None)
        _jax.config.update("jax_platforms", "cpu")

from .config import QuantPolicy, make_policy
