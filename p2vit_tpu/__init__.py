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

from .config import QuantPolicy, make_policy
