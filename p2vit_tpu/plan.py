"""Serving-mode planner: the measured deployment rules as API.

The reference ships no serving path at all (its accelerator exists only in
the paper — SURVEY §0, /root/reference/README.md:17-22); this module
encodes OUR measured on-chip tables (BENCH.md §"Small-batch latency A/B",
§"Swin crossover", §"Zoo-complete closing bench", v5e 2026-08-19) so a
deployment asks one question — "which path serves this model at this batch
size?" — instead of re-deriving the crossovers:

- int8 serving overtakes bf16 XLA between batch 64 and 128 for the ViT
  family and between batch 1 and 4 for Swin (one Swin image carries 16×
  the tokens, so the MXU fills 16× earlier).
- C<384 ViTs (deit_tiny class) never cross: 0.79× at batch 256, every
  layout counter a measured dead-end (§"dtpack A/B").
- LIS-on is the fastest int8 arm for Swin from batch 4 up; the ViT family
  runs ~3-4% faster with the fp-softmax fallback (lis=False), at the cost
  of leaving the reference's Log-Int-Softmax math (BENCH crossover table).

The thresholds are one-chip v5e measurements and drift with the XLA
toolchain; they are deployment defaults, not physics. Re-measure with
tools/latency_ab.py when the toolchain moves.
"""

from __future__ import annotations

import dataclasses

from .models.common import ViTConfig
from .models.swin import SwinConfig

# measured int8-over-bf16 crossover batches (first measured batch size at
# which int8 won; BENCH.md 2026-08-19). Measured-model scope: the vit row
# comes from the deit_small sweep, the swin row from swin_tiny (advisor
# r4); deeper/wider members are expected to cross at-or-earlier batches
# (more tokens/params fill the MXU sooner) — tools/onchip queue r5 sweeps
# deit_base 64/128 and swin_small/base 1/4/16 to pin this per model.
INT8_MIN_BATCH = {"vit": 128, "swin": 4}
# which model each family crossover was actually swept on (cited in
# recommend() reason strings so a deployment knows the evidence scope)
CROSSOVER_MEASURED_ON = {"vit": "deit_small", "swin": "swin_tiny"}
# ViTs narrower than this never crossed (deit_tiny C=192: 0.79x at b=256)
VIT_MIN_EMBED_DIM = 384


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """One serving configuration, directly splattable into the pipelines:
    ``serving.serving_forward(s, cfg, x, **plan.vit_kwargs())`` or
    ``serving_swin.serving_forward(..., lis=plan.lis)``."""

    path: str  # "int8" (quantized Pallas pipeline) | "bf16" (XLA forward)
    lis: bool  # Log-Int-Softmax (parity path) vs fp-softmax fallback
    fuse_qkv: bool
    fuse_layer: bool
    fuse_embed: bool
    reason: str

    def vit_kwargs(self) -> dict:
        """kwargs for serving.serving_forward (int8 path only)."""
        if self.path != "int8":
            raise ValueError(f"no serving kwargs for the {self.path} path")
        return {
            "lis": self.lis,
            "fuse_qkv": self.fuse_qkv,
            "fuse_layer": self.fuse_layer,
            "fuse_embed": self.fuse_embed,
        }


def _family(cfg) -> str:
    if isinstance(cfg, SwinConfig):
        return "swin"
    if isinstance(cfg, ViTConfig):
        return "vit"
    raise TypeError(f"unknown model config type {type(cfg).__name__}")


def recommend(cfg, batch: int, prefer_exact: bool = True) -> ServingPlan:
    """Pick the fastest measured serving mode for (model, batch size).

    ``prefer_exact``: keep the reference-parity integer softmax (LIS) even
    where the fp fallback measured faster (ViT family, ~3-4%). Set False
    to take the measured-fastest arm; Swin keeps LIS either way (it is
    both the parity path AND the fastest arm there from batch 4 up).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    fam = _family(cfg)
    # arm defaults won by the standing A/Bs (BENCH.md): fuse_qkv + fused
    # embed prologue on, whole-layer fusion off at every measured batch
    kw = dict(fuse_qkv=True, fuse_layer=False, fuse_embed=True)
    if fam == "vit" and cfg.embed_dim < VIT_MIN_EMBED_DIM:
        return ServingPlan(
            path="bf16", lis=False, reason=(
                f"C={cfg.embed_dim} ViTs never cross bf16 on this chip "
                "(deit_tiny 0.79x at batch 256; lane padding + per-row VPU "
                "chains — BENCH.md dtpack A/B measured every counter a "
                "dead-end); serve the quantized weights at bf16 speed via "
                "--serve-weight-only (serving.weight_only_params)"), **kw)
    lo = INT8_MIN_BATCH[fam]
    if batch < lo:
        wo_api = ("serving_swin" if fam == "swin" else "serving") \
            + ".weight_only_params"
        return ServingPlan(
            path="bf16", lis=False, reason=(
                f"batch {batch} is below the measured {fam} int8-over-bf16 "
                f"crossover (~{lo}, swept on "
                f"{CROSSOVER_MEASURED_ON[fam]}); the MXU is starved and per-row VPU "
                "chains dominate (BENCH.md small-batch latency A/B) — "
                "serve the quantized weights at bf16 speed via "
                f"--serve-weight-only ({wo_api})"), **kw)
    lis = True if fam == "swin" else prefer_exact
    why_lis = (
        "LIS on: fastest Swin arm from batch 4 up AND the parity path"
        if fam == "swin"
        else ("LIS on: reference-parity integer softmax (fp fallback is "
              "~3-4% faster; pass prefer_exact=False to take it)"
              if lis else
              "LIS off: measured-fastest ViT arm (fp-softmax fallback, "
              "leaves the reference's integer-softmax math)")
    )
    return ServingPlan(
        path="int8", lis=lis, reason=(
            f"batch {batch} >= {fam} crossover {lo}: int8 serving beats "
            f"bf16 (zoo table, BENCH.md). {why_lis}"), **kw)
