"""Rule-table pins for the serving-mode planner (p2vit_tpu/plan.py).

The planner is pure data → these tests pin the measured deployment rules
(BENCH.md 2026-08-19 crossovers) so a threshold edit is deliberate."""

import pytest

from p2vit_tpu import plan
from p2vit_tpu.models import SWIN_ZOO, VIT_ZOO

DEIT_S = VIT_ZOO["deit_small_patch16_224"]
DEIT_T = VIT_ZOO["deit_tiny_patch16_224"]
SWIN_T = SWIN_ZOO["swin_tiny_patch4_window7_224"]


def test_vit_crossover_rule():
    assert plan.recommend(DEIT_S, 64).path == "bf16"
    assert plan.recommend(DEIT_S, 128).path == "int8"
    assert plan.recommend(DEIT_S, 256).path == "int8"


def test_swin_crossover_rule():
    assert plan.recommend(SWIN_T, 1).path == "bf16"
    assert plan.recommend(SWIN_T, 4).path == "int8"
    assert plan.recommend(SWIN_T, 64).path == "int8"


def test_deit_tiny_never_crosses():
    for b in (1, 128, 256, 4096):
        p = plan.recommend(DEIT_T, b)
        assert p.path == "bf16"
        assert "dead-end" in p.reason


def test_lis_choice():
    # Swin: LIS is both the parity path and the fastest arm
    assert plan.recommend(SWIN_T, 64).lis is True
    assert plan.recommend(SWIN_T, 64, prefer_exact=False).lis is True
    # ViT: parity default on, measured-fastest opt-out
    assert plan.recommend(DEIT_S, 256).lis is True
    assert plan.recommend(DEIT_S, 256, prefer_exact=False).lis is False


def test_vit_kwargs_splat():
    p = plan.recommend(DEIT_S, 256)
    kw = p.vit_kwargs()
    assert kw == {"lis": True, "fuse_qkv": True, "fuse_layer": False,
                  "fuse_embed": True}
    with pytest.raises(ValueError):
        plan.recommend(DEIT_S, 1).vit_kwargs()


def test_input_validation():
    with pytest.raises(ValueError):
        plan.recommend(DEIT_S, 0)
    with pytest.raises(TypeError):
        plan.recommend(object(), 8)


def test_every_plan_has_a_reason():
    for cfg, b in ((DEIT_S, 1), (DEIT_S, 256), (DEIT_T, 256),
                   (SWIN_T, 1), (SWIN_T, 64)):
        assert plan.recommend(cfg, b).reason
