"""CPU smoke for the queued on-chip bench tools (zoo_bench, search_bench).

The tunnel window is scarce: a KeyError or signature drift in a queued tool
wastes an entire on-chip slot (the round-3 lesson applies to tools too).
These smokes run the tools' REAL main() control flow on injected tiny
geometries — timings are meaningless on CPU; only crash-freedom and output
shape are asserted."""

import sys

import jax
import pytest

from p2vit_tpu.models import swin
from p2vit_tpu.models.common import ViTConfig
from p2vit_tpu.models.vit import vit_flops

# patch-embed is pinned to 8 bits by the sampler, so its FLOPs share must
# stay under the 1.1x-all-4-bit constraint headroom (10%) or the Pareto
# front is structurally empty: patch 4 at embed 32 / depth 4 gives ~3%
TINY_VIT = ViTConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=32, depth=4,
    num_heads=2,
)
# zoo_bench only runs forwards — the shallower geometry compiles faster
TINY_VIT_ZOO = ViTConfig(
    img_size=32, patch_size=8, num_classes=10, embed_dim=16, depth=2,
    num_heads=2,
)
TINY_SWIN = swin.SwinConfig(
    img_size=32, patch_size=4, num_classes=10, embed_dim=16,
    depths=(2, 2), num_heads=(2, 2), window_size=4,
)


def test_require_tpu_noop_on_cpu():
    """Under JAX_PLATFORMS=cpu (the conftest's test env) the dead-tunnel
    guard must return immediately — the tools' smoke path depends on it."""
    from p2vit_tpu.profiling import require_tpu

    require_tpu(max_wait_s=1)


def test_search_bench_smoke(monkeypatch, capsys):
    import tools.search_bench as sb

    name = "tinyvit_patch8_32"
    monkeypatch.setitem(sb.VIT_ZOO, name, TINY_VIT)
    monkeypatch.setitem(sb.MEAN_HESSIAN, "tinyvit",
                        [1.0] * len(vit_flops(TINY_VIT)))
    monkeypatch.setattr(sys, "argv",
                        ["search_bench", name, "--val-batches", "1",
                         "--batch", "4"])
    sb.main()
    out = capsys.readouterr().out
    assert "END-TO-END --mixed wall" in out
    assert "WARNING" not in out  # zero-recompile claim must hold


def test_search_bench_rejects_unknown_hessian(monkeypatch):
    import tools.search_bench as sb

    name = "nohess_patch8_32"
    monkeypatch.setitem(sb.VIT_ZOO, name, TINY_VIT)
    monkeypatch.setattr(sys, "argv", ["search_bench", name])
    with pytest.raises(SystemExit):
        sb.main()


def test_resln_insitu_smoke(monkeypatch, capsys):
    import tools.resln_insitu as ri

    name = "tinyvit_patch8_32"
    monkeypatch.setitem(ri.VIT_ZOO, name, TINY_VIT_ZOO)
    monkeypatch.setitem(ri.BATCH, name, 4)
    monkeypatch.setattr(sys, "argv", ["resln_insitu", name])
    ri.main()
    out = capsys.readouterr().out
    assert "IN-SITU per-layer" in out
    assert "resln=True" in out and "nodma" in out


def test_zoo_bench_smoke(monkeypatch, capsys):
    import tools.zoo_bench as zb

    vname, sname = "tinyvit_patch8_32", "tinyswin_patch4_window4_32"
    monkeypatch.setitem(zb.VIT_ZOO, vname, TINY_VIT_ZOO)
    monkeypatch.setitem(zb.SWIN_ZOO, sname, TINY_SWIN)
    monkeypatch.setitem(zb.BATCH, vname, 4)
    monkeypatch.setitem(zb.BATCH, sname, 4)
    monkeypatch.setattr(sys, "argv", ["zoo_bench", vname, sname])
    zb.main()
    out = capsys.readouterr().out
    assert "FAILED" not in out
    assert vname in out and sname in out


def test_zoo_bench_ledger_rows():
    """Only numeric fields of succeeded models reach the committed ledger
    (failure strings must never enter — bench.py ledger contract)."""
    import tools.zoo_bench as zb

    rows = zb.ledger_rows({
        "swin_base_patch4_window7_224": {
            "bf16_img_s": 736.0, "lis_on_vs_baseline": 1.789,
            "note": "strings dropped"},
        "deit_tiny_patch16_224": "failed: RuntimeError: tunnel",
    })
    assert rows == {"zoo_swin_base_bf16_img_s": 736.0,
                    "zoo_swin_base_lis_on_vs_baseline": 1.789}


def test_w4pack_latency_smoke(monkeypatch, capsys):
    """Drives the packed-store A/B arms in interpret mode: the bitwise
    pin (i8 store == packed w4 store) must hold on every GEMM and on the
    depth chain — a MISMATCH on chip would invalidate the whole A/B."""
    import tools.w4pack_latency as wl

    monkeypatch.setattr(wl, "INTERPRET", True)
    monkeypatch.setattr(wl, "DEPTH", 2)
    monkeypatch.setattr(
        wl, "DEIT_S_GEMMS",
        (("qkv", 32, 96, False), ("proj", 32, 32, False),
         ("fc1", 32, 128, True), ("fc2", 128, 32, False)),
    )
    monkeypatch.setattr(sys, "argv", ["w4pack_latency"])
    wl.main()
    out = capsys.readouterr().out
    assert "MISMATCH" not in out and "FAILED" not in out
    assert "depth-" in out and "bitwise=ok" in out


def test_wstream_bench_smoke(monkeypatch, capsys):
    """Drives the streamed-weight arms (xla / bf16 / i8 / w8p / w4p) in
    interpret mode: every arm must argmax-agree with the bf16-const XLA
    baseline ('!' marks a <0.99 agreement in the per-GEMM lines)."""
    import tools.wstream_bench as ws

    monkeypatch.setattr(ws, "INTERPRET", True)
    monkeypatch.setattr(ws, "DEPTH", 2)
    monkeypatch.setattr(
        ws, "DEIT_S_GEMMS",
        (("qkv", 32, 96, False), ("proj", 32, 32, False),
         ("fc1", 32, 128, True), ("fc2", 128, 32, False)),
    )
    monkeypatch.setattr(sys, "argv", ["wstream_bench"])
    ws.main()
    out = capsys.readouterr().out
    assert "FAILED" not in out and "!" not in out
    assert "best=" in out and "depth-" in out


def test_latency_ab_smoke(monkeypatch, capsys):
    import tools.latency_ab as la

    name = "tinyvit_patch8_32"
    monkeypatch.setitem(la.VIT_ZOO, name, TINY_VIT_ZOO)
    monkeypatch.setattr(sys, "argv", ["latency_ab", name])
    la.main()
    out = capsys.readouterr().out
    assert "best=" in out
    assert "agree=1.0" in out  # fuse_layer arm must stay argmax-identical


def test_latency_ab_swin_smoke(monkeypatch, capsys):
    """The Swin branch (crossover sweep support) must drive calibrate →
    convert → both serving arms without the ViT-only fuse_layer probe."""
    import tools.latency_ab as la

    name = "tinyswin_patch4_window4_32"
    monkeypatch.setitem(la.SWIN_ZOO, name, TINY_SWIN)
    monkeypatch.setattr(sys, "argv", ["latency_ab", name])
    la.main()
    out = capsys.readouterr().out
    assert name in out and "int8_loff" in out and "best=" in out
    assert "agree" not in out.split(name)[-1].splitlines()[0]
