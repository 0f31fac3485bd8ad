"""bench.py ledger fallback: the driver-facing JSON line must carry a
date-labeled last-known-TPU block when the axon tunnel is dead (round-3
lesson: BENCH_r03.json recorded bare CPU numbers, which read as a
regression — VERDICT r3 item 1)."""

import json

import bench


def test_ledger_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_LEDGER", "ledger_test.json")
    # point the ledger at tmp_path: both helpers resolve the path relative
    # to the module's __file__
    monkeypatch.setattr(
        bench, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    res = {
        "deit_small_lis_on_img_s": 7131.0,
        "deit_small_lis_on_vs_baseline": 1.213,
        "u8_exact": True,
        "swin_tiny_img_s": "unavailable: RuntimeError",  # dropped: not a number
        "some_tuple": (1, 2),  # dropped: not JSON-ledger material
    }
    bench._update_ledger(res)
    got = bench._load_ledger()
    assert got is not None
    assert got["platform"] == "tpu"
    assert got["captured"]  # date-labeled
    assert got["deit_small_lis_on_img_s"] == 7131.0
    assert got["u8_exact"] is True
    assert "swin_tiny_img_s" not in got
    assert "some_tuple" not in got
    # the ledger file is valid JSON on disk
    raw = json.loads((tmp_path / "ledger_test.json").read_text())
    assert raw == got


def test_committed_ledger_is_valid():
    """The repo's committed BENCH_LEDGER.json must parse and be labeled —
    bench.py embeds it verbatim in CPU-fallback driver artifacts."""
    got = bench._load_ledger()
    assert got is not None
    assert got["platform"] == "tpu"
    assert got["captured"] >= "2026-08-17"
    assert isinstance(got["deit_small_lis_on_img_s"], (int, float))
    assert isinstance(got["deit_small_lis_on_vs_baseline"], (int, float))


def test_zoo_block():
    """On-chip driver lines carry the zoo headline from the ledger,
    date-labeled; absent zoo keys -> no block."""
    led = {"captured": "2026-08-19", "deit_small_lis_on_img_s": 7175.0,
           "zoo_swin_base_lis_on_vs_baseline": 1.7874,
           "zoo_deit_tiny_lis_on_vs_baseline": 0.7899}
    blk = bench._zoo_block(led)
    assert blk == {"zoo_swin_base_lis_on_vs_baseline": 1.7874,
                   "zoo_deit_tiny_lis_on_vs_baseline": 0.7899,
                   "captured": "2026-08-19"}
    assert bench._zoo_block({"captured": "x"}) is None
    assert bench._zoo_block(None) is None
