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
    # per-key provenance: fresh keys dated + attributed to the writer
    assert got["key_captured"]["deit_small_lis_on_img_s"].endswith(
        "bench.py")
    # the ledger file is valid JSON on disk
    raw = json.loads((tmp_path / "ledger_test.json").read_text())
    assert raw == got

    # a later PARTIAL merge (zoo-only run) must not re-date or re-attribute
    # the untouched keys (advisor r4: zoo_bench re-stamped 'captured' over
    # the whole ledger)
    first_date = got["key_captured"]["deit_small_lis_on_img_s"]
    bench._update_ledger({"zoo_swin_tiny_lis_on_vs_baseline": 1.49},
                         source="tools/zoo_bench.py")
    got2 = bench._load_ledger()
    assert got2["key_captured"]["deit_small_lis_on_img_s"] == first_date
    assert got2["key_captured"][
        "zoo_swin_tiny_lis_on_vs_baseline"].endswith("tools/zoo_bench.py")
    assert got2["deit_small_lis_on_img_s"] == 7131.0


def test_fallback_line_demotes_cpu_numbers():
    """VERDICT r4 item 2 polish: a CPU-fallback driver line must not put
    CPU img/s in the headline `value` field — the headline carries the
    ledger's on-chip number, flagged value_is_ledger."""
    cpu_res = {"deit_small_lis_on_img_s": 5.32,
               "deit_small_lis_on_vs_baseline": 1.1}
    ledger = {"deit_small_lis_on_img_s": 7201.66,
              "deit_small_lis_on_vs_baseline": 1.3215,
              "captured": "2026-08-19", "platform": "tpu"}
    line = bench._fallback_line(cpu_res, ledger)
    assert line["value"] == 7201.66
    assert line["vs_baseline"] == 1.3215
    assert line["value_is_ledger"] is True
    assert line["cpu_fallback"] == cpu_res
    assert line["last_known_tpu"] == ledger
    assert "cpu-fallback" in line["platform"]
    # no ledger at all -> value is None, never the CPU number
    line2 = bench._fallback_line(cpu_res, None)
    assert line2["value"] is None
    assert "last_known_tpu" not in line2


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
