"""The real-weights turnkey harness must stay runnable: its tiny self-test
exercises the exact code path real checkpoints will take (synthesize HF
trees -> every converter -> transformers parity). The per-stage image run
is covered by the e2e pipeline tests; here we skip it for speed."""

import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_harness_selftest(tmp_path):
    pytest.importorskip("transformers")
    sys.path.insert(0, TOOLS)
    try:
        import real_weights_harness as hw
    finally:
        sys.path.remove(TOOLS)
    rc = hw.run(str(tmp_path / "ck"), str(tmp_path / "out"), tiny=True,
                size=32, skip_images=True)
    assert rc == 0
    import json
    with open(tmp_path / "out" / "harness_report.json") as f:
        report = json.load(f)
    assert report["errors"] == []
    for comp in ("clip-text", "t5", "siglip", "clip-vision"):
        assert report["parity"][comp] == "ok", (comp, report["parity"])
    assert report["convert"]["flux_params"] > 0
