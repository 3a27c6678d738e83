"""Orchestrator robustness: stage subsets, unknown stages, timing keys."""

import pytest

from domainrag_tpu.core.config import PipelineConfig
from domainrag_tpu.pipeline import build_tiny_runner


def test_unknown_stage_rejected(tmp_path):
    cfg = PipelineConfig(datasets=("X",), shots=(1,),
                         datasets_dir=str(tmp_path),
                         output_dir=str(tmp_path / "out"))
    runner = build_tiny_runner(cfg)
    with pytest.raises(ValueError, match="unknown stage"):
        runner.run(stages=("inpaint", "nope"))


def test_stage_subset_runs_only_requested(tmp_path):
    cfg = PipelineConfig(datasets=("MISSING",), shots=(1,),
                         datasets_dir=str(tmp_path),
                         output_dir=str(tmp_path / "out"))
    runner = build_tiny_runner(cfg)
    out = runner.run(stages=("inpaint",))
    assert set(out) == {"inpaint", "timings"}
    # missing dataset dirs are skipped, not fatal (reference behavior)
    assert out["inpaint"] == {}
