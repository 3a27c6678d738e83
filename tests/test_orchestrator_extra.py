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


def test_run_forwards_failed_only_to_compose(tmp_path):
    """run() must forward failed_only to compose (VERDICT r1 item 9 — the
    reference's --failed_only re-run, outpainting...py:2064-2079, has to be
    reachable from the DAG entry, not only the subcommand)."""
    cfg = PipelineConfig(datasets=("X",), shots=(1,),
                         datasets_dir=str(tmp_path),
                         output_dir=str(tmp_path / "out"))
    runner = build_tiny_runner(cfg)
    seen = {}

    def fake_compose(resume=False, failed_only=False):
        seen.update(resume=resume, failed_only=failed_only)
        return {"ok": True}

    runner.run_compose = fake_compose
    out = runner.run(stages=("compose",), resume=True, failed_only=True)
    assert seen == {"resume": True, "failed_only": True}
    assert out["compose"] == {"ok": True}


def test_run_forwards_reference_artifacts_to_generate(tmp_path):
    """run() must forward reference_artifacts to generate so the tolerant
    migration reader (stages/migrate.py) is reachable from the DAG entry
    and the CLI pipeline subcommand, not only `generate`."""
    cfg = PipelineConfig(datasets=("X",), shots=(1,),
                         datasets_dir=str(tmp_path),
                         output_dir=str(tmp_path / "out"))
    runner = build_tiny_runner(cfg)
    seen = {}

    def fake_generate(resume=False, reference_artifacts=False):
        seen.update(resume=resume, reference_artifacts=reference_artifacts)
        return {"ok": True}

    runner.run_generate = fake_generate
    out = runner.run(stages=("generate",), reference_artifacts=True)
    assert seen == {"resume": False, "reference_artifacts": True}
    assert out["generate"] == {"ok": True}
