"""Pipelined single-chip generate loop (stages.generate.process_dataset):
the next sample's prior preprocessing prefetches and the previous sample's
PNG writes run behind the device queue. Semantics pinned here: artifacts
and manifest identical to the synchronous loop, and per-sample failures in
EITHER host thread (prefetch-side bad image, writer-side save error) mark
only that sample failed while the rest of the stream completes.

Reference behavior replaced: batch_generate_flux_kshot.py:996-1058 runs
load → prior → denoise → save strictly sequentially per rank.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.core.config import FluxSamplingConfig, GenerateConfig
from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.stages import generate as gen_stage


@pytest.fixture(scope="module")
def stage():
    bundle = fp.tiny_bundle()
    cfg = GenerateConfig(
        sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                    seed=0),
        top_ranks=1)
    return gen_stage.GenerateStage(bundle, cfg)


def make_dataset(tmp_path, n_samples=3, break_ref_of=None):
    """lamainpaint shot dir + retrieval_results dict for n samples."""
    rng = np.random.default_rng(0)
    shot_dir = tmp_path / "lamainpaint" / "DS" / "1_shot"
    shot_dir.mkdir(parents=True)
    entries = []
    for i in range(n_samples):
        sid = f"s{i}"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(shot_dir / f"{sid}.jpg")
        ref = tmp_path / f"ref_{i}.jpg"
        if break_ref_of == sid:
            ref_path = str(tmp_path / "missing_ref.jpg")  # never written
        else:
            Image.fromarray(rng.integers(0, 255, (36, 36, 3),
                                         dtype=np.uint8)).save(ref)
            ref_path = str(ref)
        entries.append({"sample_id": sid,
                        "similar_images": [{"rank": 1, "similarity": 0.9,
                                            "image_path": ref_path}]})
    rr = {"DS": {"1_shot": {"cat": entries}}}
    return str(tmp_path / "lamainpaint"), rr


def run(stage, tmp_path, rr, lama_dir, **kw):
    return gen_stage.process_dataset(
        stage, "DS", 1, rr, lama_dir, str(tmp_path / "out"),
        run_name="results_t", **kw)


def manifest_statuses(tmp_path):
    mpath = (tmp_path / "out" / "result" / "DS_1shot_retrieval"
             / "results_t" / "manifest.json")
    with open(mpath) as f:
        records = json.load(f)["samples"]
    return {sid: rec["status"] for sid, rec in records.items()}


def test_pipelined_loop_writes_all_artifacts(tmp_path, stage):
    lama_dir, rr = make_dataset(tmp_path)
    counters = run(stage, tmp_path, rr, lama_dir)
    assert counters["processed"] == 3 and counters["failed"] == 0
    base = tmp_path / "out" / "result" / "DS_1shot_retrieval" / "results_t"
    for i in range(3):
        d = base / f"s{i}"
        assert os.path.exists(d / "generated_image_rank1.png")
        assert os.path.exists(d / "target_input.png")
        assert os.path.exists(d / "params.txt")
    assert set(manifest_statuses(tmp_path).values()) == {"done"}
    # batch_params aggregates include every written image
    with open(base / "batch_params.txt") as f:
        assert "total_generated_images: 3" in f.read()


def test_prefetch_failure_marks_only_that_sample(tmp_path, stage):
    lama_dir, rr = make_dataset(tmp_path, break_ref_of="s1")
    counters = run(stage, tmp_path, rr, lama_dir)
    assert counters["processed"] == 2 and counters["failed"] == 1
    statuses = manifest_statuses(tmp_path)
    assert statuses["s1"] == "failed"
    assert statuses["s0"] == statuses["s2"] == "done"
    base = tmp_path / "out" / "result" / "DS_1shot_retrieval" / "results_t"
    assert os.path.exists(base / "s1" / "generation_failed.txt")


def test_save_failure_marks_only_that_sample(tmp_path, stage,
                                             monkeypatch):
    lama_dir, rr = make_dataset(tmp_path)
    real_write = gen_stage._write_rank_artifacts

    def flaky_write(sample_dir, ref, target_path, img):
        if sample_dir.endswith("s1"):
            raise OSError("disk full (simulated)")
        return real_write(sample_dir, ref, target_path, img)

    monkeypatch.setattr(gen_stage, "_write_rank_artifacts", flaky_write)
    counters = run(stage, tmp_path, rr, lama_dir)
    assert counters["processed"] == 2 and counters["failed"] == 1
    statuses = manifest_statuses(tmp_path)
    assert statuses["s1"] == "failed"
    assert statuses["s0"] == statuses["s2"] == "done"


def test_pipelined_matches_direct_generate(tmp_path, stage):
    """The pipelined loop's image bytes equal a direct generate_sample
    call (prefetch/writer threads change scheduling, not results)."""
    lama_dir, rr = make_dataset(tmp_path, n_samples=1)
    run(stage, tmp_path, rr, lama_dir)
    base = tmp_path / "out" / "result" / "DS_1shot_retrieval" / "results_t"
    piped = np.asarray(Image.open(base / "s0" / "generated_image_rank1.png"))

    refs = rr["DS"]["1_shot"]["cat"][0]["similar_images"]
    direct_dir = tmp_path / "direct"
    stage.generate_sample(
        "s0", os.path.join(lama_dir, "DS", "1_shot", "s0.jpg"),
        refs, str(direct_dir))
    direct = np.asarray(Image.open(direct_dir
                                   / "generated_image_rank1.png"))
    np.testing.assert_array_equal(piped, direct)
