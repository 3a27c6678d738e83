"""End-to-end pipeline integration test (SURVEY.md §4.4): toy dataset,
tiny random models, full inpaint -> retrieve -> generate -> compose DAG,
asserting the L4 filesystem contract."""

import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.core.coco import write_coco
from domainrag_tpu.core.config import (ComposeConfig, DatasetParams,
                                       FluxSamplingConfig, GenerateConfig,
                                       PipelineConfig, ReduxConfig,
                                       ResolutionPolicy)
from domainrag_tpu.pipeline import build_tiny_runner


@pytest.fixture(scope="module")
def toy_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(5)
    ds = root / "datasets" / "NEU-DET"
    (ds / "train").mkdir(parents=True)
    write_coco(str(ds / "annotations" / "1_shot.json"),
               images=[{"id": 1, "file_name": "crazing_1.jpg",
                        "width": 40, "height": 36},
                       {"id": 2, "file_name": "patches_2.jpg",
                        "width": 48, "height": 40}],
               annotations=[
                   {"id": 1, "image_id": 1, "category_id": 1,
                    "bbox": [4, 4, 12, 10]},
                   {"id": 2, "image_id": 2, "category_id": 2,
                    "bbox": [8, 8, 16, 12]},
                   {"id": 3, "image_id": 2, "category_id": 2,
                    "bbox": [30, 20, 10, 10]}],
               categories=[{"id": 1, "name": "crazing"},
                           {"id": 2, "name": "patches"}])
    for name, (w, h) in [("crazing_1", (40, 36)), ("patches_2", (48, 40))]:
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(ds / "train" / f"{name}.jpg")
    corpus = root / "coco"
    corpus.mkdir()
    corpus_paths = []
    for i in range(8):
        p = corpus / f"{i:06d}.jpg"
        Image.fromarray(rng.integers(0, 255, (36, 44, 3), dtype=np.uint8)
                        ).save(p)
        corpus_paths.append(str(p))
    return root, corpus_paths


@pytest.fixture(scope="module")
def runner(toy_env):
    root, corpus_paths = toy_env
    # tiny params everywhere: 32px generation, 2 steps, 32px compose target
    tiny_params = {name: DatasetParams(
        strength=0.5, guidance_scale=4.0, upscale_dimension=32)
        for name in ("NEU-DET",)}
    cfg = PipelineConfig(
        datasets=("NEU-DET",), shots=(1,),
        datasets_dir=str(root / "datasets"),
        output_dir=str(root / "output"),
        process_id="t",
        generate=GenerateConfig(
            sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                        seed=0),
            redux=ReduxConfig(), top_ranks=2),
        compose=ComposeConfig(
            resolution=ResolutionPolicy(min_dimension=32, max_dimension=64),
            num_steps=2, dataset_params=tiny_params),
    )
    return build_tiny_runner(cfg, {"coco": corpus_paths})


def test_full_dag(runner, toy_env):
    root, _ = toy_env
    out = runner.run()
    output = str(root / "output")

    # stage 1: inpainted backgrounds under original file names + sidecar
    assert os.path.exists(os.path.join(
        output, "lamainpaint/NEU-DET/1_shot/crazing_1.jpg"))
    with open(os.path.join(
            output, "lamainpaint/NEU-DET/1_shot/category_mapping.json")) as f:
        mapping = json.load(f)
    assert mapping == {"crazing_1": "crazing", "patches_2": "patches"}

    # stage 2: retrieval contract
    all_shots = os.path.join(output,
                             "retrieval_results/all_shots_retrieval_results.json")
    with open(all_shots) as f:
        rr = json.load(f)
    entry = rr["NEU-DET"]["1_shot"]["crazing"][0]
    assert entry["sample_id"] == "crazing_1"
    assert entry["similar_images"][0]["rank"] == 1

    # stage 3: ranked backgrounds + provenance
    bgs = glob.glob(os.path.join(
        output, "result/NEU-DET_1shot_retrieval/results_*/crazing_1/"
        "generated_image_rank*.png"))
    assert len(bgs) == 2  # top_ranks=2
    sample_dir = os.path.dirname(bgs[0])
    assert os.path.exists(os.path.join(sample_dir, "target_input.png"))
    assert os.path.exists(os.path.join(sample_dir, "params.txt"))

    # stage 4: outpaint artifacts + result JSON + final collection
    op = os.path.join(output, "outpaint_hires/process_t/NEU-DET/1_shot")
    finals = glob.glob(os.path.join(op, "crazing_1",
                                    "crazing_1_final_result_rank*.png"))
    assert len(finals) == 2
    # final result restored to the original resolution
    img = Image.open(finals[0])
    assert img.size == (40, 36)
    with open(os.path.join(op, "outpaint_results_1shot.json")) as f:
        result = json.load(f)
    assert result["dataset"] == "NEU-DET" and result["shot_number"] == 1
    assert len(result["samples"]) == 2
    rec = next(s for s in result["samples"] if s["sample_id"] == "patches_2")
    assert rec["num_bbox"] == 2
    assert len(rec["outpainted_images"]) == 2
    assert rec["outpainted_images"][0]["params"]["strength"] == 0.5
    collected = glob.glob(os.path.join(
        output, "final_results/process_t/1_shot/NEU-DET/*final_result*.png"))
    assert len(collected) == 4  # 2 samples x 2 ranks

    # timings recorded for every stage
    assert set(out["timings"]) >= {"stage/inpaint", "stage/retrieve",
                                   "stage/generate", "stage/compose"}


def test_compose_resume_skips(runner, toy_env):
    """Second compose run with resume: manifest short-circuits samples."""
    root, _ = toy_env
    out = runner.run_compose(resume=True)
    assert out["NEU-DET/1"]["samples"] == []


def test_generate_random_fallback(runner, toy_env):
    """A sample absent from the retrieval JSON gets seeded random refs
    (batch_generate_flux_kshot.py:1213-1228)."""
    from domainrag_tpu.stages.generate import random_fallback_refs
    refs = random_fallback_refs([f"p{i}.jpg" for i in range(10)], 5, seed=3)
    assert [r["rank"] for r in refs] == [1, 2, 3, 4, 5]
    np.testing.assert_allclose([r["similarity"] for r in refs],
                               [1.0, 0.9, 0.8, 0.7, 0.6])
    refs2 = random_fallback_refs([f"p{i}.jpg" for i in range(10)], 5, seed=3)
    assert refs == refs2  # deterministic


def test_compose_resolution_bucketing(runner, toy_env):
    """Bucketed fill pads+crops; output shape unchanged, fewer compiles."""
    import dataclasses
    from domainrag_tpu.stages import compose as comp
    from domainrag_tpu.core import imaging
    root, _ = toy_env
    stage = comp.ComposeStage(
        runner.fill_bundle,
        dataclasses.replace(runner.cfg.compose, resolution_bucket=16),
        process_id="bkt", seed=0)
    original = imaging.load_rgb(
        str(root / "datasets/NEU-DET/train/crazing_1.jpg"))
    bgs = comp.find_sample_backgrounds(
        str(root / "output/result"), "NEU-DET", 1, "crazing_1")[:1]
    log = stage.process_sample(
        "NEU-DET", 1, "crazing_1", original, [(4, 4, 12, 10)], ["crazing"],
        bgs, str(root / "output/bucket_test"), image_id=1)
    assert log["status"] == "completed"
    from PIL import Image
    final = Image.open(log["outpainted_images"][0]["final_result_path"])
    assert final.size == original.size


def test_compose_max_rank_batch_chunks_equal_unchunked(runner, toy_env):
    """Background-fill chunking (single-chip HBM ceiling: the <=5-bg
    one-batch 1024 px fill graph needs 20.29 GB next to the 12 GB int8
    tree — measured OOM, round-5 pipeline bench) produces the same
    composites as the one-batch fill."""
    import dataclasses
    from domainrag_tpu.stages import compose as comp
    from domainrag_tpu.core import imaging
    from PIL import Image
    root, _ = toy_env
    original = imaging.load_rgb(
        str(root / "datasets/NEU-DET/train/crazing_1.jpg"))
    bgs = comp.find_sample_backgrounds(
        str(root / "output/result"), "NEU-DET", 1, "crazing_1")[:2]
    assert len(bgs) == 2
    outs = {}
    for name, cfg in (("one", runner.cfg.compose),
                      ("chunk", dataclasses.replace(
                          runner.cfg.compose, max_rank_batch=1))):
        stage = comp.ComposeStage(runner.fill_bundle, cfg,
                                  process_id=name, seed=0)
        log = stage.process_sample(
            "NEU-DET", 1, "crazing_1", original, [(4, 4, 12, 10)],
            ["crazing"], bgs, str(root / f"output/mrb_{name}"),
            image_id=1)
        assert log["status"] == "completed"
        assert len(log["outpainted_images"]) == 2
        outs[name] = [np.asarray(Image.open(r["final_result_path"]))
                      for r in log["outpainted_images"]]
    for a, b in zip(outs["one"], outs["chunk"]):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_compose_fallback_without_annotations(runner, toy_env):
    """A sample present in the generate results but missing from the
    annotations composes via the target_input.png fallback with a default
    center bbox (ref :924-1077 semantics)."""
    import dataclasses
    import shutil
    from domainrag_tpu.stages import compose as comp
    root, _ = toy_env
    # clone an existing result sample under an unannotated name
    import glob as g
    src = g.glob(str(root / "output/result/NEU-DET_1shot_retrieval/"
                     "results_*/crazing_1"))[0]
    orphan = os.path.join(os.path.dirname(src), "orphan_9")
    if not os.path.isdir(orphan):
        shutil.copytree(src, orphan)
    stage = comp.ComposeStage(runner.fill_bundle, runner.cfg.compose,
                              process_id="fb", seed=0)
    result = comp.process_dataset(
        stage, "NEU-DET", 1, str(root / "datasets"), str(root / "output"))
    ids = [s["sample_id"] for s in result["samples"]]
    assert "orphan_9" in ids
    rec = next(s for s in result["samples"] if s["sample_id"] == "orphan_9")
    assert rec["categories"] == ["unknown"]
    # center 30% default bbox
    x, y, w, h = rec["bbox_coords_list"][0]
    assert w > 0 and h > 0


def test_generate_stage_with_pipeline_parallel(toy_env):
    """PP is reachable from the orchestrator/CLI config: a runner with
    mesh.pipeline_parallel_size=4 runs the generate stage with the
    transformer depth pipelined over a 4-stage pipe mesh."""
    from domainrag_tpu.core.config import MeshConfig

    root, corpus_paths = toy_env
    cfg = PipelineConfig(
        datasets=("NEU-DET",), shots=(1,),
        datasets_dir=str(root / "datasets"),
        output_dir=str(root / "output_pp"),
        process_id="pp",
        generate=GenerateConfig(
            sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                        seed=0),
            redux=ReduxConfig(), top_ranks=2),
        compose=ComposeConfig(
            resolution=ResolutionPolicy(min_dimension=32, max_dimension=64),
            dataset_params={"NEU-DET": DatasetParams(
                strength=0.5, guidance_scale=4.0, upscale_dimension=32)}),
        mesh=MeshConfig(pipeline_parallel_size=4),
    )
    r = build_tiny_runner(cfg, {"coco": corpus_paths})
    assert r._pipe_mesh() is not None
    out = r.run()                      # full DAG, generate+compose on PP
    assert "generate" in out and "compose" in out
    ranks = glob.glob(os.path.join(
        str(root / "output_pp"),
        "result/NEU-DET_1shot_retrieval/results_*/*/generated_image_rank*.png"))
    assert ranks, "PP generate produced no rank images"
    finals = glob.glob(os.path.join(
        str(root / "output_pp"), "outpaint_hires", "process_pp",
        "**", "*final_result*.png"), recursive=True)
    assert finals, "PP compose produced no final results"
