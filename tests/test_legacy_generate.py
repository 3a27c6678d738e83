"""Legacy no-retrieval-JSON generation mode (A3 parity leftover,
ref batch_generate_flux_kshot.py:526-736) + batch_params.txt run summary
(ref :552-564,1045-1056)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from domainrag_tpu.core.config import (FluxSamplingConfig, GenerateConfig,
                                       ReduxConfig)
from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.stages import generate as gen


@pytest.fixture(scope="module")
def legacy_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    rng = np.random.default_rng(3)
    # legacy inpaint layout: {inp}/{D}/inpainted_images/{sample}/1_inpainted.png
    samples = ["crazing_1", "patches_2"]
    inp = root / "inpainted"
    for s in samples:
        d = inp / "NEU-DET" / "inpainted_images" / s
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (36, 40, 3), dtype=np.uint8)
                        ).save(d / "1_inpainted.png")
    # an extra sample dir without the target image -> counted failed
    (inp / "NEU-DET" / "inpainted_images" / "missing_3").mkdir()

    corpus = root / "corpus"
    corpus.mkdir()
    sharp = corpus / "ref_a.jpg"
    blurred = corpus / "ref_b_blurred.jpg"
    for p in (sharp, blurred):
        Image.fromarray(rng.integers(0, 255, (30, 30, 3), dtype=np.uint8)
                        ).save(p)

    # legacy per-dataset retrieval file
    rrd = root / "retrieval_results"
    rrd.mkdir()
    results = {
        "crazing": [{
            "original_filename": "crazing_1.jpg",
            "similar_images": [
                {"image_path": str(blurred), "similarity": 0.99},
                {"image_path": str(sharp), "similarity": 0.42},
                {"image_path": str(root / "gone.jpg"), "similarity": 1.0},
            ]}],
        "patches": [{
            "original_filename": "patches_2.jpg",
            "similar_images": [
                {"image_path": str(blurred), "similarity": 0.7},
            ]}],
    }
    with open(rrd / "NEU-DET_all_categories_retrieval_results.json",
              "w") as f:
        json.dump(results, f)
    return root, str(inp), str(rrd), str(sharp), str(blurred)


def test_find_similar_image_legacy_prefers_sharp(legacy_env):
    """Non-"_blurred" corpus images win even at lower similarity; missing
    paths are skipped (ref :250-300)."""
    root, inp, rrd, sharp, blurred = legacy_env
    rr = gen.load_legacy_retrieval_results(rrd, "NEU-DET")
    assert gen.find_similar_image_legacy(rr, "crazing_1",
                                         ["crazing"]) == sharp
    # only a blurred candidate exists -> falls back to it
    assert gen.find_similar_image_legacy(rr, "patches_2",
                                         ["patches"]) == blurred
    assert gen.find_similar_image_legacy(rr, "nope", ["crazing"]) is None


def test_process_dataset_legacy(legacy_env):
    root, inp, rrd, sharp, blurred = legacy_env
    bundle = fp.tiny_bundle(jax.random.PRNGKey(0))
    cfg = GenerateConfig(
        sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                    seed=0),
        redux=ReduxConfig(), top_ranks=2)
    stage = gen.GenerateStage(bundle, cfg)
    out_dir = str(root / "result")
    counters = gen.process_dataset_legacy(stage, "NEU-DET", inp, rrd,
                                          out_dir, run_name="run")
    assert counters == {"processed": 2, "failed": 1, "skipped": 0}

    base = os.path.join(out_dir, "NEU-DET", "run")
    for s in ("crazing_1", "patches_2"):
        # legacy single un-ranked image name (ref :608)
        assert os.path.exists(os.path.join(base, s, "generated_image.png"))
        assert not os.path.exists(
            os.path.join(base, s, "generated_image_rank1.png"))

    # batch_params.txt: header + appended aggregates (ref :552-564,
    # :1045-1056)
    with open(os.path.join(base, "batch_params.txt")) as f:
        text = f.read()
    assert "dataset: NEU-DET" in text
    assert "succeeded_samples: 2" in text
    assert "failed_samples: 1" in text
    assert "total_generated_images: 2" in text
    assert "32x32: 2 images" in text
    assert "completed:" in text

    # resume skips completed samples via the manifest
    counters2 = gen.process_dataset_legacy(stage, "NEU-DET", inp, rrd,
                                           out_dir, run_name="run",
                                           resume=True)
    assert counters2["processed"] == 0 and counters2["skipped"] == 2


def test_kshot_process_dataset_writes_batch_params(tmp_path):
    """The main k-shot sweep also writes the run summary."""
    rng = np.random.default_rng(0)
    shot_dir = tmp_path / "lamainpaint" / "NEU-DET" / "1_shot"
    shot_dir.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
                    ).save(shot_dir / "crazing_1.jpg")
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    ref = corpus / "r.jpg"
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
                    ).save(ref)
    retrieval = {"NEU-DET": {"1_shot": {"crazing": [{
        "sample_id": "crazing_1",
        "similar_images": [{"image_path": str(ref), "rank": 1,
                            "similarity": 0.9}]}]}}}
    bundle = fp.tiny_bundle(jax.random.PRNGKey(0))
    cfg = GenerateConfig(
        sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                    seed=0),
        redux=ReduxConfig(), top_ranks=1)
    stage = gen.GenerateStage(bundle, cfg)
    counters = gen.process_dataset(
        stage, "NEU-DET", 1, retrieval, str(tmp_path / "lamainpaint"),
        str(tmp_path / "out"), run_name="run")
    assert counters["processed"] == 1
    with open(tmp_path / "out" / "result" / "NEU-DET_1shot_retrieval"
              / "run" / "batch_params.txt") as f:
        text = f.read()
    assert "num_samples: 1" in text
    assert "succeeded_samples: 1" in text
    assert "total_generated_images: 1" in text


def test_max_rank_batch_chunks_equal_unchunked(tmp_path):
    """Rank chunking (single-chip HBM ceiling) produces the same images
    as the one-batch denoise."""
    rng = np.random.default_rng(1)
    target = tmp_path / "t.png"
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
                    ).save(target)
    refs = []
    for i in range(3):
        p = tmp_path / f"r{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
                        ).save(p)
        refs.append({"image_path": str(p), "rank": i + 1,
                     "similarity": 0.9 - 0.1 * i})
    bundle = fp.tiny_bundle(jax.random.PRNGKey(0))
    base = GenerateConfig(
        sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                    seed=0),
        redux=ReduxConfig(), top_ranks=3)
    import dataclasses
    chunked = dataclasses.replace(base, max_rank_batch=2)
    d1, d2 = tmp_path / "one", tmp_path / "two"
    gen.GenerateStage(bundle, base).generate_sample(
        "s", str(target), refs, str(d1))
    gen.GenerateStage(bundle, chunked).generate_sample(
        "s", str(target), refs, str(d2))
    for r in (1, 2, 3):
        a = np.asarray(Image.open(d1 / f"generated_image_rank{r}.png"))
        b = np.asarray(Image.open(d2 / f"generated_image_rank{r}.png"))
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
