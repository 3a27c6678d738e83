"""End-to-end retrieval stage test on a toy corpus (tiny CLIP config).

Validates the L4 filesystem contract: cache files, per-sample JSONs,
aggregate JSONs, and the all_shots_retrieval_results.json schema consumed
by the generate stage (SURVEY.md §4.4)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.models import clip as jclip
from domainrag_tpu.models import resnet_stem
from domainrag_tpu.stages import retrieve
from domainrag_tpu.stages.encoders import ClipImageEncoder, StyleEncoder


@pytest.fixture(scope="module")
def encoders():
    cfg = jclip.TINY_VISION
    params = jclip.init_vision(jax.random.PRNGKey(0), cfg)
    clip_enc = ClipImageEncoder(params, cfg, batch_size=8)
    stem_params = resnet_stem.init(jax.random.PRNGKey(1))
    style_enc = StyleEncoder(stem_params, batch_size=8, resize=32)
    return clip_enc, style_enc


def make_corpus(tmp_path, n=12):
    rng = np.random.default_rng(7)
    corpus_dir = tmp_path / "coco" / "train2017"
    corpus_dir.mkdir(parents=True)
    paths = []
    for i in range(n):
        p = corpus_dir / f"{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
                        ).save(p)
        paths.append(str(p))
    return paths


def make_queries(tmp_path, dataset="NEU-DET", shot=1):
    rng = np.random.default_rng(8)
    shot_dir = tmp_path / "lamainpaint" / dataset / f"{shot}_shot"
    shot_dir.mkdir(parents=True)
    for name, cat in [("crazing_1", "crazing"), ("patches_3", "patches")]:
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(shot_dir / f"{name}.jpg")
    with open(shot_dir / "category_mapping.json", "w") as f:
        json.dump({"crazing_1": "crazing", "patches_3": "patches"}, f)
    return str(tmp_path / "lamainpaint")


def test_retrieval_end_to_end(tmp_path, encoders):
    clip_enc, style_enc = encoders
    corpus_paths = make_corpus(tmp_path)
    lamainpaint = make_queries(tmp_path)
    results_dir = str(tmp_path / "retrieval_results")

    feats, kept = retrieve.load_or_compute_source_features(
        results_dir, "coco", corpus_paths, clip_enc)
    assert feats.shape == (12, clip_enc.cfg.projection_dim)
    assert kept == corpus_paths
    # cache round-trip: second call must load, not recompute
    feats2, _ = retrieve.load_or_compute_source_features(
        results_dir, "coco", corpus_paths, clip_enc)
    np.testing.assert_array_equal(feats, feats2)
    assert os.path.exists(os.path.join(results_dir, "coco_clip_features.npy"))
    assert os.path.exists(os.path.join(results_dir, "coco_image_paths.json"))

    bank = retrieve.EmbeddingBank.from_sources({"coco": feats},
                                               {"coco": kept})
    all_shots = retrieve.run_retrieval(
        ["NEU-DET"], [1], bank, clip_enc, style_enc, lamainpaint,
        results_dir)

    # schema of the inter-stage contract
    assert "NEU-DET" in all_shots and "1_shot" in all_shots["NEU-DET"]
    cats = all_shots["NEU-DET"]["1_shot"]
    assert set(cats) == {"crazing", "patches"}
    entry = cats["crazing"][0]
    assert entry["sample_id"] == "crazing_1"
    assert entry["category"] == "crazing"
    sims = entry["similar_images"]
    assert len(sims) == 12  # top_k clipped to bank size
    assert [s["rank"] for s in sims] == list(range(1, 13))
    # similarities descending (1/(1+d) with d ascending)
    vals = [s["similarity"] for s in sims]
    assert vals == sorted(vals, reverse=True)
    assert sims[0]["source_dataset"] == "coco"
    assert os.path.basename(sims[0]["image_path"]).endswith(".jpg")

    # artifact files exist
    assert os.path.exists(os.path.join(
        results_dir, "all_shots_retrieval_results.json"))
    assert os.path.exists(os.path.join(
        results_dir, "NEU-DET_1_shot_retrieval_results.json"))
    assert os.path.exists(os.path.join(
        results_dir,
        "NEU-DET_1_shot_crazing_crazing_1_retrieval_results.json"))
    assert os.path.exists(os.path.join(
        results_dir, "NEU-DET_1_shot_inpainted_clip_features.npy"))

    # file content matches returned structure
    with open(os.path.join(results_dir,
                           "all_shots_retrieval_results.json")) as f:
        on_disk = json.load(f)
    assert on_disk == all_shots


def test_first_stage_matches_oracle(tmp_path, encoders):
    """The stage's search equals the numpy oracle on its own features."""
    clip_enc, _ = encoders
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 32)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank = retrieve.EmbeddingBank.from_sources(
        {"coco": feats}, {"coco": [f"img{i}.jpg" for i in range(50)]})
    q = feats[:3] + 0.01 * rng.standard_normal((3, 32)).astype(np.float32)
    results = retrieve.first_stage_topk(q, bank, top_k=10)
    from domainrag_tpu.ops.topk import topk_ip_numpy
    # oracle on the device-computed scores' inputs: same f32 data
    _, ref_idx = topk_ip_numpy(q, feats, 10)
    got_idx = np.array([[r["index"] for r in row] for row in results])
    # scores are plain f32 matmuls of the same arrays; allow tie-free match
    assert got_idx.shape == ref_idx.shape
    assert (got_idx == ref_idx).mean() > 0.95


def test_missing_shot_dir(tmp_path, encoders):
    clip_enc, style_enc = encoders
    bank = retrieve.EmbeddingBank.from_sources(
        {"coco": np.eye(4, 32, dtype=np.float32)},
        {"coco": [f"i{i}.jpg" for i in range(4)]})
    out = retrieve.retrieve_dataset_shot(
        "NOPE", 1, bank, clip_enc, style_enc,
        str(tmp_path / "missing"), str(tmp_path / "rr"))
    assert out == {}


def test_load_pretrained_features(tmp_path, rng):
    """Reference-cache migration: .npy and .pt banks (ref :509-629)."""
    import torch
    from domainrag_tpu.stages.retrieve import load_pretrained_features
    feats = rng.standard_normal((5, 8)).astype(np.float32)
    paths = [f"img{i}.jpg" for i in range(5)]
    npy = tmp_path / "f.npy"
    pj = tmp_path / "p.json"
    np.save(npy, feats)
    with open(pj, "w") as f:
        json.dump(paths, f)
    f1, p1 = load_pretrained_features(str(npy), str(pj))
    np.testing.assert_array_equal(f1, feats)
    assert p1 == paths

    pt = tmp_path / "f.pt"
    torch.save({"features": torch.from_numpy(feats), "paths": paths},
               str(pt))
    f2, p2 = load_pretrained_features(str(pt), "")
    np.testing.assert_allclose(f2, feats, rtol=1e-6)
    assert p2 == paths

    # raw tensor .pt with external paths json
    torch.save(torch.from_numpy(feats), str(pt))
    f3, p3 = load_pretrained_features(str(pt), str(pj))
    np.testing.assert_allclose(f3, feats, rtol=1e-6)
    assert p3 == paths
