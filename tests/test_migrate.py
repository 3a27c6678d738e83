"""Tolerant reader for reference-produced retrieval artifacts
(--reference_artifacts): zero-padded COCO ids, case-variant dataset keys,
sample-keyed shot blocks, stale paths — with loud accounting.
Match: batch_generate_flux_kshot.py:1060-1330,1590-1818,302-389."""

import numpy as np

from domainrag_tpu.stages.migrate import (MigrationStats,
                                          find_sample_refs_tolerant,
                                          repair_image_path)


def sims(n=5, prefix="/old/abs/coco"):
    return [{"rank": i + 1, "similarity": 1.0 - 0.1 * i,
             "image_path": f"{prefix}/img_{i}.jpg",
             "source_dataset": "coco"} for i in range(n)]


def canonical(dataset="NEU-DET", shot=5, sample="inclusion_106"):
    return {dataset: {f"{shot}_shot": {"inclusion": [
        {"sample_id": sample, "image_path": "x.jpg",
         "category": "inclusion", "similar_images": sims()}]}}}


def test_exact_canonical_is_not_fuzzy():
    stats = MigrationStats()
    refs = find_sample_refs_tolerant(canonical(), "NEU-DET", 5,
                                     "inclusion_106", stats=stats)
    assert [r["rank"] for r in refs] == [1, 2, 3, 4, 5]
    assert stats.exact == 1 and stats.fuzzy == 0


def test_case_variant_dataset_key():
    stats = MigrationStats()
    data = canonical(dataset="Neu-Det")
    refs = find_sample_refs_tolerant(data, "NEU-DET", 5, "inclusion_106",
                                     stats=stats)
    assert len(refs) == 5
    assert stats.fuzzy == 1 and "Neu-Det" in stats.notes[0]


def test_zero_padded_coco_id():
    # reference COCO blocks are sample-keyed with 12-digit padded ids and
    # LIST-valued records (ref :1614-1643)
    data = {"coco": {"1_shot": {
        "000000382438": [{"similar_images": sims()}]}}}
    stats = MigrationStats()
    refs = find_sample_refs_tolerant(data, "coco", 1, "382438", stats=stats)
    assert len(refs) == 5 and refs[0]["similarity"] == 1.0
    assert stats.fuzzy == 1
    # and the reverse: stripped key, padded query
    data2 = {"coco": {"1_shot": {"382438": [{"similar_images": sims()}]}}}
    refs2 = find_sample_refs_tolerant(data2, "coco", 1, "000000382438")
    assert len(refs2) == 5


def test_hyphen_underscore_drift():
    data = {"NEU-DET": {"5_shot": {"rolled-in_scale_14":
                                   {"similar_images": sims(3)}}}}
    refs = find_sample_refs_tolerant(data, "NEU-DET", 5,
                                     "rolled_in_scale_14")
    assert refs is not None and len(refs) == 3


def test_true_miss_returns_none_and_counts():
    stats = MigrationStats()
    refs = find_sample_refs_tolerant(canonical(), "NEU-DET", 5, "nope_1",
                                     stats=stats)
    assert refs is None and stats.missed == 1
    assert "missed" in stats.summary()


def test_rank_filter_and_top_ranks():
    data = canonical()
    refs = find_sample_refs_tolerant(data, "NEU-DET", 5, "inclusion_106",
                                     top_ranks=2)
    assert [r["rank"] for r in refs] == [1, 2]


def test_path_repair(tmp_path):
    root = tmp_path / "corpus"
    root.mkdir()
    (root / "img_0.jpg").write_bytes(b"x")
    stats = MigrationStats()
    fixed = repair_image_path("/dead/absolute/img_0.jpg",
                              {"coco": str(root)}, stats)
    assert fixed == str(root / "img_0.jpg")
    assert stats.repaired_paths == 1
    # existing paths pass through untouched
    assert repair_image_path(str(root / "img_0.jpg"), {"coco": str(root)},
                             stats) == str(root / "img_0.jpg")
    assert stats.repaired_paths == 1


def test_process_dataset_reference_mode(tmp_path):
    """End-to-end through the generate stage: reference-keyed JSON,
    tiny models, fuzzy counters surfaced."""
    import jax
    from PIL import Image
    from domainrag_tpu.core.config import (FluxSamplingConfig,
                                           GenerateConfig)
    import dataclasses
    from domainrag_tpu.models.flux import pipeline as flux_pipeline
    from domainrag_tpu.stages import generate as gen

    rng = np.random.default_rng(0)
    lam = tmp_path / "lamainpaint" / "NEU-DET" / "5_shot"
    lam.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
                    ).save(lam / "inclusion_106.jpg")
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        ).save(corpus / f"img_{i}.jpg")
    # reference-style JSON: case-variant dataset key, stale abs paths
    data = {"Neu-Det": {"5_shot": {"inclusion_106": {
        "similar_images": sims(3, prefix="/stale/path")}}}}

    bundle = flux_pipeline.tiny_bundle(jax.random.PRNGKey(0))
    cfg = GenerateConfig(sampling=FluxSamplingConfig(num_steps=1, height=16,
                                                     width=16))
    cfg = dataclasses.replace(cfg, top_ranks=3)
    stage = gen.GenerateStage(bundle, cfg)
    out = gen.process_dataset(
        stage, "NEU-DET", 5, data, str(tmp_path / "lamainpaint"),
        str(tmp_path / "out"), reference_artifacts=True,
        corpus_roots={"coco": str(corpus)})
    assert out["processed"] == 1 and out["failed"] == 0
    assert out["fuzzy_hits"] == 1
    assert out["repaired_paths"] == 3
