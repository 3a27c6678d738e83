"""Data-parallel batched generation over the 8-device mesh (A5
replacement): DP output must equal the per-sample path bit-for-bit."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.core.config import GenerateConfig, FluxSamplingConfig
from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.parallel import mesh as mesh_mod
from domainrag_tpu.stages import generate as gen_stage


@pytest.fixture(scope="module")
def stage():
    bundle = fp.tiny_bundle()
    cfg = GenerateConfig(
        sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                    seed=0),
        top_ranks=2)
    return gen_stage.GenerateStage(bundle, cfg)


def make_items(tmp_path, n_samples=3, ranks=2):
    rng = np.random.default_rng(0)
    items = []
    for i in range(n_samples):
        target = tmp_path / f"target_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(target)
        refs = []
        for rank in range(1, ranks + 1):
            ref = tmp_path / f"ref_{i}_{rank}.jpg"
            Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                            ).save(ref)
            refs.append({"rank": rank, "similarity": 0.9,
                         "image_path": str(ref)})
        items.append({"sample_id": f"s{i}", "target_path": str(target),
                      "refs": refs,
                      "sample_dir": str(tmp_path / "dp" / f"s{i}")})
    return items


def test_dp_matches_sequential(tmp_path, stage):
    mesh = mesh_mod.create_mesh(model_parallel=1)
    items = make_items(tmp_path)  # 3 samples x 2 ranks = 6 rows on 8 dev

    out = gen_stage.generate_samples_dp(stage, items, mesh)
    assert set(out) == {"s0", "s1", "s2"}
    assert all(len(v) == 2 for v in out.values())

    # sequential per-sample path on the same inputs
    seq_dir = tmp_path / "seq" / "s1"
    stage.generate_sample("s1", items[1]["target_path"], items[1]["refs"],
                          str(seq_dir))
    dp_img = np.asarray(Image.open(out["s1"][0]))
    seq_img = np.asarray(Image.open(seq_dir / "generated_image_rank1.png"))
    np.testing.assert_array_equal(dp_img, seq_img)


def test_dp_pads_odd_batches(tmp_path, stage):
    mesh = mesh_mod.create_mesh(model_parallel=1)
    (tmp_path / "odd").mkdir()
    items = make_items(tmp_path / "odd", n_samples=5, ranks=1)  # 5 rows
    out = gen_stage.generate_samples_dp(stage, items, mesh)
    assert len(out) == 5
    for paths in out.values():
        img = np.asarray(Image.open(paths[0]))
        assert img.shape == (32, 32, 3)
