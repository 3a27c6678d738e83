"""TP-sharded bundle produces identical pipeline output (8-dev CPU mesh)."""

import numpy as np
import pytest

from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.parallel import deploy, mesh as mesh_mod


def test_sharded_bundle_generate_matches(rng):
    bundle = fp.tiny_bundle()
    mesh = mesh_mod.create_mesh(model_parallel=2)
    sharded = deploy.shard_bundle(bundle, mesh)

    s = bundle.siglip_cfg.image_size
    imgs = rng.standard_normal((2, s, s, 3)).astype(np.float32)
    e1, p1 = fp.redux_prior(bundle, imgs, ["", ""], [0.8, 1.0], [1.0, 1.0])
    img_ref = fp.generate(bundle, e1, p1, height=32, width=32,
                          num_steps=2, guidance=2.5, seed=0)

    e2, p2 = fp.redux_prior(sharded, imgs, ["", ""], [0.8, 1.0], [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1),
                               rtol=1e-4, atol=1e-5)
    img_tp = fp.generate(sharded, e2, p2, height=32, width=32,
                         num_steps=2, guidance=2.5, seed=0)
    # uint8 outputs: allow off-by-one from f32 collective reduction order
    diff = np.abs(img_tp.astype(np.int32) - img_ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def test_sharded_bundle_fill_runs(rng):
    bundle = fp.tiny_bundle(fill=True)
    mesh = mesh_mod.create_mesh(model_parallel=2)
    sharded = deploy.shard_bundle(bundle, mesh, fsdp_axis=None)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.full((32, 32), 255, np.uint8)
    mask[8:24, 8:24] = 0
    s = bundle.siglip_cfg.image_size
    e, p = fp.redux_prior(sharded,
                          rng.standard_normal((1, s, s, 3))
                          .astype(np.float32), [""],
                          [1.0], [1.0])
    out = fp.fill(sharded, image, mask, e, p, num_steps=2, guidance=30.0,
                  strength=0.5, seed=0)
    assert out.shape == (32, 32, 3)
