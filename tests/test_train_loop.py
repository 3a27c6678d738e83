"""Training loop: sharded steps, checkpointing, image-dir data path."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.models.flux import model as flux
from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.train import checkpoint as ckpt
from domainrag_tpu.train import flow_match, loop


def synthetic_batches(cfg, b=4, grid=4, s_txt=6, seed=0):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    while True:
        yield {
            "x0": jnp.asarray(rng.standard_normal(
                (b, grid * grid, cfg.in_channels)).astype(np.float32)),
            "txt": jnp.asarray(rng.standard_normal(
                (b, s_txt, cfg.text_dim)).astype(np.float32)),
            "pooled": jnp.asarray(rng.standard_normal(
                (b, cfg.pooled_dim)).astype(np.float32)),
            "img_ids": jnp.asarray(flux.make_image_ids(grid, grid)),
            "txt_ids": jnp.asarray(flux.make_text_ids(s_txt)),
        }


def test_fit_runs_and_checkpoints(tmp_path):
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    final, losses = loop.fit(
        params, cfg, synthetic_batches(cfg), num_steps=4,
        train_cfg=flow_match.TrainConfig(learning_rate=1e-3),
        model_parallel=2, fsdp=True,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
        log_every=2)
    assert len(losses) == 4 and np.isfinite(losses).all()
    assert ckpt.latest_step(str(tmp_path / "ckpt")) == 4
    restored = ckpt.restore_checkpoint(str(tmp_path / "ckpt"))
    w_final = np.asarray(jax.device_get(final)["img_in"]["w"])
    np.testing.assert_allclose(
        np.asarray(restored["params"]["img_in"]["w"]), w_final, rtol=1e-6)
    # training actually changed the weights
    assert np.abs(w_final - np.asarray(params["img_in"]["w"])).max() > 0


def test_latent_batches_from_images(tmp_path):
    bundle = fp.tiny_bundle()
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(img_dir / f"{i}.png")
    gen = loop.latent_batches_from_images(
        [str(img_dir)], bundle.vae_params, bundle.vae_cfg, bundle,
        batch_size=2, key=jax.random.PRNGKey(0))
    batch = next(gen)
    lf = bundle.latent_factor
    assert batch["x0"].shape == (2, (32 // lf) ** 2,
                                 bundle.vae_cfg.latent_channels * 4)
    assert batch["txt"].shape[0] == 2
    assert np.isfinite(np.asarray(batch["x0"])).all()
