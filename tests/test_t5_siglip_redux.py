"""Parity: T5 encoder and SigLIP tower vs transformers (random tiny
weights); Redux fusion semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from domainrag_tpu.models import redux, siglip, t5  # noqa: E402


def test_t5_parity():
    from transformers import T5Config as HFT5Config, T5EncoderModel
    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False)
    model = T5EncoderModel(hf_cfg).eval()

    cfg = t5.TINY_T5
    params = t5.convert_hf_t5(model.state_dict(), cfg)

    ids = np.array([[3, 17, 42, 99, 1, 0, 0, 0],
                    [5, 6, 7, 8, 9, 10, 1, 0]], dtype=np.int64)
    attn = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(attn)
                    ).last_hidden_state.numpy()
    ours = np.asarray(t5.apply(params, jnp.asarray(ids.astype(np.int32)),
                               cfg,
                               attention_mask=jnp.asarray(attn != 0)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_t5_relative_bucket_exact():
    from transformers.models.t5.modeling_t5 import T5Attention
    rel = np.arange(-200, 201).reshape(1, -1)
    ref = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    ours = np.asarray(t5.relative_position_bucket(jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(ours, ref)


def test_siglip_parity(rng):
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel
    torch.manual_seed(0)
    hf_cfg = HFCfg(hidden_size=48, intermediate_size=96,
                   num_hidden_layers=2, num_attention_heads=4,
                   image_size=28, patch_size=7,
                   hidden_act="gelu_pytorch_tanh")
    model = SiglipVisionModel(hf_cfg).eval()

    cfg = siglip.TINY_SIGLIP
    params = siglip.convert_hf_siglip(model.state_dict(), cfg)

    images = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            images.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(siglip.apply(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-5)


def test_siglip_parity_nondivisible(rng):
    """so400m is 384 px / patch 14 (NOT divisible): the HF strided conv
    floors to 27x27 patches, discarding 6 trailing pixels. Regression for
    the production-size crash the exact-reshape patchify had (tiny 28/7
    configs never exercised flooring)."""
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel
    torch.manual_seed(0)
    hf_cfg = HFCfg(hidden_size=48, intermediate_size=96,
                   num_hidden_layers=2, num_attention_heads=4,
                   image_size=32, patch_size=7,   # 32 % 7 != 0 -> 4x4
                   hidden_act="gelu_pytorch_tanh")
    model = SiglipVisionModel(hf_cfg).eval()

    cfg = siglip.SiglipVisionConfig(image_size=32, patch_size=7, hidden=48,
                                    mlp_dim=96, layers=2, heads=4)
    params = siglip.convert_hf_siglip(model.state_dict(), cfg)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            images.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(siglip.apply(params, jnp.asarray(images), cfg))
    assert ours.shape == ref.shape == (2, 16, 48)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-5)


def test_redux_combine_dual_image(rng):
    """The [0.8, 1.0] dual-image fusion: weighted sum over the image axis."""
    text = jnp.asarray(rng.standard_normal((2, 4, 8)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((2, 9, 8)).astype(np.float32))
    embeds, pool = redux.combine_prior(text, pooled, img,
                                       [0.8, 1.0], [1.0, 1.0])
    assert embeds.shape == (1, 13, 8)
    assert pool.shape == (1, 6)
    expect = (np.concatenate([np.asarray(text), np.asarray(img)], axis=1)
              * np.array([0.8, 1.0])[:, None, None]).sum(0)
    np.testing.assert_allclose(np.asarray(embeds)[0], expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool)[0],
                               np.asarray(pooled).sum(0), rtol=1e-5, atol=1e-6)


def test_redux_projection_shapes(rng):
    cfg = redux.TINY_REDUX
    params = redux.init(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(rng.standard_normal((2, 9, cfg.siglip_hidden))
                         .astype(np.float32))
    out = redux.apply(params, tokens)
    assert out.shape == (2, 9, cfg.txt_dim)


def test_redux_single_image_scale(rng):
    """Compose-stage form: one image, per-dataset image_prompt_scale."""
    text = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal((1, 6)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((1, 9, 8)).astype(np.float32))
    embeds, pool = redux.combine_prior(text, pooled, img, [1.2], [1.0])
    expect = np.concatenate([np.asarray(text), np.asarray(img)], 1)[0] * 1.2
    np.testing.assert_allclose(np.asarray(embeds)[0], expect, rtol=1e-5, atol=1e-6)
