"""Numerical parity of the JAX CLIP towers vs transformers (random weights).

The environment has no pretrained checkpoints (zero egress), so parity is
established structurally: build a tiny random transformers CLIPModel with
quick_gelu (OpenAI configuration), convert its state dict, and require
matching activations. This validates every architectural choice (pre-LN
order, quick-gelu, EOS pooling, patch embedding layout); real-checkpoint
conversion is then mechanical.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from domainrag_tpu.models import clip as jclip  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig
    torch.manual_seed(0)
    vision = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256, hidden_act="quick_gelu")
    text = CLIPTextConfig(
        vocab_size=100, max_position_embeddings=16, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=256,
        hidden_act="quick_gelu", eos_token_id=99, bos_token_id=98,
        pad_token_id=97)
    cfg = CLIPConfig.from_text_vision_configs(text, vision, projection_dim=32)
    model = CLIPModel(cfg).eval()
    return model


def test_vision_parity(hf_model, rng):
    cfg = jclip.TINY_VISION
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k.startswith(("vision_model", "visual_projection"))}
    params = jclip.convert_hf_clip_vision(sd, cfg)

    images = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
    ref = out.numpy()

    ours = np.asarray(jclip.apply_vision(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_vision_unprojected_parity(hf_model, rng):
    cfg = jclip.TINY_VISION
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k.startswith(("vision_model", "visual_projection"))}
    params = jclip.convert_hf_clip_vision(sd, cfg)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf_model.vision_model(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
    ref = out.pooler_output.numpy()
    ours = np.asarray(jclip.apply_vision(params, jnp.asarray(images), cfg,
                                         project=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_encode_image_normalized(hf_model, rng):
    cfg = jclip.TINY_VISION
    sd = hf_model.state_dict()
    params = jclip.convert_hf_clip_vision(sd, cfg)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    emb = np.asarray(jclip.encode_image(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-6)


def test_text_parity(hf_model):
    cfg = jclip.TINY_TEXT
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k.startswith("text_model")}
    params = jclip.convert_hf_clip_text(sd, cfg)

    ids = np.array([[98, 5, 7, 12, 99, 97, 97, 97],
                    [98, 42, 99, 97, 97, 97, 97, 97]], dtype=np.int32)
    with torch.no_grad():
        out = hf_model.text_model(input_ids=torch.from_numpy(ids.astype(np.int64)))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    hidden, pooled = jclip.apply_text(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-5)
