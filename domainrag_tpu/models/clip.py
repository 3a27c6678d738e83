"""CLIP in JAX: ViT image tower (retrieval, B2) + text tower (Flux, B8).

The reference uses OpenAI ``clip.load("ViT-B/32")`` for retrieval embeddings
(retrieval/clip100_resnet_style_all_shots.py:209,161-177: encode_image +
L2-normalize -> 512-d) and transformers ``CLIPTextModel`` (CLIP-L/14) for the
Flux pooled text vector (batch_generate_flux_kshot.py:120-124).

Both towers share the pre-LN transformer with quick-gelu. Weight layout
mirrors the HF ``CLIPModel`` state dict so conversion is mechanical
(:func:`convert_hf_clip_vision`, :func:`convert_hf_clip_text`), and parity
is tested against transformers with random weights.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .common import (Params, causal_mask, layernorm, layernorm_init, linear,
                     linear_init, mha, mha_init, quick_gelu)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 512

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    max_len: int = 77
    hidden: int = 768          # CLIP-L text (Flux); ViT-B/32 pairs with 512
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 768
    eos_token_id: int = 49407


TINY_VISION = ClipVisionConfig(image_size=32, patch_size=8, hidden=64,
                               layers=2, heads=4, projection_dim=32)
TINY_TEXT = ClipTextConfig(vocab_size=100, max_len=16, hidden=64, layers=2,
                           heads=4, projection_dim=32, eos_token_id=99)


# ---------------------------------------------------------------------------
# shared transformer block (pre-LN, quick-gelu)
# ---------------------------------------------------------------------------

def _block_init(key, hidden, heads, mlp_ratio) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": layernorm_init(hidden),
        "attn": mha_init(k1, hidden, bias=True),
        "ln2": layernorm_init(hidden),
        "fc1": linear_init(k2, hidden, hidden * mlp_ratio),
        "fc2": linear_init(k3, hidden * mlp_ratio, hidden),
    }


def _block_apply(p: Params, x: jax.Array, heads: int, mask=None) -> jax.Array:
    x = x + mha(p["attn"], layernorm(p["ln1"], x), heads, mask=mask)
    h = linear(p["fc1"], layernorm(p["ln2"], x))
    x = x + linear(p["fc2"], quick_gelu(h))
    return x


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

def init_vision(key, cfg: ClipVisionConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 4)
    scale = cfg.hidden ** -0.5
    params: Params = {
        # patch embed as a matmul over flattened patches (MXU-friendly):
        # (P*P*3, hidden)
        "patch_w": jax.random.normal(
            ks[0], (cfg.patch_size * cfg.patch_size * 3, cfg.hidden),
            jnp.float32) * scale,
        "class_emb": jax.random.normal(ks[1], (cfg.hidden,)) * scale,
        "pos_emb": jax.random.normal(ks[2], (cfg.seq_len, cfg.hidden)) * scale,
        "ln_pre": layernorm_init(cfg.hidden),
        "ln_post": layernorm_init(cfg.hidden),
        "proj": jax.random.normal(ks[3], (cfg.hidden, cfg.projection_dim))
                * scale,
        "blocks": [_block_init(ks[4 + i], cfg.hidden, cfg.heads,
                               cfg.mlp_ratio) for i in range(cfg.layers)],
    }
    return params


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, P*P*3) in conv-weight-compatible order.

    Channel-last flattening matches reshaping an HWIO conv kernel to
    (P*P*I, O), so HF conv weights convert by pure reshape."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, P, P, C
    return x.reshape(b, gh * gw, patch * patch * c)


def apply_vision(params: Params, images: jax.Array,
                 cfg: ClipVisionConfig,
                 project: bool = True) -> jax.Array:
    """images: (B, H, W, 3) preprocessed (imaging.clip_preprocess).
    Returns (B, projection_dim) UN-normalized embeddings (callers
    L2-normalize per retrieval/...py:171-172)."""
    dtype = images.dtype
    x = jnp.dot(_patchify(images, cfg.patch_size),
                params["patch_w"].astype(dtype), precision="highest")
    cls = jnp.broadcast_to(params["class_emb"].astype(dtype),
                           (x.shape[0], 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"].astype(dtype)
    x = layernorm(params["ln_pre"], x)
    for block in params["blocks"]:
        x = _block_apply(block, x, cfg.heads)
    pooled = layernorm(params["ln_post"], x[:, 0])
    if not project:
        return pooled
    return jnp.dot(pooled, params["proj"].astype(dtype),
                   precision="highest")


def encode_image(params: Params, images: jax.Array,
                 cfg: ClipVisionConfig) -> jax.Array:
    """L2-normalized retrieval embeddings (f32 for index exactness)."""
    feats = apply_vision(params, images, cfg).astype(jnp.float32)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def init_text(key, cfg: ClipTextConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)
    return {
        "tok_emb": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden)) * 0.02,
        "pos_emb": jax.random.normal(ks[1], (cfg.max_len, cfg.hidden)) * 0.01,
        "ln_final": layernorm_init(cfg.hidden),
        "proj": jax.random.normal(ks[2], (cfg.hidden, cfg.projection_dim))
                * cfg.hidden ** -0.5,
        "blocks": [_block_init(ks[3 + i], cfg.hidden, cfg.heads,
                               cfg.mlp_ratio) for i in range(cfg.layers)],
    }


def apply_text(params: Params, token_ids: jax.Array, cfg: ClipTextConfig,
               dtype=jnp.float32):
    """token_ids: (B, S) int32, padded to max_len with eos/pad.

    Returns (hidden_states (B, S, H), pooled (B, H)). ``pooled`` is the
    final-LN hidden state at the first EOS position — transformers
    CLIPTextModel ``pooler_output``, which Flux consumes directly
    (no text projection)."""
    b, s = token_ids.shape
    x = params["tok_emb"].astype(dtype)[token_ids]
    x = x + params["pos_emb"].astype(dtype)[:s]
    mask = causal_mask(s)
    for block in params["blocks"]:
        x = _block_apply(block, x, cfg.heads, mask=mask)
    x = layernorm(params["ln_final"], x)
    eos_pos = jnp.argmax((token_ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


# ---------------------------------------------------------------------------
# HF weight conversion (torch state_dict -> our param tree)
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def _convert_block(sd, prefix) -> Params:
    def lin(name):
        p = {"w": _t(sd[f"{prefix}.{name}.weight"]).T}
        bkey = f"{prefix}.{name}.bias"
        if bkey in sd:
            p["b"] = _t(sd[bkey])
        return p

    def ln(name):
        return {"scale": _t(sd[f"{prefix}.{name}.weight"]),
                "bias": _t(sd[f"{prefix}.{name}.bias"])}

    attn = {
        "q": lin("self_attn.q_proj"), "k": lin("self_attn.k_proj"),
        "v": lin("self_attn.v_proj"), "o": lin("self_attn.out_proj"),
    }
    return {"ln1": ln("layer_norm1"), "attn": attn, "ln2": ln("layer_norm2"),
            "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")}


def convert_hf_clip_vision(state_dict, cfg: ClipVisionConfig) -> Params:
    """Convert a transformers ``CLIPVisionModelWithProjection`` (or the
    vision half of ``CLIPModel``) state dict."""
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}
    conv_w = _t(sd["embeddings.patch_embedding.weight"])  # (O, I, P, P)
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
    params: Params = {
        "patch_w": jnp.asarray(patch_w),
        "class_emb": jnp.asarray(_t(sd["embeddings.class_embedding"])),
        "pos_emb": jnp.asarray(_t(sd["embeddings.position_embedding.weight"])),
        "ln_pre": {"scale": jnp.asarray(_t(sd["pre_layrnorm.weight"])),
                   "bias": jnp.asarray(_t(sd["pre_layrnorm.bias"]))},
        "ln_post": {"scale": jnp.asarray(_t(sd["post_layernorm.weight"])),
                    "bias": jnp.asarray(_t(sd["post_layernorm.bias"]))},
        "proj": jnp.asarray(_t(sd["visual_projection.weight"]).T),
        "blocks": [],
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        block = jax.tree_util.tree_map(
            jnp.asarray, _convert_block(sd, f"encoder.layers.{i}"))
        params["blocks"].append(block)
        i += 1
    return params


def convert_hf_clip_text(state_dict, cfg: ClipTextConfig) -> Params:
    sd = {k.removeprefix("text_model."): v for k, v in state_dict.items()}
    params: Params = {
        "tok_emb": jnp.asarray(_t(sd["embeddings.token_embedding.weight"])),
        "pos_emb": jnp.asarray(_t(sd["embeddings.position_embedding.weight"])),
        "ln_final": {"scale": jnp.asarray(_t(sd["final_layer_norm.weight"])),
                     "bias": jnp.asarray(_t(sd["final_layer_norm.bias"]))},
        "blocks": [],
    }
    if "text_projection.weight" in sd:
        params["proj"] = jnp.asarray(_t(sd["text_projection.weight"]).T)
    else:
        params["proj"] = jnp.eye(cfg.hidden, cfg.projection_dim)
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        block = jax.tree_util.tree_map(
            jnp.asarray, _convert_block(sd, f"encoder.layers.{i}"))
        params["blocks"].append(block)
        i += 1
    return params
