"""SigLIP vision tower in JAX — the FLUX.1-Redux image encoder (B7).

Redux conditions Flux on images by projecting SigLIP-so400m/384 patch
tokens (27x27 = 729 tokens, width 1152) into T5 space
(``batch_generate_flux_kshot.py:139-146`` loads the Redux pipeline whose
``image_encoder`` is this tower). We need ``last_hidden_state`` only (post
layernorm, no attention-pooling head — the Redux projector consumes the
full token grid).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .common import (Params, gelu_tanh, layernorm, layernorm_init, linear,
                     linear_init, mha, mha_init)


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden: int = 1152
    layers: int = 27
    heads: int = 16
    mlp_dim: int = 4304
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid ** 2


SIGLIP_SO400M = SiglipVisionConfig()
TINY_SIGLIP = SiglipVisionConfig(image_size=28, patch_size=7, hidden=48,
                                 layers=2, heads=4, mlp_dim=96)


def init(key, cfg: SiglipVisionConfig = SIGLIP_SO400M) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)
    params: Params = {
        "patch_w": jax.random.normal(
            ks[0], (cfg.patch_size * cfg.patch_size * 3, cfg.hidden)) * 0.02,
        "patch_b": jnp.zeros((cfg.hidden,)),
        "pos_emb": jax.random.normal(ks[1], (cfg.seq_len, cfg.hidden)) * 0.02,
        "post_ln": layernorm_init(cfg.hidden),
        "blocks": [],
    }
    for i in range(cfg.layers):
        k1, k2, k3 = jax.random.split(ks[2 + i], 3)
        params["blocks"].append({
            "ln1": layernorm_init(cfg.hidden),
            "attn": mha_init(k1, cfg.hidden, bias=True),
            "ln2": layernorm_init(cfg.hidden),
            "fc1": linear_init(k2, cfg.hidden, cfg.mlp_dim),
            "fc2": linear_init(k3, cfg.mlp_dim, cfg.hidden),
        })
    return params


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    # floor like the HF strided conv: so400m is 384 px with patch 14
    # (27x27 = 729 patches), so the trailing 384 - 27*14 = 6 pixels are
    # discarded — an exact reshape would require divisibility
    x = images[:, :gh * patch, :gw * patch]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def apply(params: Params, images: jax.Array,
          cfg: SiglipVisionConfig = SIGLIP_SO400M) -> jax.Array:
    """images (B, S, S, 3) siglip-preprocessed ([-1,1]) ->
    last_hidden_state (B, seq, hidden)."""
    dtype = images.dtype
    x = jnp.dot(_patchify(images, cfg.patch_size),
                params["patch_w"].astype(dtype), precision="highest")
    x = x + params["patch_b"].astype(dtype)
    x = x + params["pos_emb"].astype(dtype)
    for block in params["blocks"]:
        h = layernorm(block["ln1"], x, cfg.layer_norm_eps)
        x = x + mha(block["attn"], h, cfg.heads)
        h = layernorm(block["ln2"], x, cfg.layer_norm_eps)
        x = x + linear(block["fc2"], gelu_tanh(linear(block["fc1"], h)))
    return layernorm(params["post_ln"], x, cfg.layer_norm_eps)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def convert_hf_siglip(state_dict, cfg: SiglipVisionConfig) -> Params:
    """transformers ``SiglipVisionModel`` state dict -> param tree."""
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}
    conv_w = _t(sd["embeddings.patch_embedding.weight"])  # (O, I, P, P)
    params: Params = {
        "patch_w": jnp.asarray(
            conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])),
        "patch_b": jnp.asarray(_t(sd["embeddings.patch_embedding.bias"])),
        "pos_emb": jnp.asarray(_t(sd["embeddings.position_embedding.weight"])),
        "post_ln": {"scale": jnp.asarray(_t(sd["post_layernorm.weight"])),
                    "bias": jnp.asarray(_t(sd["post_layernorm.bias"]))},
        "blocks": [],
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        pre = f"encoder.layers.{i}"

        def lin(name):
            return {"w": jnp.asarray(_t(sd[f"{pre}.{name}.weight"]).T),
                    "b": jnp.asarray(_t(sd[f"{pre}.{name}.bias"]))}

        params["blocks"].append({
            "ln1": {"scale": jnp.asarray(_t(sd[f"{pre}.layer_norm1.weight"])),
                    "bias": jnp.asarray(_t(sd[f"{pre}.layer_norm1.bias"]))},
            "attn": {"q": lin("self_attn.q_proj"),
                     "k": lin("self_attn.k_proj"),
                     "v": lin("self_attn.v_proj"),
                     "o": lin("self_attn.out_proj")},
            "ln2": {"scale": jnp.asarray(_t(sd[f"{pre}.layer_norm2.weight"])),
                    "bias": jnp.asarray(_t(sd[f"{pre}.layer_norm2.bias"]))},
            "fc1": lin("mlp.fc1"),
            "fc2": lin("mlp.fc2"),
        })
        i += 1
    return params
