"""FLUX.1-Redux prior (B7): SigLIP tokens -> T5-space image tokens, plus
the multi-image weighted-sum conditioning that is the heart of stage 3.

Reference behavior (batch_generate_flux_kshot.py:459-465 with scales from
:52-61): ``pipe_prior_redux([ref_image, target_image], prompt=["", ""],
prompt_embeds_scale=[0.8, 1.0], pooled_prompt_embeds_scale=[1.0, 1.0])``.

diffusers ``FluxPriorReduxPipeline`` semantics reproduced here:
1. per image: SigLIP last_hidden_state (N, 729, 1152) -> ReduxImageEncoder
   (Linear 1152 -> 3*4096, silu, Linear 3*4096 -> 4096) -> (N, 729, 4096);
2. per image: text embeds (N, 512, 4096 T5) and pooled (N, 768 CLIP);
3. concat text+image tokens along sequence -> (N, 1241, 4096);
4. scale each image's embeds by prompt_embeds_scale[i] (pooled by
   pooled_prompt_embeds_scale[i]) and SUM over the image axis ->
   (1, 1241, 4096) / (1, 768). The dual-image [0.8, 1.0] sum fuses the
   retrieved corpus image with the inpainted target background.

The compose stage uses the single-image form with per-dataset
``image_prompt_scale`` (outpainting_updown_sampling_redux.py:1237-1243).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, linear, linear_init


@dataclasses.dataclass(frozen=True)
class ReduxEncoderConfig:
    siglip_hidden: int = 1152
    txt_dim: int = 4096           # T5 space

    @property
    def mid_dim(self) -> int:
        return 3 * self.txt_dim


REDUX_DEV = ReduxEncoderConfig()
TINY_REDUX = ReduxEncoderConfig(siglip_hidden=48, txt_dim=32)


def init(key, cfg: ReduxEncoderConfig = REDUX_DEV) -> Params:
    k1, k2 = jax.random.split(key)
    return {"up": linear_init(k1, cfg.siglip_hidden, cfg.mid_dim),
            "down": linear_init(k2, cfg.mid_dim, cfg.txt_dim)}


def apply(params: Params, siglip_tokens: jax.Array) -> jax.Array:
    """(N, 729, siglip_hidden) -> (N, 729, txt_dim)."""
    return linear(params["down"], jax.nn.silu(linear(params["up"],
                                                     siglip_tokens)))


def combine_prior(text_embeds: jax.Array, pooled_embeds: jax.Array,
                  image_embeds: jax.Array,
                  prompt_embeds_scale: Sequence[float],
                  pooled_prompt_embeds_scale: Sequence[float]
                  ) -> Tuple[jax.Array, jax.Array]:
    """Weighted multi-image fusion (diffusers FluxPriorReduxPipeline).

    text_embeds: (N, S_txt, D); pooled_embeds: (N, P);
    image_embeds: (N, S_img, D). Returns ((1, S_txt+S_img, D), (1, P)).
    """
    scales = jnp.asarray(prompt_embeds_scale,
                         text_embeds.dtype)[:, None, None]
    pooled_scales = jnp.asarray(pooled_prompt_embeds_scale,
                                pooled_embeds.dtype)[:, None]
    embeds = jnp.concatenate([text_embeds, image_embeds], axis=1) * scales
    pooled = pooled_embeds * pooled_scales
    return (jnp.sum(embeds, axis=0, keepdims=True),
            jnp.sum(pooled, axis=0, keepdims=True))


def combine_prior_pairs(text_embeds: jax.Array, pooled_embeds: jax.Array,
                        image_embeds: jax.Array,
                        prompt_embeds_scale,
                        pooled_prompt_embeds_scale
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batched fusion: N independent conditioning groups of K images each
    (the generate stage batches many (ref, target) pairs, K=2, across the
    data mesh axis).

    text_embeds: (N, K, S_t, D); pooled_embeds: (N, K, P);
    image_embeds: (N, K, S_i, D); scales: (K,) shared or (N, K).
    Returns ((N, S_t + S_i, D), (N, P)).
    """
    scales = jnp.asarray(prompt_embeds_scale, text_embeds.dtype)
    pooled_scales = jnp.asarray(pooled_prompt_embeds_scale,
                                pooled_embeds.dtype)
    if scales.ndim == 1:
        scales = jnp.broadcast_to(scales, text_embeds.shape[:2])
    if pooled_scales.ndim == 1:
        pooled_scales = jnp.broadcast_to(pooled_scales,
                                         pooled_embeds.shape[:2])
    embeds = jnp.concatenate([text_embeds, image_embeds], axis=2)
    embeds = embeds * scales[:, :, None, None]
    pooled = pooled_embeds * pooled_scales[:, :, None]
    return jnp.sum(embeds, axis=1), jnp.sum(pooled, axis=1)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def convert_hf_redux(state_dict) -> Params:
    """diffusers ``ReduxImageEncoder`` state dict (redux_up/redux_down)."""
    return {
        "up": {"w": jnp.asarray(_t(state_dict["redux_up.weight"]).T),
               "b": jnp.asarray(_t(state_dict["redux_up.bias"]))},
        "down": {"w": jnp.asarray(_t(state_dict["redux_down.weight"]).T),
                 "b": jnp.asarray(_t(state_dict["redux_down.bias"]))},
    }
