"""ResNet50-stem style encoder (B3).

The reference's second-stage re-ranker embeds images with the first four
layers of torchvision resnet50 — conv1 (7x7/2) -> bn1 -> relu -> maxpool
(3x3/2) — then takes per-channel spatial mean/std as a 128-d "style" vector
(retrieval/clip100_resnet_style_all_shots.py:51-74,180-203).

Parity notes baked in here:
- torch ``.var`` is UNBIASED (correction=1); eps=1e-5 added to var then sqrt.
- input is raw RGB/255 at 256x256, NO ImageNet normalization (ref :188-190).
- conv1 padding 3, maxpool padding 1 (torch explicit padding, not SAME).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (Params, batchnorm, batchnorm_init, conv2d, conv_init,
                     max_pool)


@dataclasses.dataclass(frozen=True)
class ResNetStemConfig:
    channels: int = 64
    eps: float = 1e-5


def init(key, cfg: ResNetStemConfig = ResNetStemConfig()) -> Params:
    return {
        "conv1": conv_init(key, 7, 7, 3, cfg.channels, bias=False),
        "bn1": batchnorm_init(cfg.channels),
    }


def apply_stem(params: Params, images: jax.Array,
               cfg: ResNetStemConfig = ResNetStemConfig()) -> jax.Array:
    """images: (B, H, W, 3) in [0,1]. Returns (B, H/4, W/4, 64)."""
    x = conv2d(params["conv1"], images, stride=2, padding=((3, 3), (3, 3)))
    x = batchnorm(params["bn1"], x)
    x = jax.nn.relu(x)
    x = max_pool(x, window=3, stride=2, padding=((1, 1), (1, 1)))
    return x


def calc_mean_std(feat: jax.Array, eps: float = 1e-5
                  ) -> Tuple[jax.Array, jax.Array]:
    """Per-channel spatial mean/std over an NHWC feature map.

    Matches the reference ``calc_mean_std`` (retrieval/...py:67-74):
    unbiased variance + eps, then sqrt. Returns two (B, C) arrays."""
    f = feat.astype(jnp.float32)
    b, h, w, c = f.shape
    flat = f.reshape(b, h * w, c)
    mean = jnp.mean(flat, axis=1)
    n = h * w
    var = jnp.var(flat, axis=1) * (n / max(n - 1, 1))  # unbiased
    return mean, jnp.sqrt(var + eps)


def style_features(params: Params, images: jax.Array,
                   cfg: ResNetStemConfig = ResNetStemConfig()) -> jax.Array:
    """(B, H, W, 3)/[0,1] -> (B, 128) style vector = mean ++ std."""
    feat = apply_stem(params, images, cfg)
    mean, std = calc_mean_std(feat, cfg.eps)
    return jnp.concatenate([mean, std], axis=-1)


def style_distance(query: jax.Array, candidates: jax.Array) -> jax.Array:
    """Batched L2 distances (ref :474) and similarity 1/(1+d) (ref :492).

    query: (128,), candidates: (N, 128). Returns (distances, similarities)."""
    d = jnp.linalg.norm(candidates.astype(jnp.float32)
                        - query.astype(jnp.float32), axis=-1)
    return d, 1.0 / (1.0 + d)


def convert_torch_stem(conv1_weight, bn_weight, bn_bias, bn_mean, bn_var
                       ) -> Params:
    """torchvision layout (O, I, kh, kw) -> HWIO."""
    w = np.asarray(conv1_weight, dtype=np.float32).transpose(2, 3, 1, 0)
    return {
        "conv1": {"w": jnp.asarray(w)},
        "bn1": {"scale": jnp.asarray(np.asarray(bn_weight, np.float32)),
                "bias": jnp.asarray(np.asarray(bn_bias, np.float32)),
                "mean": jnp.asarray(np.asarray(bn_mean, np.float32)),
                "var": jnp.asarray(np.asarray(bn_var, np.float32))},
    }
