"""Flux AutoencoderKL (B9): 16 latent channels, 8x spatial factor.

Implicit in every reference pipeline call (the /16 size alignment at
``batch_generate_flux_kshot.py:448-450`` is ``vae_scale_factor * 2``).
Standard diffusers AutoencoderKL topology: resnet blocks with GroupNorm/silu,
single-head mid attention, nearest-2x upsampling. Latents are normalized as
``z = (enc - shift_factor) * scaling_factor`` (Flux: 0.1159 / 0.3611).

Tiled decode (:func:`decode_tiled`) keeps HBM bounded for the >=2048 px fill
configs (the reference capped resolution at 2800 px to dodge CUDA OOM —
outpainting_updown_sampling_redux.py:104-108).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (Params, conv2d, conv_init, groupnorm,
                      groupnorm_init)


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    latent_channels: int = 16
    block_out: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.block_out) - 1)


TINY_VAE = VaeConfig(latent_channels=4, block_out=(8, 16), layers_per_block=1,
                     norm_groups=4, scaling_factor=0.5, shift_factor=0.1)

FLUX_VAE = VaeConfig()


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _resnet_init(key, c_in, c_out) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": groupnorm_init(c_in),
        "conv1": conv_init(k1, 3, 3, c_in, c_out),
        "norm2": groupnorm_init(c_out),
        "conv2": conv_init(k2, 3, 3, c_out, c_out),
    }
    if c_in != c_out:
        p["shortcut"] = conv_init(k3, 1, 1, c_in, c_out)
    return p


def _resnet(p: Params, x: jax.Array, groups: int) -> jax.Array:
    h = conv2d(p["conv1"], jax.nn.silu(groupnorm(p["norm1"], x, groups)))
    h = conv2d(p["conv2"], jax.nn.silu(groupnorm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attn_init(key, c) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": groupnorm_init(c),
        "q": conv_init(ks[0], 1, 1, c, c),
        "k": conv_init(ks[1], 1, 1, c, c),
        "v": conv_init(ks[2], 1, 1, c, c),
        "o": conv_init(ks[3], 1, 1, c, c),
    }


def _attn(p: Params, x: jax.Array, groups: int) -> jax.Array:
    b, h, w, c = x.shape
    y = groupnorm(p["norm"], x, groups)
    q = conv2d(p["q"], y).reshape(b, h * w, c)
    k = conv2d(p["k"], y).reshape(b, h * w, c)
    v = conv2d(p["v"], y).reshape(b, h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision="highest") / np.sqrt(c)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype,
                     precision="highest").reshape(b, h, w, c)
    return x + conv2d(p["o"], out)


def _mid_init(key, c) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"res1": _resnet_init(k1, c, c), "attn": _attn_init(k2, c),
            "res2": _resnet_init(k3, c, c)}


def _mid(p: Params, x: jax.Array, groups: int) -> jax.Array:
    x = _resnet(p["res1"], x, groups)
    x = _attn(p["attn"], x, groups)
    return _resnet(p["res2"], x, groups)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def init(key, cfg: VaeConfig = FLUX_VAE) -> Params:
    ks = iter(jax.random.split(key, 1024))
    blocks = cfg.block_out
    enc: Params = {"conv_in": conv_init(next(ks), 3, 3, 3, blocks[0]),
                   "down": [], }
    c_prev = blocks[0]
    for i, c in enumerate(blocks):
        stage = {"res": [], }
        for _ in range(cfg.layers_per_block):
            stage["res"].append(_resnet_init(next(ks), c_prev, c))
            c_prev = c
        if i < len(blocks) - 1:
            stage["down"] = conv_init(next(ks), 3, 3, c, c)
        enc["down"].append(stage)
    enc["mid"] = _mid_init(next(ks), c_prev)
    enc["norm_out"] = groupnorm_init(c_prev)
    enc["conv_out"] = conv_init(next(ks), 3, 3, c_prev,
                                2 * cfg.latent_channels)

    dec: Params = {"conv_in": conv_init(next(ks), 3, 3, cfg.latent_channels,
                                        blocks[-1]),
                   "mid": _mid_init(next(ks), blocks[-1]),
                   "up": []}
    c_prev = blocks[-1]
    for i, c in enumerate(reversed(blocks)):
        stage = {"res": []}
        for _ in range(cfg.layers_per_block + 1):
            stage["res"].append(_resnet_init(next(ks), c_prev, c))
            c_prev = c
        if i < len(blocks) - 1:
            stage["up"] = conv_init(next(ks), 3, 3, c, c)
        dec["up"].append(stage)
    dec["norm_out"] = groupnorm_init(c_prev)
    dec["conv_out"] = conv_init(next(ks), 3, 3, c_prev, 3)
    return {"encoder": enc, "decoder": dec}


def encode_moments(params: Params, images: jax.Array,
                   cfg: VaeConfig = FLUX_VAE) -> jax.Array:
    """images (B, H, W, 3) in [-1, 1] -> moments (B, H/f, W/f, 2*C)."""
    enc = params["encoder"]
    g = cfg.norm_groups
    x = conv2d(enc["conv_in"], images)
    for i, stage in enumerate(enc["down"]):
        for res in stage["res"]:
            x = _resnet(res, x, g)
        if "down" in stage:
            # diffusers downsampler: asymmetric pad (0, 1) then stride 2
            x = conv2d(stage["down"], x, stride=2,
                       padding=((0, 1), (0, 1)))
    x = _mid(enc["mid"], x, g)
    x = jax.nn.silu(groupnorm(enc["norm_out"], x, g))
    return conv2d(enc["conv_out"], x)


def encode(params: Params, images: jax.Array,
           cfg: VaeConfig = FLUX_VAE,
           key: Optional[jax.Array] = None) -> jax.Array:
    """Normalized latents; deterministic (mode) unless a PRNG key is given."""
    moments = encode_moments(params, images, cfg)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def decode(params: Params, latents: jax.Array,
           cfg: VaeConfig = FLUX_VAE) -> jax.Array:
    """Normalized latents -> images (B, H, W, 3) in [-1, 1]."""
    dec = params["decoder"]
    g = cfg.norm_groups
    z = latents / cfg.scaling_factor + cfg.shift_factor
    x = conv2d(dec["conv_in"], z)
    x = _mid(dec["mid"], x, g)
    for i, stage in enumerate(dec["up"]):
        for res in stage["res"]:
            x = _resnet(res, x, g)
        if "up" in stage:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = conv2d(stage["up"], x)
    x = jax.nn.silu(groupnorm(dec["norm_out"], x, g))
    return conv2d(dec["conv_out"], x)


def decode_tiled(params: Params, latents: jax.Array,
                 cfg: VaeConfig = FLUX_VAE,
                 tile: int = 96, overlap: int = 16) -> jax.Array:
    """Decode in overlapping latent tiles with linear blending — bounds
    activation memory for >=2048 px outputs."""
    b, lh, lw, c = latents.shape
    if lh <= tile and lw <= tile:
        return decode(params, latents, cfg)
    f = cfg.spatial_factor
    stride = tile - overlap
    out = None
    weight = None
    ys = list(range(0, max(lh - overlap, 1), stride))
    xs = list(range(0, max(lw - overlap, 1), stride))
    for y in ys:
        for x in xs:
            y1, x1 = min(y + tile, lh), min(x + tile, lw)
            y0, x0 = max(y1 - tile, 0), max(x1 - tile, 0)
            lat_in = latents[:, y0:y1, x0:x1]
            if out is not None:
                # serialize tiles: the unrolled patch decoders have no
                # data dependence on each other (only the blend adds
                # chain), so XLA overlaps several tiles' activations and
                # the compile-time peak defeats the memory bound the
                # tiling exists for (measured: the 2800 px fill decode
                # graph asked for 20.63 GB, round 5). The barrier makes
                # each tile's input depend on the running accumulator.
                lat_in, out = jax.lax.optimization_barrier((lat_in, out))
            patch = decode(params, lat_in, cfg)
            ph, pw = patch.shape[1], patch.shape[2]
            wy = _blend_profile(ph, (y0 > 0) * overlap * f,
                                (y1 < lh) * overlap * f)
            wx = _blend_profile(pw, (x0 > 0) * overlap * f,
                                (x1 < lw) * overlap * f)
            wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
            if out is None:
                oh, ow = lh * f, lw * f
                # f32 accumulator: adding the f32 (patch*wmap) into a
                # bf16 buffer is an unsafe-cast scatter (FutureWarning,
                # error in future jax) and loses blend precision
                out = jnp.zeros((b, oh, ow, 3), jnp.float32)
                weight = jnp.zeros((1, oh, ow, 1), jnp.float32)
                dtype = patch.dtype
            out = out.at[:, y0 * f:y1 * f, x0 * f:x1 * f].add(
                patch.astype(jnp.float32) * wmap)
            weight = weight.at[:, y0 * f:y1 * f, x0 * f:x1 * f].add(wmap)
    return (out / jnp.maximum(weight, 1e-8)).astype(dtype)


def encode_tiled(params: Params, images: jax.Array,
                 cfg: VaeConfig = FLUX_VAE,
                 tile: int = 96, overlap: int = 16,
                 key: Optional[jax.Array] = None) -> jax.Array:
    """Encode in overlapping tiles (``tile``/``overlap`` in LATENT units,
    matching :func:`decode_tiled`), blending the normalized latents — the
    encode-side memory bound for the >=2048 px fill inputs (same tradeoff
    as diffusers' tiled VAE: seam regions see a truncated receptive
    field)."""
    b, h, w, _ = images.shape
    f = cfg.spatial_factor
    lh, lw = h // f, w // f
    if lh <= tile and lw <= tile:
        return encode(params, images, cfg, key=key)
    stride = tile - overlap
    out = None
    weight = None
    ys = list(range(0, max(lh - overlap, 1), stride))
    xs = list(range(0, max(lw - overlap, 1), stride))
    for y in ys:
        for x in xs:
            y1, x1 = min(y + tile, lh), min(x + tile, lw)
            y0, x0 = max(y1 - tile, 0), max(x1 - tile, 0)
            img_in = images[:, y0 * f:y1 * f, x0 * f:x1 * f]
            if out is not None:
                # serialize tiles (see decode_tiled): bound the
                # compile-time activation peak to ~one tile
                img_in, out = jax.lax.optimization_barrier((img_in, out))
            patch = encode(params, img_in, cfg, key=key)
            ph, pw = patch.shape[1], patch.shape[2]
            wy = _blend_profile(ph, (y0 > 0) * overlap, (y1 < lh) * overlap)
            wx = _blend_profile(pw, (x0 > 0) * overlap, (x1 < lw) * overlap)
            wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
            if out is None:
                out = jnp.zeros((b, lh, lw, cfg.latent_channels),
                                jnp.float32)      # see decode_tiled
                weight = jnp.zeros((1, lh, lw, 1), jnp.float32)
                dtype = patch.dtype
            out = out.at[:, y0:y1, x0:x1].add(
                patch.astype(jnp.float32) * wmap)
            weight = weight.at[:, y0:y1, x0:x1].add(wmap)
    return (out / jnp.maximum(weight, 1e-8)).astype(dtype)


def _blend_profile(n: int, ramp_lo: int, ramp_hi: int) -> jax.Array:
    w = jnp.ones((n,), jnp.float32)
    if ramp_lo > 0:
        r = (jnp.arange(ramp_lo) + 1.0) / (ramp_lo + 1.0)
        w = w.at[:ramp_lo].set(r)
    if ramp_hi > 0:
        r = (jnp.arange(ramp_hi) + 1.0) / (ramp_hi + 1.0)
        w = w.at[n - ramp_hi:].set(r[::-1])
    return w
