"""Flux MMDiT — rectified-flow transformer (B5) and its Fill variant (B6).

Architecture per the public FLUX.1 releases (12B: hidden 3072 = 24 heads x
128, 19 dual-stream + 38 single-stream blocks, 3-axis RoPE with axes_dim
[16, 56, 56], AdaLN modulation from a timestep+guidance+pooled-text vector,
guidance-distilled conditioning). The reference drives this through
diffusers pipelines (batch_generate_flux_kshot.py:148-151,467-474;
outpainting_updown_sampling_redux.py:534-541,1246-1257); here it is a
first-party JAX model:

- joint attention over [text; image] tokens through the Pallas flash
  attention kernel (ops.attention);
- bf16 params/compute with f32 LayerNorm/softmax/modulation;
- tensor-parallel-ready param layout (qkv column-sharded, proj row-sharded
  over the `model` mesh axis — see parallel.sharding).

The Fill variant only widens ``in_channels`` to 384 = 64 packed latents +
64 packed masked-image latents + 256 packed 8x8 mask (diffusers
FluxFillPipeline conditioning layout).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.mmdit_attention import (mmdit_double_attention,
                                    mmdit_single_attention)
from ..common import (Params, gelu_tanh, linear, linear_init, rmsnorm,
                      rmsnorm_init)


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64            # 384 for Fill
    out_channels: int = 64
    hidden: int = 3072
    heads: int = 24
    head_dim: int = 128
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: int = 4
    text_dim: int = 4096             # T5-XXL
    pooled_dim: int = 768            # CLIP-L pooled
    time_embed_dim: int = 256
    axes_dim: Tuple[int, int, int] = (16, 56, 56)
    theta: int = 10000
    guidance_embed: bool = True      # flux-dev (distilled guidance input)

    @property
    def mlp_hidden(self) -> int:
        return self.hidden * self.mlp_ratio


# tiny config for tests: same structure, toy sizes
TINY_FLUX = FluxConfig(in_channels=16, out_channels=16, hidden=64, heads=4,
                       head_dim=16, depth_double=2, depth_single=2,
                       text_dim=32, pooled_dim=24, time_embed_dim=32,
                       axes_dim=(4, 6, 6))

FLUX_DEV = FluxConfig()
FLUX_FILL_DEV = FluxConfig(in_channels=384)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1000.0) -> jax.Array:
    """Sinusoidal embedding of sigma in [0,1] (BFL convention: t*1000)."""
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp_embedder_init(key, d_in, hidden) -> Params:
    k1, k2 = jax.random.split(key)
    return {"in": linear_init(k1, d_in, hidden),
            "out": linear_init(k2, hidden, hidden)}


def _mlp_embedder(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["out"], jax.nn.silu(linear(p["in"], x)))


# ---------------------------------------------------------------------------
# RoPE (3-axis, pairwise rotation over consecutive channel pairs)
# ---------------------------------------------------------------------------

def rope_cos_sin(ids: jax.Array, axes_dim: Tuple[int, ...], theta: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """ids: (..., S, n_axes) int positions. Returns cos/sin of shape
    (..., S, head_dim/2): per-axis frequency tables concatenated."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dim):
        pos = ids[..., axis].astype(jnp.float32)
        scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        omega = 1.0 / (theta ** scale)                  # (dim/2,)
        angles = pos[..., None] * omega                 # (..., S, dim/2)
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return (jnp.concatenate(cos_parts, axis=-1),
            jnp.concatenate(sin_parts, axis=-1))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, S, D); rotation applied to consecutive pairs
    (x0,x1) -> (x0 cos - x1 sin, x0 sin + x1 cos)."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[..., None, :, :] if cos.ndim == x.ndim - 2 else cos
    s = sin[..., None, :, :] if sin.ndim == x.ndim - 2 else sin
    # broadcast (B, 1, S, D/2) over heads
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    return jnp.stack([out0, out1], axis=-1).reshape(shape).astype(x.dtype)


def make_image_ids(grid_h: int, grid_w: int) -> np.ndarray:
    """(grid_h*grid_w, 3): axis0 = 0, axis1 = row, axis2 = col."""
    ids = np.zeros((grid_h, grid_w, 3), np.int32)
    ids[..., 1] = np.arange(grid_h)[:, None]
    ids[..., 2] = np.arange(grid_w)[None, :]
    return ids.reshape(-1, 3)


def make_text_ids(seq_len: int) -> np.ndarray:
    return np.zeros((seq_len, 3), np.int32)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _qknorm_init(head_dim) -> Params:
    return {"q": rmsnorm_init(head_dim), "k": rmsnorm_init(head_dim)}


def _double_block_init(key, cfg: FluxConfig) -> Params:
    ks = jax.random.split(key, 10)
    h, mh = cfg.hidden, cfg.mlp_hidden
    return {
        "img_mod": linear_init(ks[0], h, 6 * h),
        "txt_mod": linear_init(ks[1], h, 6 * h),
        "img_qkv": linear_init(ks[2], h, 3 * h),
        "txt_qkv": linear_init(ks[3], h, 3 * h),
        "img_qknorm": _qknorm_init(cfg.head_dim),
        "txt_qknorm": _qknorm_init(cfg.head_dim),
        "img_proj": linear_init(ks[4], h, h),
        "txt_proj": linear_init(ks[5], h, h),
        "img_mlp1": linear_init(ks[6], h, mh),
        "img_mlp2": linear_init(ks[7], mh, h),
        "txt_mlp1": linear_init(ks[8], h, mh),
        "txt_mlp2": linear_init(ks[9], mh, h),
    }


def _single_block_init(key, cfg: FluxConfig) -> Params:
    ks = jax.random.split(key, 3)
    h, mh = cfg.hidden, cfg.mlp_hidden
    return {
        "mod": linear_init(ks[0], h, 3 * h),
        "linear1": linear_init(ks[1], h, 3 * h + mh),
        "linear2": linear_init(ks[2], h + mh, h),
        "qknorm": _qknorm_init(cfg.head_dim),
    }


def _ln_no_affine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _split_qkv(qkv: jax.Array, heads: int, head_dim: int):
    b, s, _ = qkv.shape
    qkv = qkv.reshape(b, s, 3, heads, head_dim)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def _qknorm(p: Params, q, k):
    return rmsnorm(p["q"], q), rmsnorm(p["k"], k)


def _double_block(p: Params, img, txt, vec, cos, sin, cfg: FluxConfig):
    heads, hd = cfg.heads, cfg.head_dim
    vec_act = jax.nn.silu(vec)
    img_mod = linear(p["img_mod"], vec_act)
    txt_mod = linear(p["txt_mod"], vec_act)
    (i_shift1, i_scale1, i_gate1,
     i_shift2, i_scale2, i_gate2) = jnp.split(img_mod, 6, axis=-1)
    (t_shift1, t_scale1, t_gate1,
     t_shift2, t_scale2, t_gate2) = jnp.split(txt_mod, 6, axis=-1)

    img_in = _modulate(_ln_no_affine(img), i_shift1, i_scale1)
    txt_in = _modulate(_ln_no_affine(txt), t_shift1, t_scale1)

    # joint [txt; img] attention (BFL order) over the raw fused qkv GEMM
    # outputs — ops.mmdit_attention fuses the head split, qk-rmsnorm,
    # RoPE, and joint softmax in (B, S, H*d) layout (falls back to the
    # unfused composition off-TPU / under TP/SP)
    txt_attn, img_attn = mmdit_double_attention(
        linear(p["txt_qkv"], txt_in), linear(p["img_qkv"], img_in),
        p["txt_qknorm"], p["img_qknorm"], cos, sin, heads, hd)

    img = img + i_gate1[:, None, :] * linear(p["img_proj"], img_attn)
    txt = txt + t_gate1[:, None, :] * linear(p["txt_proj"], txt_attn)

    img_h = _modulate(_ln_no_affine(img), i_shift2, i_scale2)
    img = img + i_gate2[:, None, :] * linear(
        p["img_mlp2"], gelu_tanh(linear(p["img_mlp1"], img_h)))
    txt_h = _modulate(_ln_no_affine(txt), t_shift2, t_scale2)
    txt = txt + t_gate2[:, None, :] * linear(
        p["txt_mlp2"], gelu_tanh(linear(p["txt_mlp1"], txt_h)))
    return img, txt


def _single_block(p: Params, x, vec, cos, sin, cfg: FluxConfig):
    heads, hd, h, mh = cfg.heads, cfg.head_dim, cfg.hidden, cfg.mlp_hidden
    mod = linear(p["mod"], jax.nn.silu(vec))
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    x_in = _modulate(_ln_no_affine(x), shift, scale)
    proj = linear(p["linear1"], x_in)
    mlp_h = proj[..., 3 * h:]
    # fused attention reads q/k/v straight from proj's first 3h lanes
    out = mmdit_single_attention(proj, p["qknorm"], cos, sin, heads, hd)
    combined = jnp.concatenate([out, gelu_tanh(mlp_h)], axis=-1)
    return x + gate[:, None, :] * linear(p["linear2"], combined)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init(key, cfg: FluxConfig) -> Params:
    n_keys = 8 + cfg.depth_double + cfg.depth_single
    ks = jax.random.split(key, n_keys)
    params: Params = {
        "img_in": linear_init(ks[0], cfg.in_channels, cfg.hidden),
        "txt_in": linear_init(ks[1], cfg.text_dim, cfg.hidden),
        "time_in": _mlp_embedder_init(ks[2], cfg.time_embed_dim, cfg.hidden),
        "vector_in": _mlp_embedder_init(ks[3], cfg.pooled_dim, cfg.hidden),
        "final_mod": linear_init(ks[4], cfg.hidden, 2 * cfg.hidden),
        "final_proj": linear_init(ks[5], cfg.hidden, cfg.out_channels),
        "double": [_double_block_init(ks[8 + i], cfg)
                   for i in range(cfg.depth_double)],
        "single": [_single_block_init(ks[8 + cfg.depth_double + i], cfg)
                   for i in range(cfg.depth_single)],
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _mlp_embedder_init(
            ks[6], cfg.time_embed_dim, cfg.hidden)
    return params


def apply(params: Params, img_tokens: jax.Array, txt_tokens: jax.Array,
          pooled: jax.Array, timestep: jax.Array,
          img_ids: jax.Array, txt_ids: jax.Array,
          cfg: FluxConfig, guidance: Optional[jax.Array] = None,
          remat: bool = False) -> jax.Array:
    """One velocity prediction.

    img_tokens: (B, S_img, in_channels) packed latents (+fill conditioning);
    txt_tokens: (B, S_txt, text_dim) T5 (or Redux-extended) embeddings;
    pooled: (B, pooled_dim) CLIP pooled vector;
    timestep: (B,) sigma in [0,1]; guidance: (B,) distilled guidance scale;
    img_ids/txt_ids: (S, 3) RoPE position ids.
    ``remat=True`` checkpoints every block (recompute activations in the
    backward pass) — required for training the 12B model.
    Returns (B, S_img, out_channels) velocity.
    """
    dtype = img_tokens.dtype
    img = linear(params["img_in"], img_tokens)
    txt = linear(params["txt_in"], txt_tokens.astype(dtype))

    vec = _mlp_embedder(params["time_in"],
                        timestep_embedding(timestep, cfg.time_embed_dim)
                        .astype(dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("flux-dev requires a guidance value")
        vec = vec + _mlp_embedder(
            params["guidance_in"],
            timestep_embedding(guidance, cfg.time_embed_dim).astype(dtype))
    vec = vec + _mlp_embedder(params["vector_in"], pooled.astype(dtype))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_cos_sin(ids, cfg.axes_dim, cfg.theta)
    cos = cos[None, None]            # (1, 1, S, D/2) broadcast over B, H
    sin = sin[None, None]

    double_fn = _double_block
    single_fn = _single_block
    if remat:
        double_fn = jax.checkpoint(
            lambda p, i, t, v, c, s: _double_block(p, i, t, v, c, s, cfg),
            static_argnums=())
        single_fn = jax.checkpoint(
            lambda p, x, v, c, s: _single_block(p, x, v, c, s, cfg))

    for block in params["double"]:
        if remat:
            img, txt = double_fn(block, img, txt, vec, cos, sin)
        else:
            img, txt = double_fn(block, img, txt, vec, cos, sin, cfg)

    x = jnp.concatenate([txt, img], axis=1)
    for block in params["single"]:
        if remat:
            x = single_fn(block, x, vec, cos, sin)
        else:
            x = single_fn(block, x, vec, cos, sin, cfg)
    img = x[:, txt.shape[1]:]

    mod = linear(params["final_mod"], jax.nn.silu(vec))
    shift, scale = jnp.split(mod, 2, axis=-1)
    img = _modulate(_ln_no_affine(img), shift, scale)
    return linear(params["final_proj"], img)


# ---------------------------------------------------------------------------
# block-residual caching (training-free acceleration, "Cache Me if You
# Can" arXiv:2312.03209 family): transformer block outputs drift slowly
# across adjacent denoise steps, so REFRESH steps record every block's
# residual (out - in) and CACHED steps replay them (embedders/final
# layers always recompute — they carry the timestep). Roughly halves
# denoise FLOPs at refresh-every-other-step. EXPERIMENTAL: changes
# outputs; quality must be validated against real weights before
# production use (the refresh-every-step schedule is exact).
# ---------------------------------------------------------------------------

def init_block_cache(cfg: FluxConfig, batch: int, s_img: int, s_txt: int,
                     dtype=jnp.bfloat16):
    """Zeroed residual cache pytree (carry it through the denoise loop)."""
    return {
        "double": [(jnp.zeros((batch, s_img, cfg.hidden), dtype),
                    jnp.zeros((batch, s_txt, cfg.hidden), dtype))
                   for _ in range(cfg.depth_double)],
        "single": [jnp.zeros((batch, s_txt + s_img, cfg.hidden), dtype)
                   for _ in range(cfg.depth_single)],
    }


def apply_with_cache(params: Params, img_tokens: jax.Array,
                     txt_tokens: jax.Array, pooled: jax.Array,
                     timestep: jax.Array, img_ids: jax.Array,
                     txt_ids: jax.Array, cfg: FluxConfig, cache,
                     refresh: jax.Array,
                     guidance: Optional[jax.Array] = None):
    """:func:`apply` with block-residual caching.

    ``refresh``: traced bool scalar — True recomputes every block and
    records residuals; False replays ``cache``. Returns (velocity,
    new_cache). With ``refresh=True`` every step this is exactly
    :func:`apply` (pinned by tests)."""
    dtype = img_tokens.dtype
    img = linear(params["img_in"], img_tokens)
    txt = linear(params["txt_in"], txt_tokens.astype(dtype))
    vec = _mlp_embedder(params["time_in"],
                        timestep_embedding(timestep, cfg.time_embed_dim)
                        .astype(dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("flux-dev requires a guidance value")
        vec = vec + _mlp_embedder(
            params["guidance_in"],
            timestep_embedding(guidance, cfg.time_embed_dim).astype(dtype))
    vec = vec + _mlp_embedder(params["vector_in"], pooled.astype(dtype))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_cos_sin(ids, cfg.axes_dim, cfg.theta)
    cos, sin = cos[None, None], sin[None, None]

    new_cache = {"double": [], "single": []}
    for block, (c_img, c_txt) in zip(params["double"], cache["double"]):
        def full(img, txt, block=block):
            i2, t2 = _double_block(block, img, txt, vec, cos, sin, cfg)
            return i2, t2, (i2 - img).astype(c_img.dtype), \
                (t2 - txt).astype(c_txt.dtype)

        def cached(img, txt, c_img=c_img, c_txt=c_txt):
            return (img + c_img.astype(img.dtype),
                    txt + c_txt.astype(txt.dtype), c_img, c_txt)

        img, txt, r_img, r_txt = jax.lax.cond(refresh, full, cached,
                                              img, txt)
        new_cache["double"].append((r_img, r_txt))

    x = jnp.concatenate([txt, img], axis=1)
    for block, c_x in zip(params["single"], cache["single"]):
        def full_s(x, block=block, c_x=c_x):
            x2 = _single_block(block, x, vec, cos, sin, cfg)
            return x2, (x2 - x).astype(c_x.dtype)

        def cached_s(x, c_x=c_x):
            return x + c_x.astype(x.dtype), c_x

        x, r_x = jax.lax.cond(refresh, full_s, cached_s, x)
        new_cache["single"].append(r_x)
    img = x[:, txt.shape[1]:]

    mod = linear(params["final_mod"], jax.nn.silu(vec))
    shift, scale = jnp.split(mod, 2, axis=-1)
    img = _modulate(_ln_no_affine(img), shift, scale)
    return linear(params["final_proj"], img), new_cache


# ---------------------------------------------------------------------------
# latent packing (diffusers _pack_latents layout: channel-major, then 2x2)
# ---------------------------------------------------------------------------

def pack_latents(latents: jax.Array) -> jax.Array:
    """(B, H, W, C) NHWC latents -> (B, H/2*W/2, C*4) tokens.

    Feature order matches diffusers ``_pack_latents`` (which permutes NCHW
    to (B, H/2, W/2, C, 2, 2)): index = c*4 + dy*2 + dx."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # B, h2, w2, C, dy, dx
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Inverse of :func:`pack_latents` -> (B, 2*grid_h, 2*grid_w, C)."""
    b, s, d = tokens.shape
    c = d // 4
    x = tokens.reshape(b, grid_h, grid_w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # B, h2, dy, w2, dx, C
    return x.reshape(b, grid_h * 2, grid_w * 2, c)
