"""T5 v1.1 encoder in JAX (B8) — Flux's second text encoder (T5-XXL).

The reference loads ``T5EncoderModel`` + ``T5TokenizerFast`` from the
FLUX.1-dev checkpoint (batch_generate_flux_kshot.py:125-137) to produce the
(512, 4096) prompt embedding consumed by the MMDiT. Architecture:
RMSNorm (no mean subtraction), relative position bias computed in block 0
and shared by all layers, UNSCALED attention logits (T5 bakes the 1/sqrt(d)
into init), gated-gelu MLP, tied final RMSNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, linear, linear_init, rmsnorm, rmsnorm_init


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    layers: int = 24
    heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6


T5_XXL = T5Config()
TINY_T5 = T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64, layers=2,
                   heads=4)


def relative_position_bucket(relative_position: jax.Array,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """Bidirectional bucketing, exact transcription of the T5 scheme
    (transformers ``T5Attention._relative_position_bucket``)."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _attn_init(key, cfg: T5Config, with_rel_bias: bool) -> Params:
    ks = jax.random.split(key, 5)
    inner = cfg.heads * cfg.d_kv
    p = {
        "q": linear_init(ks[0], cfg.d_model, inner, bias=False),
        "k": linear_init(ks[1], cfg.d_model, inner, bias=False),
        "v": linear_init(ks[2], cfg.d_model, inner, bias=False),
        "o": linear_init(ks[3], inner, cfg.d_model, bias=False),
    }
    if with_rel_bias:
        p["rel_bias"] = jax.random.normal(
            ks[4], (cfg.rel_buckets, cfg.heads)) * 0.02
    return p


def init(key, cfg: T5Config = T5_XXL) -> Params:
    ks = jax.random.split(key, cfg.layers * 3 + 2)
    params: Params = {
        "embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * 1.0,
        "final_norm": rmsnorm_init(cfg.d_model),
        "blocks": [],
    }
    for i in range(cfg.layers):
        k_attn, k_ff0, k_ff1 = ks[1 + 3 * i:4 + 3 * i]
        kf = jax.random.split(k_ff1, 2)
        params["blocks"].append({
            "ln_attn": rmsnorm_init(cfg.d_model),
            "attn": _attn_init(k_attn, cfg, with_rel_bias=(i == 0)),
            "ln_ff": rmsnorm_init(cfg.d_model),
            "wi_0": linear_init(k_ff0, cfg.d_model, cfg.d_ff, bias=False),
            "wi_1": linear_init(kf[0], cfg.d_model, cfg.d_ff, bias=False),
            "wo": linear_init(kf[1], cfg.d_ff, cfg.d_model, bias=False),
        })
    return params


def _self_attention(p: Params, x: jax.Array, bias: jax.Array,
                    mask: Optional[jax.Array], cfg: T5Config) -> jax.Array:
    b, s, _ = x.shape
    def heads(v):
        return v.reshape(b, s, cfg.heads, cfg.d_kv).transpose(0, 2, 1, 3)
    q = heads(linear(p["q"], x))
    k = heads(linear(p["k"], x))
    v = heads(linear(p["v"], x))
    # NO 1/sqrt(d) scaling (T5 convention)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision="highest") + bias
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype, precision="highest")
    out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.heads * cfg.d_kv)
    return linear(p["o"], out)


def apply(params: Params, token_ids: jax.Array,
          cfg: T5Config = T5_XXL,
          attention_mask: Optional[jax.Array] = None,
          dtype=jnp.float32) -> jax.Array:
    """token_ids (B, S) -> encoder hidden states (B, S, d_model)."""
    s = token_ids.shape[1]
    x = params["embed"].astype(dtype)[token_ids]

    pos = jnp.arange(s)
    rel = pos[None, :] - pos[:, None]              # key - query
    buckets = relative_position_bucket(rel, cfg.rel_buckets,
                                       cfg.rel_max_distance)
    bias_table = params["blocks"][0]["attn"]["rel_bias"].astype(jnp.float32)
    bias = bias_table[buckets]                     # (S, S, H)
    bias = bias.transpose(2, 0, 1)[None]           # (1, H, S, S)

    for block in params["blocks"]:
        h = rmsnorm(block["ln_attn"], x, cfg.layer_norm_eps)
        x = x + _self_attention(block["attn"], h, bias, attention_mask, cfg)
        h = rmsnorm(block["ln_ff"], x, cfg.layer_norm_eps)
        gated = jax.nn.gelu(linear(block["wi_0"], h), approximate=True) \
            * linear(block["wi_1"], h)
        x = x + linear(block["wo"], gated)
    return rmsnorm(params["final_norm"], x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def convert_hf_t5(state_dict, cfg: T5Config) -> Params:
    """transformers ``T5EncoderModel`` state dict -> param tree."""
    sd = {k.removeprefix("encoder."): v for k, v in state_dict.items()}
    params: Params = {
        "embed": jnp.asarray(_t(state_dict["shared.weight"])),
        "final_norm": {"scale": jnp.asarray(_t(sd["final_layer_norm.weight"]))},
        "blocks": [],
    }
    i = 0
    while f"block.{i}.layer.0.SelfAttention.q.weight" in sd:
        pre = f"block.{i}"
        attn = {
            "q": {"w": jnp.asarray(_t(sd[f"{pre}.layer.0.SelfAttention.q.weight"]).T)},
            "k": {"w": jnp.asarray(_t(sd[f"{pre}.layer.0.SelfAttention.k.weight"]).T)},
            "v": {"w": jnp.asarray(_t(sd[f"{pre}.layer.0.SelfAttention.v.weight"]).T)},
            "o": {"w": jnp.asarray(_t(sd[f"{pre}.layer.0.SelfAttention.o.weight"]).T)},
        }
        rb = f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"
        if rb in sd:
            attn["rel_bias"] = jnp.asarray(_t(sd[rb]))
        params["blocks"].append({
            "ln_attn": {"scale": jnp.asarray(_t(sd[f"{pre}.layer.0.layer_norm.weight"]))},
            "attn": attn,
            "ln_ff": {"scale": jnp.asarray(_t(sd[f"{pre}.layer.1.layer_norm.weight"]))},
            "wi_0": {"w": jnp.asarray(_t(sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"]).T)},
            "wi_1": {"w": jnp.asarray(_t(sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"]).T)},
            "wo": {"w": jnp.asarray(_t(sd[f"{pre}.layer.1.DenseReluDense.wo.weight"]).T)},
        })
        i += 1
    return params
