"""Shared functional building blocks for all models.

Models in this framework are pure functions over nested param dicts
(pytrees): ``init(key, cfg) -> params`` and ``apply(params, x, ...)``.
This keeps pjit sharding rules trivial (path-based PartitionSpecs) and
avoids framework state. Compute dtype is a caller choice; params are
stored f32 and cast at use (bf16 on the MXU for the big models).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def lecun_init(key, shape, fan_in, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * math.sqrt(1.0 / fan_in)


def linear_init(key, d_in, d_out, bias=True, std=None) -> Params:
    if std is None:
        std = math.sqrt(1.0 / d_in)
    kw, _ = jax.random.split(key)
    p = {"w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


# Serving mode (models.quant): when enabled, quantized linears also
# quantize activations per token to int8 and run the dot as int8×int8 on
# the MXU — 2× peak over bf16 on v5e (394 TOPS vs 197 TFLOPS). Read at
# trace time; toggle BEFORE jit-compiling the serving graph. This is a
# PROCESS-WIDE mode: toggling drops every compiled executable in the
# process (jax.clear_caches — minutes of recompiles through a remote-
# compile tunnel), so flip it once at process start, not per call.
_INT8_ACTIVATIONS = False


def set_int8_activations(enabled: bool) -> None:
    global _INT8_ACTIVATIONS
    if bool(enabled) == _INT8_ACTIVATIONS:
        return
    _INT8_ACTIVATIONS = bool(enabled)
    # the flag is read at TRACE time: jitted callables compiled before the
    # toggle would silently keep the old path — drop compiled caches so
    # every entry point retraces under the new mode
    jax.clear_caches()


# All matmuls request precision="highest": a no-op for bf16 operands (the
# MXU consumes bf16 natively) but required for f32 parity paths — default
# backend matmul precision truncates f32 to bf16 passes on both CPU (oneDNN)
# and TPU, which breaks retrieval index exactness.
def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        if _INT8_ACTIVATIONS:
            if jax.default_backend() == "tpu":
                # native int8 MXU path (394 TOPS vs 197 bf16 TFLOPS):
                # Mosaic lowers the int8 dot to it, XLA does not —
                # 1.4-1.9x per hot GEMM (BENCH_NOTES). Bit-identical to
                # the XLA formulation below; returns None on ineligible
                # shapes (small M, untileable K/N) or when disabled.
                from ..ops import int8_gemm
                y = int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"],
                                          bias=p.get("b"))
                if y is not None:
                    return y
            # W8A8: dynamic symmetric per-token activation quant, int8
            # MXU dot, rescale by (token amax/127) · per-column w_s
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            amax = jnp.maximum(amax, 1e-12)
            xq = jnp.clip(jnp.round(xf / amax), -127, 127).astype(jnp.int8)
            acc = jnp.dot(xq, p["w_q"], preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * amax
                 * p["w_s"].astype(jnp.float32)).astype(x.dtype)
        else:
            # weight-only int8 (models.quant): w = w_q * diag(s), so
            # y = (x @ w_q) * s — the dequantized weight never
            # materializes
            y = jnp.dot(x, p["w_q"].astype(x.dtype),
                        preferred_element_type=x.dtype)
            y = y * p["w_s"].astype(x.dtype)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype),
                    preferred_element_type=x.dtype, precision="highest")
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm_init(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with f32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def rmsnorm_init(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32)}


def rmsnorm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"]).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# conv / pooling (NHWC; XLA tiles convs onto the MXU)
# ---------------------------------------------------------------------------

def conv_init(key, kh, kw, c_in, c_out, bias=True, groups=1) -> Params:
    fan_in = kh * kw * (c_in // groups)
    p = {"w": jax.random.normal(key, (kh, kw, c_in // groups, c_out),
                                jnp.float32) * math.sqrt(1.0 / fan_in)}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv2d(p: Params, x: jax.Array, stride=1, padding="SAME",
           groups: int = 1) -> jax.Array:
    """NHWC conv. ``padding`` is "SAME"/"VALID" or explicit
    ((top, bottom), (left, right))."""
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype, precision="highest")
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_transpose(p: Params, x: jax.Array, stride=2,
                     padding="SAME") -> jax.Array:
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest")
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def batchnorm_init(dim) -> Params:
    """Inference-mode batchnorm (running statistics)."""
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32)}


def batchnorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return ((xf - p["mean"]) * inv + p["bias"]).astype(x.dtype)


def groupnorm_init(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def groupnorm(p: Params, x: jax.Array, groups: int = 32,
              eps: float = 1e-6) -> jax.Array:
    """GroupNorm over NHWC (stats per group across H, W and group channels),
    f32 statistics.

    Single-reduction formulation: mean and E[x²] in one fused pass (XLA
    fuses the bf16→f32 cast into the reductions — the f32 tensor never
    materializes), then ONE elementwise pass applying per-channel
    a = rsqrt·scale and b = bias − mean·a. The naive two-pass version
    (mean, then var, then normalize, then affine) cost 64 of the 145 ms
    of a 1024 px VAE decode (tools/tpu_experiments.py exp_vae): at
    1024²×128 each materialized f32 intermediate is 537 MB of HBM
    traffic. E[x²]−mean² in f32 is safe at activation scales (|x| ≲ 1e2:
    worst-case cancellation leaves ~7 significant digits)."""
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, cg)
    mean = jnp.mean(xf, axis=(1, 2, 4))                      # (B, G)
    m2 = jnp.mean(jnp.square(xf), axis=(1, 2, 4))            # (B, G)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                           # (B, G)
    # per-(batch, channel) affine: y = x * a + b
    inv_c = jnp.repeat(inv, cg, axis=-1)                     # (B, C)
    mean_c = jnp.repeat(mean, cg, axis=-1)
    a = inv_c * p["scale"][None]
    off = p["bias"][None] - mean_c * a
    y = x.astype(jnp.float32) * a[:, None, None, :] + off[:, None, None, :]
    return y.astype(x.dtype)


def max_pool(x: jax.Array, window: int, stride: int,
             padding) -> jax.Array:
    """NHWC max pool; ``padding`` explicit ((t, b), (l, r)) or SAME/VALID.
    Pads with -inf (torch semantics for MaxPool2d)."""
    if isinstance(padding, (tuple, list)):
        pads = ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
    else:
        pads = padding
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads)


def avg_pool(x: jax.Array, window: int, stride: int,
             padding="VALID") -> jax.Array:
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1), padding=padding)
    return s / (window * window)


# ---------------------------------------------------------------------------
# attention (dense reference; Pallas flash attention lives in ops.attention)
# ---------------------------------------------------------------------------

def mha_init(key, dim, bias=True) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], dim, dim, bias=bias),
        "k": linear_init(ks[1], dim, dim, bias=bias),
        "v": linear_init(ks[2], dim, dim, bias=bias),
        "o": linear_init(ks[3], dim, dim, bias=bias),
    }


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def sdpa(q, k, v, mask: Optional[jax.Array] = None) -> jax.Array:
    """Scaled dot-product attention over (B, H, S, Dh); f32 softmax."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision="highest") * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=q.dtype, precision="highest")


def mha(p: Params, x: jax.Array, n_heads: int, mask=None,
        attn_fn=None) -> jax.Array:
    """``n_heads`` is static config, deliberately not stored in params (jit
    would trace it)."""
    q = split_heads(linear(p["q"], x), n_heads)
    k = split_heads(linear(p["k"], x), n_heads)
    v = split_heads(linear(p["v"], x), n_heads)
    fn = attn_fn if attn_fn is not None else sdpa
    out = fn(q, k, v, mask)
    return linear(p["o"], merge_heads(out))


def causal_mask(seq: int) -> jax.Array:
    return jnp.tril(jnp.ones((1, 1, seq, seq), jnp.bool_))


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) if hasattr(x, "shape") else 0
               for x in jax.tree_util.tree_leaves(params))
