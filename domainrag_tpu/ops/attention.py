"""Blockwise (flash) attention for TPU — the MMDiT hot op (B5).

The reference relies on CUDA SDPA inside diffusers' Flux attention
(joint 512-text + 4096-image token sequences at 1024 px, ~31k tokens at the
2800 px fill cap — outpainting_updown_sampling_redux.py:104-108). Here it is
a Pallas online-softmax kernel: O(seq) memory, f32 accumulation, bf16
operands on the MXU.

API: :func:`attention` picks the Pallas kernel on TPU and the dense XLA
reference elsewhere; both take (B, H, S, D) and return (B, H, S, D).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(q, k, v, causal: bool = False):
    """Dense attention oracle; f32 softmax, any backend."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision="highest") * scale
    if causal:
        s_q, s_k = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s_q, s_k), jnp.bool_))
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=q.dtype, precision="highest")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_buf, l_buf,
                  *, scale: float, kv_len: int, block_kv: int,
                  causal: bool, block_q: int):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)

    q = q_ref[0]                     # (bq, D)
    k = k_ref[0]                     # (bkv, D)
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # mask kv padding (and causal structure if requested)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_kv
    mask = kv_pos < kv_len
    if causal:
        iq = pl.program_id(1)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
        mask = mask & (kv_pos <= q_pos)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_buf[:]                # (bq, 128) broadcast copies
    m_cur = jnp.max(s, axis=1, keepdims=True)          # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp(m_prev - m_new)                     # (bq, 128)
    p = jnp.exp(s - m_new[:, :1])                      # (bq, bkv) f32
    # fully-masked rows/blocks: s == m_new == NEG_INF would give exp(0)=1
    p = jnp.where(mask, p, 0.0)
    l_new = l_buf[:] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), m_prev.shape)
    acc[:] = acc[:] * corr[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_buf[:] = m_new
    l_buf[:] = l_new

    @pl.when(ik == n_k - 1)
    def _():
        # guard l=0 (a row with every position masked) against 0/0
        denom = jnp.maximum(l_buf[:][:, :1], 1e-30)
        o_ref[0] = (acc[:] / denom).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_kv",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool = False,
                    block_q: int = 256, block_kv: int = 512,
                    interpret: bool = False) -> jax.Array:
    """(B, H, Sq, D) x (B, H, Skv, D) -> (B, H, Sq, D).

    D is padded to a multiple of 128 lanes; seq dims padded to the block
    sizes with masking, so arbitrary (even prime) lengths are exact.
    """
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, 128)
    bq = min(block_q, _round_up(s_q, 8))
    bkv = min(block_kv, _round_up(s_kv, 128))
    sq_pad = _round_up(s_q, bq)
    skv_pad = _round_up(s_kv, bkv)

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - d)))

    qp = pad(q, sq_pad).reshape(b * h, sq_pad, d_pad)
    kp = pad(k, skv_pad).reshape(b * h, skv_pad, d_pad)
    vp = pad(v, skv_pad).reshape(b * h, skv_pad, d_pad)

    grid = (b * h, sq_pad // bq, skv_pad // bkv)
    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=s_kv, block_kv=bkv,
        causal=causal, block_q=bq)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d_pad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(b, h, sq_pad, d_pad)
    return out[:, :, :s_q, :d]


# ---------------------------------------------------------------------------
# tensor-parallel composition: a Pallas kernel inside pjit would force its
# operands replicated; under TP the heads axis is model-sharded, so the
# kernel must run per-shard via shard_map. Stages set the TP context once
# (parallel.deploy.shard_bundle does this) and every attention call inside
# the traced model routes through the head-sharded wrapper.
# ---------------------------------------------------------------------------

import contextlib as _contextlib
import threading as _threading

_TP_CONTEXT = _threading.local()


_FORCE_REFERENCE = _threading.local()


@_contextlib.contextmanager
def dense_attention():
    """Force the differentiable dense path inside this context. The Pallas
    flash kernel has no VJP yet (roadmap), so TRAINING must run dense
    attention — flow_match wraps its loss with this."""
    prev = getattr(_FORCE_REFERENCE, "value", False)
    _FORCE_REFERENCE.value = True
    try:
        yield
    finally:
        _FORCE_REFERENCE.value = prev


@_contextlib.contextmanager
def tp_attention(mesh, axis: str = "model"):
    """Within this context, attention() runs head-sharded over ``axis``."""
    prev = getattr(_TP_CONTEXT, "value", None)
    _TP_CONTEXT.value = (mesh, axis)
    try:
        yield
    finally:
        _TP_CONTEXT.value = prev


def _tp_sharded(q, k, v, causal: bool):
    from jax.sharding import PartitionSpec as P
    mesh, axis = _TP_CONTEXT.value
    n = mesh.shape[axis]
    if n <= 1 or q.shape[1] % n != 0:
        return None

    def local(q, k, v):
        if jax.default_backend() == "tpu" and \
                not getattr(_FORCE_REFERENCE, "value", False):
            return flash_attention(q, k, v, causal=causal)
        return attention_reference(q, k, v, causal=causal)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(None, axis),) * 3,
                       out_specs=P(None, axis),
                       check_vma=False)
    return fn(q, k, v)


def attention(q, k, v, causal: bool = False, mask=None,
              force_reference: bool = False):
    """Dispatch: Pallas flash kernel on TPU (no custom mask), dense
    reference otherwise; head-sharded via shard_map inside a
    :func:`tp_attention` context. ``mask`` forces the reference path."""
    force_reference = force_reference or getattr(_FORCE_REFERENCE, "value",
                                                 False)
    if mask is None and getattr(_TP_CONTEXT, "value", None) is not None:
        out = _tp_sharded(q, k, v, causal)
        if out is not None:
            return out
    if mask is not None or force_reference or \
            jax.default_backend() != "tpu":
        if mask is not None:
            scale = 1.0 / math.sqrt(q.shape[-1])
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32,
                                precision="highest") * scale
            logits = jnp.where(mask, logits, NEG_INF)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                              preferred_element_type=q.dtype,
                              precision="highest")
        return attention_reference(q, k, v, causal=causal)
    return flash_attention(q, k, v, causal=causal)
