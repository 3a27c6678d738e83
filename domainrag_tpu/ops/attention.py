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
LOG2_E = 1.4426950408889634
LN_2 = 0.6931471805599453


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


def _flash_kernel(kv_valid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  acc, m_buf, l_buf,
                  *, scale: float, block_kv: int,
                  causal: bool, block_q: int, masked: bool):
    """Online-softmax tile. Base-2 exponentials throughout (exp2 is the
    native VPU transcendental; log2(e) is folded into ``scale``), converted
    to a natural-log LSE only at the final write. ``masked=False`` (the
    production Flux shapes: KV length a multiple of the block, static
    validity) skips the whole iota/compare/where chain — the softmax is
    the kernel's VPU bottleneck, and mask arithmetic is a per-element cost
    on the (bq, bkv) tile."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)

    q = q_ref[0]                     # (bq, D) — scale pre-folded into q
    k = k_ref[0]                     # (bkv, D)
    v = v_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if masked:
        # mask kv padding (and causal structure if requested); the validity
        # boundary is a runtime scalar so ring attention can fold blocks
        # whose valid length depends on the (traced) ring step
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + ik * block_kv
        mask = kv_pos < kv_valid_ref[0]
        if causal:
            iq = pl.program_id(1)
            q_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + iq * block_q
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

    m_prev = m_buf[:]                # (bq, 128) broadcast copies
    m_cur = jnp.max(s, axis=1, keepdims=True)          # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp2(m_prev - m_new)                    # (bq, 128)
    p = jnp.exp2(s - m_new[:, :1])                     # (bq, bkv) f32
    if masked and causal:
        # a row whose every position is masked in this tile has
        # s == m_new == NEG_INF -> exp2(0) = 1; zero it explicitly.
        # (kv-padding-only masks need no fixup: exp2(NEG_INF - m) == 0.)
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
        lse_ref[0] = m_buf[:] * LN_2 + jnp.log(jnp.maximum(l_buf[:], 1e-30))


def _flash_kernel_1pass(kv_valid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                        *, scale: float, block_kv: int,
                        causal: bool, block_q: int, masked: bool):
    """Whole-KV-in-one-block specialization (the tuned policy at <=4608
    tokens): plain softmax, no running-max scratch, no correction chain."""
    q = q_ref[0]                     # scale pre-folded into q
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if masked:
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kv_pos < kv_valid_ref[0]
        if causal:
            iq = pl.program_id(1)
            q_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + iq * block_q
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)              # (bq, 1)
    p = jnp.exp2(s - m)
    if masked and causal:
        p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)              # (bq, 1)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = m * LN_2 + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tuned_blocks(s_kv: int):
    """Measured block policy (tools/tpu_experiments.py flash2/flash3,
    v5e, round 3, slope-calibrated): a SINGLE KV pass (block_kv = whole
    padded KV) wins at every production shape once the Mosaic VMEM budget
    is raised (v5e has 128 MiB; the scores tile at bq=512 x 16896 kv is
    34.6 MB):

        4608 tokens (1024 px):  bq=512  1.33 ms/layer (99 % MFU)
        8448 tokens (fill):     bq=256  6.03 ms (74 %) [512: 6.18]
        16896 tokens (2048 px): bq=512 21.63 ms (82 %) [256: 23.18]

    bq is therefore 512 except in the mid band around 8448 where 256
    measured best. Beyond ~49k tokens (past the 2800 px fill cap) the
    scores tile would exceed the VMEM budget — fall back to the fewest
    even KV tiles <=4608 (bounded padding waste)."""
    skv_pad = _round_up(s_kv, 128)
    if s_kv <= 49152:
        bq = 512 if (s_kv <= 4608 or s_kv > 11264) else 256
        return bq, skv_pad
    n_tiles = -(-s_kv // 4608)
    return 256, _round_up(-(-s_kv // n_tiles), 128)


def _plan(q, k, block_q, block_kv):
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    d_pad = _round_up(d, 128)
    bq = min(block_q, _round_up(s_q, 8))
    bkv = min(block_kv, _round_up(s_kv, 128))
    return (b, h, s_q, s_kv, d, d_pad, bq, bkv,
            _round_up(s_q, bq), _round_up(s_kv, bkv))


def _pad_to(x, s_pad, d_pad):
    d = x.shape[3]
    return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                       (0, d_pad - d)))


def _flash_forward(q, k, v, causal, block_q, block_kv, interpret,
                   kv_valid=None):
    """Returns (out (B,H,Sq,D), lse (BH, sq_pad, 128) f32 broadcast).

    ``kv_valid``: optional runtime int32 scalar — kv positions >= it are
    masked (defaults to the static kv length)."""
    b, h, s_q, s_kv, d, d_pad, bq, bkv, sq_pad, skv_pad = _plan(
        q, k, block_q, block_kv)
    # base-2 logits: exp2 is the native VPU transcendental; log2(e) folds
    # into the QK^T scale for free (the kernels convert the LSE back to
    # natural units on the final write).  The scale is pre-multiplied into
    # q OUTSIDE the kernel: one (S, D) elementwise pass instead of a
    # (bq, bkv) logits-tile pass per grid cell (the kernel is VPU-bound on
    # the softmax; the logits tile is 36x larger than the q tile at the
    # 4608-token Flux shape).  f32 multiply, then back to the input dtype.
    scale = LOG2_E / math.sqrt(d)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = _pad_to(q, sq_pad, d_pad).reshape(b * h, sq_pad, d_pad)
    kp = _pad_to(k, skv_pad, d_pad).reshape(b * h, skv_pad, d_pad)
    vp = _pad_to(v, skv_pad, d_pad).reshape(b * h, skv_pad, d_pad)
    # masking is only needed when the kv extent is not exactly the padded
    # block span (kv padding), the caller supplies a runtime validity
    # bound (ring attention), or the structure is causal — otherwise the
    # whole per-element mask chain is skipped (it is pure VPU overhead on
    # the production Flux shapes, whose 4608-token KV is block-aligned)
    masked = causal or (kv_valid is not None) or (skv_pad != s_kv)
    if kv_valid is None:
        kv_valid = s_kv
    kv_valid_arr = jnp.full((1,), kv_valid, jnp.int32)

    n_kv_blocks = skv_pad // bkv
    grid = (b * h, sq_pad // bq, n_kv_blocks)
    if n_kv_blocks == 1:
        kernel = functools.partial(
            _flash_kernel_1pass, scale=scale, block_kv=bkv,
            causal=causal, block_q=bq, masked=masked)
        scratch_shapes = []
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, block_kv=bkv,
            causal=causal, block_q=bq, masked=masked)
        scratch_shapes = [
            pltpu.VMEM((bq, d_pad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d_pad), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_pad, 128), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB VMEM; the default Mosaic budget rejects the
            # larger single-pass scores tiles that measure fastest
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
        interpret=interpret,
    )(kv_valid_arr, qp, kp, vp)
    out = out.reshape(b, h, sq_pad, d_pad)[:, :, :s_q, :d]
    return out, lse


def flash_attention_lse(q, k, v, kv_valid=None,
                        block_q: int = None, block_kv: int = None,
                        interpret: bool = False):
    """Flash forward returning (out (B,H,Sq,D), lse (B,H,Sq,1) f32) — the
    partial-softmax form ring attention merges across sequence shards.
    Not differentiable (serving path). Default blocks: measured policy
    (:func:`_tuned_blocks`)."""
    tq, tkv = _tuned_blocks(k.shape[2])
    block_q = tq if block_q is None else block_q
    block_kv = tkv if block_kv is None else block_kv
    b, h, s_q, _ = q.shape
    out, lse = _flash_forward(q, k, v, False, block_q, block_kv, interpret,
                              kv_valid=kv_valid)
    lse = lse.reshape(b, h, -1, 128)[:, :, :s_q, :1]
    return out, lse


def _bwd_common(q, k, lse, mask, scale):
    """Recompute softmax probs for one (q block, kv block) pair in f32."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask, s, NEG_INF)
    p = jnp.exp(s - lse[:, :1])
    return jnp.where(mask, p, 0.0)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_acc,
                         *, scale, kv_len, block_kv, causal, block_q):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    kv_pos = jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], k.shape[0]), 1) + ik * block_kv
    mask = kv_pos < kv_len
    if causal:
        iq = pl.program_id(1)
        q_pos = jax.lax.broadcasted_iota(
            jnp.int32, mask.shape, 0) + iq * block_q
        mask = mask & (kv_pos <= q_pos)

    p = _bwd_common(q, k, lse, mask, scale)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, :1])
    dq_acc[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ik == n_k - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc,
                          *, scale, kv_len, block_kv, causal, block_q):
    iq = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    ikv = pl.program_id(1)
    kv_pos = jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], k.shape[0]), 1) + ikv * block_kv
    mask = kv_pos < kv_len
    if causal:
        q_pos = jax.lax.broadcasted_iota(
            jnp.int32, mask.shape, 0) + iq * block_q
        mask = mask & (kv_pos <= q_pos)

    p = _bwd_common(q, k, lse, mask, scale)
    # dv += p^T @ do
    dv_acc[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, :1])
    # dk += ds^T @ q * scale
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(res, g, causal, block_q, block_kv, interpret):
    q, k, v, out, lse = res
    # the backward kernels keep ~3x the forward's VMEM live per (bq, bkv)
    # tile (p + dp + dk/dv accumulators) — cap the kv block so the tuned
    # single-pass forward blocks don't blow the 16 MB budget here
    block_kv = min(block_kv, 1024)
    b, h, s_q, s_kv, d, d_pad, bq, bkv, sq_pad, skv_pad = _plan(
        q, k, block_q, block_kv)
    scale = 1.0 / math.sqrt(d)
    qp = _pad_to(q, sq_pad, d_pad).reshape(b * h, sq_pad, d_pad)
    kp = _pad_to(k, skv_pad, d_pad).reshape(b * h, skv_pad, d_pad)
    vp = _pad_to(v, skv_pad, d_pad).reshape(b * h, skv_pad, d_pad)
    dop = _pad_to(g, sq_pad, d_pad).reshape(b * h, sq_pad, d_pad)

    # delta = rowsum(dO * O), broadcast over 128 lanes (plain XLA: cheap)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - s_q)))
    delta = jnp.broadcast_to(delta.reshape(b * h, sq_pad, 1),
                             (b * h, sq_pad, 128))

    common = dict(scale=scale, kv_len=s_kv, block_kv=bkv, causal=causal,
                  block_q=bq)
    q_spec = pl.BlockSpec((1, bq, d_pad), lambda bh, iq, ik: (bh, iq, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bkv, d_pad), lambda bh, iq, ik: (bh, ik, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, bq, 128), lambda bh, iq, ik: (bh, iq, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(b * h, sq_pad // bq, skv_pad // bkv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, lse_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    # dk/dv: kv blocks outer, q blocks inner
    q_spec2 = pl.BlockSpec((1, bq, d_pad), lambda bh, ik, iq: (bh, iq, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, bkv, d_pad), lambda bh, ik, iq: (bh, ik, 0),
                            memory_space=pltpu.VMEM)
    lse_spec2 = pl.BlockSpec((1, bq, 128), lambda bh, ik, iq: (bh, iq, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(b * h, skv_pad // bkv, sq_pad // bq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, lse_spec2,
                  lse_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct((b * h, skv_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, skv_pad, d_pad), v.dtype)],
        scratch_shapes=[pltpu.VMEM((bkv, d_pad), jnp.float32),
                        pltpu.VMEM((bkv, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    def unpad_q(x):
        return x.reshape(b, h, sq_pad, d_pad)[:, :, :s_q, :d]

    def unpad_kv(x):
        return x.reshape(b, h, skv_pad, d_pad)[:, :, :s_kv, :d]

    return unpad_q(dq), unpad_kv(dk), unpad_kv(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_diff(q, k, v, causal, block_q, block_kv, interpret):
    out, _ = _flash_forward(q, k, v, causal, block_q, block_kv, interpret)
    return out


def _flash_fwd_rule(q, k, v, causal, block_q, block_kv, interpret):
    out, lse = _flash_forward(q, k, v, causal, block_q, block_kv, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(causal, block_q, block_kv, interpret, res, g):
    return _flash_backward(res, g, causal, block_q, block_kv, interpret)


_flash_attention_diff.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_kv",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool = False,
                    block_q: int = None, block_kv: int = None,
                    interpret: bool = False) -> jax.Array:
    """(B, H, Sq, D) x (B, H, Skv, D) -> (B, H, Sq, D).

    D is padded to a multiple of 128 lanes; seq dims padded to the block
    sizes with masking, so arbitrary (even prime) lengths are exact.
    Differentiable: a custom VJP runs the flash backward (dq and dk/dv
    kernels with the stored logsumexp), so training uses the same
    O(seq)-memory path as inference. Default blocks come from the
    measured policy (:func:`_tuned_blocks`); the backward caps its kv
    block independently for VMEM.
    """
    tq, tkv = _tuned_blocks(k.shape[2])
    block_q = tq if block_q is None else block_q
    block_kv = tkv if block_kv is None else block_kv
    return _flash_attention_diff(q, k, v, causal, block_q, block_kv,
                                 interpret)


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
    """Force the dense XLA path inside this context (debug/fallback; the
    flash kernel is differentiable via its custom VJP, so training does
    NOT need this)."""
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


_SP_CONTEXT = _threading.local()


@_contextlib.contextmanager
def sp_attention(mesh, axis: str = "data"):
    """Within this context, attention() runs sequence-sharded over ``axis``
    via ring attention (ops.ring_attention) — the >=2048 px fill regime
    (~31k joint tokens at the 2800 px cap,
    outpainting_updown_sampling_redux.py:104-108). Composes with
    :func:`tp_attention`: heads shard over the TP axis of the same mesh,
    sequence blocks ring over the SP axis."""
    prev = getattr(_SP_CONTEXT, "value", None)
    _SP_CONTEXT.value = (mesh, axis)
    try:
        yield
    finally:
        _SP_CONTEXT.value = prev


def _sp_sharded(q, k, v, causal: bool):
    if causal:
        return None  # ring fold here is non-causal (MMDiT is bidirectional)
    mesh, axis = _SP_CONTEXT.value
    if mesh.shape[axis] <= 1:
        return None
    head_axis = None
    tp = getattr(_TP_CONTEXT, "value", None)
    if tp is not None and tp[0] is mesh and tp[1] != axis \
            and mesh.shape[tp[1]] > 1 and q.shape[1] % mesh.shape[tp[1]] == 0:
        head_axis = tp[1]
    from .ring_attention import ring_attention_padded
    return ring_attention_padded(q, k, v, mesh, axis=axis,
                                 head_axis=head_axis)


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
    if mask is None and getattr(_SP_CONTEXT, "value", None) is not None:
        out = _sp_sharded(q, k, v, causal)
        if out is not None:
            return out
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
