"""Fused MMDiT attention path — kills the per-block "surroundings" cost.

Round-3 in-situ slope measurement (BENCH_NOTES, tools/tpu_experiments.py
insitu2): the bare flash kernel is 1.3-1.7 ms/layer at the 1024 px Flux
shape, but the attention SECTION of a block costs 3.2-3.4 ms — the other
~1.9 ms/block is the XLA chain around it: the (B,S,3,H,d) qkv split
transposes, f32 qk-rmsnorm, the interleaved RoPE pair shuffles
(stack/reshape), the flash prescale pass, and the (B,H,S,d)->(B,S,Hd)
output transpose. Across 57 blocks that is ~20 % of the denoise step.

This module replaces the whole chain with ONE Pallas kernel per variant
that keeps the fused qkv GEMM's natural (B, S, H*d) lane layout end to
end. The kernel grid is (B, H, q-tiles); every q/k/v operand is a
128-lane head slice of the raw (B, S, 3*H*d) GEMM output, so per-head
layout splits never materialize:

- q tiles get qk-rmsnorm + interleaved RoPE + the flash q-prescale
  INLINE (each q element is visited exactly once anyway). The pair swap
  of the rotation is a 128x128 permutation MATMUL on the MXU — no
  stride-2 gathers, no VPU lane rolls.
- k is normed+roped ONCE per (batch, head) into a VMEM scratch at the
  first q-tile (``@pl.when(iq == 0)``, the flash accumulator-init
  pattern — the TPU grid walks q-tiles innermost, so the scratch
  persists across the sweep). v is consumed straight from the GEMM
  output lanes, untouched.
- the joint (double-block) variant takes the txt and img streams as
  SEPARATE qkv inputs and folds the softmax across both score tiles —
  the [txt; img] concat never exists anywhere. The output block spec
  writes (B, S, H*d) directly, which the out-proj GEMM consumes with no
  transpose.

A first cut staged a separate "prep" kernel writing normed/roped q/k/v
back to HBM; measured on-chip it gave +0.37 ms/layer on the double block
and LOST 0.40 ms on the single (the extra ~170 MB/layer HBM round-trip).
The inline version removes that traffic entirely.

The reference eager-torch path this replaces is diffusers'
FluxAttnProcessor inside the pipelines the reference drives
(batch_generate_flux_kshot.py:148-151, 467-474). Numerics match the
unfused path (models/flux/model.py) to bf16 rounding; gradients are exact
by construction — the custom VJP recomputes the unfused composition.

Dispatch: the fused path engages on TPU for head_dim 128, bf16, <=49k
tokens, outside TP/SP contexts; everything else falls back to the
unfused composition (which routes through ops.attention's dispatcher and
so keeps TP/SP/CPU behavior unchanged).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import attention as _attn
from .attention import LOG2_E, NEG_INF, attention

_EPS = 1e-6             # qk-rmsnorm epsilon (models.common.rmsnorm)
# One-pass ceiling, MEASURED: 16896 tokens (2048 px fill) compiles inside
# the 100 MB Mosaic VMEM budget and wins (24.8 vs 28.6 ms/layer); the
# 31137-token 2800 px cap does NOT compile (score tiles + f32 RoPE tables
# + KV scratch exceed VMEM). Shapes above the gate fall back to the
# unfused composition whose ops.attention flash path multi-passes KV and
# is proven to 31k+ (tools/tpu_experiments.py exp_mmdithires).
_MAX_ONEPASS = 17408

# SageAttention-style int8 QK (arXiv:2410.02367's recipe, re-derived for
# the TPU int8 MXU): after the in-kernel qk-rmsnorm+RoPE, quantize q per
# row and K per (batch, head) tensor to int8 and run the score dot as
# int8*int8 -> int32 — measured 328 TOP/s vs 189 TF/s bf16 at the
# full-layer 4608-token shape (1.73x on the QK half of attention). The
# softmax dequantizes with the rank-1 (row x scalar) rescale before the
# f32 exp2; P·V stays bf16 (probs quantization hurts accuracy for no
# bandwidth win). Serving-only approximation: scores carry ~1/254
# relative rounding; the backward still recomputes through the exact
# reference composition. Off by default; enable with set_int8_qk(True)
# (CLI --int8_qk; read at trace time like common.set_int8_activations).
_INT8_QK = False


def set_int8_qk(enabled: bool) -> None:
    global _INT8_QK
    if bool(enabled) == _INT8_QK:
        return
    _INT8_QK = bool(enabled)
    jax.clear_caches()


def int8_qk_enabled() -> bool:
    return _INT8_QK


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bq(s_total: int) -> int:
    """Measured q-block policy (mirrors ops.attention._tuned_blocks)."""
    return 512 if (s_total <= 4608 or s_total > 11264) else 256


# ---------------------------------------------------------------------------
# unfused reference composition (CPU / TP / SP / odd-shape fallback, and the
# backward recompute). Mirrors models/flux/model.py's original block math.
# ---------------------------------------------------------------------------

def _rms(x: jax.Array, w: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + _EPS)
    return (y * w).astype(x.dtype)


def _rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array
                      ) -> jax.Array:
    """x: (B,H,S,D); cos/sin (S, D/2); consecutive-pair rotation."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, None]
    s = sin[None, None]
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    return jnp.stack([out0, out1], axis=-1).reshape(shape).astype(x.dtype)


def _split_heads(qkv: jax.Array, heads: int, head_dim: int):
    b, s, _ = qkv.shape
    qkv = qkv.reshape(b, s, 3, heads, head_dim)
    return (qkv[:, :, 0].transpose(0, 2, 1, 3),
            qkv[:, :, 1].transpose(0, 2, 1, 3),
            qkv[:, :, 2].transpose(0, 2, 1, 3))


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _reference_double(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin,
                      heads: int, head_dim: int):
    tq, tk, tv = _split_heads(txt_qkv, heads, head_dim)
    iq, ik, iv = _split_heads(img_qkv, heads, head_dim)
    tq, tk = _rms(tq, wq_t), _rms(tk, wk_t)
    iq, ik = _rms(iq, wq_i), _rms(ik, wk_i)
    q = jnp.concatenate([tq, iq], axis=2)      # text first (BFL order)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    q = _rope_interleaved(q, cos, sin)
    k = _rope_interleaved(k, cos, sin)
    out = _merge_heads(attention(q, k, v))
    t_len = txt_qkv.shape[1]
    return out[:, :t_len], out[:, t_len:]


def _reference_single(proj, wq, wk, cos, sin, heads: int, head_dim: int):
    qkv = proj[..., :3 * heads * head_dim]
    q, k, v = _split_heads(qkv, heads, head_dim)
    q, k = _rms(q, wq), _rms(k, wk)
    q = _rope_interleaved(q, cos, sin)
    k = _rope_interleaved(k, cos, sin)
    return _merge_heads(attention(q, k, v))


# ---------------------------------------------------------------------------
# RoPE tables in "doubled" form: c2[j] = cos[j//2]; s2[2i] = -sin[i],
# s2[2i+1] = +sin[i]. With xswap[j] = x[j^1] the pair rotation is
# out = x*c2 + xswap*s2 — and xswap is x @ P for the 128x128 pair-swap
# permutation P, a near-free MXU matmul inside the kernel.
# ---------------------------------------------------------------------------

def _expand_tables(cos, sin, head_dim: int):
    c = cos.astype(jnp.float32)
    s = sin.astype(jnp.float32)
    c2 = jnp.repeat(c, 2, axis=-1)
    s2 = jnp.stack([-s, s], axis=-1).reshape(s.shape[0], head_dim)
    return c2, s2


def _pad_rows(x, rows: int):
    return x if x.shape[0] == rows else jnp.pad(
        x, ((0, rows - x.shape[0]), (0, 0)))


def _pad_seq(x, rows: int):
    return x if x.shape[1] == rows else jnp.pad(
        x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))


@functools.lru_cache(maxsize=1)
def _pair_swap_np():
    p = np.zeros((128, 128), np.float32)
    for j in range(128):
        p[j ^ 1, j] = 1.0            # (y @ P)[:, j] = y[:, j^1]
    return p


def _pair_swap_matrix():
    # jnp conversion happens per trace — caching the jnp array would leak
    # a tracer out of the first jit that builds it
    return jnp.asarray(_pair_swap_np())


def _norm_rope(x, w, c2, s2, p_swap, prescale, out_dtype=None):
    """qk-rmsnorm + interleaved RoPE on a (rows, 128) head slice.

    Matches the unfused path's rounding: f32 norm, bf16 round after the
    w scale, f32 rotation, output in x.dtype (or ``out_dtype`` —
    float32 for the int8-QK quantizer, which rounds once itself)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + _EPS)
    y = (y * w).astype(x.dtype).astype(jnp.float32)
    sw = jax.lax.dot_general(y, p_swap, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    r = y * c2 + sw * s2
    if prescale is not None:
        r = r * prescale
    return r.astype(out_dtype if out_dtype is not None else x.dtype)


def _quant_rows(x_f32):
    """Per-row symmetric int8: (rows, 128) f32 -> int8, (rows, 1) f32."""
    s = jnp.maximum(jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
                    / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x_f32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_tensor(x_f32):
    """Per-tensor symmetric int8: (rows, 128) f32 -> int8, scalar f32."""
    s = jnp.maximum(jnp.max(jnp.abs(x_f32)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x_f32 / s), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# one-pass flash kernels over raw qkv GEMM lanes (no lse output — serving
# forward; the backward recomputes through the unfused composition)
# ---------------------------------------------------------------------------

def _seq_kernel(valid_ref, q_ref, k_ref, v_ref, c_ref, s_ref,
                wq_ref, wk_ref, p_ref, o_ref, k_scr, *scr,
                bq: int, masked: bool, prescale: float,
                int8_qk: bool = False):
    iq = pl.program_id(2)
    p_swap = p_ref[:]
    ks_scr = scr[0] if int8_qk else None

    @pl.when(iq == 0)
    def _():
        if int8_qk:
            kf = _norm_rope(k_ref[0], wk_ref[:], c_ref[:], s_ref[:],
                            p_swap, None, out_dtype=jnp.float32)
            kq, sk = _quant_tensor(kf)
            k_scr[:] = kq
            ks_scr[0, 0] = sk
        else:
            k_scr[:] = _norm_rope(k_ref[0], wk_ref[:], c_ref[:], s_ref[:],
                                  p_swap, None)

    if int8_qk:
        qf = _norm_rope(q_ref[0], wq_ref[:], c_ref[pl.ds(iq * bq, bq)],
                        s_ref[pl.ds(iq * bq, bq)], p_swap, prescale,
                        out_dtype=jnp.float32)
        qq, sq = _quant_rows(qf)
        s = jax.lax.dot_general(qq, k_scr[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * (sq * ks_scr[0, 0])
    else:
        q = _norm_rope(q_ref[0], wq_ref[:], c_ref[pl.ds(iq * bq, bq)],
                       s_ref[pl.ds(iq * bq, bq)], p_swap, prescale)
        s = jax.lax.dot_general(q, k_scr[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if masked:
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_pos < valid_ref[0], s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _joint_kernel(valid_ref, qt_ref, qi_ref, kt_ref, ki_ref, vt_ref, vi_ref,
                  ct_ref, st_ref, ci_ref, si_ref,
                  wqt_ref, wkt_ref, wqi_ref, wki_ref, p_ref,
                  o_ref, kt_scr, ki_scr, *scr,
                  t_tiles: int, bq: int, masked: bool, prescale: float,
                  int8_qk: bool = False):
    iq = pl.program_id(2)
    p_swap = p_ref[:]
    kts_scr = scr[0] if int8_qk else None
    kis_scr = scr[1] if int8_qk else None

    @pl.when(iq == 0)
    def _():
        if int8_qk:
            ktf = _norm_rope(kt_ref[0], wkt_ref[:], ct_ref[:], st_ref[:],
                             p_swap, None, out_dtype=jnp.float32)
            ktq, skt = _quant_tensor(ktf)
            kt_scr[:] = ktq
            kts_scr[0, 0] = skt
            kif = _norm_rope(ki_ref[0], wki_ref[:], ci_ref[:], si_ref[:],
                             p_swap, None, out_dtype=jnp.float32)
            kiq, ski = _quant_tensor(kif)
            ki_scr[:] = kiq
            kis_scr[0, 0] = ski
        else:
            kt_scr[:] = _norm_rope(kt_ref[0], wkt_ref[:], ct_ref[:],
                                   st_ref[:], p_swap, None)
            ki_scr[:] = _norm_rope(ki_ref[0], wki_ref[:], ci_ref[:],
                                   si_ref[:], p_swap, None)

    is_txt = iq < t_tiles
    q_raw = jnp.where(is_txt, qt_ref[0], qi_ref[0])
    wq = jnp.where(is_txt, wqt_ref[:], wqi_ref[:])
    off_t = jnp.minimum(iq, t_tiles - 1) * bq
    off_i = jnp.maximum(iq - t_tiles, 0) * bq
    cq = jnp.where(is_txt, ct_ref[pl.ds(off_t, bq)],
                   ci_ref[pl.ds(off_i, bq)])
    sq = jnp.where(is_txt, st_ref[pl.ds(off_t, bq)],
                   si_ref[pl.ds(off_i, bq)])

    if int8_qk:
        qf = _norm_rope(q_raw, wq, cq, sq, p_swap, prescale,
                        out_dtype=jnp.float32)
        qq, sqr = _quant_rows(qf)
        st = jax.lax.dot_general(qq, kt_scr[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) \
            * (sqr * kts_scr[0, 0])
        si = jax.lax.dot_general(qq, ki_scr[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) \
            * (sqr * kis_scr[0, 0])
    else:
        q = _norm_rope(q_raw, wq, cq, sq, p_swap, prescale)
        st = jax.lax.dot_general(q, kt_scr[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        si = jax.lax.dot_general(q, ki_scr[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if masked:
        t_pos = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(t_pos < valid_ref[0], st, NEG_INF)
        i_pos = jax.lax.broadcasted_iota(jnp.int32, si.shape, 1)
        si = jnp.where(i_pos < valid_ref[1], si, NEG_INF)
    m = jnp.maximum(jnp.max(st, axis=1, keepdims=True),
                    jnp.max(si, axis=1, keepdims=True))
    pt = jnp.exp2(st - m)
    pi = jnp.exp2(si - m)
    l = (jnp.sum(pt, axis=1, keepdims=True)
         + jnp.sum(pi, axis=1, keepdims=True))
    o = jax.lax.dot_general(pt.astype(vt_ref.dtype), vt_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
        + jax.lax.dot_general(pi.astype(vi_ref.dtype), vi_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _lane_block(heads: int, which: int, rows: int, row_map):
    """BlockSpec for a (1, rows, 128) head slice of a (B, S, W) array whose
    lanes are [q | k | v | ...] in heads*128 groups; which = 0/1/2."""
    return pl.BlockSpec(
        (1, rows, 128),
        lambda b, h, iq: (b, row_map(iq), which * heads + h),
        memory_space=pltpu.VMEM)


def _tab_spec(rows: int):
    return pl.BlockSpec((rows, 128), lambda b, h, iq: (0, 0),
                        memory_space=pltpu.VMEM)


_W_SPEC = pl.BlockSpec((1, 128), lambda b, h, iq: (0, 0),
                       memory_space=pltpu.VMEM)
_P_SPEC = pl.BlockSpec((128, 128), lambda b, h, iq: (0, 0),
                       memory_space=pltpu.VMEM)


def _flash_params(heads, bq, s_kv_rows, b, n_q):
    return dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n_q * bq * s_kv_rows * 128,
            bytes_accessed=2 * b * heads * (n_q * bq + 2 * s_kv_rows) * 128,
            transcendentals=b * heads * n_q * bq * s_kv_rows),
    )


def _w128(w):
    return w.astype(jnp.float32).reshape(1, 128)


# ---------------------------------------------------------------------------
# fused implementations
# ---------------------------------------------------------------------------

def _fused_double_impl(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin,
                       *, heads: int, interpret: bool,
                       int8_qk: bool = False):
    b, s_txt, _ = txt_qkv.shape
    s_img = img_qkv.shape[1]
    bq = _bq(s_txt + s_img)
    st_pad = _round_up(s_txt, bq)
    si_pad = _round_up(s_img, bq)
    masked = (st_pad != s_txt) or (si_pad != s_img)
    prescale = LOG2_E / math.sqrt(128.0)
    c2, s2 = _expand_tables(cos, sin, 128)
    ct = _pad_rows(c2[:s_txt], st_pad)
    st_t = _pad_rows(s2[:s_txt], st_pad)
    ci = _pad_rows(c2[s_txt:], si_pad)
    si_t = _pad_rows(s2[s_txt:], si_pad)
    txt_qkv = _pad_seq(txt_qkv, st_pad)
    img_qkv = _pad_seq(img_qkv, si_pad)
    t_tiles = st_pad // bq
    i_tiles = si_pad // bq
    n_q = t_tiles + i_tiles
    hd = heads * 128
    kv_row = lambda iq: 0                                     # noqa: E731
    qt_row = lambda iq: jnp.minimum(iq, t_tiles - 1)          # noqa: E731
    qi_row = lambda iq: jnp.clip(iq - t_tiles, 0, i_tiles - 1)  # noqa: E731
    out_spec = pl.BlockSpec((1, bq, 128), lambda b_, h, iq: (b_, iq, h),
                            memory_space=pltpu.VMEM)
    kv_dtype = jnp.int8 if int8_qk else txt_qkv.dtype
    scratch = [pltpu.VMEM((st_pad, 128), kv_dtype),
               pltpu.VMEM((si_pad, 128), kv_dtype)]
    if int8_qk:
        scratch += [pltpu.SMEM((1, 1), jnp.float32),
                    pltpu.SMEM((1, 1), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_joint_kernel, t_tiles=t_tiles, bq=bq,
                          masked=masked, prescale=prescale,
                          int8_qk=int8_qk),
        grid=(b, heads, n_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _lane_block(heads, 0, bq, qt_row),
                  _lane_block(heads, 0, bq, qi_row),
                  _lane_block(heads, 1, st_pad, kv_row),
                  _lane_block(heads, 1, si_pad, kv_row),
                  _lane_block(heads, 2, st_pad, kv_row),
                  _lane_block(heads, 2, si_pad, kv_row),
                  _tab_spec(st_pad), _tab_spec(st_pad),
                  _tab_spec(si_pad), _tab_spec(si_pad),
                  _W_SPEC, _W_SPEC, _W_SPEC, _W_SPEC, _P_SPEC],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, st_pad + si_pad, hd),
                                       txt_qkv.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **_flash_params(heads, bq, st_pad + si_pad, b, n_q),
    )(jnp.asarray([s_txt, s_img], jnp.int32),
      txt_qkv, img_qkv, txt_qkv, img_qkv, txt_qkv, img_qkv,
      ct, st_t, ci, si_t,
      _w128(wq_t), _w128(wk_t), _w128(wq_i), _w128(wk_i),
      _pair_swap_matrix())
    return out[:, :s_txt], out[:, st_pad:st_pad + s_img]


def _fused_single_impl(proj, wq, wk, cos, sin, *, heads: int,
                       interpret: bool, int8_qk: bool = False):
    b, s, _ = proj.shape
    bq = _bq(s)
    s_pad = _round_up(s, bq)
    masked = s_pad != s
    prescale = LOG2_E / math.sqrt(128.0)
    c2, s2 = _expand_tables(cos, sin, 128)
    proj = _pad_seq(proj, s_pad)
    n_q = s_pad // bq
    hd = heads * 128
    out_spec = pl.BlockSpec((1, bq, 128), lambda b_, h, iq: (b_, iq, h),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((s_pad, 128),
                          jnp.int8 if int8_qk else proj.dtype)]
    if int8_qk:
        scratch.append(pltpu.SMEM((1, 1), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_seq_kernel, bq=bq, masked=masked,
                          prescale=prescale, int8_qk=int8_qk),
        grid=(b, heads, n_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _lane_block(heads, 0, bq, lambda iq: iq),
                  _lane_block(heads, 1, s_pad, lambda iq: 0),
                  _lane_block(heads, 2, s_pad, lambda iq: 0),
                  _tab_spec(s_pad), _tab_spec(s_pad),
                  _W_SPEC, _W_SPEC, _P_SPEC],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), proj.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **_flash_params(heads, bq, s_pad, b, n_q),
    )(jnp.asarray([s], jnp.int32), proj, proj, proj,
      _pad_rows(c2, s_pad), _pad_rows(s2, s_pad),
      _w128(wq), _w128(wk), _pair_swap_matrix())
    return out[:, :s]


# ---------------------------------------------------------------------------
# custom VJPs: forward = fused Pallas chain, backward = exact vjp of the
# unfused composition (recompute — training correctness without flash-lse
# plumbing through the fused layout)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_double(heads: int, head_dim: int, interpret: bool,
                 int8_qk: bool = False):
    def ref(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin):
        return _reference_double(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                 cos, sin, heads, head_dim)

    @jax.custom_vjp
    def f(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin):
        return _fused_double_impl(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                  cos, sin, heads=heads, interpret=interpret,
                                  int8_qk=int8_qk)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        return jax.vjp(ref, *res)[1](g)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_single(heads: int, head_dim: int, interpret: bool,
                 int8_qk: bool = False):
    def ref(proj, wq, wk, cos, sin):
        return _reference_single(proj, wq, wk, cos, sin, heads, head_dim)

    @jax.custom_vjp
    def f(proj, wq, wk, cos, sin):
        return _fused_single_impl(proj, wq, wk, cos, sin, heads=heads,
                                  interpret=interpret, int8_qk=int8_qk)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        return jax.vjp(ref, *res)[1](g)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _squeeze_tables(cos, sin):
    """(1,1,S,D/2) or (S,D/2) -> (S,D/2), else None (unsupported form)."""
    if cos.ndim == 2:
        return cos, sin
    if cos.ndim == 4 and cos.shape[0] == 1 and cos.shape[1] == 1:
        return cos[0, 0], sin[0, 0]
    return None, None


def _fused_ok(head_dim: int, dtype, s_total: int, interpret: bool) -> bool:
    if head_dim != 128 or dtype != jnp.bfloat16 or s_total > _MAX_ONEPASS:
        return False
    if getattr(_attn._FORCE_REFERENCE, "value", False):
        return False
    if getattr(_attn._TP_CONTEXT, "value", None) is not None:
        return False
    if getattr(_attn._SP_CONTEXT, "value", None) is not None:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    return True


def mmdit_double_attention(txt_qkv, img_qkv, txt_qknorm, img_qknorm,
                           cos, sin, heads: int, head_dim: int,
                           interpret: bool = False):
    """Joint [txt; img] attention from the two raw qkv GEMM outputs.

    txt_qkv/img_qkv: (B, S, 3*heads*head_dim) fused projections;
    *_qknorm: rmsnorm param dicts ({"q": {"scale"}, "k": {"scale"}});
    cos/sin: RoPE tables, (S_total, head_dim/2) or broadcast (1,1,S,D/2).
    Returns (txt_attn, img_attn) each (B, S, heads*head_dim).
    """
    wq_t, wk_t = txt_qknorm["q"]["scale"], txt_qknorm["k"]["scale"]
    wq_i, wk_i = img_qknorm["q"]["scale"], img_qknorm["k"]["scale"]
    cos2, sin2 = _squeeze_tables(cos, sin)
    s_total = txt_qkv.shape[1] + img_qkv.shape[1]
    if cos2 is None or not _fused_ok(head_dim, txt_qkv.dtype, s_total,
                                     interpret):
        c = cos if cos.ndim == 4 else cos[None, None]
        s = sin if sin.ndim == 4 else sin[None, None]
        return _reference_double(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                 c[0, 0], s[0, 0], heads, head_dim)
    return _make_double(heads, head_dim, interpret, _INT8_QK)(
        txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos2, sin2)


def mmdit_single_attention(proj, qknorm, cos, sin, heads: int,
                           head_dim: int, interpret: bool = False):
    """Attention over a single joint stream from the fused linear1 output.

    proj: (B, S, W) with q/k/v in the first 3*heads*head_dim lanes (the
    trailing lanes — the single block's parallel MLP — are ignored here).
    Returns (B, S, heads*head_dim).
    """
    wq, wk = qknorm["q"]["scale"], qknorm["k"]["scale"]
    cos2, sin2 = _squeeze_tables(cos, sin)
    if cos2 is None or not _fused_ok(head_dim, proj.dtype, proj.shape[1],
                                     interpret):
        c = cos if cos.ndim == 4 else cos[None, None]
        s = sin if sin.ndim == 4 else sin[None, None]
        return _reference_single(proj, wq, wk, c[0, 0], s[0, 0], heads,
                                 head_dim)
    return _make_single(heads, head_dim, interpret, _INT8_QK)(
        proj, wq, wk, cos2, sin2)
