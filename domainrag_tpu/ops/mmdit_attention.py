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
# The multi-KV-pass path (_mp_flash, round 4) carries past the one-pass
# ceiling with O(bq) VMEM; this bound only marks the largest measured
# regime (the 2800 px cap is ~31k). Design note: the first multipass cut
# re-applied K's norm+RoPE INSIDE the kernel per (q-tile, kv-tile) visit
# — measured 207 vs 120 ms/layer unfused at 31k tokens, because with kv
# innermost every RoPE table and K tile is re-DMAed n_q (~61) times
# (~47 GB/layer of f32 table traffic alone) and the f32 VPU norm repeats
# per visit. The shipped design hoists norm+RoPE into ONE XLA prep pass
# over the GEMM output (~0.8 GB/layer round-trip at 31k, ~1 ms), then
# streams prenormed K/V through a plain online-softmax kernel. Tile
# sweep at the 31k double shape (tools/tpu_experiments.py mpbq):
# bq=1024/bkv=1024 measured fastest (103.9 ms vs 110.0 at bq=2048,
# 108.2-129.5 for every larger tile) — K/V HBM re-fetch is NOT the
# limiter once tables/weights leave the kernel; small q tiles win on
# padding (round_up(S, bq)) and VMEM pipelining.
_MAX_MULTIPASS = 49152

# SageAttention-style int8 QK (arXiv:2410.02367's recipe, re-derived for
# the TPU int8 MXU): after the in-kernel qk-rmsnorm+RoPE, quantize q per
# row and K per (batch, head) tensor to int8 and run the score dot as
# int8*int8 -> int32 — measured 328 TOP/s vs 189 TF/s bf16 at the
# full-layer 4608-token shape (1.73x on the QK half of attention).
#
# Round-4 rework: the dequant no longer materializes a rescaled f32
# score matrix (the O(bq·s_kv) extra pass that made the round-3 mode a
# wash — BENCH_NOTES "int8 QK scores"). The row max is taken in int32
# and the per-row scale alpha = s_q·s_K folds into the exp2 argument:
# p = exp2(alpha·(s_i32 - m_i32)) — alpha > 0 commutes with max, so
# this equals the exact softmax of the dequantized scores.
#
# _INT8_PV additionally runs the P·V contraction on the int8 MXU:
# after the shared-max exp2, every row of [pt|pi] has max element
# exactly 1 (exp2(0) at the argmax), so P quantizes to int8 with the
# CONSTANT scale 127 — no per-row rescale. V quantizes per 128-lane
# column once per (batch, head) at the first q tile (like K), and the
# l-normalization uses the QUANTIZED row sum l = sum(P_q), so the
# output stays an exact convex combination of the quantized rows and
# the 127s cancel: o = (P_q @ V_q) · s_vcol / l.
#
# Serving-only approximations; the backward recomputes through the
# exact reference composition. Off by default; enable with
# set_int8_qk(True) / set_int8_pv(True) (CLI --int8_qk/--int8_attn;
# read at trace time like common.set_int8_activations).
_INT8_QK = False
_INT8_PV = False


def set_int8_qk(enabled: bool) -> None:
    global _INT8_QK
    if bool(enabled) == _INT8_QK:
        return
    _INT8_QK = bool(enabled)
    jax.clear_caches()


def int8_qk_enabled() -> bool:
    return _INT8_QK


def set_int8_pv(enabled: bool) -> None:
    """int8 P·V (implies int8 QK at dispatch). Trace-time flag."""
    global _INT8_PV
    if bool(enabled) == _INT8_PV:
        return
    _INT8_PV = bool(enabled)
    jax.clear_caches()


def int8_pv_enabled() -> bool:
    return _INT8_PV


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


def _pad_seq3(x, rows: int):
    """Pad the sequence axis (2) of a (3, B, S, H*d) qkv3 array."""
    return x if x.shape[2] == rows else jnp.pad(
        x, ((0, 0), (0, 0), (0, rows - x.shape[2]), (0, 0)))


def qkv3_from_lanes(qkv: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """(B, S, 3*H*d) fused-GEMM lane layout -> (3, B, S, H*d) qkv3.

    One XLA transpose-copy (~0.1 ms at the 1024 px single-block shape)
    that drops the attention kernel's DMA row pitch from 3*H*d (or the
    single block's 7*H*d) to H*d — slope-measured 2.73 -> 0.78 ms/layer
    (round 4). Lane order within each part is preserved (head-major)."""
    b, s, w = qkv.shape
    hd = heads * head_dim
    return qkv.reshape(b, s, 3, hd).transpose(2, 0, 1, 3)


def lanes_from_qkv3(qkv3: jax.Array) -> jax.Array:
    """Inverse of :func:`qkv3_from_lanes` (fallback/reference path)."""
    return jnp.concatenate([qkv3[0], qkv3[1], qkv3[2]], axis=-1)


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


def _quant_cols(x_f32):
    """Per-column symmetric int8: (rows, 128) f32 -> int8, (1, 128) f32.
    The V quantizer: the column scale folds into the output epilogue."""
    s = jnp.maximum(jnp.max(jnp.abs(x_f32), axis=0, keepdims=True)
                    / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x_f32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_probs(p_f32):
    """P in [0, 1] with row max EXACTLY 1 (shared-max exp2) -> int8 with
    the constant scale 127; no clip needed (127·1 is the max)."""
    return jnp.round(p_f32 * 127.0).astype(jnp.int8)


# ---------------------------------------------------------------------------
# one-pass flash kernels over raw qkv GEMM lanes (no lse output — serving
# forward; the backward recomputes through the unfused composition)
# ---------------------------------------------------------------------------

def _seq_kernel(valid_ref, q_ref, k_ref, v_ref, c_ref, s_ref,
                wq_ref, wk_ref, p_ref, o_ref, k_scr, *scr,
                bq: int, masked: bool, prescale: float,
                int8_qk: bool = False, int8_pv: bool = False):
    iq = pl.program_id(2)
    p_swap = p_ref[:]
    scr = list(scr)
    ks_scr = scr.pop(0) if int8_qk else None
    v_scr = scr.pop(0) if int8_pv else None
    vs_scr = scr.pop(0) if int8_pv else None

    @pl.when(iq == 0)
    def _():
        if int8_qk:
            kf = _norm_rope(_ld(k_ref), wk_ref[:], c_ref[:], s_ref[:],
                            p_swap, None, out_dtype=jnp.float32)
            kq, sk = _quant_tensor(kf)
            k_scr[:] = kq
            ks_scr[0, 0] = sk
        else:
            k_scr[:] = _norm_rope(_ld(k_ref), wk_ref[:], c_ref[:], s_ref[:],
                                  p_swap, None)
        if int8_pv:
            vq, vs = _quant_cols(_ld(v_ref).astype(jnp.float32))
            v_scr[:] = vq
            vs_scr[:] = vs

    if int8_qk:
        qf = _norm_rope(_ld(q_ref), wq_ref[:], c_ref[pl.ds(iq * bq, bq)],
                        s_ref[pl.ds(iq * bq, bq)], p_swap, prescale,
                        out_dtype=jnp.float32)
        qq, sq = _quant_rows(qf)
        s = jax.lax.dot_general(qq, k_scr[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        if masked:
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_pos < valid_ref[0], s, jnp.int32(-(2 ** 30)))
        # folded dequant: alpha = s_q·s_K > 0 commutes with max, so
        # exp2(alpha·(s_i32 - m_i32)) IS the softmax numerator of the
        # dequantized scores — no rescaled f32 score matrix pass
        m = jnp.max(s, axis=1, keepdims=True)
        alpha = sq * ks_scr[0, 0]
        p = jnp.exp2((s - m).astype(jnp.float32) * alpha)
    else:
        q = _norm_rope(_ld(q_ref), wq_ref[:], c_ref[pl.ds(iq * bq, bq)],
                       s_ref[pl.ds(iq * bq, bq)], p_swap, prescale)
        s = jax.lax.dot_general(q, k_scr[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_pos < valid_ref[0], s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
    if int8_pv:
        pq = _quant_probs(p)
        l = jnp.sum(pq, axis=1, keepdims=True,
                    dtype=jnp.int32).astype(jnp.float32)
        o = jax.lax.dot_general(pq, v_scr[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # o_real = (P_q/127)@(V_q·s_col) / (l/127): the 127s cancel and
        # l >= 127 always (the row max quantizes to exactly 127)
        o_ref[0] = (o.astype(jnp.float32) * vs_scr[:] / l
                    ).astype(o_ref.dtype)
    else:
        l = jnp.sum(p, axis=1, keepdims=True)
        v = _ld(v_ref)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _joint_kernel(valid_ref, qt_ref, qi_ref, kt_ref, ki_ref, vt_ref, vi_ref,
                  ct_ref, st_ref, ci_ref, si_ref,
                  wqt_ref, wkt_ref, wqi_ref, wki_ref, p_ref,
                  o_ref, kt_scr, ki_scr, *scr,
                  t_tiles: int, bq: int, masked: bool, prescale: float,
                  int8_qk: bool = False, int8_pv: bool = False):
    iq = pl.program_id(2)
    p_swap = p_ref[:]
    scr = list(scr)
    kts_scr = scr.pop(0) if int8_qk else None
    kis_scr = scr.pop(0) if int8_qk else None
    vt_scr = scr.pop(0) if int8_pv else None
    vi_scr = scr.pop(0) if int8_pv else None
    vts_scr = scr.pop(0) if int8_pv else None
    vis_scr = scr.pop(0) if int8_pv else None

    @pl.when(iq == 0)
    def _():
        if int8_qk:
            ktf = _norm_rope(_ld(kt_ref), wkt_ref[:], ct_ref[:], st_ref[:],
                             p_swap, None, out_dtype=jnp.float32)
            ktq, skt = _quant_tensor(ktf)
            kt_scr[:] = ktq
            kts_scr[0, 0] = skt
            kif = _norm_rope(_ld(ki_ref), wki_ref[:], ci_ref[:], si_ref[:],
                             p_swap, None, out_dtype=jnp.float32)
            kiq, ski = _quant_tensor(kif)
            ki_scr[:] = kiq
            kis_scr[0, 0] = ski
        else:
            kt_scr[:] = _norm_rope(_ld(kt_ref), wkt_ref[:], ct_ref[:],
                                   st_ref[:], p_swap, None)
            ki_scr[:] = _norm_rope(_ld(ki_ref), wki_ref[:], ci_ref[:],
                                   si_ref[:], p_swap, None)
        if int8_pv:
            vtq, vts = _quant_cols(_ld(vt_ref).astype(jnp.float32))
            vt_scr[:] = vtq
            vts_scr[:] = vts
            viq, vis = _quant_cols(_ld(vi_ref).astype(jnp.float32))
            vi_scr[:] = viq
            vis_scr[:] = vis

    is_txt = iq < t_tiles
    q_raw = jnp.where(is_txt, _ld(qt_ref), _ld(qi_ref))
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
                                 preferred_element_type=jnp.int32)
        si = jax.lax.dot_general(qq, ki_scr[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        if masked:
            t_pos = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
            st = jnp.where(t_pos < valid_ref[0], st, jnp.int32(-(2 ** 30)))
            i_pos = jax.lax.broadcasted_iota(jnp.int32, si.shape, 1)
            si = jnp.where(i_pos < valid_ref[1], si, jnp.int32(-(2 ** 30)))
        # two K tensors -> two dequant scales; the shared row max must
        # live in the REAL domain, so fold each alpha into its exp2
        # argument: p = exp2(alpha·s_i32 - m_real)
        at = sqr * kts_scr[0, 0]
        ai = sqr * kis_scr[0, 0]
        m = jnp.maximum(
            jnp.max(st, axis=1, keepdims=True).astype(jnp.float32) * at,
            jnp.max(si, axis=1, keepdims=True).astype(jnp.float32) * ai)
        pt = jnp.exp2(st.astype(jnp.float32) * at - m)
        pi = jnp.exp2(si.astype(jnp.float32) * ai - m)
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
    if int8_pv:
        ptq = _quant_probs(pt)
        piq = _quant_probs(pi)
        l = (jnp.sum(ptq, axis=1, keepdims=True, dtype=jnp.int32)
             + jnp.sum(piq, axis=1, keepdims=True, dtype=jnp.int32)
             ).astype(jnp.float32)
        # separate per-column V scales -> scale each int32 partial before
        # the sum (two O(bq·128) multiplies)
        o = (jax.lax.dot_general(ptq, vt_scr[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) * vts_scr[:]
             + jax.lax.dot_general(piq, vi_scr[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.float32) * vis_scr[:])
        o_ref[0] = (o / l).astype(o_ref.dtype)
    else:
        l = (jnp.sum(pt, axis=1, keepdims=True)
             + jnp.sum(pi, axis=1, keepdims=True))
        o = jax.lax.dot_general(pt.astype(vt_ref.dtype), _ld(vt_ref),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            + jax.lax.dot_general(pi.astype(vi_ref.dtype), _ld(vi_ref),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _online_update(s, v, acc, m_buf, l_buf):
    """One online-softmax accumulation step (ops.attention._flash_kernel
    conventions: base-2 exponentials, (bq, 128)-replicated m/l buffers)."""
    m_prev = m_buf[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, :1])
    l_buf[:] = l_buf[:] * corr + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), m_prev.shape)
    acc[:] = acc[:] * corr[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_buf[:] = m_new


def _flash_mp_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref,
                     acc, m_buf, l_buf,
                     *, bkv: int, masked: bool, prescale: float):
    """Multi-KV-pass streaming flash kernel over PRENORMED q/k/v head
    slices (VERDICT r3 item 4: the 2800 px fill's ~31k-token joint
    sequence exceeds the one-pass kernel's VMEM ceiling). Grid
    (B, H, n_q, n_kv), kv innermost: the q tile's block index is
    constant across the kv sweep (no re-DMA), K/V stream per tile with
    the online-softmax accumulator. norm+RoPE happened once in the XLA
    prep pass (:func:`_prep_norm_rope`) — see the _MAX_MULTIPASS design
    note for why recomputing it in-kernel loses at this regime."""
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)

    s = jax.lax.dot_general(_ld(q_ref), _ld(k_ref),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * prescale
    if masked:
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + ik * bkv
        s = jnp.where(kv_pos < valid_ref[0], s, NEG_INF)
    _online_update(s, _ld(v_ref), acc, m_buf, l_buf)

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc[:] / jnp.maximum(l_buf[:][:, :1], 1e-30)
                    ).astype(o_ref.dtype)


def _prep_norm_rope(x, w, cos, sin):
    """qk-rmsnorm + interleaved RoPE over a (B, S, H*128) stream — ONE
    fused XLA elementwise pass feeding the multipass kernel. Rounding
    matches the unfused reference: f32 norm, dtype round after the w
    scale, f32 rotation, cast back (\\_rms/_rope_interleaved order)."""
    b, s, hd = x.shape
    h = hd // 128
    x4 = _rms(x.reshape(b, s, h, 128), w)
    xf = x4.astype(jnp.float32).reshape(b, s, h, 64, 2)
    c = cos.astype(jnp.float32)[None, :, None, :]
    sn = sin.astype(jnp.float32)[None, :, None, :]
    o0 = xf[..., 0] * c - xf[..., 1] * sn
    o1 = xf[..., 0] * sn + xf[..., 1] * c
    return jnp.stack([o0, o1], axis=-1).reshape(b, s, hd).astype(x.dtype)


def _quant_bh(x, extra_scale: float = 1.0):
    """XLA prep quantizer for the int8 multipass (round 5): (B, S, H*128)
    -> int8 same shape + (B, H) f32 scales, symmetric per (batch, head)
    TENSOR. Coarser than the one-pass kernel's per-ROW q scales — the
    multipass kernel reads its scales from SMEM per (b, h), and after
    qk-rmsnorm all rows of a head share magnitude, so the granularity
    loss is small (parity envelope pinned by the tests).
    ``extra_scale`` folds the flash prescale into q's dequant factor."""
    b, s, hd = x.shape
    h = hd // 128
    xf = x.astype(jnp.float32).reshape(b, s, h, 128)
    amax = jnp.max(jnp.abs(xf), axis=(1, 3))               # (B, H)
    sc = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / sc[:, None, :, None]), -127, 127
                 ).astype(jnp.int8).reshape(b, s, hd)
    return q, sc * extra_scale


def _quant_bh_cols(x):
    """(B, S, H*128) -> int8 + (B, H, 128) per-column scales (the V
    quantizer of the int8-P·V multipass; the column scale applies once
    at the finalize step since it is constant across kv tiles)."""
    b, s, hd = x.shape
    h = hd // 128
    xf = x.astype(jnp.float32).reshape(b, s, h, 128)
    amax = jnp.max(jnp.abs(xf), axis=1)                    # (B, H, 128)
    sc = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / sc[:, None]), -127, 127
                 ).astype(jnp.int8).reshape(b, s, hd)
    return q, sc


def _online_update_i8pv(s, vq, acc, m_buf, l_buf):
    """Online-softmax step with the int8 P·V contraction (round 5). The
    running-max construction guarantees p = exp2(s - m_new) <= 1
    elementwise, so P quantizes with the constant scale 127 and the
    127s cancel between the acc and l accumulators exactly as in the
    one-pass shared-max variant; the per-column V scale is constant
    across kv tiles and applies once at the finalize step."""
    m_prev = m_buf[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, :1])
    pq = jnp.round(p * 127.0).astype(jnp.int8)
    l_buf[:] = l_buf[:] * corr + jnp.broadcast_to(
        jnp.sum(pq, axis=1, keepdims=True,
                dtype=jnp.int32).astype(jnp.float32), m_prev.shape)
    acc[:] = acc[:] * corr[:, :1] + jax.lax.dot_general(
        pq, vq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    m_buf[:] = m_new


def _flash_mp_kernel_i8(valid_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
                        *rest, bkv: int, masked: bool, int8_pv: bool):
    """:func:`_flash_mp_kernel` with int8 QK scores (and optionally int8
    P·V) — VERDICT r4 weak #2: the 1.73x int8 QK MXU rate had only ever
    been measured in the one-pass regime (<=17k tokens) where attention
    is ~20% of the step; at the 2800 px cap the quadratic term is 45x
    larger and attention dominates, so the int8 question must be
    answered HERE. q/k arrive PRE-QUANTIZED from the XLA prep pass
    (:func:`_quant_bh` — per (batch, head) tensor scales via SMEM; the
    flash prescale is folded into q's scale), so the kernel's hot loop
    is one int8 MXU dot + one f32 dequant multiply per score tile."""
    if int8_pv:
        vs_ref, o_ref, acc, m_buf, l_buf = rest
    else:
        o_ref, acc, m_buf, l_buf = rest
    b_ = pl.program_id(0)
    h = pl.program_id(1)
    ik = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)

    alpha = qs_ref[b_, h] * ks_ref[b_, h]
    s = jax.lax.dot_general(_ld(q_ref), _ld(k_ref),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * alpha
    if masked:
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + ik * bkv
        s = jnp.where(kv_pos < valid_ref[0], s, NEG_INF)
    if int8_pv:
        _online_update_i8pv(s, _ld(v_ref), acc, m_buf, l_buf)
    else:
        _online_update(s, _ld(v_ref), acc, m_buf, l_buf)

    @pl.when(ik == n_k - 1)
    def _():
        o = acc[:] / jnp.maximum(l_buf[:][:, :1], 1e-30)
        if int8_pv:
            o = o * _ld(vs_ref)
        o_ref[0] = o.astype(o_ref.dtype)


def _mp_flash_i8(q8, k8, v, qs, ks, valid: int, *, heads: int,
                 interpret: bool, bq: int, bkv: int, out_dtype,
                 int8_pv: bool, vs=None):
    """int8 multipass pallas_call wrapper: separate q8/k8 (int8) and v
    (bf16, or int8 when ``int8_pv``) streams, per-(b,h) scales in SMEM,
    per-(b,h,column) V scales as a VMEM (1,1,128) block."""
    b, s_pad, hd = q8.shape
    n_q = s_pad // bq
    n_kv = s_pad // bkv
    masked = valid != s_pad

    def lane(rows, rmap):
        return pl.BlockSpec((1, rows, 128),
                            lambda b_, h, iq, ik: (b_, rmap(iq, ik), h),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                lane(bq, lambda iq, ik: iq),
                lane(bkv, lambda iq, ik: ik),
                lane(bkv, lambda iq, ik: ik)]
    args = [jnp.asarray([valid], jnp.int32),
            qs.astype(jnp.float32), ks.astype(jnp.float32), q8, k8, v]
    if int8_pv:
        # (B, H, 128) -> (B, H, 1, 128): compiled pallas requires the
        # block's last-two dims to divide (8, 128) or EQUAL the array's —
        # a (1, 1, 128) block over (B, H, 128) has second-to-last 1 vs H
        # and only lowered in interpret mode (found by the on-chip mpint8
        # run at 31k tokens, round 5)
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, 128), lambda b_, h, iq, ik: (b_, h, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(vs.astype(jnp.float32)[:, :, None, :])
    return pl.pallas_call(
        functools.partial(_flash_mp_kernel_i8, bkv=bkv, masked=masked,
                          int8_pv=int8_pv),
        grid=(b, heads, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, 128),
                               lambda b_, h, iq, ik: (b_, iq, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), out_dtype),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        interpret=interpret,
        **_mp_params(heads, bq, s_pad, b, n_q, n_kv),
    )(*args)


def _lane_block(heads: int, which: int, rows: int, row_map):
    """BlockSpec for a (1, rows, 128) head slice of a (B, S, W) array whose
    lanes are [q | k | v | ...] in heads*128 groups; which = 0/1/2."""
    return pl.BlockSpec(
        (1, rows, 128),
        lambda b, h, iq: (b, row_map(iq), which * heads + h),
        memory_space=pltpu.VMEM)


def _lane_block3(which: int, rows: int, row_map):
    """BlockSpec for a (1, 1, rows, 128) head slice of a (3, B, S, H*d)
    qkv3-layout array. The contiguous per-part layout keeps the DMA row
    pitch at H*d bytes — slope-measured 0.78 vs 2.73 ms/layer against
    reading the same head slices out of the single block's 21504-wide
    fused linear1 output (row-pitch-bound DMA, round 4)."""
    return pl.BlockSpec(
        (1, 1, rows, 128),
        lambda b, h, iq: (which, b, row_map(iq), h),
        memory_space=pltpu.VMEM)


def _ld(ref):
    """Load a (*, rows, 128) ref as (rows, 128) (drops leading unit dims
    so kernels work for both (B,S,W) lane slices and qkv3 slices)."""
    x = ref[...]
    return x.reshape(x.shape[-2], x.shape[-1])


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

def _mp_params(heads, bq, s_kv_rows, b, n_q, n_kv):
    return dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n_q * bq * s_kv_rows * 128,
            bytes_accessed=2 * b * heads
            * (n_q * bq + 2 * n_q * s_kv_rows) * 128,
            transcendentals=b * heads * n_q * bq * s_kv_rows),
    )


def _mp_flash(qkv3_arr, valid: int, *, heads: int, interpret: bool,
              bq: int, bkv: int):
    """Streaming flash attention over a prenormed (3, B, S_pad, H*128)
    qkv3 tensor (q/k already normed+roped by :func:`_prep_norm_rope`,
    v raw). VMEM is O(bq·bkv); K/V HBM re-fetch scales with
    n_q = S/bq, so the multipass default bq must stay large. The round-4
    tile sweep (BENCH_NOTES "multipass tile sweep") measured bq=1024 as
    the fastest at the 31k-token cap shape — 103.86 ms/layer double vs
    109.78 at bq=2048 — hence the 1024 default below; bkv follows bq."""
    _, b, s_pad, hd = qkv3_arr.shape
    n_q = s_pad // bq
    n_kv = s_pad // bkv
    masked = valid != s_pad

    def lane(which, rows, rmap):
        return pl.BlockSpec(
            (1, 1, rows, 128),
            lambda b_, h, iq, ik: (which, b_, rmap(iq, ik), h),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_flash_mp_kernel, bkv=bkv, masked=masked,
                          prescale=LOG2_E / math.sqrt(128.0)),
        grid=(b, heads, n_q, n_kv),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  lane(0, bq, lambda iq, ik: iq),
                  lane(1, bkv, lambda iq, ik: ik),
                  lane(2, bkv, lambda iq, ik: ik)],
        out_specs=pl.BlockSpec((1, bq, 128),
                               lambda b_, h, iq, ik: (b_, iq, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), qkv3_arr.dtype),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        interpret=interpret,
        **_mp_params(heads, bq, s_pad, b, n_q, n_kv),
    )(jnp.asarray([valid], jnp.int32), qkv3_arr, qkv3_arr, qkv3_arr)
    return out


def _mp_tiles(bq: int, bkv):
    """bkv defaults to min(bq, 1024) and must divide bq (one padded
    length serves both tilings)."""
    if bkv is None:
        bkv = min(bq, 1024)
    if bq % bkv:
        bkv = bq
    return bq, bkv


def _split_qkv_lanes(x, hd: int, qkv3: bool):
    if qkv3:
        return x[0], x[1], x[2]
    return x[..., :hd], x[..., hd:2 * hd], x[..., 2 * hd:3 * hd]


def _fused_double_mp(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin,
                     *, heads: int, interpret: bool, qkv3: bool,
                     bq: int = 1024, bkv=None, int8_qk: bool = False,
                     int8_pv: bool = False):
    """Multi-KV-pass double-block fused attention for joint sequences
    above the one-pass VMEM ceiling (the reference's 2800 px cap regime,
    outpainting_updown_sampling_redux.py:104-108 — ~31k tokens). bf16
    only; norm+RoPE runs once per stream in XLA, the two streams concat
    into one prenormed sequence, and the kernel streams K/V with O(bq)
    VMEM — no sequence ceiling."""
    hd = heads * 128
    tq, tk, tv = _split_qkv_lanes(txt_qkv, hd, qkv3)
    iq_, ik_, iv = _split_qkv_lanes(img_qkv, hd, qkv3)
    s_txt, s_img = tq.shape[1], iq_.shape[1]
    ct, st_ = cos[:s_txt], sin[:s_txt]
    ci, si_ = cos[s_txt:s_txt + s_img], sin[s_txt:s_txt + s_img]
    q = jnp.concatenate([_prep_norm_rope(tq, wq_t, ct, st_),
                         _prep_norm_rope(iq_, wq_i, ci, si_)], axis=1)
    k = jnp.concatenate([_prep_norm_rope(tk, wk_t, ct, st_),
                         _prep_norm_rope(ik_, wk_i, ci, si_)], axis=1)
    v = jnp.concatenate([tv, iv], axis=1)
    s_tot = s_txt + s_img
    bq, bkv = _mp_tiles(bq, bkv)
    if int8_qk or int8_pv:
        out = _mp_i8_common(q, k, v, s_tot, heads=heads,
                            interpret=interpret, bq=bq, bkv=bkv,
                            int8_pv=int8_pv, out_dtype=tv.dtype)
    else:
        arr = _pad_seq3(jnp.stack([q, k, v]), _round_up(s_tot, bq))
        out = _mp_flash(arr, s_tot, heads=heads, interpret=interpret,
                        bq=bq, bkv=bkv)
    return out[:, :s_txt], out[:, s_txt:s_tot]


def _mp_i8_common(q, k, v, s_tot: int, *, heads: int, interpret: bool,
                  bq: int, bkv: int, int8_pv: bool, out_dtype):
    """Shared int8 tail of the multipass wrappers: XLA prep quantization
    (per-(b,h) q/k tensors, flash prescale folded into q's scale;
    per-(b,h)-column V when ``int8_pv``), sequence padding AFTER
    quantization (zero int8 rows), then :func:`_mp_flash_i8`."""
    prescale = LOG2_E / math.sqrt(128.0)
    q8, qs = _quant_bh(q, prescale)
    k8, ks = _quant_bh(k)
    s_pad = _round_up(s_tot, bq)
    q8 = _pad_seq(q8, s_pad)
    k8 = _pad_seq(k8, s_pad)
    if int8_pv:
        v8, vs = _quant_bh_cols(v)
        return _mp_flash_i8(q8, k8, _pad_seq(v8, s_pad), qs, ks, s_tot,
                            heads=heads, interpret=interpret, bq=bq,
                            bkv=bkv, out_dtype=out_dtype, int8_pv=True,
                            vs=vs)
    return _mp_flash_i8(q8, k8, _pad_seq(v, s_pad), qs, ks, s_tot,
                        heads=heads, interpret=interpret, bq=bq,
                        bkv=bkv, out_dtype=out_dtype, int8_pv=False)


def _fused_single_mp(proj, wq, wk, cos, sin, *, heads: int,
                     interpret: bool, qkv3: bool, bq: int = 1024,
                     bkv=None, int8_qk: bool = False,
                     int8_pv: bool = False):
    """Multi-KV-pass single-block fused attention (see
    :func:`_fused_double_mp`)."""
    hd = heads * 128
    q, k, v = _split_qkv_lanes(proj, hd, qkv3)
    s = q.shape[1]
    q = _prep_norm_rope(q, wq, cos[:s], sin[:s])
    k = _prep_norm_rope(k, wk, cos[:s], sin[:s])
    bq, bkv = _mp_tiles(bq, bkv)
    if int8_qk or int8_pv:
        return _mp_i8_common(q, k, v, s, heads=heads,
                             interpret=interpret, bq=bq, bkv=bkv,
                             int8_pv=int8_pv, out_dtype=v.dtype)[:, :s]
    arr = _pad_seq3(jnp.stack([q, k, v]), _round_up(s, bq))
    return _mp_flash(arr, s, heads=heads, interpret=interpret,
                     bq=bq, bkv=bkv)[:, :s]


def _fused_double_impl(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin,
                       *, heads: int, interpret: bool,
                       int8_qk: bool = False, int8_pv: bool = False,
                       qkv3: bool = False):
    """Streams are (B, S, 3*H*d) fused lanes, or (3, B, S, H*d) each
    when ``qkv3`` (contiguous low-pitch layout)."""
    if qkv3:
        _, b, s_txt, _ = txt_qkv.shape
        s_img = img_qkv.shape[2]
    else:
        b, s_txt, _ = txt_qkv.shape
        s_img = img_qkv.shape[1]
    if s_txt + s_img > _MAX_ONEPASS:
        return _fused_double_mp(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                cos, sin, heads=heads,
                                interpret=interpret, qkv3=qkv3,
                                int8_qk=int8_qk, int8_pv=int8_pv)
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
    if qkv3:
        txt_qkv = _pad_seq3(txt_qkv, st_pad)
        img_qkv = _pad_seq3(img_qkv, si_pad)
    else:
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
    dtype = txt_qkv.dtype
    kv_dtype = jnp.int8 if int8_qk else dtype
    scratch = [pltpu.VMEM((st_pad, 128), kv_dtype),
               pltpu.VMEM((si_pad, 128), kv_dtype)]
    if int8_qk:
        scratch += [pltpu.SMEM((1, 1), jnp.float32),
                    pltpu.SMEM((1, 1), jnp.float32)]
    if int8_pv:
        scratch += [pltpu.VMEM((st_pad, 128), jnp.int8),
                    pltpu.VMEM((si_pad, 128), jnp.int8),
                    pltpu.VMEM((1, 128), jnp.float32),
                    pltpu.VMEM((1, 128), jnp.float32)]
    if qkv3:
        lane = lambda which, rows, rmap: _lane_block3(which, rows, rmap)  # noqa: E731
    else:
        lane = lambda which, rows, rmap: _lane_block(heads, which, rows,  # noqa: E731
                                                     rmap)
    out = pl.pallas_call(
        functools.partial(_joint_kernel, t_tiles=t_tiles, bq=bq,
                          masked=masked, prescale=prescale,
                          int8_qk=int8_qk, int8_pv=int8_pv),
        grid=(b, heads, n_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  lane(0, bq, qt_row),
                  lane(0, bq, qi_row),
                  lane(1, st_pad, kv_row),
                  lane(1, si_pad, kv_row),
                  lane(2, st_pad, kv_row),
                  lane(2, si_pad, kv_row),
                  _tab_spec(st_pad), _tab_spec(st_pad),
                  _tab_spec(si_pad), _tab_spec(si_pad),
                  _W_SPEC, _W_SPEC, _W_SPEC, _W_SPEC, _P_SPEC],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, st_pad + si_pad, hd), dtype),
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
                       interpret: bool, int8_qk: bool = False,
                       int8_pv: bool = False, qkv3: bool = False):
    """``proj``: (B, S, >=3*H*d) fused lanes, or (3, B, S, H*d) when
    ``qkv3`` (the contiguous low-pitch layout — see qkv3_from_lanes)."""
    if qkv3:
        _, b, s, _ = proj.shape
    else:
        b, s, _ = proj.shape
    if s > _MAX_ONEPASS:
        return _fused_single_mp(proj, wq, wk, cos, sin, heads=heads,
                                interpret=interpret, qkv3=qkv3,
                                int8_qk=int8_qk, int8_pv=int8_pv)
    bq = _bq(s)
    s_pad = _round_up(s, bq)
    masked = s_pad != s
    prescale = LOG2_E / math.sqrt(128.0)
    c2, s2 = _expand_tables(cos, sin, 128)
    proj = _pad_seq3(proj, s_pad) if qkv3 else _pad_seq(proj, s_pad)
    n_q = s_pad // bq
    hd = heads * 128
    out_spec = pl.BlockSpec((1, bq, 128), lambda b_, h, iq: (b_, iq, h),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((s_pad, 128),
                          jnp.int8 if int8_qk else proj.dtype)]
    if int8_qk:
        scratch.append(pltpu.SMEM((1, 1), jnp.float32))
    if int8_pv:
        scratch += [pltpu.VMEM((s_pad, 128), jnp.int8),
                    pltpu.VMEM((1, 128), jnp.float32)]
    if qkv3:
        lane = lambda which, rows, rmap: _lane_block3(which, rows, rmap)  # noqa: E731
    else:
        lane = lambda which, rows, rmap: _lane_block(heads, which, rows,  # noqa: E731
                                                     rmap)
    out = pl.pallas_call(
        functools.partial(_seq_kernel, bq=bq, masked=masked,
                          prescale=prescale, int8_qk=int8_qk,
                          int8_pv=int8_pv),
        grid=(b, heads, n_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  lane(0, bq, lambda iq: iq),
                  lane(1, s_pad, lambda iq: 0),
                  lane(2, s_pad, lambda iq: 0),
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
                 int8_qk: bool = False, int8_pv: bool = False,
                 qkv3: bool = False):
    def ref(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin):
        if qkv3:
            txt_qkv = lanes_from_qkv3(txt_qkv)
            img_qkv = lanes_from_qkv3(img_qkv)
        return _reference_double(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                 cos, sin, heads, head_dim)

    @jax.custom_vjp
    def f(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos, sin):
        return _fused_double_impl(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                  cos, sin, heads=heads, interpret=interpret,
                                  int8_qk=int8_qk, int8_pv=int8_pv,
                                  qkv3=qkv3)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        return jax.vjp(ref, *res)[1](g)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_single(heads: int, head_dim: int, interpret: bool,
                 int8_qk: bool = False, int8_pv: bool = False,
                 qkv3: bool = False):
    def ref(proj, wq, wk, cos, sin):
        if qkv3:
            proj = lanes_from_qkv3(proj)
        return _reference_single(proj, wq, wk, cos, sin, heads, head_dim)

    @jax.custom_vjp
    def f(proj, wq, wk, cos, sin):
        return _fused_single_impl(proj, wq, wk, cos, sin, heads=heads,
                                  interpret=interpret, int8_qk=int8_qk,
                                  int8_pv=int8_pv, qkv3=qkv3)

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


def _fused_ok(head_dim: int, dtype, s_total: int, interpret: bool,
              int8: bool = False) -> bool:
    # above the one-pass VMEM ceiling both the bf16 and (round 5) the
    # int8 paths switch to the multi-KV-pass kernels (_fused_*_mp /
    # _mp_flash_i8, O(bq) VMEM — no hard sequence ceiling;
    # _MAX_MULTIPASS bounds the regime that has been measured and gates
    # back to the exact unfused composition beyond it)
    cap = _MAX_MULTIPASS
    if head_dim != 128 or dtype != jnp.bfloat16 or s_total > cap:
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

    txt_qkv/img_qkv: (B, S, 3*heads*head_dim) fused projections, or
    (3, B, S, heads*head_dim) qkv3 layout (low-pitch DMA — see
    qkv3_from_lanes; both streams must use the same form);
    *_qknorm: rmsnorm param dicts ({"q": {"scale"}, "k": {"scale"}});
    cos/sin: RoPE tables, (S_total, head_dim/2) or broadcast (1,1,S,D/2).
    Returns (txt_attn, img_attn) each (B, S, heads*head_dim).
    """
    qkv3 = txt_qkv.ndim == 4
    wq_t, wk_t = txt_qknorm["q"]["scale"], txt_qknorm["k"]["scale"]
    wq_i, wk_i = img_qknorm["q"]["scale"], img_qknorm["k"]["scale"]
    cos2, sin2 = _squeeze_tables(cos, sin)
    s_axis = 2 if qkv3 else 1
    s_total = txt_qkv.shape[s_axis] + img_qkv.shape[s_axis]
    if cos2 is None or not _fused_ok(head_dim, txt_qkv.dtype, s_total,
                                     interpret, _INT8_QK or _INT8_PV):
        if qkv3:
            txt_qkv = lanes_from_qkv3(txt_qkv)
            img_qkv = lanes_from_qkv3(img_qkv)
        c = cos if cos.ndim == 4 else cos[None, None]
        s = sin if sin.ndim == 4 else sin[None, None]
        return _reference_double(txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i,
                                 c[0, 0], s[0, 0], heads, head_dim)
    return _make_double(heads, head_dim, interpret,
                        _INT8_QK or _INT8_PV, _INT8_PV, qkv3)(
        txt_qkv, img_qkv, wq_t, wk_t, wq_i, wk_i, cos2, sin2)


def mmdit_single_attention(proj, qknorm, cos, sin, heads: int,
                           head_dim: int, interpret: bool = False):
    """Attention over a single joint stream from the fused linear1 output.

    proj: (B, S, W) with q/k/v in the first 3*heads*head_dim lanes (the
    trailing lanes — the single block's parallel MLP — are ignored here),
    or (3, B, S, heads*head_dim) qkv3 layout (low-pitch DMA).
    Returns (B, S, heads*head_dim).
    """
    qkv3 = proj.ndim == 4
    wq, wk = qknorm["q"]["scale"], qknorm["k"]["scale"]
    cos2, sin2 = _squeeze_tables(cos, sin)
    s_len = proj.shape[2 if qkv3 else 1]
    if cos2 is None or not _fused_ok(head_dim, proj.dtype, s_len,
                                     interpret, _INT8_QK or _INT8_PV):
        if qkv3:
            proj = lanes_from_qkv3(proj)
        c = cos if cos.ndim == 4 else cos[None, None]
        s = sin if sin.ndim == 4 else sin[None, None]
        return _reference_single(proj, wq, wk, c[0, 0], s[0, 0], heads,
                                 head_dim)
    return _make_single(heads, head_dim, interpret,
                        _INT8_QK or _INT8_PV, _INT8_PV, qkv3)(
        proj, wq, wk, cos2, sin2)
