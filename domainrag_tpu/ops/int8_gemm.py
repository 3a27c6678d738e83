"""W8A8 int8 GEMM on the native int8 MXU path (Pallas/Mosaic).

The v5e MXU runs int8×int8 at 394 TOPS — 2× its bf16 peak — but this
XLA version does not lower ``jnp.dot(int8, int8, preferred=int32)`` to
that path (measured at or below the bf16 rate at every Flux hot shape;
BENCH_NOTES "W8A8 int8-MXU probe"). Mosaic DOES: a K-blocked Pallas
GEMM with int8 operands and an int32 VMEM accumulator measures
290–370 TOP/s at the Flux hot shapes with the tuned tiles below
(slope-calibrated, serialized chains) vs ~190 TF/s for the best XLA
bf16 GEMMs — 1.4–1.9× per shape; full-12B serving measured 4.557 →
7.06 images/min/chip (BENCH_NOTES "W8A8 on the int8 MXU via Pallas").

Layout (matches ``models.quant``): weights are per-output-channel
symmetric int8, ``w ≈ w_q · diag(w_s)``; activations are quantized per
token on the fly, ``x ≈ x_q · diag(x_s)`` with ``x_s = rowmax|x|/127``.
The kernel computes ``(x_q @ w_q)`` exactly in int32 and applies the
rank-1 rescale ``x_s ⊗ w_s`` (+ optional bias) in the epilogue of the
last K step, so the f32 intermediate never touches HBM.

The quantize pass itself stays in XLA: it fuses with whatever produced
``x`` (bias/GELU/modulation chains), so the int8 operand is usually the
only materialization between two GEMMs.

Numerics: the integer dot is exact (|acc| ≤ K·127² < 2³¹ for K < 1.3e5)
and the epilogue applies the same f32 multiplies in the same order as
the XLA W8A8 formulation in ``common.linear`` — the two paths agree
bitwise (test-pinned), so correctness evidence for one covers both.

Replaces: the CUDA/cuBLAS int8 path the reference stack would use via
torch quantization (the reference itself runs bf16 eager diffusers —
`/root/reference/batch_generate_flux_kshot.py:49`).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Process-wide escape hatch (mirrors common.set_int8_activations's role).
# Sharding: pure-DP serving runs the denoise cores under shard_map
# (models/flux/pipeline._dp_wrap), so the kernel always sees per-device
# local shapes; TP-sharded bundles disable the kernel via the context
# below and use the XLA formulation, which GSPMD partitions.
_PALLAS_ENABLED = True

# Trace-time thread-local disable for sharded forwards: pallas_call has
# no GSPMD partitioning rule, so under a TP-sharded bundle the XLA
# formulation must run instead (it partitions transparently). Safe as a
# trace-time read: TP-sharded params carry different shardings and
# therefore different jit cache keys than unsharded ones.
_TLS = threading.local()


@contextlib.contextmanager
def disable_pallas_w8a8():
    prev = getattr(_TLS, "disable", False)
    _TLS.disable = True
    try:
        yield
    finally:
        _TLS.disable = prev


def set_w8a8_pallas(enabled: bool) -> None:
    global _PALLAS_ENABLED
    if bool(enabled) == _PALLAS_ENABLED:
        return
    _PALLAS_ENABLED = bool(enabled)
    jax.clear_caches()  # flag is read at trace time


def w8a8_pallas_enabled() -> bool:
    return _PALLAS_ENABLED


def _pick(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


# Slope-measured tile picks at the Flux hot shapes (tools/
# tpu_experiments.py w8a8tiles, serialized chains, c=16/64): a single K
# pass (bk=K) wins whenever K fits one block (<=3072); large-K shapes
# prefer bk=1536 with a wider N block. Keyed (K, N) — M is bm=512
# everywhere and the measured M=4096/4608 variants agree on the pick.
_TUNED_TILES = {
    (3072, 9216): (512, 512, 3072),     # qkv: 0.75 ms vs 0.91 default
    (3072, 12288): (512, 1024, 3072),   # mlp-up: 0.99 vs 1.20
    (3072, 21504): (512, 1024, 3072),   # single linear1: 1.64 vs 1.96
    (3072, 3072): (512, 1024, 3072),    # proj (single-pass, same K)
    (12288, 3072): (512, 1024, 1536),   # mlp-down: measured best
    (15360, 3072): (512, 1536, 1536),   # single linear2: 1.58 vs 1.60
}


def quantize_rowwise(x: jax.Array):
    """Per-token symmetric int8 quant: (M, K) float -> int8 + (M, 1) f32.

    Identical arithmetic to the XLA W8A8 branch in ``common.linear``
    (f32 amax, /127, round-clip) so both paths agree bitwise."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref, *,
            k_steps: int, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _epilogue():
        acc = (acc_ref[...].astype(jnp.float32)
               * xs_ref[...].astype(jnp.float32)
               * ws_ref[...].astype(jnp.float32))
        # cast BEFORE the bias add — same op order as the XLA W8A8
        # branch in common.linear, so the two paths agree bitwise
        y = acc.astype(out_dtype)
        if b_ref is not None:
            y = y + b_ref[...].astype(out_dtype)
        o_ref[...] = y


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype",
                                             "interpret"))
def _w8a8_gemm(q, w_q, xs, ws, bias, bm, bn, bk, out_dtype,
               interpret=False):
    m, k = q.shape
    _, n = w_q.shape
    k_steps = k // bk
    has_bias = bias is not None

    def kern(*refs):
        if has_bias:
            x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref = refs
        else:
            x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref = refs
            b_ref = None
        _kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref,
                k_steps=k_steps, out_dtype=out_dtype)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),
        pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
        pl.BlockSpec((bm, 1), lambda i, j, s: (i, 0)),
        pl.BlockSpec((1, bn), lambda i, j, s: (0, j)),
    ]
    args = [q, w_q, xs, ws]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, s: (0, j)))
        args.append(bias.reshape(1, n))
    return pl.pallas_call(
        kern,
        grid=(m // bm, n // bn, k_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)


def w8a8_eligible(m: int, k: int, n: int) -> bool:
    """Shapes the Pallas path accepts: M large enough to amortize row
    padding, K/N tileable. Everything else falls back to the XLA
    formulation (bit-identical)."""
    return (m >= 512
            and _pick(k, (1536, 2048, 1024, 512, 256, 128)) is not None
            and _pick(n, (1024, 512, 256, 128)) is not None)


def w8a8_linear(x: jax.Array, w_q: jax.Array, w_s: jax.Array,
                bias: Optional[jax.Array] = None,
                interpret: bool = False) -> Optional[jax.Array]:
    """Fused W8A8 linear: dynamic per-token activation quant (XLA, fuses
    with the producer) + int8 MXU GEMM + rank-1 rescale epilogue.

    ``x``: (..., K) float; ``w_q``: (K, N) int8; ``w_s``: (N,) f32.
    Returns None when the shape is ineligible — caller falls back."""
    if not _PALLAS_ENABLED or getattr(_TLS, "disable", False):
        return None
    k, n = w_q.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= int(d)
    if not w8a8_eligible(m, k, n):
        return None
    bm, bn, bk = _TUNED_TILES.get(
        (k, n), (512,
                 _pick(n, (1024, 512, 256, 128)),
                 _pick(k, (1536, 2048, 1024, 512, 256, 128))))

    x2 = x.reshape(m, k)
    q, s = quantize_rowwise(x2)
    pad = (-m) % bm
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        s = jnp.pad(s, ((0, pad), (0, 0)), constant_values=1.0)
    out_dtype = x.dtype
    y = _w8a8_gemm(q, w_q, s, w_s.reshape(1, n).astype(jnp.float32),
                   None if bias is None else bias,
                   bm, bn, bk, out_dtype, interpret=interpret)
    if pad:
        y = y[:m]
    return y.reshape(*lead, n)
