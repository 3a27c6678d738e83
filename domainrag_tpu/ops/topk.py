"""Exact inner-product top-k over embedding banks — the FAISS replacement.

The reference builds a FAISS ``IndexFlatIP`` per query and searches top-100
(``retrieval/clip100_resnet_style_all_shots.py:425-434``). Here the bank is a
resident device array and search is a fused MXU GEMM + top-k:

- :func:`topk_ip` — XLA path: one f32 matmul + ``lax.top_k``. Simple,
  exact, and fast; materializes the (Q, N) score matrix in HBM.
- :func:`topk_ip_pallas` — Pallas kernel fusing the GEMM with a streaming
  bitonic top-k held in VMEM, so per-tile scores never round-trip to HBM.
  The right shape for production banks (N ~ 10^5..10^7).

Exactness contract (BASELINE: *identical* top-100 indices vs FAISS f32 IP):
scores are f32 accumulations; ordering is (score desc, index asc) — ties
break toward the lower bank index, which matches FAISS exact-flat behavior
on distinct scores and gives a deterministic total order on ties.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# numpy oracle (host, for tests and tiny banks)
# ---------------------------------------------------------------------------

def topk_ip_numpy(queries: np.ndarray, bank: np.ndarray, k: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Reference oracle: exact IP scores, (score desc, index asc) order."""
    queries = np.asarray(queries, dtype=np.float32)
    bank = np.asarray(bank, dtype=np.float32)
    scores = queries @ bank.T
    k = min(k, bank.shape[0])
    # lexsort: primary -score, secondary index (lexsort is stable; keys
    # listed last have highest priority)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, axis=1), order.astype(np.int32)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def topk_ip(queries: jax.Array, bank: jax.Array, k: int
            ) -> Tuple[jax.Array, jax.Array]:
    """Dense GEMM + ``lax.top_k`` (stable: ties -> lower index first)."""
    # precision="highest": on TPU the default f32 matmul truncates operands
    # to bf16 passes, which perturbs near-tie scores and breaks the
    # identical-top-100-vs-FAISS gate (ref retrieval/...py:425-434).
    scores = jnp.dot(queries.astype(jnp.float32),
                     bank.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    k = min(k, bank.shape[0])
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# bitonic helpers (shared by the Pallas kernel; pure jnp so they also run
# under interpret mode and in plain XLA for testing)
# ---------------------------------------------------------------------------

def _lane_iota(shape) -> jax.Array:
    """Full-shape iota along the lane (last) dimension. Full shape rather
    than a broadcastable (1, n) — Mosaic miscompiles sublane-1 broadcasts
    inside roll/select chains."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=len(shape) - 1)


def _beats(score_a, idx_a, score_b, idx_b):
    """True where (a) orders before (b): score desc, index asc on ties."""
    return (score_a > score_b) | ((score_a == score_b) & (idx_a < idx_b))


def _compare_exchange(scores, idx, distance: int, direction_mask):
    """One bitonic compare-exchange stage over the last axis.

    ``direction_mask`` is True where the element at position i should keep
    the *winner* (orders-first element) of the pair (i, i XOR distance).
    Implemented with two rolls so it lowers cleanly to Mosaic (no lane
    gathers/reshapes).
    """
    lanes = _lane_iota(scores.shape)
    bit_set = (lanes & distance) != 0  # position has the high half of pair

    # partner values: i^d = i+d when bit clear, i-d when bit set.
    # jnp.roll with a static shift lowers to slice+concatenate, which both
    # Mosaic (real TPU pallas) and the interpreter support.
    p_scores = jnp.where(bit_set,
                         jnp.roll(scores, distance, axis=scores.ndim - 1),
                         jnp.roll(scores, -distance, axis=scores.ndim - 1))
    p_idx = jnp.where(bit_set,
                      jnp.roll(idx, distance, axis=idx.ndim - 1),
                      jnp.roll(idx, -distance, axis=idx.ndim - 1))

    a_wins = _beats(scores, idx, p_scores, p_idx)
    # keep_self = direction_mask ? a_wins : !a_wins  (boolean select via
    # xor — Mosaic rejects i1-valued jnp.where operands)
    keep_self = ~(a_wins ^ direction_mask)
    new_scores = jnp.where(keep_self, scores, p_scores)
    new_idx = jnp.where(keep_self, idx, p_idx)
    return new_scores, new_idx


def bitonic_sort(scores, idx, descending: bool = True):
    """Full bitonic sort of the last axis (power-of-two length) by the
    (score desc, index asc) total order; ``descending=True`` puts winners
    first. Vectorized over leading axes."""
    n = scores.shape[-1]
    assert n & (n - 1) == 0, "bitonic sort needs power-of-two length"
    lanes = _lane_iota(scores.shape)
    span = 2
    while span <= n:
        # direction per block of `span`: winner-first blocks alternate so
        # each 2*span block ends up bitonic; the top-level pass bakes in
        # the requested final order.
        if descending:
            block_desc = (lanes & span) == 0
        else:
            block_desc = (lanes & span) != 0
        d = span // 2
        while d >= 1:
            bit_set = (lanes & d) != 0
            # position keeps winner when it's the low half of a
            # winner-first block, or the high half of a loser-first block:
            # block_desc ? !bit_set : bit_set == bit_set ^ block_desc.
            direction_mask = bit_set ^ block_desc
            scores, idx = _compare_exchange(scores, idx, d, direction_mask)
            d //= 2
        span *= 2
    return scores, idx


def bitonic_sort_desc(scores, idx):
    return bitonic_sort(scores, idx, descending=True)


def bitonic_merge_desc(scores, idx):
    """Merge a sequence whose halves are each sorted desc (forming a bitonic
    sequence after reversing the second half) into full desc order."""
    n = scores.shape[-1]
    lanes = _lane_iota(scores.shape)
    d = n // 2
    while d >= 1:
        bit_set = (lanes & d) != 0
        scores, idx = _compare_exchange(scores, idx, d, ~bit_set)
        d //= 2
    return scores, idx


def _merge_sorted_topk(run_s, run_i, asc_s, asc_i):
    """Top-k of the union of a desc-sorted running list and an ASC-sorted
    challenger list (winner-last; avoids an unsupported lane reversal in
    Mosaic). Elementwise winner of run[i] vs asc[i] is exactly the top-k of
    the union and is bitonic, so one merge pass restores desc order."""
    take_run = _beats(run_s, run_i, asc_s, asc_i)
    top_s = jnp.where(take_run, run_s, asc_s)
    top_i = jnp.where(take_run, run_i, asc_i)
    return bitonic_merge_desc(top_s, top_i)


# ---------------------------------------------------------------------------
# Pallas fused GEMM + streaming top-k
# ---------------------------------------------------------------------------

_ROW_GROUP = 8  # Mosaic miscompiles the roll/select sort network above 8
                # sublanes ("Check failed: limits[i] <= dim(i)"), so the
                # merge runs per 8-row vreg group.


def _topk_kernel(q_ref, bank_ref, out_s_ref, out_i_ref,
                 acc_s, acc_i, score_buf,
                 *, k_pad: int, block_n: int, n_total: int):
    """Grid = (Q_tiles, N_tiles). For each query tile the bank-tile axis is
    innermost; the running top-k lives in VMEM scratch across bank tiles."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, jnp.int32(2**31 - 1))

    # MXU: (TQ, d) x (d, TN) -> f32 scores
    # HIGHEST precision for the same reason as topk_ip: default f32 MXU
    # matmul is bf16x3-ish and perturbs near-tie scores vs FAISS f32.
    scores = jax.lax.dot_general(
        q_ref[:], bank_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    gidx = col + base
    # mask bank padding rows
    valid = gidx < n_total
    score_buf[:] = jnp.where(valid, scores, NEG_INF)

    block_q = scores.shape[0]

    def row_group(r, _):
        rows = pl.ds(r * _ROW_GROUP, _ROW_GROUP)
        for c in range(block_n // k_pad):
            cols = slice(c * k_pad, (c + 1) * k_pad)
            chunk_s = score_buf[rows, cols]
            # threshold gate: the chunk can change the running top-k only
            # if some element strictly beats its row's k-th best (equal
            # scores lose on index — the stream visits the bank in
            # ascending index order, so anything already held has a lower
            # index).  After the first few tiles almost every chunk fails
            # this test, so the O(k log^2 k) sort+merge below — the whole
            # VPU cost of the old kernel — is skipped (VERDICT r2 item 4:
            # shortlist-style redesign).
            thresh = acc_s[rows, k_pad - 1:k_pad]          # (G, 1)
            hit = jnp.any(chunk_s > thresh)

            @pl.when(hit)
            def _(chunk_s=chunk_s, rows=rows, c=c):
                run_s, run_i = acc_s[rows, :], acc_i[rows, :]
                chunk_i = jax.lax.broadcasted_iota(
                    jnp.int32, (_ROW_GROUP, k_pad), 1) + (base + c * k_pad)
                chunk_i = jnp.where(chunk_s > NEG_INF, chunk_i,
                                    jnp.int32(2**31 - 1))
                chunk_s, chunk_i = bitonic_sort(chunk_s, chunk_i,
                                                descending=False)
                run_s, run_i = _merge_sorted_topk(run_s, run_i,
                                                  chunk_s, chunk_i)
                acc_s[rows, :] = run_s
                acc_i[rows, :] = run_i
        return 0

    jax.lax.fori_loop(0, block_q // _ROW_GROUP, row_group, 0)

    @pl.when(j == n_j - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "block_n", "interpret"))
def topk_ip_pallas(queries: jax.Array, bank: jax.Array, k: int,
                   block_q: int = 128, block_n: int = 512,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused GEMM + streaming top-k. Per-tile scores stay in VMEM.

    Returns (scores (Q, k), indices (Q, k)) matching :func:`topk_ip_numpy`.
    """
    q, d = queries.shape
    n = bank.shape[0]
    k_pad = max(128, _round_up(k, 128))
    block_n = max(block_n, k_pad)
    assert block_n % k_pad == 0

    q_pad = _round_up(q, block_q)
    n_pad = _round_up(n, block_n)
    d_pad = _round_up(d, 128)
    queries_p = jnp.zeros((q_pad, d_pad), jnp.float32).at[:q, :d].set(
        queries.astype(jnp.float32))
    bank_p = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(
        bank.astype(jnp.float32))

    grid = (q_pad // block_q, n_pad // block_n)
    kernel = functools.partial(_topk_kernel, k_pad=k_pad, block_n=block_n,
                               n_total=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k_pad), jnp.float32),
            pltpu.VMEM((block_q, k_pad), jnp.int32),
            pltpu.VMEM((block_q, block_n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=(q_pad * d_pad + n_pad * d_pad + 2 * q_pad * k_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries_p, bank_p)
    return out_s[:q, :k], out_i[:q, :k]
