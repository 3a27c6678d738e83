"""Ring (sequence-parallel) attention over the mesh (SURVEY.md §5
"long-context": optional sequence-sharded variant for the >=2048 px fill
configs, where the joint sequence reaches ~31k tokens).

Layout: Q/K/V sharded over the sequence axis across ``axis`` devices. Each
device owns one query block and streams every K/V block around the ring
with ``jax.lax.ppermute``, folding each block into a running online
softmax — the multi-chip generalization of the single-chip flash kernel
(ops.attention). Communication rides ICI; memory per device is O(seq/d).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _fold_block(q, k, v, m, l, acc, scale, kv_valid):
    """One online-softmax accumulation step.

    q: (B, H, Sq, D); k/v: (B, H, Skv, D); m/l: (B, H, Sq, 1);
    acc: (B, H, Sq, D) f32. kv_valid: (Skv,) bool mask for padding."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(kv_valid[None, None, None, :], s, NEG_INF)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    p = jnp.where(kv_valid[None, None, None, :], p, 0.0)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis: str = "data",
                   seq_valid: Optional[int] = None) -> jax.Array:
    """(B, H, S, D) with S divisible by the axis size (pad + pass
    ``seq_valid`` for ragged lengths). Returns (B, H, S, D), numerically
    the dense softmax attention."""
    b, h, s, d = q.shape
    n_dev = mesh.shape[axis]
    assert s % n_dev == 0, "pad the sequence to a multiple of the axis size"
    block = s // n_dev
    scale = 1.0 / math.sqrt(d)
    valid_len = s if seq_valid is None else seq_valid

    def local(q_blk, k_blk, v_blk):
        # q_blk/k_blk/v_blk: (B, H, block, D) on this device
        idx = jax.lax.axis_index(axis)

        def kv_mask(owner):
            pos = owner * block + jnp.arange(block)
            return pos < valid_len

        m = jnp.full((b, h, block, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((b, h, block, 1), jnp.float32)
        acc = jnp.zeros((b, h, block, d), jnp.float32)

        def body(step, carry):
            m, l, acc, k_cur, v_cur = carry
            owner = (idx + step) % n_dev  # whose block we hold this step
            m, l, acc = _fold_block(q_blk, k_cur, v_cur, m, l, acc, scale,
                                    kv_mask(owner))
            # rotate: receive the next block from the right neighbor
            perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return m, l, acc, k_next, v_next

        m, l, acc, _, _ = jax.lax.fori_loop(
            0, n_dev, body, (m, l, acc, k_blk, v_blk))
        return (acc / jnp.maximum(l, 1e-30)).astype(q_blk.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_vma=False)
    return fn(q, k, v)


def ring_attention_padded(q, k, v, mesh: Mesh, axis: str = "data"):
    """Convenience wrapper: pads ragged sequences to the axis multiple."""
    s = q.shape[2]
    n_dev = mesh.shape[axis]
    s_pad = (s + n_dev - 1) // n_dev * n_dev
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = ring_attention(q, k, v, mesh, axis=axis, seq_valid=s)
    return out[:, :, :s]
