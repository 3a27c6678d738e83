"""Ring (sequence-parallel) attention over the mesh (SURVEY.md §5
"long-context": sequence-sharded variant for the >=2048 px fill configs,
where the joint sequence reaches ~31k tokens).

Layout: Q/K/V sharded over the sequence axis across ``axis`` devices. Each
device owns one query block and streams every K/V block around the ring
with ``jax.lax.ppermute``, merging each block's normalized partial
attention (out_i, lse_i) into a running pair — the multi-chip
generalization of the single-chip flash kernel (ops.attention).
Communication rides ICI; memory per device is O(seq/d).

Per-block partials come from the Pallas flash kernel on TPU (q-block x
kv-block tiles stay in VMEM — no (block, block) logit materialization; at
the 2800 px cap that matrix would be ~15 GB/device in f32) and from a
dense fold elsewhere (CPU tests, tiny shapes).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _dense_block_lse(q, k, v, scale, kv_valid):
    """Normalized partial attention of one kv block.

    q: (B, H, Sq, D); k/v: (B, H, Skv, D); kv_valid: int32 scalar —
    kv positions >= it are masked. Returns (out f32, lse f32 (B,H,Sq,1))."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(k.shape[2])
    valid = (pos < kv_valid)[None, None, None, :]
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return out.astype(jnp.float32), lse


def _merge_partials(out_run, lse_run, out_i, lse_i):
    """Combine two normalized softmax partials over disjoint kv sets."""
    lse = jnp.logaddexp(lse_run, lse_i)
    w_run = jnp.exp(lse_run - lse)
    w_i = jnp.exp(lse_i - lse)
    return out_run * w_run + out_i * w_i, lse


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   axis: str = "data",
                   seq_valid: Optional[int] = None,
                   head_axis: Optional[str] = None) -> jax.Array:
    """(B, H, S, D) with S divisible by the axis size (pad + pass
    ``seq_valid`` for ragged lengths). Returns (B, H, S, D), numerically
    the dense softmax attention.

    ``head_axis`` additionally shards the head dim over that mesh axis
    (SP x TP composition for the 2048+ px fill configs: heads ride the
    ``model`` axis, sequence blocks ring over ``data``)."""
    b, h, s, d = q.shape
    n_dev = mesh.shape[axis]
    assert s % n_dev == 0, "pad the sequence to a multiple of the axis size"
    if head_axis is not None:
        assert h % mesh.shape[head_axis] == 0, \
            f"heads {h} not divisible by {head_axis} axis"
    block = s // n_dev
    scale = 1.0 / math.sqrt(d)
    valid_len = s if seq_valid is None else seq_valid
    use_flash = jax.default_backend() == "tpu"

    def local(q_blk, k_blk, v_blk):
        # q_blk/k_blk/v_blk: (B, H_local, block, D) on this device
        idx = jax.lax.axis_index(axis)
        h_local = q_blk.shape[1]

        out0 = jnp.zeros((b, h_local, block, d), jnp.float32)
        lse0 = jnp.full((b, h_local, block, 1), NEG_INF, jnp.float32)

        def body(step, carry):
            out, lse, k_cur, v_cur = carry
            owner = (idx + step) % n_dev  # whose block we hold this step
            kv_valid = jnp.clip(valid_len - owner * block, 0, block)
            if use_flash:
                from .attention import flash_attention_lse
                o_i, lse_i = flash_attention_lse(q_blk, k_cur, v_cur,
                                                 kv_valid=kv_valid)
                o_i = o_i.astype(jnp.float32)
            else:
                o_i, lse_i = _dense_block_lse(q_blk, k_cur, v_cur, scale,
                                              kv_valid)
            out, lse = _merge_partials(out, lse, o_i, lse_i)
            # rotate: receive the next block from the right neighbor
            perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return out, lse, k_next, v_next

        out, _, _, _ = jax.lax.fori_loop(
            0, n_dev, body, (out0, lse0, k_blk, v_blk))
        return out.astype(q_blk.dtype)

    spec = P(None, head_axis, axis, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec,) * 3,
        out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def ring_attention_padded(q, k, v, mesh: Mesh, axis: str = "data",
                          head_axis: Optional[str] = None):
    """Convenience wrapper: pads ragged sequences to the axis multiple."""
    s = q.shape[2]
    n_dev = mesh.shape[axis]
    s_pad = (s + n_dev - 1) // n_dev * n_dev
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = ring_attention(q, k, v, mesh, axis=axis, seq_valid=s,
                         head_axis=head_axis)
    return out[:, :, :s]
