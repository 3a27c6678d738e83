"""Sharded retrieval search: bank rows sharded over the ``data`` axis,
per-shard fused top-k, all-gather of the k candidates, exact global merge.

This is the multi-chip form of ops.topk (SURVEY.md B1: "all-gather merge of
per-shard top-100"): each device scans only N/d bank rows; the merge moves
d*k candidates (tiny) over ICI instead of the full score matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import topk as topk_ops

_INT_MAX = jnp.int32(2**31 - 1)


def pad_bank_for_mesh(bank: np.ndarray, mesh: Mesh, axis: str = "data"
                      ) -> Tuple[np.ndarray, int]:
    """Zero-pad bank rows to a multiple of the axis size. Returns
    (padded_bank, n_valid); pass ``n_valid`` to :func:`sharded_topk`,
    which masks pad rows out of the merge."""
    n, d = bank.shape
    d_axis = mesh.shape[axis]
    n_pad = (n + d_axis - 1) // d_axis * d_axis
    if n_pad == n:
        return np.asarray(bank, np.float32), n
    pad = np.zeros((n_pad - n, d), np.float32)
    return np.concatenate([np.asarray(bank, np.float32), pad], 0), n


def sharded_topk(queries: jax.Array, bank: jax.Array, k: int, mesh: Mesh,
                 n_valid: int, axis: str = "data",
                 use_pallas: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    """queries (Q, D) replicated; bank (N_pad, D) row-sharded over ``axis``
    (N_pad from :func:`pad_bank_for_mesh`). Returns replicated (Q, k)
    scores and GLOBAL indices, ordering identical to the single-device
    oracle (score desc, index asc)."""
    n_pad = bank.shape[0]
    d_axis = mesh.shape[axis]
    assert n_pad % d_axis == 0, "use pad_bank_for_mesh first"
    shard_rows = n_pad // d_axis
    k = min(k, n_valid)
    kk = min(k, shard_rows)

    def local(q, bank_shard):
        idx_base = jax.lax.axis_index(axis) * shard_rows
        if use_pallas and jax.default_backend() == "tpu":
            s, i = topk_ops.topk_ip_pallas(q, bank_shard, kk)
        else:
            s, i = topk_ops.topk_ip(q, bank_shard, kk)
        i = i + idx_base
        # mask pad rows out before the merge
        valid = i < n_valid
        s = jnp.where(valid, s, jnp.float32(topk_ops.NEG_INF))
        i = jnp.where(valid, i, _INT_MAX)
        # gather candidates from every shard: (d, Q, kk)
        s_all = jax.lax.all_gather(s, axis)
        i_all = jax.lax.all_gather(i, axis)
        qn = q.shape[0]
        s_flat = s_all.transpose(1, 0, 2).reshape(qn, d_axis * kk)
        i_flat = i_all.transpose(1, 0, 2).reshape(qn, d_axis * kk)
        # exact global merge with (score desc, index asc) tie-break
        order = jnp.lexsort((i_flat, -s_flat), axis=-1)[:, :k]
        return (jnp.take_along_axis(s_flat, order, axis=1),
                jnp.take_along_axis(i_flat, order, axis=1))

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(axis, None)),
                       out_specs=(P(), P()),
                       check_vma=False)
    return fn(queries, bank)


def shard_bank(bank: np.ndarray, mesh: Mesh, axis: str = "data"):
    """device_put a padded bank with row sharding."""
    from jax.sharding import NamedSharding
    return jax.device_put(bank, NamedSharding(mesh, P(axis, None)))
