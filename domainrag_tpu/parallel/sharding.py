"""Parameter sharding rules (Megatron-style TP + FSDP) for the models.

GSPMD does the heavy lifting: we annotate parameter shardings and let XLA
insert the collectives (all-gather on the column-sharded projections' edge,
reduce on row-sharded contractions), riding ICI within the mesh.

Flux MMDiT rules over the ``model`` axis:
- column-sharded (output dim): qkv fusions, MLP up-projections, modulation
  producers are replicated (tiny), so: ``img_qkv``/``txt_qkv``/``linear1``/
  ``*_mlp1``;
- row-sharded (input dim): attention output and MLP down projections:
  ``img_proj``/``txt_proj``/``linear2``/``*_mlp2``;
- everything else replicated.

FSDP mode shards every large parameter's leading dim over ``data`` instead
(weight-gathered on use) — the right choice when batch >> TP efficiency.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_SHARDED = ("img_qkv", "txt_qkv", "linear1", "img_mlp1", "txt_mlp1")
ROW_SHARDED = ("img_proj", "txt_proj", "linear2", "img_mlp2", "txt_mlp2")


def _path_names(path) -> list:
    names = []
    for part in path:
        if hasattr(part, "key"):
            names.append(str(part.key))
        elif hasattr(part, "idx"):
            names.append(str(part.idx))
    return names


def flux_param_specs(params, model_axis: str = "model",
                     fsdp_axis: Optional[str] = None):
    """PartitionSpec pytree for a Flux param tree.

    ``fsdp_axis``: additionally shard large replicated weights' first dim
    over that axis (ZeRO-3 style weight sharding).
    """
    def spec_for(path, leaf):
        names = _path_names(path)
        ndim = getattr(leaf, "ndim", 0)
        parent = [n for n in names if not n.isdigit()]
        in_block = any(n in ("double", "single") for n in names)
        owner = None
        for n in reversed(parent):
            if n in COL_SHARDED or n in ROW_SHARDED:
                owner = n
                break
        if in_block and owner in COL_SHARDED:
            if names[-1] == "w" and ndim == 2:
                return P(None, model_axis)
            if names[-1] == "b" and ndim == 1:
                return P(model_axis)
        if in_block and owner in ROW_SHARDED:
            if names[-1] == "w" and ndim == 2:
                return P(model_axis, None)
            # row-sharded layer's bias is added post-reduction: replicate
            return P()
        if fsdp_axis is not None and ndim >= 2:
            return P(fsdp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, specs=None, **kw):
    """device_put the param tree with the given (or derived) specs."""
    if specs is None:
        specs = flux_param_specs(params, **kw)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def validate_divisibility(params, specs, mesh: Mesh) -> None:
    """Every sharded dim must divide by its mesh axis size (else GSPMD
    silently pads — reject early instead)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def check(path, leaf, spec):
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = axis_sizes[axis] if isinstance(axis, str) else \
                int(np.prod([axis_sizes[a] for a in axis]))
            if leaf.shape[dim] % size != 0:
                raise ValueError(
                    f"param {_path_names(path)} dim {dim} "
                    f"({leaf.shape[dim]}) not divisible by {axis}={size}")

    jax.tree_util.tree_map_with_path(check, params, specs)
