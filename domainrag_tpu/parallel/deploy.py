"""Deployment sharding for full Flux bundles (the v5e-8 production path).

The 12B MMDiT in bf16 (~24 GB) exceeds one v5e chip's HBM: production
serving shards the transformer Megatron-style over the ``model`` axis
(SURVEY.md §2C: "2-way TP or weight-sharded FSDP-style pjit is required").
Everything else (VAE, text encoders, Redux) is small and replicated.

GSPMD propagates the param shardings through the unchanged model code and
inserts the ICI collectives; the denoise batch shards over ``data``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.flux.pipeline import FluxBundle
from . import sharding as sharding_mod


def shard_bundle(bundle: FluxBundle, mesh: Mesh,
                 model_axis: str = "model",
                 fsdp_axis: Optional[str] = None) -> FluxBundle:
    """Returns a bundle whose MMDiT params are TP(-and optionally FSDP-)
    sharded and whose auxiliary model params are replicated on the mesh."""
    specs = sharding_mod.flux_param_specs(bundle.flux_params,
                                          model_axis=model_axis,
                                          fsdp_axis=fsdp_axis)
    sharding_mod.validate_divisibility(bundle.flux_params, specs, mesh)
    flux_params = sharding_mod.shard_params(bundle.flux_params, mesh, specs)

    replicated = NamedSharding(mesh, P())

    def rep(tree):
        if tree is None:
            return None
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated), tree)

    return dataclasses.replace(
        bundle,
        tp_mesh=mesh,
        tp_axis=model_axis,
        flux_params=flux_params,
        vae_params=rep(bundle.vae_params),
        t5_params=rep(bundle.t5_params),
        clip_text_params=rep(bundle.clip_text_params),
        siglip_params=rep(bundle.siglip_params),
        redux_params=rep(bundle.redux_params),
    )
