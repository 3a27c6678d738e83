"""Rectified-flow (flow-matching) training for the Flux MMDiT.

The reference is inference-only (SURVEY.md: "no training loop"); this
module goes beyond it: domain fine-tuning of the generator on the very
images the pipeline synthesizes (or any latent dataset), with dp x tp
(x fsdp) sharding over a mesh.

Objective: x_t = (1 - t) x0 + t eps, target velocity v* = eps - x0,
loss = E ||v_theta(x_t, t) - v*||^2 with logit-normal t sampling (the
SD3/Flux recipe).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.flux import model as flux_mod
from ..parallel import sharding as sharding_mod


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    remat: bool = True              # checkpoint blocks (12B training)
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    guidance_value: float = 1.0     # distillation-style fixed guidance
    t_mean: float = 0.0             # logit-normal t distribution
    t_std: float = 1.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )


def sample_timesteps(key, batch: int, cfg: TrainConfig) -> jax.Array:
    """Logit-normal t in (0, 1)."""
    z = jax.random.normal(key, (batch,)) * cfg.t_std + cfg.t_mean
    return jax.nn.sigmoid(z)


def flow_match_loss(params, batch, key, flux_cfg: flux_mod.FluxConfig,
                    train_cfg: TrainConfig) -> jax.Array:
    """batch: dict with x0 (B, S, C) latent tokens, txt (B, S_t, D_t5),
    pooled (B, P), img_ids (S, 3), txt_ids (S_t, 3)."""
    x0 = batch["x0"]
    b = x0.shape[0]
    k_t, k_eps = jax.random.split(key)
    t = sample_timesteps(k_t, b, train_cfg)
    eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
    x_t = (1.0 - t[:, None, None]) * x0 + t[:, None, None] * eps
    target = eps - x0
    guidance = jnp.full((b,), train_cfg.guidance_value, jnp.float32) \
        if flux_cfg.guidance_embed else None
    # flash attention has a custom VJP (ops.attention), so training uses
    # the same O(seq)-memory kernel as inference on TPU
    v = flux_mod.apply(params, x_t, batch["txt"], batch["pooled"], t,
                       batch["img_ids"], batch["txt_ids"], flux_cfg,
                       guidance=guidance, remat=train_cfg.remat)
    return jnp.mean(jnp.square(v.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def train_step(params, opt_state, batch, key,
               flux_cfg: flux_mod.FluxConfig, train_cfg: TrainConfig,
               optimizer) -> Tuple[dict, optax.OptState, jax.Array]:
    loss, grads = jax.value_and_grad(flow_match_loss)(
        params, batch, key, flux_cfg, train_cfg)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(mesh: Mesh, flux_cfg: flux_mod.FluxConfig,
                            train_cfg: TrainConfig, params,
                            data_axis: str = "data",
                            model_axis: str = "model",
                            fsdp: bool = False):
    """jit the FULL training step over the mesh: params TP-sharded over
    ``model`` (optionally FSDP over ``data``), batch sharded over ``data``,
    optimizer state sharded like params. Returns
    (step_fn, sharded_params, sharded_opt_state, batch_shardings)."""
    optimizer = make_optimizer(train_cfg)
    specs = sharding_mod.flux_param_specs(
        params, model_axis=model_axis,
        fsdp_axis=data_axis if fsdp else None)
    sharding_mod.validate_divisibility(params, specs, mesh)
    sharded_params = sharding_mod.shard_params(params, mesh, specs)
    opt_state = optimizer.init(sharded_params)

    batch_sharding = {
        "x0": NamedSharding(mesh, P(data_axis)),
        "txt": NamedSharding(mesh, P(data_axis)),
        "pooled": NamedSharding(mesh, P(data_axis)),
        "img_ids": NamedSharding(mesh, P()),
        "txt_ids": NamedSharding(mesh, P()),
    }

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, batch, key):
        return train_step(p, o, batch, key, flux_cfg, train_cfg, optimizer)

    return step, sharded_params, opt_state, batch_sharding
