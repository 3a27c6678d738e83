"""Training loop driver: domain fine-tuning of the Flux MMDiT on the
pipeline's own outputs (or any latent dataset).

Beyond the reference (inference-only): ``fit`` runs the sharded
flow-matching step over a mesh with periodic Orbax checkpoints, graceful
SIGINT stop, and progress/ETA reporting — the same aux subsystems the
inference stages use.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np

from ..core.interrupt import should_stop
from ..core.log import get_logger
from ..core.progress import ProgressReporter
from ..models.flux import model as flux_mod
from ..parallel.mesh import create_mesh
from . import checkpoint as ckpt_mod
from . import flow_match

logger = get_logger("domainrag_tpu.train")


def latent_batches_from_images(image_dirs, vae_params, vae_cfg, bundle,
                               batch_size: int, key,
                               prompt: str = "") -> Iterator[dict]:
    """Stream training batches from directories of images: VAE-encode to
    packed latent tokens, pair with the (shared) encoded prompt."""
    import glob as globlib

    import jax.numpy as jnp

    from ..core import imaging
    from ..models.flux import pipeline as fp
    from ..models.flux import vae as vae_mod

    paths = sorted(p for d in image_dirs
                   for p in globlib.glob(os.path.join(d, "*.png"))
                   + globlib.glob(os.path.join(d, "*.jpg")))
    if not paths:
        return
    txt, pooled = fp.encode_prompt(bundle, [prompt])
    lf = bundle.latent_factor
    while True:
        key, sub = jax.random.split(key)
        picks = jax.random.choice(sub, len(paths), (batch_size,),
                                  replace=len(paths) < batch_size)
        pixels = []
        size = None
        for idx in np.asarray(picks):
            img = imaging.load_rgb(paths[int(idx)])
            if size is None:
                w = imaging.to_multiple_of(img.width, lf, lf * 2)
                h = imaging.to_multiple_of(img.height, lf, lf * 2)
                size = (w, h)
            pixels.append(np.asarray(img.resize(size)) / 127.5 - 1.0)
        batch_px = jnp.asarray(np.stack(pixels), jnp.float32)
        latents = vae_mod.encode(vae_params, batch_px, vae_cfg)
        x0 = flux_mod.pack_latents(latents)
        grid_h = latents.shape[1] // 2
        grid_w = latents.shape[2] // 2
        yield {
            "x0": x0,
            "txt": jnp.broadcast_to(txt, (batch_size,) + txt.shape[1:]),
            "pooled": jnp.broadcast_to(pooled,
                                       (batch_size,) + pooled.shape[1:]),
            "img_ids": jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w)),
            "txt_ids": jnp.asarray(flux_mod.make_text_ids(txt.shape[1])),
        }


def fit(params, flux_cfg: flux_mod.FluxConfig,
        batches: Iterable[dict],
        num_steps: int,
        train_cfg: Optional[flow_match.TrainConfig] = None,
        mesh=None, model_parallel: int = 1, fsdp: bool = True,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 100,
        seed: int = 0,
        log_every: int = 10):
    """Run ``num_steps`` sharded flow-matching steps. Returns
    (final_params, losses)."""
    from ..models import common as _common
    if _common._INT8_ACTIVATIONS:
        # the W8A8 serving mode quantizes activations through round(),
        # whose gradient is zero a.e. — training would silently learn
        # nothing. Serving-only; fail loudly.
        raise ValueError(
            "training is incompatible with the W8A8 serving mode "
            "(set_int8_activations(True) / --w8a8): activation "
            "round() has zero gradient. Disable it before fit().")
    train_cfg = train_cfg or flow_match.TrainConfig()
    if mesh is None:
        mesh = create_mesh(model_parallel=model_parallel)
    step_fn, sharded_params, opt_state, batch_sharding = \
        flow_match.make_sharded_train_step(mesh, flux_cfg, train_cfg,
                                           params, fsdp=fsdp)
    key = jax.random.PRNGKey(seed)
    reporter = ProgressReporter(num_steps, label="train-steps",
                                log_every=log_every)
    losses = []
    it = iter(batches)
    for step in range(num_steps):
        if should_stop():
            logger.warning("graceful stop at step %d", step)
            break
        try:
            batch = next(it)
        except StopIteration:
            logger.warning("data exhausted at step %d", step)
            break
        batch = {k: jax.device_put(v, batch_sharding[k])
                 for k, v in batch.items()}
        key, sub = jax.random.split(key)
        sharded_params, opt_state, loss = step_fn(sharded_params, opt_state,
                                                  batch, sub)
        losses.append(float(loss))
        reporter.update(ok=np.isfinite(losses[-1]),
                        detail=f"loss={losses[-1]:.4f}")
        if checkpoint_dir and (step + 1) % checkpoint_every == 0:
            ckpt_mod.save_checkpoint(checkpoint_dir, step + 1,
                                     jax.device_get(sharded_params))
    if checkpoint_dir:
        ckpt_mod.save_checkpoint(checkpoint_dir, num_steps,
                                 jax.device_get(sharded_params))
    return sharded_params, losses
