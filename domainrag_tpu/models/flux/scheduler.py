"""Flow-match Euler scheduler for the Flux rectified-flow models (B5/B6).

Semantics match diffusers' ``FlowMatchEulerDiscreteScheduler`` as driven by
``FluxPipeline``/``FluxFillPipeline`` (the reference samplers:
``batch_generate_flux_kshot.py:467-474`` — 50 steps, and
``outpainting_updown_sampling_redux.py:1246-1257`` — 50 steps with
``strength`` partial denoise):

- base sigma grid ``linspace(1, 1/steps, steps)`` plus a terminal 0;
- flux-dev *dynamic shifting*: ``mu`` from the image token count
  (256 -> base_shift, 4096 -> max_shift), sigmas warped by
  ``exp(mu) / (exp(mu) + (1/s - 1))``;
- Euler update ``x += (sigma_next - sigma) * v``;
- ``strength``: start at index ``steps - min(steps*strength, steps)`` with
  latents ``sigma_start * noise + (1 - sigma_start) * image_latents``
  (diffusers ``scale_noise``).

The denoise loop is a ``lax.fori_loop`` over a static sigma table — one
compiled XLA graph per (shape, steps) bucket.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def calculate_shift(image_seq_len: int,
                    base_seq_len: int = 256, max_seq_len: int = 4096,
                    base_shift: float = 0.5, max_shift: float = 1.15
                    ) -> float:
    """Flux-dev's resolution-dependent schedule shift (diffusers
    ``calculate_shift``)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma_exponent: float, sigmas: np.ndarray
               ) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) +
                           (1.0 / sigmas - 1.0) ** sigma_exponent)


@dataclasses.dataclass(frozen=True)
class FlowSchedule:
    """Sigma table with terminal 0: ``sigmas[i] -> sigmas[i+1]`` per step."""

    sigmas: np.ndarray            # (num_steps + 1,), descending, last = 0
    start_index: int = 0          # strength trim offset

    @property
    def num_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def timesteps(self) -> np.ndarray:
        """Model conditioning values: sigma (t/1000 convention handled by
        the embedder, which multiplies by 1000)."""
        return self.sigmas[:-1]

    @property
    def start_sigma(self) -> float:
        return float(self.sigmas[0])


def make_schedule(num_steps: int,
                  image_seq_len: Optional[int] = None,
                  use_dynamic_shifting: bool = True,
                  base_shift: float = 0.5, max_shift: float = 1.15,
                  shift: float = 3.0,
                  strength: float = 1.0,
                  num_train_timesteps: int = 1000) -> FlowSchedule:
    """Build the (possibly strength-trimmed) sigma table.

    ``strength < 1`` reproduces diffusers img2img/fill trimming:
    ``t_start = steps - min(int(steps * strength), steps)`` and the loop
    runs the remaining ``steps - t_start`` steps.
    """
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps,
                         dtype=np.float64)
    if use_dynamic_shifting:
        if image_seq_len is None:
            raise ValueError("dynamic shifting needs image_seq_len")
        mu = calculate_shift(image_seq_len, base_shift=base_shift,
                             max_shift=max_shift)
        sigmas = time_shift(mu, 1.0, sigmas)
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    sigmas = np.append(sigmas, 0.0).astype(np.float32)

    init_steps = min(int(num_steps * strength), num_steps)
    t_start = max(num_steps - init_steps, 0)
    return FlowSchedule(sigmas=sigmas[t_start:], start_index=t_start)


def scale_noise(sample: jax.Array, noise: jax.Array,
                sigma: float) -> jax.Array:
    """Forward noising at sigma (diffusers ``scale_noise``)."""
    return sigma * noise + (1.0 - sigma) * sample


def euler_step(x: jax.Array, velocity: jax.Array,
               sigma: jax.Array, sigma_next: jax.Array) -> jax.Array:
    # f32 state update regardless of model compute dtype (diffusers keeps
    # scheduler state f32 to avoid drift over 50 steps)
    return (x.astype(jnp.float32)
            + (sigma_next - sigma) * velocity.astype(jnp.float32)
            ).astype(x.dtype)


def denoise(model_fn: Callable[[jax.Array, jax.Array], jax.Array],
            latents: jax.Array, schedule: FlowSchedule) -> jax.Array:
    """Run the full Euler loop. ``model_fn(latents, timestep)`` returns the
    velocity prediction; traced once, iterated with ``lax.fori_loop``."""
    sigmas = jnp.asarray(schedule.sigmas, jnp.float32)

    def body(i, x):
        sigma = sigmas[i]
        v = model_fn(x, sigma)
        return euler_step(x, v, sigma, sigmas[i + 1])

    return jax.lax.fori_loop(0, schedule.num_steps, body, latents)
