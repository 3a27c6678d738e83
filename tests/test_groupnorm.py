"""Numerical pinning of models.common.groupnorm's single-reduction form.

The round-3 rewrite computes var = E[x²] − mean² in one fused pass
(tools/tpu_experiments.py exp_vae: the naive two-pass version cost 64 of
the 145 ms of a 1024 px VAE decode). The E[x²]−mean² formulation loses
precision when |mean| ≫ std — pin here that at the offsets real
activations reach it still matches a float64 two-pass oracle.

Consumers: flux/vae.py (diffusers AutoencoderKL semantics) and
models/lama.py; the reference runs torch GroupNorm inside both
(lama_inpaint/lama_inpaint.py:103, batch pipelines' VAE).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models.common import groupnorm


def _oracle(x, scale, bias, groups, eps=1e-6):
    """float64 two-pass reference."""
    b, h, w, c = x.shape
    xf = x.astype(np.float64).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) / np.sqrt(var + eps)).reshape(b, h, w, c)
    return y * scale + bias


@pytest.mark.parametrize("offset,scale_in", [
    (0.0, 1.0),          # centered activations
    (30.0, 0.5),         # large mean vs std — cancellation stress
    (-100.0, 2.0),       # the documented |x| ≲ 1e2 envelope
])
def test_groupnorm_matches_two_pass_oracle(rng, offset, scale_in):
    b, h, w, c, g = 2, 8, 8, 16, 4
    x = (rng.standard_normal((b, h, w, c)) * scale_in + offset
         ).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
    bias = rng.uniform(-0.5, 0.5, (c,)).astype(np.float32)
    got = np.asarray(groupnorm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x), groups=g), np.float64)
    want = _oracle(x, scale, bias, g)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_groupnorm_bf16_centered(rng):
    """bf16 inputs (the production VAE dtype) stay within bf16 rounding
    of the f64 oracle for centered activations."""
    b, h, w, c, g = 1, 16, 16, 32, 8
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    scale = np.ones((c,), np.float32)
    bias = np.zeros((c,), np.float32)
    got = np.asarray(groupnorm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x, jnp.bfloat16), groups=g).astype(jnp.float32),
        np.float64)
    want = _oracle(x, scale, bias, g)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_groupnorm_constant_input_stable():
    """Zero variance: rsqrt(eps) path must not produce NaN/Inf."""
    x = jnp.full((1, 4, 4, 8), 7.25, jnp.float32)
    out = np.asarray(groupnorm(
        {"scale": jnp.ones((8,), jnp.float32),
         "bias": jnp.zeros((8,), jnp.float32)}, x, groups=2))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0, atol=1e-2)
