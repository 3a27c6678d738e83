"""Flux VAE structure tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models.flux import vae


@pytest.fixture(scope="module")
def tiny():
    cfg = vae.TINY_VAE
    params = vae.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_encode_decode_shapes(tiny, rng):
    cfg, params = tiny
    imgs = jnp.asarray(rng.standard_normal((1, 16, 24, 3)).astype(np.float32))
    z = vae.encode(params, imgs, cfg)
    f = cfg.spatial_factor
    assert z.shape == (1, 16 // f, 24 // f, cfg.latent_channels)
    out = vae.decode(params, z, cfg)
    assert out.shape == (1, 16, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_deterministic_vs_sampled(tiny, rng):
    cfg, params = tiny
    imgs = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    z1 = vae.encode(params, imgs, cfg)
    z2 = vae.encode(params, imgs, cfg)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z3 = vae.encode(params, imgs, cfg, key=jax.random.PRNGKey(1))
    assert np.abs(np.asarray(z3) - np.asarray(z1)).max() > 1e-6


def test_latent_normalization_roundtrip(tiny, rng):
    """encode applies (m - shift) * scale; decode inverts before conv."""
    cfg, params = tiny
    imgs = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    moments = vae.encode_moments(params, imgs, cfg)
    mean = np.asarray(moments)[..., :cfg.latent_channels]
    z = np.asarray(vae.encode(params, imgs, cfg))
    np.testing.assert_allclose(z, (mean - cfg.shift_factor)
                               * cfg.scaling_factor, rtol=1e-5, atol=1e-6)


def test_tiled_decode_matches_full(tiny, rng):
    """Tiled decode is deliberately lossy near seams (each tile sees its
    own global mid-attention context — same tradeoff as diffusers' tiled
    VAE); the contract is bounded deviation + exactness when one tile
    covers the whole latent."""
    cfg, params = tiny
    lat = jnp.asarray(rng.standard_normal(
        (1, 12, 20, cfg.latent_channels)).astype(np.float32))
    full = np.asarray(vae.decode(params, lat, cfg))
    tiled = np.asarray(vae.decode_tiled(params, lat, cfg, tile=8, overlap=4))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    err = np.abs(tiled - full)
    assert err.mean() < 0.2  # random-weight worst case measured ~0.08
    # single-tile path is exactly the full decode
    exact = np.asarray(vae.decode_tiled(params, lat, cfg, tile=32,
                                        overlap=4))
    np.testing.assert_array_equal(exact, full)
