"""Flux MMDiT structural/numerical tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models.flux import model as flux


@pytest.fixture(scope="module")
def tiny():
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_inputs(cfg, b=2, grid=4, s_txt=6, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal(
        (b, grid * grid, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (b, s_txt, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (b, cfg.pooled_dim)).astype(np.float32))
    t = jnp.full((b,), 0.7, jnp.float32)
    g = jnp.full((b,), 2.5, jnp.float32)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    return img, txt, pooled, t, g, img_ids, txt_ids


def test_forward_shape_and_determinism(tiny):
    cfg, params = tiny
    img, txt, pooled, t, g, iid, tid = make_inputs(cfg)
    out1 = flux.apply(params, img, txt, pooled, t, iid, tid, cfg, guidance=g)
    out2 = flux.apply(params, img, txt, pooled, t, iid, tid, cfg, guidance=g)
    assert out1.shape == (2, 16, cfg.out_channels)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_guidance_required_and_effective(tiny):
    cfg, params = tiny
    img, txt, pooled, t, g, iid, tid = make_inputs(cfg)
    with pytest.raises(ValueError):
        flux.apply(params, img, txt, pooled, t, iid, tid, cfg)
    out_a = flux.apply(params, img, txt, pooled, t, iid, tid, cfg,
                       guidance=jnp.full((2,), 2.5))
    out_b = flux.apply(params, img, txt, pooled, t, iid, tid, cfg,
                       guidance=jnp.full((2,), 30.0))
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6


def test_timestep_conditioning(tiny):
    cfg, params = tiny
    img, txt, pooled, _, g, iid, tid = make_inputs(cfg)
    o1 = flux.apply(params, img, txt, pooled, jnp.full((2,), 0.1), iid, tid,
                    cfg, guidance=g)
    o2 = flux.apply(params, img, txt, pooled, jnp.full((2,), 0.9), iid, tid,
                    cfg, guidance=g)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_rope_translation_sensitivity(tiny):
    """Shifting image grid positions changes attention (RoPE active)."""
    cfg, params = tiny
    img, txt, pooled, t, g, iid, tid = make_inputs(cfg)
    iid_shift = iid.at[:, 1:].add(5)
    o1 = flux.apply(params, img, txt, pooled, t, iid, tid, cfg, guidance=g)
    o2 = flux.apply(params, img, txt, pooled, t, iid_shift, tid, cfg,
                    guidance=g)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_timestep_embedding_values():
    emb = flux.timestep_embedding(jnp.asarray([0.0]), 8)
    # t=0 -> cos(0)=1, sin(0)=0
    np.testing.assert_allclose(np.asarray(emb)[0],
                               [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
    emb2 = flux.timestep_embedding(jnp.asarray([0.5]), 256)
    assert np.isfinite(np.asarray(emb2)).all()


def test_rope_rotation_identity():
    """Zero positions -> identity; rotation preserves norms."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 5, 16)).astype(np.float32))
    ids0 = jnp.zeros((5, 3), jnp.int32)
    cos, sin = flux.rope_cos_sin(ids0, (4, 6, 6), 10000)
    out = flux.apply_rope(x, cos[None, None], sin[None, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    ids = jnp.asarray(flux.make_image_ids(5, 1))
    cos, sin = flux.rope_cos_sin(ids, (4, 6, 6), 10000)
    out = flux.apply_rope(x, cos[None, None], sin[None, None])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((2, 8, 6, 16)).astype(np.float32))
    tokens = flux.pack_latents(lat)
    assert tokens.shape == (2, 4 * 3, 64)
    back = flux.unpack_latents(tokens, 4, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_pack_layout_matches_diffusers():
    """Feature order must be c*4 + dy*2 + dx (diffusers _pack_latents)."""
    h = w = 2
    c = 3
    lat = np.zeros((1, h, w, c), np.float32)
    # encode position+channel into values: value = c_idx*100 + dy*10 + dx
    for dy in range(2):
        for dx in range(2):
            for ci in range(c):
                lat[0, dy, dx, ci] = ci * 100 + dy * 10 + dx
    tokens = np.asarray(flux.pack_latents(jnp.asarray(lat)))[0, 0]
    expect = [ci * 100 + dy * 10 + dx
              for ci in range(c) for dy in range(2) for dx in range(2)]
    np.testing.assert_array_equal(tokens, expect)


def test_fill_variant_shapes():
    cfg = flux.FluxConfig(in_channels=flux.TINY_FLUX.in_channels * 6,
                          out_channels=flux.TINY_FLUX.out_channels,
                          hidden=64, heads=4, head_dim=16, depth_double=1,
                          depth_single=1, text_dim=32, pooled_dim=24,
                          time_embed_dim=32, axes_dim=(4, 6, 6))
    params = flux.init(jax.random.PRNGKey(1), cfg)
    img, txt, pooled, t, g, iid, tid = make_inputs(cfg, b=1)
    out = flux.apply(params, img, txt, pooled, t, iid, tid, cfg, guidance=g)
    assert out.shape == (1, 16, cfg.out_channels)


def test_apply_with_cache_refresh_exact(rng):
    """refresh=True is exactly apply(); replaying the recorded residuals
    on the same inputs reproduces the refresh output (the exactness
    anchor for the block-caching accelerator, arXiv:2312.03209 family)."""
    import jax
    import jax.numpy as jnp

    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.standard_normal(
        (2, 16, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (2, 6, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (2, cfg.pooled_dim)).astype(np.float32))
    t = jnp.full((2,), 0.5)
    g = jnp.full((2,), 4.0)
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))

    ref = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid,
                                cfg, guidance=g))
    cache = flux.init_block_cache(cfg, 2, 16, 6, dtype=jnp.float32)
    out, cache = flux.apply_with_cache(
        params, img, txt, pooled, t, iid, tid, cfg, cache,
        refresh=jnp.bool_(True), guidance=g)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    # replay: same inputs, refresh=False -> residual adds retrace the
    # refresh trajectory exactly
    out2, _ = flux.apply_with_cache(
        params, img, txt, pooled, t, iid, tid, cfg, cache,
        refresh=jnp.bool_(False), guidance=g)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
