"""Converter-convention gate: diffusers numpy oracle vs converted model.

A random tiny checkpoint is synthesized DIRECTLY in the diffusers layout
(torch ``(out, in)`` Linear weights, diffusers key names) — not via this
repo's exporter — then run through

  (a) tests/diffusers_numpy_oracle.py (independent float64 numpy
      implementation of the published diffusers Flux semantics), and
  (b) ``convert.convert_flux_transformer`` + ``flux.apply`` (the
      production path for real FLUX.1 weights).

Agreement pins every mapping convention the VERDICT flagged as a silent
single point of failure: the fused-qkv concat order, the single-block
linear1 [q,k,v,mlp] order, the ``norm_out`` (scale, shift) -> (shift,
scale) swap, qk-norm placement, RoPE pairing/axis order, the text-first
joint sequence, and the ``_pack_latents`` feature order.  If any of them
flips in the converter or the model, the outputs diverge structurally
(not by epsilon) and this test fails — with diffusers absent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domainrag_tpu.models import convert
from domainrag_tpu.models.flux import model as flux_mod

from diffusers_numpy_oracle import (flux_forward, pack_latents_nchw,
                                    unpack_latents_nchw)

CFG = flux_mod.TINY_FLUX  # hidden 64, 4 heads x 16, 2 double + 2 single


def _make_diffusers_state_dict(rng, cfg):
    """Random checkpoint with the exact diffusers FluxTransformer2DModel
    key set and torch shapes for ``cfg``."""
    h, mh = cfg.hidden, cfg.mlp_hidden
    sd = {}

    def lin(name, d_out, d_in):
        sd[f"{name}.weight"] = rng.standard_normal(
            (d_out, d_in)).astype(np.float32) / np.sqrt(d_in)
        sd[f"{name}.bias"] = 0.1 * rng.standard_normal(
            (d_out,)).astype(np.float32)

    lin("x_embedder", h, cfg.in_channels)
    lin("context_embedder", h, cfg.text_dim)
    for emb, d_in in [("timestep_embedder", cfg.time_embed_dim),
                      ("guidance_embedder", cfg.time_embed_dim),
                      ("text_embedder", cfg.pooled_dim)]:
        lin(f"time_text_embed.{emb}.linear_1", h, d_in)
        lin(f"time_text_embed.{emb}.linear_2", h, h)
    for i in range(cfg.depth_double):
        pre = f"transformer_blocks.{i}"
        lin(f"{pre}.norm1.linear", 6 * h, h)
        lin(f"{pre}.norm1_context.linear", 6 * h, h)
        for n in ["to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"]:
            lin(f"{pre}.attn.{n}", h, h)
        for n in ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]:
            sd[f"{pre}.attn.{n}.weight"] = (
                1.0 + 0.1 * rng.standard_normal(cfg.head_dim)
            ).astype(np.float32)
        lin(f"{pre}.attn.to_out.0", h, h)
        lin(f"{pre}.attn.to_add_out", h, h)
        lin(f"{pre}.ff.net.0.proj", mh, h)
        lin(f"{pre}.ff.net.2", h, mh)
        lin(f"{pre}.ff_context.net.0.proj", mh, h)
        lin(f"{pre}.ff_context.net.2", h, mh)
    for i in range(cfg.depth_single):
        pre = f"single_transformer_blocks.{i}"
        lin(f"{pre}.norm.linear", 3 * h, h)
        for n in ["to_q", "to_k", "to_v"]:
            lin(f"{pre}.attn.{n}", h, h)
        for n in ["norm_q", "norm_k"]:
            sd[f"{pre}.attn.{n}.weight"] = (
                1.0 + 0.1 * rng.standard_normal(cfg.head_dim)
            ).astype(np.float32)
        lin(f"{pre}.proj_mlp", mh, h)
        lin(f"{pre}.proj_out", h, h + mh)
    lin("norm_out.linear", 2 * h, h)
    lin("proj_out", cfg.out_channels, h)
    return sd


@pytest.fixture(scope="module")
def oracle_case():
    rng = np.random.default_rng(7)
    sd = _make_diffusers_state_dict(rng, CFG)
    grid = 4
    s_txt = 8
    img_tokens = rng.standard_normal(
        (1, grid * grid, CFG.in_channels)).astype(np.float32)
    txt_tokens = rng.standard_normal(
        (1, s_txt, CFG.text_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, CFG.pooled_dim)).astype(np.float32)
    img_ids = flux_mod.make_image_ids(grid, grid)
    txt_ids = flux_mod.make_text_ids(s_txt)
    t = np.asarray([0.7], np.float32)
    g = np.asarray([2.5], np.float32)
    return sd, img_tokens, txt_tokens, pooled, img_ids, txt_ids, t, g


def test_converted_model_matches_diffusers_oracle(oracle_case):
    sd, img_tokens, txt_tokens, pooled, img_ids, txt_ids, t, g = oracle_case
    want = flux_forward(
        sd, img_tokens, txt_tokens, pooled, t, img_ids, txt_ids,
        num_layers=CFG.depth_double, num_single_layers=CFG.depth_single,
        num_heads=CFG.heads, axes_dim=CFG.axes_dim,
        time_embed_dim=CFG.time_embed_dim, guidance=g, theta=CFG.theta)

    params = convert.convert_flux_transformer(sd, CFG)
    got = flux_mod.apply(
        params, jnp.asarray(img_tokens), jnp.asarray(txt_tokens),
        jnp.asarray(pooled), jnp.asarray(t), jnp.asarray(img_ids),
        jnp.asarray(txt_ids), CFG, guidance=jnp.asarray(g))

    got = np.asarray(got, np.float64)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-3 * max(scale, 1.0), (
        f"converted model diverges from diffusers semantics: "
        f"max |diff| {np.abs(got - want).max():.3e} vs scale {scale:.3e}")


def test_oracle_detects_flipped_norm_out(oracle_case):
    """The oracle must actually have teeth: flipping the norm_out chunk
    order in the converter input (scale<->shift halves swapped) must
    produce a structural mismatch."""
    sd, img_tokens, txt_tokens, pooled, img_ids, txt_ids, t, g = oracle_case
    want = flux_forward(
        sd, img_tokens, txt_tokens, pooled, t, img_ids, txt_ids,
        num_layers=CFG.depth_double, num_single_layers=CFG.depth_single,
        num_heads=CFG.heads, axes_dim=CFG.axes_dim,
        time_embed_dim=CFG.time_embed_dim, guidance=g, theta=CFG.theta)

    h = CFG.hidden
    sd_bad = dict(sd)
    w = sd["norm_out.linear.weight"]
    b = sd["norm_out.linear.bias"]
    sd_bad["norm_out.linear.weight"] = np.concatenate(
        [w[h:], w[:h]], axis=0)
    sd_bad["norm_out.linear.bias"] = np.concatenate([b[h:], b[:h]])
    params = convert.convert_flux_transformer(sd_bad, CFG)
    got = flux_mod.apply(
        params, jnp.asarray(img_tokens), jnp.asarray(txt_tokens),
        jnp.asarray(pooled), jnp.asarray(t), jnp.asarray(img_ids),
        jnp.asarray(txt_ids), CFG, guidance=jnp.asarray(g))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got, np.float64) - want).max() > 1e-2 * scale


def test_oracle_detects_flipped_qkv_order(oracle_case):
    """Swapping q<->v in the fused concat must diverge."""
    sd, img_tokens, txt_tokens, pooled, img_ids, txt_ids, t, g = oracle_case
    want = flux_forward(
        sd, img_tokens, txt_tokens, pooled, t, img_ids, txt_ids,
        num_layers=CFG.depth_double, num_single_layers=CFG.depth_single,
        num_heads=CFG.heads, axes_dim=CFG.axes_dim,
        time_embed_dim=CFG.time_embed_dim, guidance=g, theta=CFG.theta)
    sd_bad = dict(sd)
    pre = "transformer_blocks.0.attn"
    for a, bk in [("to_q", "to_v")]:
        for part in ["weight", "bias"]:
            sd_bad[f"{pre}.{a}.{part}"], sd_bad[f"{pre}.{bk}.{part}"] = \
                sd[f"{pre}.{bk}.{part}"], sd[f"{pre}.{a}.{part}"]
    params = convert.convert_flux_transformer(sd_bad, CFG)
    got = flux_mod.apply(
        params, jnp.asarray(img_tokens), jnp.asarray(txt_tokens),
        jnp.asarray(pooled), jnp.asarray(t), jnp.asarray(img_ids),
        jnp.asarray(txt_ids), CFG, guidance=jnp.asarray(g))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got, np.float64) - want).max() > 1e-2 * scale


def test_pack_latents_matches_diffusers_order():
    """Our NHWC pack_latents must equal diffusers' NCHW _pack_latents on
    the transposed input, and unpack must invert both."""
    rng = np.random.default_rng(3)
    lat_nchw = rng.standard_normal((2, 6, 8, 10)).astype(np.float32)
    want = pack_latents_nchw(lat_nchw)
    got = np.asarray(flux_mod.pack_latents(
        jnp.asarray(lat_nchw.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # inverses
    back = unpack_latents_nchw(want, 8, 10)
    np.testing.assert_allclose(back, lat_nchw, rtol=0, atol=0)
    ours_back = np.asarray(flux_mod.unpack_latents(jnp.asarray(got), 4, 5))
    np.testing.assert_allclose(ours_back.transpose(0, 3, 1, 2), lat_nchw,
                               rtol=0, atol=0)


def test_rope_matches_diffusers_pairing():
    """Our apply_rope must equal diffusers apply_rotary_emb +
    FluxPosEmbed tables (consecutive-pair rotation, per-axis concat)."""
    from diffusers_numpy_oracle import apply_rotary_emb, flux_pos_embed

    rng = np.random.default_rng(11)
    ids = np.stack([np.zeros(12, np.int32),
                    rng.integers(0, 9, 12).astype(np.int32),
                    rng.integers(0, 9, 12).astype(np.int32)], axis=-1)
    axes_dim = (4, 6, 6)
    x = rng.standard_normal((1, 2, 12, 16)).astype(np.float32)

    cos, sin = flux_pos_embed(ids, axes_dim)
    want = apply_rotary_emb(x.astype(np.float64),
                            cos[None, None], sin[None, None])

    cos_j, sin_j = flux_mod.rope_cos_sin(jnp.asarray(ids), axes_dim, 10000)
    got = flux_mod.apply_rope(jnp.asarray(x), cos_j[None, None],
                              sin_j[None, None])
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               atol=1e-5)
