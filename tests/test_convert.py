"""Checkpoint converter validation without real weights: round-trip our
param tree through a synthetic diffusers-layout state dict and require
exact equality, plus a forward-pass equivalence check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models import convert
from domainrag_tpu.models.flux import model as flux
from domainrag_tpu.models.flux import vae as vae_mod


from domainrag_tpu.models.export_diffusers import (
    export_flux_to_diffusers, export_vae_to_diffusers)


def test_flux_transformer_roundtrip(rng):
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    sd = export_flux_to_diffusers(params, cfg)
    back = convert.convert_flux_transformer(sd, cfg)

    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b, "converted tree structure differs"
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # forward equivalence (belt and braces)
    img = jnp.asarray(rng.standard_normal(
        (1, 16, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (1, 6, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)).astype(np.float32))
    args = (img, txt, pooled, jnp.full((1,), 0.5),
            jnp.asarray(flux.make_image_ids(4, 4)),
            jnp.asarray(flux.make_text_ids(6)))
    g = jnp.full((1,), 4.0)
    out_a = flux.apply(params, *args, cfg, guidance=g)
    out_b = flux.apply(back, *args, cfg, guidance=g)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)


def test_flux_vae_roundtrip(rng):
    cfg = vae_mod.TINY_VAE
    params = vae_mod.init(jax.random.PRNGKey(1), cfg)
    sd = export_vae_to_diffusers(params)
    back = convert.convert_flux_vae(sd, cfg)
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    imgs = jnp.asarray(rng.standard_normal((1, 16, 16, 3))
                       .astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vae_mod.encode(back, imgs, cfg)),
        np.asarray(vae_mod.encode(params, imgs, cfg)), rtol=1e-5,
        atol=1e-6)


def test_lama_ordered_roundtrip(rng):
    """Export our tiny LaMa tree in torch module order + layout, convert
    back, require exact equality and a matching forward."""
    from domainrag_tpu.models import lama as lama_mod

    cfg = lama_mod.TINY_LAMA
    params = lama_mod.init(jax.random.PRNGKey(2), cfg)
    order = convert.lama_leaf_order(params)
    sd = {}
    for i, (path, leaf) in enumerate(order):
        arr = np.asarray(leaf)
        if arr.ndim == 4:  # HWIO -> torch (O, I, kh, kw)
            arr = arr.transpose(3, 2, 0, 1)
        sd[f"model.{i}.param"] = arr
    sd["model.bn.num_batches_tracked"] = np.asarray(3)  # 0-d skipped

    back = convert.convert_lama(sd, cfg)
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:8, 4:8].set(1.0)
    np.testing.assert_array_equal(
        np.asarray(lama_mod.apply(back, img, mask, cfg)),
        np.asarray(lama_mod.apply(params, img, mask, cfg)))


def test_lama_ordered_rejects_mismatch():
    from domainrag_tpu.models import lama as lama_mod
    cfg = lama_mod.TINY_LAMA
    params = lama_mod.init(jax.random.PRNGKey(2), cfg)
    order = convert.lama_leaf_order(params)
    sd = {f"p{i}": np.zeros((1, 2, 3)) for i in range(len(order))}
    with pytest.raises(ValueError):
        convert.convert_lama(sd, cfg)
