"""Weight-only int8 quantization: exactness bound and model-level drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models import quant
from domainrag_tpu.models.common import linear, linear_init
from domainrag_tpu.models.flux import model as flux


def test_quantized_linear_close(rng):
    p = linear_init(jax.random.PRNGKey(0), 64, 128)
    q = quant.quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8 and q["w_s"].shape == (128,)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    dense = np.asarray(linear(p, x))
    quantized = np.asarray(linear(q, x))
    rel = np.abs(quantized - dense).max() / (np.abs(dense).max() + 1e-8)
    assert rel < 0.02  # per-channel int8 keeps relative error ~<1%


def test_quantize_tree_selective():
    params = {
        "big": {"w": jnp.ones((512, 256))},
        "small": {"w": jnp.ones((4, 4))},
        "nested": [{"inner": {"w": jnp.ones((512, 256)),
                              "b": jnp.zeros((256,))}}],
        "norm": {"scale": jnp.ones((8,))},
    }
    q = quant.quantize_tree(params, min_size=1024)
    assert "w_q" in q["big"] and "w" not in q["big"]
    assert "w" in q["small"]                      # below threshold
    assert "w_q" in q["nested"][0]["inner"]
    assert "b" in q["nested"][0]["inner"]         # bias preserved f32
    assert "scale" in q["norm"]
    # int8 weights shrink the tree
    assert quant.quantized_bytes(q) < quant.quantized_bytes(params)


def test_w8a8_linear_close(rng):
    """W8A8 serving mode (int8 activations + int8 MXU dot) stays within a
    small relative error of the f32 linear and restores cleanly."""
    from domainrag_tpu.models import common

    p = linear_init(jax.random.PRNGKey(1), 128, 256)
    q = quant.quantize_linear(p)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
    dense = np.asarray(linear(p, x))
    common.set_int8_activations(True)
    try:
        w8a8 = np.asarray(jax.jit(linear)(q, x))
    finally:
        common.set_int8_activations(False)
    rel = np.abs(w8a8 - dense).max() / (np.abs(dense).max() + 1e-8)
    assert rel < 0.05  # dynamic per-token int8: ~1-2% typical
    # flag restored: back to the weight-only path (different numerics)
    wonly = np.asarray(linear(q, x))
    assert not np.array_equal(wonly, w8a8) or rel == 0.0


def test_w8a8_flux_forward_correlated(rng):
    """Full MMDiT forward under W8A8 remains highly correlated with dense
    — the serving-quality gate for the int8-MXU bench mode."""
    from domainrag_tpu.models import common

    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_tree(params, min_size=256)
    img = jnp.asarray(rng.standard_normal(
        (1, 16, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (1, 6, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)).astype(np.float32))
    t = jnp.full((1,), 0.5)
    g = jnp.full((1,), 4.0)
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))
    dense = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid,
                                  cfg, guidance=g))
    common.set_int8_activations(True)
    try:
        w8a8 = np.asarray(flux.apply(qparams, img, txt, pooled, t, iid,
                                     tid, cfg, guidance=g))
    finally:
        common.set_int8_activations(False)
    corr = np.corrcoef(dense.ravel(), w8a8.ravel())[0, 1]
    assert corr > 0.985


def test_flux_forward_quantized(rng):
    """Full MMDiT forward with quantized weights stays close to dense."""
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_tree(params, min_size=256)

    img = jnp.asarray(rng.standard_normal(
        (1, 16, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (1, 6, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)).astype(np.float32))
    t = jnp.full((1,), 0.5)
    g = jnp.full((1,), 4.0)
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))

    dense = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid,
                                  cfg, guidance=g))
    quantized = np.asarray(flux.apply(qparams, img, txt, pooled, t, iid,
                                      tid, cfg, guidance=g))
    # layered error accumulates; demand correlation rather than tightness
    denom = np.abs(dense).max() + 1e-8
    assert np.abs(quantized - dense).max() / denom < 0.2
    corr = np.corrcoef(dense.ravel(), quantized.ravel())[0, 1]
    assert corr > 0.99
