"""TP attention composition: head-sharded shard_map path equals the
replicated forward (mechanism test on CPU; on TPU the same wrapper runs
the Pallas kernel per shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models.flux import model as flux
from domainrag_tpu.ops import attention as attn
from domainrag_tpu.parallel import deploy, mesh as mesh_mod, sharding


@pytest.fixture(scope="module")
def mesh_tp():
    return mesh_mod.create_mesh(model_parallel=2)


def test_tp_attention_matches(mesh_tp, rng):
    q = jnp.asarray(rng.standard_normal((1, 4, 32, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 4, 32, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 4, 32, 16)).astype(np.float32))
    ref = np.asarray(attn.attention_reference(q, k, v))
    with attn.tp_attention(mesh_tp):
        out = np.asarray(attn.attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tp_attention_indivisible_heads_falls_back(mesh_tp, rng):
    # 3 heads not divisible by tp=2 -> dense fallback, still correct
    q = jnp.asarray(rng.standard_normal((1, 3, 16, 8)).astype(np.float32))
    with attn.tp_attention(mesh_tp):
        out = np.asarray(attn.attention(q, q, q))
    ref = np.asarray(attn.attention_reference(q, q, q))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flux_tp_forward_with_tp_attention(mesh_tp, rng):
    """Full MMDiT forward under jit with TP params AND head-sharded
    attention — the production v5e-8 configuration."""
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

    ref = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid, cfg,
                                guidance=g))
    specs = sharding.flux_param_specs(params)
    sharded = sharding.shard_params(params, mesh_tp, specs)
    with attn.tp_attention(mesh_tp):
        fn = jax.jit(lambda p, *a: flux.apply(p, *a, cfg, guidance=g))
        out = np.asarray(fn(sharded, img, txt, pooled, t, iid, tid))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


def test_dense_attention_context(rng):
    """dense_attention() forces the differentiable path (training on TPU
    must not route through the VJP-less Pallas kernel)."""
    import jax.numpy as jnp
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
    with attn.dense_attention():
        # grad through attention works in this context on any backend
        def loss(q):
            return jnp.sum(attn.attention(q, q, q) ** 2)
        g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    # context restores
    assert not getattr(attn._FORCE_REFERENCE, "value", False)
