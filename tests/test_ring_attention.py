"""Ring attention over 8 virtual devices vs the dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.ops import attention as attn
from domainrag_tpu.ops import ring_attention as ring
from domainrag_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.create_mesh(model_parallel=1)


def test_ring_matches_dense(mesh8, rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 16)).astype(np.float32))
    ref = np.asarray(attn.attention_reference(q, k, v))
    out = np.asarray(ring.ring_attention(q, k, v, mesh8))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_ragged_padded(mesh8, rng):
    # 50 tokens over 8 devices -> padded to 56, masked
    q = jnp.asarray(rng.standard_normal((1, 1, 50, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 50, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 50, 8)).astype(np.float32))
    ref = np.asarray(attn.attention_reference(q, k, v))
    out = np.asarray(ring.ring_attention_padded(q, k, v, mesh8))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_attention_differentiable(mesh8, rng):
    """Ring attention is pure jnp + ppermute inside shard_map, so grads
    flow without a custom VJP — the SP training path."""
    import jax
    q = jnp.asarray(rng.standard_normal((1, 1, 32, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 32, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 32, 8)).astype(np.float32))

    def loss_ring(q, k, v):
        return jnp.sum(ring.ring_attention(q, k, v, mesh8) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(attn.attention_reference(q, k, v) ** 2)

    gr = jax.grad(loss_ring, (0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, (0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
