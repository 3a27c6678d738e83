"""Flash attention vs dense reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from domainrag_tpu.ops import attention as attn


def make_qkv(rng, b, h, sq, skv, d, dtype=np.float32):
    q = rng.standard_normal((b, h, sq, d)).astype(dtype)
    k = rng.standard_normal((b, h, skv, d)).astype(dtype)
    v = rng.standard_normal((b, h, skv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("sq,skv,d,bq,bkv", [
    (128, 128, 64, 128, 128),      # single block
    (256, 384, 128, 128, 128),     # multi kv blocks
    (100, 200, 64, 64, 128),       # ragged seq -> padding/masking path
    (64, 640, 32, 64, 256),        # long kv, small d
])
def test_flash_matches_reference(rng, sq, skv, d, bq, bkv):
    q, k, v = make_qkv(rng, 1, 2, sq, skv, d)
    ref = attn.attention_reference(q, k, v)
    out = attn.flash_attention(q, k, v, block_q=bq, block_kv=bkv,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_causal(rng):
    q, k, v = make_qkv(rng, 1, 2, 96, 96, 64)
    ref = attn.attention_reference(q, k, v, causal=True)
    out = attn.flash_attention(q, k, v, causal=True, block_q=32, block_kv=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16(rng):
    q, k, v = make_qkv(rng, 1, 1, 128, 256, 64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attn.attention_reference(qb, kb, vb)
    out = attn.flash_attention(qb, kb, vb, block_q=128, block_kv=128,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_dispatch_reference_on_cpu(rng):
    q, k, v = make_qkv(rng, 1, 1, 16, 16, 32)
    out = attn.attention(q, k, v)
    ref = attn.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_masked_dispatch(rng):
    q, k, v = make_qkv(rng, 1, 1, 8, 8, 16)
    mask = jnp.tril(jnp.ones((1, 1, 8, 8), jnp.bool_))
    out = attn.attention(q, k, v, mask=mask)
    ref = attn.attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def flash_i(q, k, v, **kw):
    return attn.flash_attention(q, k, v, interpret=True, **kw)


@pytest.mark.parametrize("sq,skv,d,bq,bkv,causal", [
    (64, 64, 32, 64, 64, False),       # single block
    (96, 160, 64, 32, 128, False),     # multi-block, ragged
    (64, 64, 32, 32, 64, True),        # causal
])
def test_flash_backward_matches_dense(rng, sq, skv, d, bq, bkv, causal):
    q, k, v = make_qkv(rng, 1, 2, sq, skv, d)

    def loss_flash(q, k, v):
        out = attn.flash_attention(q, k, v, causal=causal, block_q=bq,
                                   block_kv=bkv, interpret=True)
        return jnp.sum(out * jnp.cos(out))   # nontrivial downstream grad

    def loss_dense(q, k, v):
        out = attn.attention_reference(q, k, v, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"d{name} mismatch")


def test_flash_lse_kv_valid(rng):
    """flash_attention_lse with a runtime kv_valid boundary == dense
    attention over the valid prefix (the ring-attention fold primitive)."""
    import jax.numpy as jnp
    q = jnp.asarray(rng.standard_normal((2, 3, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 24, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 24, 8)), jnp.float32)
    import numpy as np
    from domainrag_tpu.ops import attention as attn
    for valid in (24, 13, 1):
        out, lse = attn.flash_attention_lse(
            q, k, v, kv_valid=jnp.int32(valid), block_q=8, block_kv=8,
            interpret=True)
        ref = attn.attention_reference(q, k[:, :, :valid], v[:, :, :valid])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # lse sanity: finite over valid prefix
        assert np.isfinite(np.asarray(lse)).all()


def test_tuned_block_policy():
    """Default flash blocks follow the measured v5e policy (round 3):
    one KV pass at every production shape; bq=512 except the mid band
    around the 8448-token fill shape; even-tile fallback only past ~49k
    tokens; backward caps its kv block at 1024 for VMEM regardless."""
    from domainrag_tpu.ops.attention import _tuned_blocks

    assert _tuned_blocks(512) == (512, 512)
    assert _tuned_blocks(640) == (512, 640)
    assert _tuned_blocks(77) == (512, 128)       # pads to lane multiple
    assert _tuned_blocks(4608) == (512, 4608)    # 1024px joint seq
    assert _tuned_blocks(8448) == (256, 8448)    # fill regime: one pass
    assert _tuned_blocks(16896) == (512, 16896)  # 2048px fill: one pass
    assert _tuned_blocks(31104) == (512, 31104)  # 2800px fill cap
    assert _tuned_blocks(60000) == (256, 4352)   # beyond VMEM: even tiles
