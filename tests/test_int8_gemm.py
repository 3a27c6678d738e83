"""Pallas W8A8 GEMM (`ops.int8_gemm`): bitwise parity with the XLA W8A8
formulation in common.linear, row-padding, bias epilogue, eligibility
gating. Runs in Pallas interpret mode on the CPU test platform; the
TPU-rate measurements live in BENCH_NOTES / tools/tpu_experiments.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models import quant
from domainrag_tpu.models.common import linear_init
from domainrag_tpu.ops import int8_gemm


def _xla_w8a8(x, w_q, w_s, bias=None):
    """The exact XLA formulation from common.linear's W8A8 branch."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    amax = jnp.maximum(amax, 1e-12)
    xq = jnp.clip(jnp.round(xf / amax), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xq, w_q, preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * amax
         * w_s.astype(jnp.float32)).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


@pytest.mark.parametrize("m,k,n", [(512, 256, 256), (640, 128, 384)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_pallas_w8a8_bitwise_parity(rng, m, k, n, with_bias):
    """m=640 exercises the pad-to-bm row path (bm=512)."""
    p = quant.quantize_linear(linear_init(jax.random.PRNGKey(1), k, n,
                                          bias=with_bias))
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bias = p.get("b")
    want = np.asarray(_xla_w8a8(x, p["w_q"], p["w_s"], bias))
    got = int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"], bias=bias,
                                interpret=True)
    assert got is not None
    got = np.asarray(got)
    assert got.shape == (m, n)
    # identical integer dot + identical f32 rescale order -> bitwise
    np.testing.assert_array_equal(got, want)


def test_pallas_w8a8_batched_shape(rng):
    """(B, S, K) inputs flatten/unflatten around the kernel."""
    p = quant.quantize_linear(linear_init(jax.random.PRNGKey(2), 128, 256,
                                          bias=False))
    x = jnp.asarray(rng.standard_normal((2, 320, 128)), jnp.bfloat16)
    got = int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"], interpret=True)
    assert got is not None and got.shape == (2, 320, 256)
    want = np.asarray(_xla_w8a8(x.reshape(640, 128), p["w_q"], p["w_s"]))
    np.testing.assert_array_equal(np.asarray(got).reshape(640, 256), want)


def test_eligibility_gate():
    # small M -> GEMV territory, XLA fallback
    assert not int8_gemm.w8a8_eligible(1, 3072, 18432)
    assert not int8_gemm.w8a8_eligible(256, 3072, 9216)
    # untileable K/N
    assert not int8_gemm.w8a8_eligible(4608, 100, 9216)
    assert not int8_gemm.w8a8_eligible(4608, 3072, 100)
    # every Flux hot shape qualifies
    for m, k, n in [(4608, 3072, 9216), (4608, 3072, 12288),
                    (4608, 12288, 3072), (4608, 3072, 21504),
                    (4608, 15360, 3072), (512, 3072, 9216),
                    (4096, 3072, 12288)]:
        assert int8_gemm.w8a8_eligible(m, k, n), (m, k, n)


def test_ineligible_returns_none(rng):
    p = quant.quantize_linear(
        {"w": np.asarray(rng.standard_normal((100, 256)), np.float32)})
    x = jnp.asarray(rng.standard_normal((512, 100)), jnp.bfloat16)
    assert int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"],
                                 interpret=True) is None


def test_tp_disable_context(rng):
    """Sharded serving must fall back to the partitionable XLA path."""
    p = quant.quantize_linear(linear_init(jax.random.PRNGKey(4), 128, 256))
    x = jnp.asarray(rng.standard_normal((512, 128)), jnp.bfloat16)
    with int8_gemm.disable_pallas_w8a8():
        assert int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"],
                                     interpret=True) is None
    assert int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"],
                                 interpret=True) is not None


def test_disable_toggle(rng):
    p = quant.quantize_linear(linear_init(jax.random.PRNGKey(3), 128, 256))
    x = jnp.asarray(rng.standard_normal((512, 128)), jnp.bfloat16)
    int8_gemm.set_w8a8_pallas(False)
    try:
        assert int8_gemm.w8a8_linear(x, p["w_q"], p["w_s"],
                                     interpret=True) is None
    finally:
        int8_gemm.set_w8a8_pallas(True)


def test_training_rejects_w8a8_mode():
    """fit() must fail loudly under the serving-only W8A8 mode (round()
    has zero gradient — training would silently learn nothing)."""
    from domainrag_tpu.models.common import set_int8_activations
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.train import loop as train_loop

    set_int8_activations(True)
    try:
        with pytest.raises(ValueError, match="W8A8"):
            train_loop.fit({}, flux.TINY_FLUX, [], num_steps=1)
    finally:
        set_int8_activations(False)
