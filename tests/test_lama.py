"""LaMa FFC generator tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.models import lama


@pytest.fixture(scope="module")
def tiny():
    cfg = lama.TINY_LAMA
    params = lama.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_fourier_unit_matches_numpy(rng):
    """Spectral path parity against a direct numpy transcription."""
    key = jax.random.PRNGKey(3)
    c = 4
    p = lama._fourier_unit_init(key, c, c)
    x = rng.standard_normal((1, 8, 8, c)).astype(np.float32)

    out = np.asarray(lama.fourier_unit(p, jnp.asarray(x)))

    f = np.fft.rfft2(x, axes=(1, 2), norm="ortho")
    y = np.concatenate([f.real, f.imag], axis=-1).astype(np.float32)
    w = np.asarray(p["conv"]["w"])  # (1,1,2c,2c)
    y = y @ w[0, 0]
    # batchnorm with default running stats = identity, then relu
    y = np.maximum(y, 0.0)
    yr, yi = np.split(y, 2, axis=-1)
    ref = np.fft.irfft2(yr + 1j * yi, s=(8, 8), axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_generator_shapes_and_range(tiny, rng):
    cfg, params = tiny
    img = jnp.asarray(rng.random((1, 32, 40, 3)).astype(np.float32))
    mask = jnp.zeros((1, 32, 40, 1), jnp.float32).at[:, 8:16, 8:24].set(1.0)
    out = lama.apply(params, img, mask, cfg)
    assert out.shape == (1, 32, 40, 3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    # deterministic
    out2 = lama.apply(params, img, mask, cfg)
    np.testing.assert_array_equal(o, np.asarray(out2))


def test_mask_influences_output(tiny, rng):
    cfg, params = tiny
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    m1 = jnp.zeros((1, 32, 32, 1), jnp.float32).at[:, :8].set(1.0)
    m2 = jnp.zeros((1, 32, 32, 1), jnp.float32).at[:, 16:].set(1.0)
    o1 = np.asarray(lama.apply(params, img, m1, cfg))
    o2 = np.asarray(lama.apply(params, img, m2, cfg))
    assert np.abs(o1 - o2).max() > 1e-6


def test_inpaint_image_wrapper(tiny, rng):
    cfg, params = tiny
    img = rng.integers(0, 255, (30, 37, 3), dtype=np.uint8)  # non-/8 dims
    mask = np.zeros((30, 37), np.uint8)
    mask[5:15, 5:20] = 255
    out = lama.inpaint_image(params, img, mask, cfg)
    assert out.shape == (30, 37, 3) and out.dtype == np.uint8


def test_pad_to_multiple():
    assert lama.pad_to_multiple(30, 37) == (32, 40)
    assert lama.pad_to_multiple(64, 64) == (64, 64)


def test_runner_batch_matches_single(tiny, rng):
    from domainrag_tpu.stages.inpaint import LamaRunner
    cfg, params = tiny
    runner = LamaRunner(params, cfg, bucket_multiple=8)
    imgs = [rng.integers(0, 255, (30, 37, 3), dtype=np.uint8),
            rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)]
    masks = []
    for im in imgs:
        m = np.zeros(im.shape[:2], np.uint8)
        m[5:15, 5:20] = 255
        masks.append(m)
    batch = runner.inpaint_batch(imgs, masks)
    for im, ma, out in zip(imgs, masks, batch):
        assert out.shape == im.shape
    # note: zero-padding to the batch max dims changes FFT context, so
    # per-image and batch outputs agree exactly only for same-bucket
    # members; check the same-shape case strictly
    single = runner.inpaint(imgs[1], masks[1])
    same_bucket = runner.inpaint_batch([imgs[1], imgs[1]],
                                       [masks[1], masks[1]])
    np.testing.assert_array_equal(single, same_bucket[0])
    np.testing.assert_array_equal(same_bucket[0], same_bucket[1])
