"""Frechet-distance evaluator properties."""

import numpy as np
import pytest

from domainrag_tpu.eval import fid


def test_identical_distributions_zero(rng):
    x = rng.standard_normal((500, 16))
    mu, sigma = fid.compute_stats(x)
    assert abs(fid.frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_mean_shift_is_squared_distance(rng):
    x = rng.standard_normal((2000, 8))
    mu, sigma = fid.compute_stats(x)
    mu2 = mu + 3.0
    d = fid.frechet_distance(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 9.0 * 8, rtol=1e-8)


def test_known_gaussian_distance():
    """1-D closed form: (m1-m2)^2 + (s1-s2)^2."""
    d = fid.frechet_distance(np.array([0.0]), np.array([[4.0]]),
                             np.array([1.0]), np.array([[1.0]]))
    np.testing.assert_allclose(d, 1.0 + (2.0 - 1.0) ** 2, rtol=1e-9)


def test_sample_sensitivity(rng):
    base = rng.standard_normal((800, 16))
    close = base + 0.05 * rng.standard_normal((800, 16))
    far = rng.standard_normal((800, 16)) * 3.0 + 5.0
    d_close = fid.fid_from_features(base, close)
    d_far = fid.fid_from_features(base, far)
    assert d_close < d_far


def test_fid_from_paths(tmp_path, rng):
    import jax
    from PIL import Image
    from domainrag_tpu.models import clip as jclip
    from domainrag_tpu.stages.encoders import ClipImageEncoder
    cfg = jclip.TINY_VISION
    enc = ClipImageEncoder(jclip.init_vision(jax.random.PRNGKey(0), cfg),
                           cfg, batch_size=8)
    real, gen = [], []
    for i in range(6):
        p1 = tmp_path / f"r{i}.png"
        p2 = tmp_path / f"g{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(p1)
        Image.fromarray(rng.integers(100, 130, (32, 32, 3), dtype=np.uint8)
                        ).save(p2)
        real.append(str(p1))
        gen.append(str(p2))
    d_self = fid.fid_from_paths(real, real, enc)
    d_cross = fid.fid_from_paths(real, gen, enc)
    assert d_self < 1e-6 and d_cross > d_self
