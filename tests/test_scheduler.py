"""Flow-match scheduler numerics (SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp

from domainrag_tpu.models.flux import scheduler as sch


def test_unshifted_grid():
    s = sch.make_schedule(4, use_dynamic_shifting=False, shift=1.0)
    np.testing.assert_allclose(s.sigmas, [1.0, 0.75, 0.5, 0.25, 0.0],
                               atol=1e-7)
    assert s.num_steps == 4 and s.start_index == 0


def test_static_shift():
    # shift=3: sigma' = 3s/(1+2s)
    s = sch.make_schedule(2, use_dynamic_shifting=False, shift=3.0)
    base = np.array([1.0, 0.5])
    np.testing.assert_allclose(s.sigmas[:-1], 3 * base / (1 + 2 * base),
                               rtol=1e-6)


def test_calculate_shift_endpoints():
    assert np.isclose(sch.calculate_shift(256), 0.5)
    assert np.isclose(sch.calculate_shift(4096), 1.15)
    # 1024px image: (1024/16)^2 = 4096 tokens -> max shift
    mid = sch.calculate_shift(2176)
    assert 0.5 < mid < 1.15


def test_dynamic_shifting_warp():
    s = sch.make_schedule(10, image_seq_len=4096)
    # warped sigmas still start at 1 (time_shift(mu,1,1)=1) and descend
    assert np.isclose(s.sigmas[0], 1.0, atol=1e-6)
    assert (np.diff(s.sigmas) < 0).all()
    assert s.sigmas[-1] == 0.0
    # shift raises mid sigmas vs unshifted (keeps more noise longer)
    flat = sch.make_schedule(10, use_dynamic_shifting=False, shift=1.0)
    assert (s.sigmas[1:-1] > flat.sigmas[1:-1]).all()


def test_strength_trim():
    # diffusers: t_start = steps - min(int(steps*strength), steps)
    s = sch.make_schedule(50, image_seq_len=4096, strength=0.3)
    assert s.start_index == 35
    assert s.num_steps == 15
    full = sch.make_schedule(50, image_seq_len=4096, strength=1.0)
    np.testing.assert_allclose(s.sigmas, full.sigmas[35:])
    assert s.start_sigma == full.sigmas[35]


def test_scale_noise_and_euler():
    sample = jnp.ones((2, 4))
    noise = jnp.zeros((2, 4))
    out = sch.scale_noise(sample, noise, 0.25)
    np.testing.assert_allclose(np.asarray(out), 0.75)

    x = jnp.zeros((3,))
    v = jnp.ones((3,))
    x2 = sch.euler_step(x, v, jnp.float32(0.5), jnp.float32(0.4))
    np.testing.assert_allclose(np.asarray(x2), -0.1, rtol=1e-6)


def test_denoise_linear_model_reaches_zero():
    """With v = x/sigma (exact rectified flow to 0), Euler reaches ~0."""
    sched = sch.make_schedule(8, use_dynamic_shifting=False, shift=1.0)

    def model(x, sigma):
        return x / jnp.maximum(sigma, 1e-6)

    x = jnp.full((4,), 5.0)
    out = sch.denoise(model, x, sched)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_strength_zero_and_full_edges():
    """strength=0 -> zero denoise steps; strength=1 -> full schedule."""
    s0 = sch.make_schedule(10, image_seq_len=256, strength=0.0)
    assert s0.num_steps == 0 and s0.start_index == 10
    x = jnp.ones((3,))
    out = sch.denoise(lambda x, s: x * 0 + 99, x, s0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    s1 = sch.make_schedule(10, image_seq_len=256, strength=1.0)
    assert s1.num_steps == 10 and s1.start_index == 0
