"""End-to-end Flux pipelines on the tiny bundle: Redux-conditioned
generation and Fill composition (SURVEY.md §4.2/4.5 determinism)."""

import numpy as np
import pytest

from domainrag_tpu.models.flux import pipeline as fp


@pytest.fixture(scope="module")
def bundle():
    return fp.tiny_bundle()


@pytest.fixture(scope="module")
def fill_bundle():
    return fp.tiny_bundle(fill=True)


def siglip_images(bundle, n, seed=0):
    rng = np.random.default_rng(seed)
    s = bundle.siglip_cfg.image_size
    return rng.standard_normal((n, s, s, 3)).astype(np.float32)


def test_redux_generate_deterministic(bundle):
    """The stage-3 path: dual-image prior + fixed-seed generation
    (batch_generate_flux_kshot.py:459-474 semantics)."""
    embeds, pooled = fp.redux_prior(
        bundle, siglip_images(bundle, 2), ["", ""],
        prompt_embeds_scale=[0.8, 1.0],
        pooled_prompt_embeds_scale=[1.0, 1.0])
    assert embeds.shape[0] == 1 and pooled.shape[0] == 1
    # 512-text-equivalents + 2 images' tokens
    s_txt = bundle.t5_max_len
    s_img = bundle.siglip_cfg.seq_len
    assert embeds.shape[1] == s_txt + s_img

    img1 = fp.generate(bundle, embeds, pooled, height=32, width=32,
                       num_steps=3, guidance=2.5, seed=0)
    img2 = fp.generate(bundle, embeds, pooled, height=32, width=32,
                       num_steps=3, guidance=2.5, seed=0)
    assert img1.shape == (32, 32, 3) and img1.dtype == np.uint8
    np.testing.assert_array_equal(img1, img2)  # seed-0 determinism

    img3 = fp.generate(bundle, embeds, pooled, height=32, width=32,
                       num_steps=3, guidance=2.5, seed=1)
    assert (img1 != img3).any()


def test_redux_scale_changes_output(bundle):
    imgs = siglip_images(bundle, 2)
    e1, p1 = fp.redux_prior(bundle, imgs, ["", ""], [0.8, 1.0], [1.0, 1.0])
    e2, p2 = fp.redux_prior(bundle, imgs, ["", ""], [0.2, 1.0], [1.0, 1.0])
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-6


def test_fill_keeps_strength_semantics(fill_bundle):
    """strength=0 must return (a VAE round-trip of) the input: zero steps."""
    bundle = fill_bundle
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.full((32, 32), 255, np.uint8)
    mask[8:24, 8:24] = 0  # keep center box

    embeds, pooled = fp.redux_prior(bundle, siglip_images(bundle, 1), [""],
                                    [1.0], [1.0])
    out = fp.fill(bundle, image, mask, embeds, pooled, num_steps=4,
                  guidance=30.0, strength=0.5, seed=0)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8

    # determinism
    out2 = fp.fill(bundle, image, mask, embeds, pooled, num_steps=4,
                   guidance=30.0, strength=0.5, seed=0)
    np.testing.assert_array_equal(out, out2)


def test_pack_mask_layout():
    import jax.numpy as jnp
    from domainrag_tpu.models.flux.pipeline import pack_mask
    # 1 batch, 4x4 mask, factor 2 -> latent grid 2x2 -> packed 1 token of 16
    mask = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4))
    tokens = pack_mask(mask, 2)
    assert tokens.shape == (1, 1, 16)
    # unshuffle: latent cell (i,j) holds pixels (2i+di, 2j+dj); packing is
    # channel-major over the 2x2 latent grid
    vals = np.asarray(tokens)[0, 0]
    # channel c = di*2+dj of latent cell (dy,dx) = pixel (2*dy+di, 2*dx+dj)
    expect = [np.float32((2 * dy + di) * 4 + (2 * dx + dj))
              for di in range(2) for dj in range(2)
              for dy in range(2) for dx in range(2)]
    np.testing.assert_array_equal(vals, expect)


def test_strength_trims_work(fill_bundle):
    """Lower strength -> result closer to the original image."""
    bundle = fill_bundle
    rng = np.random.default_rng(1)
    image = rng.integers(100, 140, (32, 32, 3), dtype=np.uint8)
    mask = np.full((32, 32), 255, np.uint8)
    embeds, pooled = fp.redux_prior(bundle, siglip_images(bundle, 1), [""],
                                    [1.0], [1.0])
    lo = fp.fill(bundle, image, mask, embeds, pooled, num_steps=4,
                 guidance=30.0, strength=0.25, seed=0).astype(np.int32)
    hi = fp.fill(bundle, image, mask, embeds, pooled, num_steps=4,
                 guidance=30.0, strength=1.0, seed=0).astype(np.int32)
    img = image.astype(np.int32)
    assert np.abs(lo - img).mean() < np.abs(hi - img).mean()


def test_generate_block_cache_interval(rng):
    """block_cache_interval=2 runs the cached denoise core and stays
    close to the exact path; interval=1 is the exact path itself."""
    import jax
    import numpy as np
    from domainrag_tpu.models.flux import pipeline as fp

    bundle = fp.tiny_bundle(jax.random.PRNGKey(0))
    pimgs = np.zeros((2, 2, 28, 28, 3), np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[0.8, 1.0],
                                pooled_prompt_embeds_scale=[1.0, 1.0])
    exact = fp.generate(bundle, e, p, height=16, width=16, num_steps=4,
                        seed=[0, 1])
    cached = fp.generate(bundle, e, p, height=16, width=16, num_steps=4,
                         seed=[0, 1], block_cache_interval=2)
    assert cached.shape == exact.shape
    corr = np.corrcoef(cached.ravel().astype(float),
                       exact.ravel().astype(float))[0, 1]
    assert corr > 0.9          # approximation, not equality
    assert not np.array_equal(cached, exact)  # and it actually engaged


def test_prior_pairs_indexed_matches_dense(bundle):
    """Deduplicated-tower prior == the dense per-pair prior (the target
    tower forward is shared across ranks, not recomputed)."""
    import numpy as np
    rng = np.random.default_rng(4)
    size = bundle.siglip_cfg.image_size
    uniq = rng.standard_normal((3, size, size, 3)).astype(np.float32)
    pair_idx = np.asarray([[0, 2], [1, 2]])   # two ranks, shared target 2
    dense_imgs = uniq[pair_idx]               # (2, 2, S, S, 3)
    e1, p1 = fp.redux_prior_pairs(
        bundle, dense_imgs, "", prompt_embeds_scale=[0.8, 1.0],
        pooled_prompt_embeds_scale=[1.0, 1.0])
    e2, p2 = fp.redux_prior_pairs_indexed(
        bundle, uniq, pair_idx, "", prompt_embeds_scale=[0.8, 1.0],
        pooled_prompt_embeds_scale=[1.0, 1.0])
    np.testing.assert_allclose(np.asarray(e1, np.float32),
                               np.asarray(e2, np.float32), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1, np.float32),
                               np.asarray(p2, np.float32), atol=2e-5)


def test_block_cache_auto_calibration(bundle):
    """'auto' picks the largest candidate interval within the divergence
    budget; an impossible budget falls back to exact (1)."""
    import numpy as np
    rng = np.random.default_rng(2)
    size = bundle.siglip_cfg.image_size
    pimgs = rng.standard_normal((1, 2, size, size, 3)).astype(np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[0.8, 1.0],
                                pooled_prompt_embeds_scale=[1.0, 1.0])
    loose = fp.calibrate_block_cache_interval(
        bundle, e, p, 16, 16, 4, 2.5, divergence_budget=1e9)
    assert loose == 4                      # everything fits a huge budget
    strict = fp.calibrate_block_cache_interval(
        bundle, e, p, 16, 16, 4, 2.5, divergence_budget=0.0)
    assert strict == 1                     # nothing beats exact

    # end-to-end: generate accepts "auto" and produces an image
    out = fp.generate(bundle, e, p, height=16, width=16, num_steps=4,
                      block_cache_interval="auto")
    assert out.shape == (16, 16, 3)


def test_prompt_cache_and_text_encoder_release():
    """Single-chip staged residency (round 5): prompts precomputed into
    bundle.prompt_cache reproduce the live-encoder embeddings bit-exactly
    after release_text_encoders(); uncached prompts then fail loudly."""
    b = fp.tiny_bundle()
    live = fp.encode_prompt(b, ["", "a dog"])
    fp.precompute_prompts(b, ["", "a dog"])
    fp.release_text_encoders(b)
    assert b.t5_params is None and b.clip_text_params is None
    cached = fp.encode_prompt(b, ["", "a dog"])
    np.testing.assert_array_equal(np.asarray(live[0]),
                                  np.asarray(cached[0]))
    np.testing.assert_array_equal(np.asarray(live[1]),
                                  np.asarray(cached[1]))
    # order permutes correctly through the per-prompt cache
    swapped = fp.encode_prompt(b, ["a dog", ""])
    np.testing.assert_array_equal(np.asarray(swapped[0][0]),
                                  np.asarray(cached[0][1]))
    with pytest.raises(ValueError, match="not in the cache"):
        fp.encode_prompt(b, ["unseen"])
