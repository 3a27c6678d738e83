"""Pipeline parallelism: bit-equality with the unsharded forward on the
8-device virtual CPU mesh (SURVEY.md §2C — the reference has no PP at
all; this is a beyond-reference capability for depth-sharded serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from domainrag_tpu.models.flux import model as flux
from domainrag_tpu.parallel import pipeline_parallel as pp


def _toy_inputs(rng, cfg, batch):
    img = jnp.asarray(rng.standard_normal(
        (batch, 16, cfg.in_channels)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal(
        (batch, 6, cfg.text_dim)).astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal(
        (batch, cfg.pooled_dim)).astype(np.float32))
    t = jnp.linspace(0.2, 0.9, batch)
    g = jnp.full((batch,), 4.0)
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))
    return img, txt, pooled, t, g, iid, tid


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("n_stages,microbatches", [(2, 4), (4, 4), (4, 2)])
def test_pipelined_apply_bit_equal(rng, n_stages, microbatches):
    cfg = flux.TINY_FLUX          # 2 double + 2 single
    params = flux.init(jax.random.PRNGKey(0), cfg)
    img, txt, pooled, t, g, iid, tid = _toy_inputs(rng, cfg, batch=4)

    ref = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid,
                                cfg, guidance=g))
    mesh = _pipe_mesh(n_stages)
    stages = pp.prepare_stages(params, n_stages)
    out = np.asarray(pp.pipelined_apply(
        params, stages, img, txt, pooled, t, iid, tid, cfg,
        mesh=mesh, guidance=g, microbatches=microbatches))
    # bit-equal when both sides compile fresh (verified by hand); under
    # the shared persistent XLA cache the reference may execute an
    # AOT-cached kernel compiled with different CPU features, which
    # perturbs f32 contractions at the ~1e-6 level
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=3e-6)


def test_pipelined_apply_uneven_depths(rng):
    """Depths that do NOT divide the stage count exercise the all-zero
    identity padding blocks (3 doubles + 5 singles over 4 stages)."""
    cfg = flux.FluxConfig(in_channels=16, out_channels=16, hidden=64,
                          heads=4, head_dim=16, depth_double=3,
                          depth_single=5, text_dim=32, pooled_dim=24,
                          time_embed_dim=32, axes_dim=(4, 6, 6))
    params = flux.init(jax.random.PRNGKey(1), cfg)
    img, txt, pooled, t, g, iid, tid = _toy_inputs(rng, cfg, batch=2)
    ref = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid,
                                cfg, guidance=g))
    mesh = _pipe_mesh(4)
    stages = pp.prepare_stages(params, 4)
    assert stages.per_stage_double == 1 and stages.per_stage_single == 2
    out = np.asarray(pp.pipelined_apply(
        params, stages, img, txt, pooled, t, iid, tid, cfg,
        mesh=mesh, guidance=g, microbatches=2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=3e-6)


def test_zero_block_is_identity(rng):
    """The depth-padding guarantee: an all-zero block is a bitwise
    identity under the gated-residual structure."""
    cfg = flux.TINY_FLUX
    dblock = pp._zero_block_like(flux._double_block_init(
        jax.random.PRNGKey(0), cfg))
    sblock = pp._zero_block_like(flux._single_block_init(
        jax.random.PRNGKey(0), cfg))
    img = jnp.asarray(rng.standard_normal((2, 16, cfg.hidden))
                      .astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((2, 6, cfg.hidden))
                      .astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((2, cfg.hidden))
                      .astype(np.float32))
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))
    cos, sin = flux.rope_cos_sin(jnp.concatenate([tid, iid], 0),
                                 cfg.axes_dim, cfg.theta)
    cos, sin = cos[None, None], sin[None, None]
    i2, t2 = flux._double_block(dblock, img, txt, vec, cos, sin, cfg)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(txt))
    x = jnp.concatenate([txt, img], axis=1)
    x2 = flux._single_block(sblock, x, vec, cos, sin, cfg)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_prepare_stages_shapes():
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    st = pp.prepare_stages(params, 4)
    # 2 doubles + 2 singles over 4 stages -> padded to 4 + 4
    lead = jax.tree_util.tree_leaves(st.doubles)[0].shape[0]
    assert lead == 4 and st.per_stage_double == 1
    lead = jax.tree_util.tree_leaves(st.singles)[0].shape[0]
    assert lead == 4 and st.per_stage_single == 1


def test_generate_with_pipe_axis(rng):
    """PP is reachable from the serving pipeline: generate(pipe_axis=...)
    matches the unsharded generate."""
    from jax.sharding import Mesh
    from domainrag_tpu.models.flux import pipeline as fp

    bundle = fp.tiny_bundle(jax.random.PRNGKey(0))
    pimgs = np.zeros((4, 2, 28, 28, 3), np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[0.8, 1.0],
                                pooled_prompt_embeds_scale=[1.0, 1.0])
    ref = fp.generate(bundle, e, p, height=16, width=16, num_steps=2,
                      seed=list(range(4)))
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    out = fp.generate(bundle, e, p, height=16, width=16, num_steps=2,
                      seed=list(range(4)), mesh=mesh, pipe_axis="pipe")
    assert out.shape == ref.shape
    # uint8 outputs; compile-cache AOT noise can flip a pixel by 1
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_fill_batch_with_pipe_axis(rng):
    """PP also serves the fill/compose path: fill_batch(pipe_axis=...)
    matches the unsharded fill."""
    from jax.sharding import Mesh
    from domainrag_tpu.models.flux import pipeline as fp

    bundle = fp.tiny_bundle(jax.random.PRNGKey(0), fill=True)
    images = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    masks = np.full((2, 16, 16), 255, np.uint8)
    masks[:, 4:8, 4:8] = 0
    pimgs = np.zeros((2, 1, 28, 28, 3), np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[1.0],
                                pooled_prompt_embeds_scale=[1.0])
    ref = fp.fill_batch(bundle, images, masks, e, p, num_steps=2,
                        seeds=[0, 1], guidance=30.0, strength=0.6)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    out = fp.fill_batch(bundle, images, masks, e, p, num_steps=2,
                        seeds=[0, 1], guidance=30.0, strength=0.6,
                        mesh=mesh, pipe_axis="pipe")
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_pp_stage_cache_invalidates_on_quantize(rng):
    """Quantize-after-serve must rebuild the PP stages: quantize_tree
    reuses bias arrays verbatim, so a single-leaf identity anchor matched
    across the swap and served stale unquantized stages (measured)."""
    from jax.sharding import Mesh
    from domainrag_tpu.models import quant
    from domainrag_tpu.models.flux import pipeline as fp

    bundle = fp.tiny_bundle(jax.random.PRNGKey(3), fill=True)
    images = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    masks = np.full((2, 16, 16), 255, np.uint8)
    masks[:, 5:9, 5:9] = 0
    pimgs = np.zeros((2, 1, 28, 28, 3), np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[1.0],
                                pooled_prompt_embeds_scale=[1.0])
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    kw = dict(num_steps=2, seeds=[7, 8], guidance=30.0, strength=0.7)
    fp.fill_batch(bundle, images, masks, e, p, mesh=mesh,
                  pipe_axis="pipe", **kw)        # populate the cache
    bundle.flux_params = quant.quantize_tree(bundle.flux_params,
                                             min_size=256)
    ref_q = fp.fill_batch(bundle, images, masks, e, p, **kw)
    out_q = fp.fill_batch(bundle, images, masks, e, p, mesh=mesh,
                          pipe_axis="pipe", **kw)
    assert np.abs(out_q.astype(int) - ref_q.astype(int)).max() <= 1
