"""Serving feature matrix: which (DP, TP, SP, PP) x (block cache) x
(generate / fill) combinations are supported, in ONE parametrized place
(VERDICT r2 item: the matrix previously had silent holes — block caching
raised only deep inside the denoise, PP silently ignored a TP bundle).

Supported combos must run and produce correctly-shaped output;
unsupported combos must raise the documented ValueError up front.
The matrix (also in README):

    strategy        generate    fill    + block cache
    none (1 chip)   yes         yes     yes
    DP (data axis)  yes         yes     yes (HBM-checked)
    TP (shard_bundle) yes       yes     yes
    PP (pipe_axis)  yes         yes     NO  (documented error)
    TP + PP         NO (error)  NO      —
    SP (hires ring) —           yes     n/a (fill path)
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def gen_bundle():
    return fp.tiny_bundle(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def fill_bundle():
    return fp.tiny_bundle(jax.random.PRNGKey(0), fill=True)


def _gen_inputs(bundle, n=2):
    pimgs = np.zeros((n, 2, 28, 28, 3), np.float32)
    return fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[0.8, 1.0],
                                pooled_prompt_embeds_scale=[1.0, 1.0])


def _fill_inputs(bundle, rng, n=2, size=16):
    images = rng.integers(0, 255, (n, size, size, 3)).astype(np.uint8)
    masks = np.full((n, size, size), 255, np.uint8)
    masks[:, 4:8, 4:8] = 0
    pimgs = np.zeros((n, 1, 28, 28, 3), np.float32)
    e, p = fp.redux_prior_pairs(bundle, pimgs, "",
                                prompt_embeds_scale=[1.0],
                                pooled_prompt_embeds_scale=[1.0])
    return images, masks, e, p


def _tp_bundle(bundle):
    from domainrag_tpu.parallel import deploy
    mesh = mesh_mod.create_mesh(model_parallel=2)
    return deploy.shard_bundle(bundle, mesh), mesh


@pytest.mark.parametrize("strategy", ["none", "dp", "tp", "pp"])
@pytest.mark.parametrize("cache", [1, 2])
def test_generate_matrix(gen_bundle, strategy, cache):
    e, p = _gen_inputs(gen_bundle)
    kw = dict(height=16, width=16, num_steps=2, seed=[0, 1],
              block_cache_interval=cache)
    if strategy == "none":
        out = fp.generate(gen_bundle, e, p, **kw)
    elif strategy == "dp":
        out = fp.generate(gen_bundle, e, p,
                          mesh=mesh_mod.create_mesh(model_parallel=1), **kw)
    elif strategy == "tp":
        bundle, mesh = _tp_bundle(gen_bundle)
        out = fp.generate(bundle, e, p, mesh=mesh, **kw)
    elif strategy == "pp":
        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        if cache > 1:
            with pytest.raises(ValueError, match="block_cache_interval"):
                fp.generate(gen_bundle, e, p, mesh=mesh, pipe_axis="pipe",
                            **kw)
            return
        out = fp.generate(gen_bundle, e, p, mesh=mesh, pipe_axis="pipe",
                          **kw)
    assert out.shape == (2, 16, 16, 3) and out.dtype == np.uint8


@pytest.mark.parametrize("strategy", ["none", "dp", "tp", "pp", "sp"])
def test_fill_matrix(fill_bundle, rng, strategy):
    images, masks, e, p = _fill_inputs(fill_bundle, rng)
    kw = dict(num_steps=2, seeds=[0, 1], guidance=30.0, strength=0.6)
    if strategy == "none":
        out = fp.fill_batch(fill_bundle, images, masks, e, p, **kw)
    elif strategy == "dp":
        out = fp.fill_batch(fill_bundle, images, masks, e, p,
                            mesh=mesh_mod.create_mesh(model_parallel=1),
                            **kw)
    elif strategy == "tp":
        bundle, mesh = _tp_bundle(fill_bundle)
        out = fp.fill_batch(bundle, images, masks, e, p, mesh=mesh, **kw)
    elif strategy == "pp":
        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        out = fp.fill_batch(fill_bundle, images, masks, e, p, mesh=mesh,
                            pipe_axis="pipe", **kw)
    elif strategy == "sp":
        # hires ring-attention path: force the hires threshold down so the
        # tiny shape rides the SP branch
        out = fp.fill_batch(fill_bundle, images, masks, e, p,
                            mesh=mesh_mod.create_mesh(model_parallel=1),
                            hires_threshold_px=1, **kw)
    assert out.shape == images.shape and out.dtype == np.uint8


def test_pp_rejects_tp_bundle(gen_bundle, fill_bundle, rng):
    """PP + TP is documented unsupported: the PP path would serve
    unsharded block params and silently ignore tp_mesh."""
    bundle, _ = _tp_bundle(gen_bundle)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    e, p = _gen_inputs(gen_bundle)
    with pytest.raises(ValueError, match="does not compose"):
        fp.generate(bundle, e, p, height=16, width=16, num_steps=2,
                    seed=[0, 1], mesh=mesh, pipe_axis="pipe")

    fbundle, _ = _tp_bundle(fill_bundle)
    images, masks, e, p = _fill_inputs(fill_bundle, rng)
    with pytest.raises(ValueError, match="does not compose"):
        fp.fill_batch(fbundle, images, masks, e, p, num_steps=2,
                      seeds=[0, 1], mesh=mesh, pipe_axis="pipe")


def test_cli_rejects_pp_combos():
    """The CLI fails fast on unsupported combos instead of dying at
    denoise time after inpaint/retrieve already ran (ADVICE r2)."""
    from domainrag_tpu.cli import main as cli

    base = ["generate", "--datasets", "NEUDET", "--shots", "5",
            "--tiny-models"]
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(base + ["--pipeline_parallel", "2",
                         "--block_cache_interval", "2"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(base + ["--pipeline_parallel", "2",
                         "--model_parallel", "2"])


@pytest.mark.parametrize("strategy", ["none", "dp", "tp"])
def test_generate_w8a8_matrix(gen_bundle, strategy):
    """W8A8 serving (int8 weights + int8 activations) through the real
    generate surface: single-chip and TP-sharded. On the CPU test
    platform the Pallas int8 kernel is backend-gated off, so this
    exercises the XLA W8A8 formulation the TP path also uses on TPU
    (the two are bitwise-identical — tests/test_int8_gemm.py)."""
    import dataclasses

    from domainrag_tpu.models import quant
    from domainrag_tpu.models.common import set_int8_activations

    bundle = dataclasses.replace(
        gen_bundle, flux_params=quant.quantize_tree(
            gen_bundle.flux_params, min_size=1024))
    e, p = _gen_inputs(bundle)
    kw = dict(height=16, width=16, num_steps=2, seed=[0, 1])
    set_int8_activations(True)
    try:
        if strategy == "none":
            out = fp.generate(bundle, e, p, **kw)
        elif strategy == "dp":
            # DP runs the core under shard_map (_dp_wrap) — w8a8 stays on
            out = fp.generate(bundle, e, p,
                              mesh=mesh_mod.create_mesh(model_parallel=1),
                              **kw)
        else:
            sharded, mesh = _tp_bundle(bundle)
            out = fp.generate(sharded, e, p, mesh=mesh, **kw)
    finally:
        set_int8_activations(False)
    assert out.shape == (2, 16, 16, 3) and out.dtype == np.uint8


def test_fill_w8a8(fill_bundle, rng):
    """W8A8 through the fill/compose surface (single chip)."""
    import dataclasses

    from domainrag_tpu.models import quant
    from domainrag_tpu.models.common import set_int8_activations

    bundle = dataclasses.replace(
        fill_bundle, flux_params=quant.quantize_tree(
            fill_bundle.flux_params, min_size=1024))
    images, masks, e, p = _fill_inputs(bundle, rng)
    set_int8_activations(True)
    try:
        out = fp.fill_batch(bundle, images, masks, e, p, num_steps=2,
                            seeds=[0, 1], guidance=30.0, strength=0.6)
    finally:
        set_int8_activations(False)
    assert out.shape == images.shape and out.dtype == np.uint8
