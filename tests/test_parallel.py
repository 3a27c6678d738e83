"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from domainrag_tpu.ops import topk as topk_ops
from domainrag_tpu.parallel import collectives, mesh as mesh_mod, sharding


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return mesh_mod.create_mesh(model_parallel=1)


@pytest.fixture(scope="module")
def mesh_tp():
    return mesh_mod.create_mesh(model_parallel=2)


def test_mesh_shapes(mesh8, mesh_tp):
    assert mesh8.shape == {"data": 8, "model": 1}
    assert mesh_tp.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_mod.create_mesh(model_parallel=3)


def test_sharded_topk_matches_oracle(mesh8, rng):
    queries = rng.integers(-8, 8, (5, 64)).astype(np.float32)
    bank = rng.integers(-8, 8, (1003, 64)).astype(np.float32)  # odd size
    ref_s, ref_i = topk_ops.topk_ip_numpy(queries, bank, 100)

    padded, n_valid = collectives.pad_bank_for_mesh(bank, mesh8)
    assert padded.shape[0] % 8 == 0
    bank_dev = collectives.shard_bank(padded, mesh8)
    s, i = collectives.sharded_topk(jnp.asarray(queries), bank_dev, 100,
                                    mesh8, n_valid)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-6)


def test_sharded_topk_with_ties(mesh8, rng):
    queries = rng.integers(-2, 3, (3, 32)).astype(np.float32)
    bank = rng.integers(-2, 3, (512, 32)).astype(np.float32)
    bank[100:200] = bank[0:100]  # exact ties across shards
    ref_s, ref_i = topk_ops.topk_ip_numpy(queries, bank, 64)
    padded, n_valid = collectives.pad_bank_for_mesh(bank, mesh8)
    s, i = collectives.sharded_topk(
        jnp.asarray(queries), collectives.shard_bank(padded, mesh8),
        64, mesh8, n_valid)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_flux_param_specs(mesh_tp):
    from domainrag_tpu.models.flux import model as flux
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    specs = sharding.flux_param_specs(params)
    # column-sharded qkv
    assert specs["double"][0]["img_qkv"]["w"] == P(None, "model")
    assert specs["double"][0]["img_qkv"]["b"] == P("model")
    # row-sharded proj with replicated bias
    assert specs["double"][0]["img_proj"]["w"] == P("model", None)
    assert specs["double"][0]["img_proj"]["b"] == P()
    assert specs["single"][0]["linear1"]["w"] == P(None, "model")
    assert specs["single"][0]["linear2"]["w"] == P("model", None)
    # embedders replicated
    assert specs["img_in"]["w"] == P()
    sharding.validate_divisibility(params, specs, mesh_tp)


def test_flux_tp_forward_matches_single(mesh_tp):
    """TP-sharded forward == replicated forward (GSPMD correctness)."""
    from domainrag_tpu.models.flux import model as flux
    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 16, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((2, 6, cfg.text_dim))
                      .astype(np.float32))
    pooled = jnp.asarray(rng.standard_normal((2, cfg.pooled_dim))
                         .astype(np.float32))
    t = jnp.full((2,), 0.5)
    g = jnp.full((2,), 4.0)
    iid = jnp.asarray(flux.make_image_ids(4, 4))
    tid = jnp.asarray(flux.make_text_ids(6))

    ref = np.asarray(flux.apply(params, img, txt, pooled, t, iid, tid, cfg,
                                guidance=g))

    specs = sharding.flux_param_specs(params)
    sharded = sharding.shard_params(params, mesh_tp, specs)

    fn = jax.jit(lambda p, *a: flux.apply(p, *a, cfg, guidance=g))
    out = np.asarray(fn(sharded, img, txt, pooled, t, iid, tid))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


def test_fsdp_specs():
    from domainrag_tpu.models.flux import model as flux
    params = flux.init(jax.random.PRNGKey(0), flux.TINY_FLUX)
    specs = sharding.flux_param_specs(params, fsdp_axis="data")
    # non-TP 2D weights get FSDP sharding on dim 0
    assert specs["img_in"]["w"] == P("data")
    assert specs["time_in"]["in"]["w"] == P("data")
    # TP rules still win inside blocks
    assert specs["double"][0]["img_qkv"]["w"] == P(None, "model")
