"""Aux subsystems: prefetch, graceful interrupt, progress, checkpointing,
flow-match trainer (SURVEY.md §5)."""

import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.core import interrupt
from domainrag_tpu.core.prefetch import PrefetchError, prefetch
from domainrag_tpu.core.progress import ProgressReporter


def test_prefetch_order_and_errors():
    def fn(x):
        if x == 3:
            raise ValueError("boom")
        return x * 10

    out = list(prefetch(range(6), fn, depth=2))
    values = [v for v in out if not isinstance(v, PrefetchError)]
    errors = [v for v in out if isinstance(v, PrefetchError)]
    assert values == [0, 10, 20, 40, 50]
    assert len(errors) == 1 and errors[0].item == 3
    assert isinstance(errors[0].__cause__, ValueError)


def test_prefetch_overlaps():
    """Producer runs ahead of the consumer (depth 2)."""
    times = []

    def fn(x):
        times.append(("produced", x, time.perf_counter()))
        return x

    it = prefetch(range(3), fn, depth=2)
    time.sleep(0.15)
    first = next(it)
    # all three items were produced before the consumer asked
    assert first == 0 and len(times) == 3
    it.close()


def test_graceful_interrupt():
    with interrupt.graceful_interrupts():
        assert not interrupt.should_stop()
        os.kill(os.getpid(), signal.SIGINT)  # handled, not raised
        time.sleep(0.05)
        assert interrupt.should_stop()
    assert not interrupt.should_stop()  # reset on exit


def test_progress_reporter():
    r = ProgressReporter(total=3, label="x")
    r.update(ok=True)
    r.update(ok=False)
    r.update(ok=True)
    s = r.summary()
    assert s["done"] == 3 and s["failed"] == 1 and s["per_min"] > 0


def test_train_step_reduces_loss():
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.train import flow_match

    cfg = flux.TINY_FLUX
    params = flux.init(jax.random.PRNGKey(0), cfg)
    tcfg = flow_match.TrainConfig(learning_rate=1e-3)
    opt = flow_match.make_optimizer(tcfg)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    grid, s_txt, b = 4, 6, 4
    batch = {
        "x0": jnp.asarray(rng.standard_normal(
            (b, grid * grid, cfg.in_channels)).astype(np.float32)),
        "txt": jnp.asarray(rng.standard_normal(
            (b, s_txt, cfg.text_dim)).astype(np.float32)),
        "pooled": jnp.asarray(rng.standard_normal(
            (b, cfg.pooled_dim)).astype(np.float32)),
        "img_ids": jnp.asarray(flux.make_image_ids(grid, grid)),
        "txt_ids": jnp.asarray(flux.make_text_ids(s_txt)),
    }
    step = jax.jit(lambda p, o, bt, k: flow_match.train_step(
        p, o, bt, k, cfg, tcfg, opt))
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # same batch repeatedly -> loss trends down
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_checkpoint_roundtrip(tmp_path):
    from domainrag_tpu.train import checkpoint as ckpt
    params = {"w": jnp.arange(8, dtype=jnp.float32).reshape(2, 4),
              "nested": {"b": jnp.ones((3,))}}
    path = ckpt.save_checkpoint(str(tmp_path), 5, params)
    assert os.path.isdir(path)
    assert ckpt.latest_step(str(tmp_path)) == 5
    restored = ckpt.restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))
    # template-driven restore
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": params})
    restored2 = ckpt.restore_checkpoint(str(tmp_path), step=5,
                                        template=template)
    np.testing.assert_array_equal(
        np.asarray(restored2["params"]["nested"]["b"]), 1.0)
