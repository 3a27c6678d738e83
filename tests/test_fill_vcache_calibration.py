"""Fill-regime velocity-cache calibration (VERDICT r3 item 3).

The compose stage IS the reference's headline workload
(outpainting_updown_sampling_redux.py:1246-1257), yet round 3's
"auto"/"sched:K" calibration refused the fill path — compose users got
only blind integers. ``calibrate_fill_vcache`` probes the FILL core
itself (fill conditioning + strength-trimmed sigmas) so per-dataset
strengths (outpainting_updown_sampling_redux.py:31-56) shape the
budgeted schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domainrag_tpu.models.flux import pipeline as fp
from domainrag_tpu.models.flux import scheduler as sched_mod


@pytest.fixture(scope="module")
def fill_bundle():
    return fp.tiny_bundle(jax.random.PRNGKey(3), fill=True)


def _fill_inputs(bundle, h=16, w=16, n=2, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
    masks = np.full((n, h, w), 255, np.uint8)
    masks[:, :h // 2, :w // 2] = 0
    embeds, pooled = fp.redux_prior_pairs(
        bundle,
        rng.standard_normal(
            (n, 1, bundle.siglip_cfg.image_size,
             bundle.siglip_cfg.image_size, 3)).astype(np.float32),
        "bg", prompt_embeds_scale=[1.0], pooled_prompt_embeds_scale=[1.0])
    return images, masks, embeds, pooled


def test_fill_accepts_sched_form(fill_bundle):
    """"sched:K" resolves to a DP-planned anchor tuple over the
    strength-TRIMMED step indices and actually engages the cache."""
    images, masks, embeds, pooled = _fill_inputs(fill_bundle)
    kw = dict(num_steps=6, guidance=30.0, strength=0.85, seeds=[0, 1])
    exact = fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                          **kw)
    out = fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                        velocity_cache_interval="sched:2", **kw)
    assert out.shape == exact.shape
    assert not np.array_equal(out, exact)   # the cache engaged
    # the calibration stored an anchor tuple bounded by the TRIMMED count
    n_trim = len(sched_mod.make_schedule(
        6, image_seq_len=16, strength=0.85).sigmas) - 1
    entries = [v for k, v in fp._FILL_VCACHE_CALIBRATIONS.items()
               if "fill-sched:2" in k]
    assert entries, "calibration was not cached"
    anchors = entries[-1]
    assert isinstance(anchors, tuple) and anchors[0] == 0
    assert list(anchors) == sorted(set(anchors))
    assert anchors[-1] < n_trim
    assert len(anchors) == -(-n_trim // 2)   # uniform-K call parity


def test_fill_auto_budget_extremes(fill_bundle):
    """A tiny budget refuses every candidate (interval 1 == exact path);
    an enormous budget admits the largest candidate."""
    images, masks, embeds, pooled = _fill_inputs(fill_bundle, seed=1)
    kw = dict(num_steps=6, guidance=30.0, strength=0.99, seeds=[0, 1])
    exact = fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                          **kw)
    tight = fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                          velocity_cache_interval="auto",
                          vcache_divergence_budget=0.0, **kw)
    # budget 0 -> interval 1 -> the exact graph (same executable)
    assert np.max(np.abs(tight.astype(int) - exact.astype(int))) <= 1
    loose_key = [k for k in list(fp._FILL_VCACHE_CALIBRATIONS)
                 if "fill-auto" in k]
    fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                  velocity_cache_interval="auto",
                  vcache_divergence_budget=1e9, **kw)
    new = [v for k, v in fp._FILL_VCACHE_CALIBRATIONS.items()
           if "fill-auto" in k and k not in loose_key]
    assert new == [4]   # largest candidate admitted


def test_fill_calibration_cached_and_strength_keyed(fill_bundle,
                                                    monkeypatch):
    """One probe per (model, resolution, steps, STRENGTH, guidance,
    form); a second same-config call reuses it, a different strength
    re-probes (strength trims the sigmas the anchors index into)."""
    images, masks, embeds, pooled = _fill_inputs(fill_bundle, seed=2)
    calls = []
    real = fp.calibrate_fill_vcache

    def counting(*a, **k):
        calls.append(k.get("form"))
        return real(*a, **k)

    monkeypatch.setattr(fp, "calibrate_fill_vcache", counting)
    kw = dict(num_steps=5, guidance=30.0, seeds=[0, 1],
              velocity_cache_interval="sched:2")
    fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                  strength=0.9, **kw)
    fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                  strength=0.9, **kw)
    assert len(calls) == 1
    fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                  strength=0.7, **kw)
    assert len(calls) == 2


def test_fill_rejects_unknown_string(fill_bundle):
    images, masks, embeds, pooled = _fill_inputs(fill_bundle)
    with pytest.raises(ValueError, match="'auto' or 'sched:K'"):
        fp.fill_batch(fill_bundle, images, masks, embeds, pooled,
                      num_steps=4, velocity_cache_interval="fast")
