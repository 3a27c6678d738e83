"""Parity of the style encoder vs a torch reference built in-test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from domainrag_tpu.models import resnet_stem  # noqa: E402


@pytest.fixture(scope="module")
def torch_stem():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                           bias=False)
    bn = torch.nn.BatchNorm2d(64)
    # randomize running stats so BN parity is actually exercised
    with torch.no_grad():
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0.0, 0.2)
        bn.running_mean.normal_(0.0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
    seq = torch.nn.Sequential(
        conv, bn, torch.nn.ReLU(),
        torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1)).eval()
    return seq, conv, bn


def _params(conv, bn):
    return resnet_stem.convert_torch_stem(
        conv.weight.detach().numpy(), bn.weight.detach().numpy(),
        bn.bias.detach().numpy(), bn.running_mean.numpy(),
        bn.running_var.numpy())


def torch_calc_mean_std(feat, eps=1e-5):
    """Transcription of reference calc_mean_std (retrieval/...py:67-74)."""
    size = feat.size()
    N, C = size[:2]
    feat_var = feat.view(N, C, -1).var(dim=2) + eps
    feat_std = feat_var.sqrt()
    feat_mean = feat.view(N, C, -1).mean(dim=2)
    return feat_mean, feat_std


def test_stem_parity(torch_stem, rng):
    seq, conv, bn = torch_stem
    params = _params(conv, bn)
    images = rng.random((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(resnet_stem.apply_stem(params, jnp.asarray(images)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_style_features_parity(torch_stem, rng):
    seq, conv, bn = torch_stem
    params = _params(conv, bn)
    images = rng.random((2, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        feat = seq(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        mean, std = torch_calc_mean_std(feat)
        ref = torch.cat([mean, std], dim=1).numpy()
    ours = np.asarray(resnet_stem.style_features(params, jnp.asarray(images)))
    assert ours.shape == (2, 128)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_style_distance_similarity():
    q = jnp.zeros((4,))
    cands = jnp.asarray([[3.0, 4.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    d, sim = resnet_stem.style_distance(q, cands)
    np.testing.assert_allclose(np.asarray(d), [5.0, 0.0])
    np.testing.assert_allclose(np.asarray(sim), [1 / 6.0, 1.0])


def test_unbiased_variance_matters(rng):
    """Guards the unbiased-variance detail: biased var would diverge."""
    feat = rng.random((1, 4, 4, 8)).astype(np.float32)
    mean, std = resnet_stem.calc_mean_std(jnp.asarray(feat.copy()))
    tmean, tstd = torch_calc_mean_std(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(std), tstd.numpy(), rtol=1e-5)
    biased = np.sqrt(feat.reshape(1, 16, 8).var(axis=1) + 1e-5)
    assert not np.allclose(np.asarray(std), biased, rtol=1e-3)
