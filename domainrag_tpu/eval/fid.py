"""Generation-quality evaluation: Frechet distance over embedding
distributions (the BASELINE quality gate is "FID-matched generated
images").

Classic FID uses InceptionV3 pool features; its weights are not fetchable
here, so the extractor is pluggable and the default is the framework's own
CLIP image tower (CLIP-FID is an established variant — same Frechet
machinery, different feature space). With converted real CLIP weights this
produces comparable-across-runs numbers; the Frechet core is
extractor-agnostic either way.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

from ..core.log import get_logger

logger = get_logger("domainrag_tpu.eval")


def compute_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^(1/2))."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if isinstance(covmean, tuple):  # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        logger.warning("singular covariance product; adding eps=%g", eps)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(real: np.ndarray, generated: np.ndarray) -> float:
    mu_r, s_r = compute_stats(real)
    mu_g, s_g = compute_stats(generated)
    return frechet_distance(mu_r, s_r, mu_g, s_g)


def fid_from_paths(real_paths: Sequence[str],
                   generated_paths: Sequence[str],
                   clip_encoder) -> float:
    """CLIP-FID between two image sets using a
    stages.encoders.ClipImageEncoder."""
    real_feats, _ = clip_encoder.encode_paths(real_paths)
    gen_feats, _ = clip_encoder.encode_paths(generated_paths)
    if len(real_feats) < 2 or len(gen_feats) < 2:
        raise ValueError("need at least 2 readable images per set")
    return fid_from_features(real_feats, gen_feats)
