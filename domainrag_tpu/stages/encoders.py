"""Jitted, batch-padded encoder wrappers for the retrieval stage.

The reference embeds images one at a time (batch=1 CLIP forwards,
retrieval/clip100_resnet_style_all_shots.py:280-287) and recomputes all 100
re-rank features per query (:468). These wrappers fix both: fixed-bucket
batching (one compiled XLA graph per bucket, no recompile storms) and
caller-side caching.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core import imaging
from ..models import clip as jclip
from ..models import resnet_stem


def _pad_batch(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class ClipImageEncoder:
    """CLIP image tower with host preprocess + device batch embed."""

    def __init__(self, params, cfg: jclip.ClipVisionConfig,
                 batch_size: int = 32):
        self.cfg = cfg
        self.batch_size = batch_size
        self._params = params
        self._encode = jax.jit(
            lambda p, x: jclip.encode_image(p, x, cfg))

    def preprocess(self, image: Image.Image) -> np.ndarray:
        return imaging.clip_preprocess(image, self.cfg.image_size)

    def encode_arrays(self, pixel_batches: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) preprocessed -> (N, 512) L2-normalized f32."""
        out = []
        bs = self.batch_size
        for i in range(0, len(pixel_batches), bs):
            chunk = pixel_batches[i:i + bs]
            n = len(chunk)
            emb = self._encode(self._params,
                               jnp.asarray(_pad_batch(chunk, bs)))
            out.append(np.asarray(emb)[:n])
        return np.concatenate(out, axis=0) if out else np.zeros(
            (0, self.cfg.projection_dim), np.float32)

    def encode_paths(self, paths: Sequence[str],
                     on_error: Optional[Callable[[str, Exception], None]] = None
                     ) -> tuple[np.ndarray, List[str]]:
        """Load+preprocess+embed; skips unreadable files (the reference
        warns and continues, ref :288-292). Returns (features, kept_paths).

        Host decode/preprocess of the NEXT chunk overlaps the device encode
        of the current one (double buffering) — the corpus build is the
        retrieval stage's dominant cost at 10^5+ images."""
        from ..core.prefetch import PrefetchError, prefetch

        bs = self.batch_size
        chunks = [list(paths[i:i + bs]) for i in range(0, len(paths), bs)]

        def load_chunk(chunk):
            pixels, kept = [], []
            for path in chunk:
                try:
                    pixels.append(self.preprocess(imaging.load_rgb(path)))
                    kept.append(path)
                except Exception as e:  # unreadable/corrupt image
                    if on_error:
                        on_error(path, e)
            return pixels, kept

        feats: List[np.ndarray] = []
        kept_all: List[str] = []
        for loaded in prefetch(chunks, load_chunk, depth=2):
            if isinstance(loaded, PrefetchError):
                continue
            pixels, kept = loaded
            if not pixels:
                continue
            feats.append(self.encode_arrays(np.stack(pixels)))
            kept_all.extend(kept)
        if not feats:
            return np.zeros((0, self.cfg.projection_dim), np.float32), []
        return np.concatenate(feats, axis=0), kept_all


class StyleEncoder:
    """ResNet-stem style features with host preprocess + batch embed."""

    def __init__(self, params, cfg: resnet_stem.ResNetStemConfig = None,
                 batch_size: int = 32, resize: int = 256):
        self.cfg = cfg or resnet_stem.ResNetStemConfig()
        self.batch_size = batch_size
        self.resize = resize
        self._params = params
        self._encode = jax.jit(
            lambda p, x: resnet_stem.style_features(p, x, self.cfg))
        self._cache: dict[str, np.ndarray] = {}

    def encode_paths(self, paths: Sequence[str]) -> dict[str, np.ndarray]:
        """Returns {path: (128,) style vector}; memoized across queries
        (the reference recomputed candidates per query — do not replicate)."""
        missing = [p for p in paths if p not in self._cache]
        pixels, kept = [], []
        for path in missing:
            try:
                img = imaging.load_rgb(path)
                pixels.append(imaging.style_preprocess(img, self.resize))
                kept.append(path)
            except Exception:
                continue
        bs = self.batch_size
        for i in range(0, len(pixels), bs):
            chunk = np.stack(pixels[i:i + bs])
            n = len(chunk)
            feats = np.asarray(self._encode(
                self._params, jnp.asarray(_pad_batch(chunk, bs))))[:n]
            for path, feat in zip(kept[i:i + bs], feats):
                self._cache[path] = feat
        return {p: self._cache[p] for p in paths if p in self._cache}
