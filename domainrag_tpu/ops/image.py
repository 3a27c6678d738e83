"""On-device image ops (B10): resize, box-mask rasterization, compositing.

The reference does these with PIL/cv2 on the host
(outpainting_updown_sampling_redux.py:107-108,441,454 resizes;
lama_inpaint.py:32-71 masks; :676 crops). Host PIL stays authoritative
where bit-parity feeds retrieval (core.imaging + the native resampler);
these jax versions run inside compiled graphs — e.g. restoring fill output
to the original resolution without a host round-trip, or building masks
for a whole batch of bboxes at once.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def resize_bicubic(image: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(..., H, W, C) -> (..., out_h, out_w, C), cubic interpolation
    (jax.image 'cubic' = Keys kernel a=-0.5, same family as PIL bicubic;
    not bit-identical to PIL — use the native resampler where that
    matters)."""
    shape = image.shape[:-3] + (out_h, out_w, image.shape[-1])
    return jax.image.resize(image, shape, method="cubic")


def resize_bilinear(image: jax.Array, out_h: int, out_w: int) -> jax.Array:
    shape = image.shape[:-3] + (out_h, out_w, image.shape[-1])
    return jax.image.resize(image, shape, method="linear")


def boxes_mask(height: int, width: int, bboxes: jax.Array,
               n_valid: Optional[jax.Array] = None,
               inside_value: float = 1.0,
               outside_value: float = 0.0) -> jax.Array:
    """Rasterize a union of boxes on device.

    bboxes: (N, 4) float [x, y, w, h] (a fixed-size, possibly padded
    buffer — pass ``n_valid`` to ignore the tail). PIL-inclusive fill
    semantics to match core.imaging.inpaint_mask_from_bboxes. Returns
    (height, width) f32.
    """
    bboxes = jnp.asarray(bboxes, jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]

    def one_box(bbox):
        x, y, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
        x0 = jnp.maximum(0.0, x)
        y0 = jnp.maximum(0.0, y)
        x1 = jnp.minimum(jnp.float32(width), x0 + w)
        y1 = jnp.minimum(jnp.float32(height), y0 + h)
        valid = (x1 > x0) & (y1 > y0)
        xi0, yi0 = jnp.floor(x0), jnp.floor(y0)
        xi1 = jnp.minimum(jnp.floor(x1), width - 1.0)
        yi1 = jnp.minimum(jnp.floor(y1), height - 1.0)
        inside = (ys >= yi0) & (ys <= yi1) & (xs >= xi0) & (xs <= xi1)
        return inside & valid

    masks = jax.vmap(one_box)(bboxes)            # (N, H, W) bool
    if n_valid is not None:
        idx = jnp.arange(bboxes.shape[0])
        masks = masks & (idx < n_valid)[:, None, None]
    union = jnp.any(masks, axis=0)
    return jnp.where(union, inside_value, outside_value)


def composite(foreground: jax.Array, background: jax.Array,
              mask: jax.Array) -> jax.Array:
    """mask==1 keeps foreground, 0 takes background. mask (H, W) or
    broadcastable; images (..., H, W, C)."""
    m = mask[..., None] if mask.ndim == foreground.ndim - 1 else mask
    return foreground * m + background * (1.0 - m)


def paste_box(canvas: jax.Array, patch: jax.Array, y: int, x: int
              ) -> jax.Array:
    """Static-position paste (device-side equivalent of PIL crop/paste)."""
    return jax.lax.dynamic_update_slice(
        canvas, patch.astype(canvas.dtype),
        (y, x, 0) if canvas.ndim == 3 else (0, y, x, 0))
