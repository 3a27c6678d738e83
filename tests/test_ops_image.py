"""On-device image ops vs the host (PIL-parity) implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.core import imaging
from domainrag_tpu.ops import image as dimg


@pytest.mark.parametrize("bboxes", [
    [(10, 20, 30, 40)],
    [(0, 0, 64, 64)],
    [(-5, -5, 20, 20)],
    [(50, 50, 100, 100)],
    [(10, 10, 5, 5), (30, 30, 20, 10)],
])
def test_boxes_mask_matches_host(bboxes):
    host = imaging.inpaint_mask_from_bboxes(64, 64, bboxes)
    dev = np.asarray(dimg.boxes_mask(64, 64, jnp.asarray(bboxes),
                                     inside_value=255.0))
    np.testing.assert_array_equal(dev.astype(np.uint8), host)


def test_boxes_mask_padding():
    bboxes = jnp.asarray([[5, 5, 10, 10], [0, 0, 64, 64]], jnp.float32)
    m_all = np.asarray(dimg.boxes_mask(64, 64, bboxes))
    m_one = np.asarray(dimg.boxes_mask(64, 64, bboxes,
                                       n_valid=jnp.int32(1)))
    assert m_all.sum() > m_one.sum()
    host = imaging.inpaint_mask_from_bboxes(64, 64, [(5, 5, 10, 10)])
    np.testing.assert_array_equal((m_one > 0), host > 0)


def test_composite():
    fg = jnp.ones((8, 8, 3))
    bg = jnp.zeros((8, 8, 3))
    mask = jnp.zeros((8, 8)).at[2:4, 2:4].set(1.0)
    out = np.asarray(dimg.composite(fg, bg, mask))
    assert out[3, 3, 0] == 1.0 and out[0, 0, 0] == 0.0


def test_resize_shapes(rng):
    img = jnp.asarray(rng.random((1, 16, 24, 3)).astype(np.float32))
    out = dimg.resize_bicubic(img, 32, 48)
    assert out.shape == (1, 32, 48, 3)
    out2 = dimg.resize_bilinear(img[0], 8, 12)
    assert out2.shape == (8, 12, 3)


def test_paste_box(rng):
    canvas = jnp.zeros((10, 10, 3))
    patch = jnp.ones((4, 4, 3))
    out = np.asarray(dimg.paste_box(canvas, patch, 2, 3))
    assert out[2:6, 3:7].sum() == 48 and out.sum() == 48
