"""Bit-parity of the native resampler vs PIL (the retrieval preprocess
exactness requirement, SURVEY.md §7 hard part 3)."""

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.native.build import (FILTER_BICUBIC, FILTER_BILINEAR,
                                        load_native, native_available,
                                        resize_batch_native, resize_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain and no "
                                       "prebuilt .so")


def test_native_library_loads():
    """The prebuilt .so is committed; a load failure is a bug, not a skip."""
    assert load_native() is not None


@pytest.mark.parametrize("in_size,out_size", [
    ((300, 400), (224, 298)),    # downscale (CLIP preprocess shape)
    ((100, 150), (224, 336)),    # upscale
    ((224, 224), (224, 224)),    # identity
    ((37, 53), (224, 224)),      # odd sizes
    ((400, 300), (256, 256)),    # style-path shape
])
@pytest.mark.parametrize("filt", ["bicubic", "bilinear"])
def test_resize_parity(rng, in_size, out_size, filt):
    img = rng.integers(0, 255, (in_size[0], in_size[1], 3), dtype=np.uint8)
    pil_filter = Image.BICUBIC if filt == "bicubic" else Image.BILINEAR
    ref = np.asarray(Image.fromarray(img).resize(
        (out_size[1], out_size[0]), pil_filter))
    fid = FILTER_BICUBIC if filt == "bicubic" else FILTER_BILINEAR
    ours = resize_native(img, out_size[0], out_size[1], fid)
    np.testing.assert_array_equal(ours, ref)


def test_batch_matches_single(rng):
    imgs = rng.integers(0, 255, (6, 80, 60, 3), dtype=np.uint8)
    batch = resize_batch_native(imgs, 32, 48, n_threads=3)
    for i in range(6):
        single = resize_native(imgs[i], 32, 48)
        np.testing.assert_array_equal(batch[i], single)
        ref = np.asarray(Image.fromarray(imgs[i]).resize((48, 32),
                                                         Image.BICUBIC))
        np.testing.assert_array_equal(batch[i], ref)
