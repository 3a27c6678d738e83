"""Parity tests for host-side imaging ops against PIL ground truth."""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from domainrag_tpu.core import imaging


def pil_inpaint_mask(width, height, bboxes):
    """Direct transcription of the reference algorithm via PIL, as oracle."""
    mask = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(mask)
    for x, y, w, h in bboxes:
        x0, y0 = max(0, x), max(0, y)
        right, bottom = min(width, x0 + w), min(height, y0 + h)
        if right > x0 and bottom > y0:
            draw.rectangle([x0, y0, right, bottom], fill=255)
    return np.asarray(mask)


def pil_outpaint_mask(width, height, bboxes):
    mask = Image.new("L", (width, height), 255)
    draw = ImageDraw.Draw(mask)
    for x, y, w, h in bboxes:
        x2, y2 = x + w, y + h
        x0 = max(0, min(x, width - 1))
        y0 = max(0, min(y, height - 1))
        x1 = max(0, min(x2, width))
        y1 = max(0, min(y2, height))
        draw.rectangle([x0, y0, x1, y1], fill=0)
    return np.asarray(mask)


@pytest.mark.parametrize("bboxes", [
    [(10, 20, 30, 40)],
    [(0, 0, 64, 64)],
    [(-5, -5, 20, 20)],                      # clamped at origin
    [(50, 50, 100, 100)],                    # overflows right/bottom
    [(10, 10, 5, 5), (30, 30, 20, 10)],      # multiple, disjoint
    [(10, 10, 30, 30), (20, 20, 30, 30)],    # overlapping
    [(63, 63, 1, 1)],                        # edge pixel
])
def test_inpaint_mask_parity(bboxes):
    ours = imaging.inpaint_mask_from_bboxes(64, 64, bboxes)
    ref = pil_inpaint_mask(64, 64, bboxes)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("bboxes", [
    [(10, 20, 30, 40)],
    [(0, 0, 64, 64)],
    [(-5, -5, 20, 20)],
    [(50, 50, 100, 100)],
    [(10, 10, 5, 5), (30, 30, 20, 10)],
])
def test_outpaint_mask_parity(bboxes):
    ours = imaging.outpaint_keep_mask(64, 64, bboxes)
    ref = pil_outpaint_mask(64, 64, bboxes)
    np.testing.assert_array_equal(ours, ref)


class TestResolutionPolicy:
    """Truth table from outpainting_updown_sampling_redux.py:403-458."""

    def test_no_change(self):
        (w, h), up, down, wu, wd = imaging.resolve_resolution(1200, 1500)
        assert (w, h) == (1200, 1500) and up == 1.0 and down == 1.0
        assert not wu and not wd

    def test_upscale_min_side(self):
        (w, h), up, down, wu, wd = imaging.resolve_resolution(512, 768)
        assert wu and not wd
        assert up == 1024 / 512
        assert (w, h) == (1024, 1536)

    def test_upscale_both_sides_small(self):
        (w, h), up, _, wu, _ = imaging.resolve_resolution(400, 800)
        # scale_w = 1024/400 = 2.56, scale_h = 1024/800 = 1.28 -> max
        assert up == 1024 / 400
        assert (w, h) == (1024, int(800 * 1024 / 400))

    def test_downscale(self):
        (w, h), up, down, wu, wd = imaging.resolve_resolution(4000, 2000)
        assert wd and not wu
        assert down == 2800 / 4000
        assert (w, h) == (2800, int(2000 * 2800 / 4000))

    def test_conflict_raises(self):
        with pytest.raises(imaging.ResolutionConflictError):
            imaging.resolve_resolution(500, 3000)

    def test_uodd_2048(self):
        (w, h), up, _, wu, _ = imaging.resolve_resolution(
            1024, 768, min_dimension=2048)
        assert wu and up == 2048 / 768

    def test_scale_bboxes_truncates(self):
        out = imaging.scale_bboxes([(10, 11, 12, 13)], 1.5)
        assert out == [[15, 16, 18, 19]]


def test_clip_preprocess_matches_torchvision():
    """Bit-parity with torchvision's Resize+CenterCrop+Normalize (what
    clip.load uses)."""
    torchvision = pytest.importorskip("torchvision", reason="no torchvision")
    import torch
    from torchvision import transforms

    ref_t = transforms.Compose([
        transforms.Resize(224, interpolation=transforms.InterpolationMode.BICUBIC),
        transforms.CenterCrop(224),
        transforms.ToTensor(),
        transforms.Normalize(imaging.CLIP_MEAN.tolist(),
                             imaging.CLIP_STD.tolist()),
    ])
    rng = np.random.default_rng(0)
    for size in [(320, 240), (240, 320), (224, 224), (500, 300)]:
        img = Image.fromarray(
            rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8))
        ref = ref_t(img).numpy().transpose(1, 2, 0)
        ours = imaging.clip_preprocess(img)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resolution_roundtrip():
    img = Image.new("RGB", (512, 768))
    out, up, down, wu, wd = imaging.apply_resolution(img)
    assert out.size == (1024, 1536)
    back = imaging.restore_resolution(out, up, down, wu, wd)
    assert back.size == (512, 768)


def test_to_multiple_of():
    assert imaging.to_multiple_of(1000, 16) == 992
    assert imaging.to_multiple_of(30, 16, minimum=64) == 64
    assert imaging.to_multiple_of(1024, 16) == 1024
