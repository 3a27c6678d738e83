import json
import os

from domainrag_tpu.core.coco import CocoAnnotations, write_coco
from domainrag_tpu.core.manifest import (Manifest, STATUS_DONE, STATUS_FAILED)
from domainrag_tpu.core.config import get_dataset_params, DatasetParams


def make_toy_coco(tmp_path, shot=1):
    path = os.path.join(tmp_path, "annotations", f"{shot}_shot.json")
    write_coco(
        path,
        images=[
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 64, "height": 64},
        ],
        annotations=[
            {"id": 10, "image_id": 1, "category_id": 3, "bbox": [1, 2, 10, 12]},
            {"id": 11, "image_id": 1, "category_id": 4, "bbox": [5, 5, 6, 6]},
            {"id": 12, "image_id": 2, "category_id": 3, "bbox": [0, 0, 8, 8]},
        ],
        categories=[{"id": 3, "name": "crazing"}, {"id": 4, "name": "patches"}],
    )
    return path


def test_coco_reader(tmp_path):
    make_toy_coco(str(tmp_path))
    coco = CocoAnnotations.load_shot(str(tmp_path), 1)
    assert coco.image_ids() == [1, 2]
    assert coco.file_name(1) == "a.jpg"
    assert coco.image_size(2) == (64, 64)
    assert coco.bboxes_for_image(1) == [(1, 2, 10, 12), (5, 5, 6, 6)]
    assert coco.category_names_for_image(1) == ["crazing", "patches"]
    assert coco.bboxes_for_image(99) == []


def test_manifest_resume_semantics(tmp_path):
    path = os.path.join(str(tmp_path), "manifest.json")
    m = Manifest(path, process_id="7")
    keys = ["s1", "s2", "s3", "s4"]
    assert m.pending(keys) == keys

    m.mark("s1", STATUS_DONE, elapsed_s=1.5)
    m.mark("s2", STATUS_FAILED, error="boom")

    # reload from disk
    m2 = Manifest(path, process_id="7")
    assert m2.status("s1") == STATUS_DONE
    assert m2.pending(keys, resume=True) == ["s2", "s3", "s4"]
    assert m2.pending(keys, failed_only=True) == ["s2"]
    assert m2.counts() == {STATUS_DONE: 1, STATUS_FAILED: 1}
    assert m2.entry("s2")["error"] == "boom"

    # manifest file is valid json with namespacing
    with open(path) as f:
        data = json.load(f)
    assert data["process_id"] == "7"


def test_dataset_params_lookup():
    p = get_dataset_params("neu-det")
    assert p.strength == 0.3 and p.guidance_scale == 30.0
    p = get_dataset_params("UODD")
    assert p.upscale_dimension == 2048 and p.strength == 0.4
    p = get_dataset_params("FISH")
    assert p.guidance_scale == 35.0 and p.image_prompt_scale == 1.2
    assert "underwater" in p.redux_prompt
    # unknown dataset gets defaults
    assert get_dataset_params("nope") == DatasetParams()
    # custom upscale override
    p = get_dataset_params("DIOR", custom_upscale={"dior": 1536})
    assert p.upscale_dimension == 1536
