"""Synthetic-set COCO export from a compose run layout."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.core.coco import write_coco
from domainrag_tpu.core.config import get_shots_for_dataset
from domainrag_tpu.pipeline.export import export_synthetic_coco


def test_export_synthetic_coco(tmp_path):
    ds = tmp_path / "datasets" / "NEU-DET"
    write_coco(str(ds / "annotations" / "1_shot.json"),
               images=[{"id": 7, "file_name": "crazing_1.jpg",
                        "width": 50, "height": 40}],
               annotations=[{"id": 1, "image_id": 7, "category_id": 2,
                             "bbox": [5, 5, 10, 8]},
                            {"id": 2, "image_id": 7, "category_id": 2,
                             "bbox": [20, 10, 12, 9]}],
               categories=[{"id": 2, "name": "crazing"}])
    out = tmp_path / "output"
    op = out / "outpaint_hires" / "process_9" / "NEU-DET" / "1_shot" / \
        "crazing_1"
    op.mkdir(parents=True)
    for r in (1, 2):
        Image.new("RGB", (50, 40)).save(
            op / f"crazing_1_final_result_rank{r}.png")

    result = export_synthetic_coco(str(tmp_path / "datasets"), str(out),
                                   "NEU-DET", 1, "9")
    assert len(result["images"]) == 2          # one per rank
    assert len(result["annotations"]) == 4     # 2 bboxes x 2 images
    img0 = result["images"][0]
    assert img0["source_sample_id"] == "crazing_1"
    assert img0["width"] == 50 and img0["height"] == 40
    ann = result["annotations"][0]
    assert ann["bbox"] == [5, 5, 10, 8] and ann["category_id"] == 2
    assert result["categories"] == [{"id": 2, "name": "crazing"}]
    # file written
    with open(out / "synthetic_NEU-DET_1shot.json") as f:
        on_disk = json.load(f)
    assert on_disk == result


def test_shots_per_dataset():
    assert get_shots_for_dataset("NWPU_VHR-10") == (3, 5, 10, 20)
    assert get_shots_for_dataset("Camouflage") == (1, 2, 3, 5)
    assert get_shots_for_dataset("NEU-DET") == (1, 5, 10)
