"""Multi-host integration (SURVEY.md §5, VERDICT r2 item 5): two REAL
coordinated ``jax.distributed`` processes (CPU backend, gloo collectives)
run the worker-sliced retrieve -> generate flow over a shared directory.

Asserts: disjoint per-worker sample coverage, barrier-fenced stage
boundaries, and worker-0 merges producing the canonical
``all_shots_retrieval_results.json`` and run manifest — the TPU-native
replacement for the reference's queue-coordinated process-per-GPU
executor (outpainting_updown_sampling_redux.py:1605-1767).
"""

import glob
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.parallel import multihost

DRIVER = os.path.join(os.path.dirname(__file__), "multihost_driver.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(9)
    ds = root / "datasets" / "NEU-DET"
    (ds / "train").mkdir(parents=True)
    from domainrag_tpu.core.coco import write_coco
    images, annotations = [], []
    names = ["crazing_1", "crazing_2", "patches_3", "patches_4",
             "scratches_5"]
    cats = {"crazing": 1, "patches": 2, "scratches": 3}
    for i, name in enumerate(names):
        images.append({"id": i + 1, "file_name": f"{name}.jpg",
                       "width": 40, "height": 36})
        annotations.append({"id": i + 1, "image_id": i + 1,
                            "category_id": cats[name.rsplit("_", 1)[0]],
                            "bbox": [4, 4, 12, 10]})
        Image.fromarray(rng.integers(0, 255, (36, 40, 3), dtype=np.uint8)
                        ).save(ds / "train" / f"{name}.jpg")
    write_coco(str(ds / "annotations" / "1_shot.json"), images=images,
               annotations=annotations,
               categories=[{"id": v, "name": k} for k, v in cats.items()])
    corpus = root / "coco"
    corpus.mkdir()
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (36, 44, 3), dtype=np.uint8)
                        ).save(corpus / f"{i:06d}.jpg")
    return root


@pytest.mark.slow
def test_two_process_retrieve_generate(toy_root):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, DRIVER, str(i), "2", f"127.0.0.1:{port}",
         str(toy_root)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    output = str(toy_root / "output")
    results_dir = os.path.join(output, "retrieval_results")

    # per-worker partials exist and cover DISJOINT sample slices
    partials = []
    for w in range(2):
        path = os.path.join(
            results_dir, f"all_shots_retrieval_results.worker{w}.json")
        assert os.path.exists(path), f"missing worker {w} partial"
        with open(path) as f:
            partials.append(json.load(f))

    def sample_set(blob):
        out = set()
        for shots in blob.values():
            for categories in shots.values():
                for entries in categories.values():
                    out |= {e["sample_id"] for e in entries}
        return out

    s0, s1 = sample_set(partials[0]), sample_set(partials[1])
    assert s0 and s1 and not (s0 & s1), "worker slices overlap"

    # worker-0 merge produced the canonical contract covering everything
    with open(os.path.join(results_dir,
                           "all_shots_retrieval_results.json")) as f:
        merged = json.load(f)
    assert sample_set(merged) == s0 | s1 == {
        "crazing_1", "crazing_2", "patches_3", "patches_4", "scratches_5"}

    # generate: both workers wrote into ONE shared run dir; merged
    # manifest covers every sample as done
    run_dirs = glob.glob(os.path.join(
        output, "result", "NEU-DET_1shot_retrieval", "results_*"))
    assert len(run_dirs) == 1, f"hosts disagreed on the run dir: {run_dirs}"
    base = run_dirs[0]
    with open(os.path.join(base, "manifest.json")) as f:
        manifest = json.load(f)["samples"]
    assert set(manifest) == s0 | s1
    assert all(v["status"] == "done" for v in manifest.values())
    # every sample has its ranked outputs on disk
    for sample in sorted(s0 | s1):
        pngs = glob.glob(os.path.join(base, sample,
                                      "generated_image_rank*.png"))
        assert len(pngs) == 2, f"{sample}: {pngs}"


def test_merge_worker_retrieval_results(tmp_path):
    """Unit: the merge unions disjoint slices, dedups by sample_id and
    sorts deterministically."""
    a = {"D": {"1_shot": {"cat": [
        {"sample_id": "s2", "similar_images": []},
    ]}}}
    b = {"D": {"1_shot": {"cat": [
        {"sample_id": "s1", "similar_images": []},
        {"sample_id": "s2", "similar_images": [{"dup": True}]},
    ], "other": [{"sample_id": "s3", "similar_images": []}]}}}
    for i, blob in enumerate([a, b]):
        with open(tmp_path / f"all_shots_retrieval_results.worker{i}.json",
                  "w") as f:
            json.dump(blob, f)
    merged = multihost.merge_worker_retrieval_results(str(tmp_path))
    entries = merged["D"]["1_shot"]["cat"]
    assert [e["sample_id"] for e in entries] == ["s1", "s2"]
    assert entries[1]["similar_images"] == []  # first worker wins the dup
    assert merged["D"]["1_shot"]["other"][0]["sample_id"] == "s3"
    assert os.path.exists(tmp_path / "all_shots_retrieval_results.json")


def test_merge_worker_manifests(tmp_path):
    for i, samples in enumerate([{"a": {"status": "done"}},
                                 {"b": {"status": "failed"}}]):
        with open(tmp_path / f"manifest.worker{i}.json", "w") as f:
            json.dump({"process_id": str(i), "samples": samples}, f)
    out = multihost.merge_worker_manifests(
        [str(tmp_path / f"manifest.worker{i}.json") for i in range(2)],
        str(tmp_path / "manifest.json"))
    assert set(out) == {"a", "b"}
    with open(tmp_path / "manifest.json") as f:
        assert set(json.load(f)["samples"]) == {"a", "b"}
