"""Multi-host coordination (SURVEY.md §5 distributed backend).

The reference coordinates its process-per-GPU workers with
``multiprocessing.Queue`` progress/result plumbing and merges their
outputs in the parent (outpainting_updown_sampling_redux.py:1605-1767).
The TPU-native replacement is ``jax.distributed`` + XLA collectives for
device work and host-side artifact files for stage outputs:

- each process (host) runs the SAME stage code over a disjoint
  round-robin sample slice (``core.config.worker_slice`` keyed by
  ``jax.process_index()``);
- stage artifacts are written worker-suffixed (retrieval partials,
  per-host manifests); per-sample files are naturally disjoint;
- :func:`barrier` (``multihost_utils.sync_global_devices``) fences
  stage boundaries; worker 0 then merges the partials into the
  canonical single-file contracts the next stage consumes.

Exercised end-to-end by tests/test_multihost.py: two coordinated
``jax.distributed`` CPU processes run worker-sliced retrieve+generate
over a shared directory and the merged artifacts match the
single-process run.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional

import jax

from ..core.log import get_logger

logger = get_logger("domainrag_tpu.multihost")


def is_distributed() -> bool:
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def process_index() -> int:
    try:
        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def barrier(name: str) -> None:
    """Fence all hosts at a stage boundary (no-op single-process).

    Replaces the reference's queue-join synchronization
    (outpainting_updown_sampling_redux.py:1666-1713)."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(f"domainrag/{name}")


def shared_timestamp() -> str:
    """A run timestamp identical on every host (broadcast from process 0)
    — run directories like ``results_*_{timestamp}`` must agree across
    hosts or each worker writes into its own tree."""
    import time
    if not is_distributed():
        return time.strftime("%Y%m%d_%H%M%S")
    import numpy as np
    from jax.experimental import multihost_utils
    t = multihost_utils.broadcast_one_to_all(
        np.int64(int(time.time())))
    return time.strftime("%Y%m%d_%H%M%S", time.localtime(int(t)))


# ---------------------------------------------------------------------------
# artifact merges (run on worker 0 after a barrier)
# ---------------------------------------------------------------------------

def merge_worker_retrieval_results(results_dir: str,
                                   out_name: str =
                                   "all_shots_retrieval_results.json"
                                   ) -> Optional[dict]:
    """Merge ``all_shots_retrieval_results.worker{W}.json`` partials into
    the canonical all-shots contract (ref :1095-1097 file).

    Workers hold disjoint sample slices, so the merge concatenates each
    (dataset, shot, category)'s entry lists; entries are de-duplicated by
    sample_id (first worker wins) and sorted for determinism."""
    partials = sorted(glob.glob(os.path.join(
        results_dir, "all_shots_retrieval_results.worker*.json")),
        key=lambda p: int(re.search(r"worker(\d+)", p).group(1)))
    if not partials:
        return None
    merged: Dict[str, dict] = {}
    for path in partials:
        with open(path, encoding="utf-8") as f:
            part = json.load(f)
        for dataset, shots in part.items():
            d = merged.setdefault(dataset, {})
            for shot_key, categories in shots.items():
                s = d.setdefault(shot_key, {})
                for category, entries in categories.items():
                    known = {e["sample_id"]
                             for e in s.setdefault(category, [])}
                    s[category].extend(e for e in entries
                                       if e["sample_id"] not in known)
    for shots in merged.values():
        for categories in shots.values():
            for entries in categories.values():
                entries.sort(key=lambda e: e["sample_id"])
    out = os.path.join(results_dir, out_name)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(merged, f, indent=2, ensure_ascii=False)
    logger.info("merged %d retrieval partials -> %s", len(partials), out)
    return merged


def merge_worker_manifests(paths: List[str], out_path: str) -> dict:
    """Union per-host manifest files ({"process_id", "samples": {...}} —
    core.manifest layout) into one (replaces the reference's
    merge_gpu_results, ref :1750-1767). Workers hold disjoint samples, so
    conflicts only arise from reruns; later files win those."""
    merged: Dict[str, dict] = {}
    for path in paths:
        if not os.path.exists(path):
            continue
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        merged.update(data.get("samples", {}))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"process_id": "merged", "samples": merged}, f, indent=2)
    return merged
