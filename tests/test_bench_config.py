"""Config plumbing of the pipeline benchmark (bench.py) — the round-5
fast-mode knobs and the single-chip serving guidance must reach the
stage configs, or the on-chip runs silently measure the wrong mode."""

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    return importlib.reload(bench)


def test_pipebench_cfg_default(monkeypatch):
    monkeypatch.delenv("BENCH_PIPELINE_VCACHE", raising=False)
    cfg = _bench()._pipebench_cfg()
    assert cfg.generate.sampling.velocity_cache_interval == 1
    assert cfg.compose.velocity_cache_interval == 1
    # single-chip guidance: rank batch 1 in BOTH denoise stages
    # (generate: batch-2 graph 19.31 GB OOM next to the co-residents;
    # compose: the 5-bg one-batch graph 20.29 GB OOM — both measured)
    assert cfg.generate.max_rank_batch == 1
    assert cfg.compose.max_rank_batch == 1


def test_pipebench_cfg_fast_mode(monkeypatch):
    monkeypatch.setenv("BENCH_PIPELINE_VCACHE", "3")
    cfg = _bench()._pipebench_cfg()
    assert cfg.generate.sampling.velocity_cache_interval == 3
    assert cfg.compose.velocity_cache_interval == 3
