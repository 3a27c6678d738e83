"""Multi-worker sample sharding: disjoint, exhaustive, deterministic."""

from domainrag_tpu.core.config import worker_slice


def test_worker_slice_partition():
    items = [f"s{i}" for i in range(10)]
    shards = [worker_slice(items, w, 3) for w in range(3)]
    flat = sorted(x for s in shards for x in s)
    assert flat == sorted(items)                 # exhaustive
    assert len(set(map(tuple, shards))) == 3     # disjoint
    assert worker_slice(items, 0, 1) == items    # single worker = identity
    assert worker_slice(items, 1, 3) == ["s1", "s4", "s7"]
