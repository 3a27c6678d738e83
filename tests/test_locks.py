"""Shared-cache locking and atomic publication."""

import json
import multiprocessing as mp
import os

import numpy as np

from domainrag_tpu.core.locks import (atomic_save_npy, atomic_write_text,
                                      file_lock)


def test_atomic_npy_roundtrip(tmp_path):
    path = str(tmp_path / "a" / "feats.npy")
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    atomic_save_npy(path, arr)
    np.testing.assert_array_equal(np.load(path), arr)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path / "a"))


def test_atomic_text(tmp_path):
    path = str(tmp_path / "x.json")
    atomic_write_text(path, json.dumps([1, 2]))
    assert json.load(open(path)) == [1, 2]


def _worker(path, results, idx):
    with file_lock(path):
        # read-modify-write that would race without the lock
        value = int(open(path).read()) if os.path.exists(path) else 0
        import time
        time.sleep(0.02)
        with open(path, "w") as f:
            f.write(str(value + 1))
    results.put(idx)


def test_file_lock_serializes(tmp_path):
    path = str(tmp_path / "counter.txt")
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(path, q, i)) for i in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert int(open(path).read()) == 4  # no lost updates
