"""Device mesh construction (replaces CUDA_VISIBLE_DEVICES pinning, B11).

The reference scales by launching one process per GPU from shell
(domainrag.sh:4,15,26) or by torch.multiprocessing sample sharding
(outpainting_updown_sampling_redux.py:1605-1715). Here scale-out is a
``jax.sharding.Mesh`` with two axes:

- ``data``: embarrassingly-parallel sample dimension (batch of k-shot
  samples, retrieval queries, bank shards);
- ``model``: tensor-parallel dimension for the 12B Flux MMDiT (bf16
  weights ~24 GB exceed one v5e chip's 16 GB HBM — TP or FSDP is
  mandatory, SURVEY.md §2C).

Multi-host: call :func:`initialize_distributed` once per process; the mesh
then spans all processes' devices (ICI within a slice, DCN across).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper (no-op when single-process
    args are absent and env autodetection fails)."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
    except Exception:
        # single-process / already initialized
        pass


def create_mesh(model_parallel: int = 1,
                devices: Optional[Sequence[jax.Device]] = None,
                data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """(data, model) mesh over all devices. ``model_parallel`` must divide
    the device count; data gets the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by TP={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for batches of samples."""
    return NamedSharding(mesh, P(axis))
