"""Model/optimizer checkpointing via Orbax (SURVEY.md §5: the reference is
inference-only with no model checkpointing; the trainer introduced in
train/flow_match.py needs save/restore, and sharded restore lets a resumed
run land directly on the mesh)."""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, params: Any,
                    opt_state: Any = None) -> str:
    """Write params (+opt state) under ``{directory}/step_{step}``."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckpt = _checkpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore the payload; ``template`` (a pytree of arrays or
    ShapeDtypeStructs, possibly with shardings) drives typed/sharded
    restore when given."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(path, template)
    return ckpt.restore(path)
