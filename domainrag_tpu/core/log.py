"""Logging + lightweight step timing.

Replaces the reference's mixed print/tqdm/logging
(lama_inpaint/lama_inpaint.py:14-30 was the only real logger) with one
framework logger and a profiling context that can emit ``jax.profiler``
traces (SURVEY.md §5 tracing).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Iterator, Optional

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str = "domainrag_tpu",
               log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    return logger


class StepTimer:
    """Accumulates named wall-clock spans; per-stage replacement for the
    reference's ad-hoc ``process_time_seconds``
    (outpainting_updown_sampling_redux.py:888,1348-1358)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler.trace`` wrapper, no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
