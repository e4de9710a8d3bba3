"""Tracing / profiling / structured training logs.

The reference's only observability is `print` of the per-epoch penalized
log-likelihood (`/root/reference/rankfm/_rankfm.pyx:332-336`) and `%%time`
notebook cells (SURVEY.md §5). Here:

* every fit records a structured per-epoch log (epoch, eta, log-likelihood,
  penalized ll, wall seconds, interactions/s) on ``model.training_log_``,
* `trace(path)` wraps a block in a `jax.profiler` trace for offline analysis
  in TensorBoard/XProf,
* `device_memory_stats()` snapshots live HBM usage where the backend exposes
  it.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Profile a block: ``with observe.trace('/tmp/trace'): model.fit(...)``"""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None):
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return stats or {}
