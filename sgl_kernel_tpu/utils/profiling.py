"""Profiling + compilation-cache utilities.

The reference's performance observation is bench-grid + CI baseline diffing
(SURVEY.md §5: no in-tree tracer; triton do_bench grids +
update_baseline_from_log.py). The TPU-native equivalents:

- ``trace(path)``: a ``jax.profiler`` context manager producing Perfetto/
  TensorBoard traces of XLA executions and Pallas kernels (replaces the
  reference's SYCL_PRINT-debugging + external VTune flow).
- ``enable_persistent_cache(path)``: JAX's persistent compilation cache —
  the TPU equivalent of the reference's entire JIT subsystem (SHA-keyed
  .so cache, jit/compiler.py:431-445): traced programs are keyed by HLO
  hash and reloaded across processes, so first-compile cost is paid once
  per shape-specialization, like the reference's per-(dtype, hidden)
  kernel cache.
- ``timed(fn, *args)``: wall-clock a jitted callable with a forced device
  sync (``block_until_ready`` alone does not wait on relayed backends —
  docs/PERF.md timing methodology).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sgl-tpu-trace"):
    """Capture a jax.profiler trace (view in TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_persistent_cache(path: str = None):
    """Turn on JAX's persistent compilation cache (idempotent)."""
    path = path or os.environ.get("SGL_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/sgl_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def timed(fn, *args, reps: int = 10, **kwargs):
    """Median wall-clock seconds of fn(*args) with a forced host sync."""
    out = fn(*args, **kwargs)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force transfer: real sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
