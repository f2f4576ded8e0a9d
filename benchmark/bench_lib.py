"""Shared benchmark harness with relay-safe timing.

Mirrors the reference's triton-do_bench role (benchmark/*.py) with the
methodology this environment requires (docs/PERF.md): one jitted chain with
a *traced* repetition count, timed by differencing two forced runs.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

# the bench suite is compile-dominated on the axon relay (remote compiles
# take minutes); reuse the persistent cache across scripts/runs
try:
    from sgl_kernel_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache(os.environ.get("SGL_TPU_CACHE", "/tmp/sgl_tpu_jax_cache"))
except Exception:
    pass


def bench_chain(step_fn, carry_init, *, reps: int = 64, spinup: int = 1):
    """step_fn(carry) -> carry (device-only). Returns seconds per step."""

    @jax.jit
    def chain(n, carry):
        def body(i, c):
            return step_fn(c)

        out = jax.lax.fori_loop(0, n, body, carry)
        return jax.tree.leaves(out)[0].reshape(-1)[0]

    _ = float(chain(jnp.int32(spinup), carry_init))

    def run(n):
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(n), carry_init))
        return time.perf_counter() - t0

    _ = run(spinup)
    t1 = min(run(spinup) for _ in range(2))
    t2 = min(run(spinup + reps) for _ in range(2))
    return (t2 - t1) / reps


def report(name: str, seconds: float, **extra):
    rec = {"name": name, "ms": round(seconds * 1e3, 4), **extra}
    print(json.dumps(rec), flush=True)
    return rec


def load_baseline(path=None):
    path = path or os.path.join(os.path.dirname(__file__), "baseline.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def compare_to_baseline(records, baseline):
    """Reference-style LOWER/HIGHER diff report
    (benchmark/update_baseline_from_log.py semantics)."""
    for rec in records:
        name, ms = rec["name"], rec["ms"]
        if name in baseline:
            base = baseline[name]
            delta = (ms - base) / base * 100
            tag = "LOWER" if ms < base else "HIGHER"
            print(f"{name}: {ms:.3f} ms vs baseline {base:.3f} ms ({tag} {abs(delta):.1f}%)")
        else:
            print(f"{name}: {ms:.3f} ms (no baseline)")


def check_regressions(records, baseline, threshold: float = 0.10):
    """Entries slower than baseline by > threshold (the reference CI gate:
    pr-test-xpu.yml fails the PR on baseline diffs). Returns [(name, ms,
    base_ms, pct), ...]."""
    bad = []
    for rec in records:
        base = baseline.get(rec["name"])
        if base and rec["ms"] > base * (1 + threshold):
            bad.append((rec["name"], rec["ms"], base, (rec["ms"] - base) / base * 100))
    return bad


def update_baseline(records, path=None):
    path = path or os.path.join(os.path.dirname(__file__), "baseline.json")
    baseline = load_baseline(path)
    for rec in records:
        baseline[rec["name"]] = rec["ms"]
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
