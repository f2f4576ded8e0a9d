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


def bench_chain(step_fn, carry_init, *, reps: int = 64, spinup: int = 1, args=()):
    """step_fn(carry, *args) -> carry (device-only). Returns seconds/step.

    Pass multi-hundred-MB operands (KV pools, weight banks) via ``args``,
    NOT as closure constants: closed-over arrays embed in the shipped HLO
    and the relay's remote-compile endpoint rejects large bodies with
    HTTP 413 (hit at the B=16 ctx-8192 decode pool, regen 2026-08-19)."""

    @jax.jit
    def chain(n, carry, *a):
        def body(i, c):
            return step_fn(c, *a)

        out = jax.lax.fori_loop(0, n, body, carry)
        return jax.tree.leaves(out)[0].reshape(-1)[0]

    _ = float(chain(jnp.int32(spinup), carry_init, *args))

    def run(n):
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(n), carry_init, *args))
        return time.perf_counter() - t0

    _ = run(spinup)
    for attempt in range(3):
        t1 = min(run(spinup) for _ in range(2 + attempt))
        t2 = min(run(spinup + reps) for _ in range(2 + attempt))
        sec = (t2 - t1) / reps
        if sec > 0:
            return sec
        # relay dispatch jitter (~ms) swamped the differencing for this
        # tiny op — quadruple the rep count and try again (negative
        # "timings" were landing in baseline.json, regen 2026-08-19)
        reps *= 4
    return sec


def bench_chain_banks(step_fn, carry_init, banks, *, reps: int = 16, spinup: int = 1):
    """bench_chain with HONEST WEIGHT RESIDENCY: ``banks`` is a list of L
    same-structure operand tuples; each chain rep runs step_fn once per
    bank, so L distinct weight sets stream through the cache hierarchy and
    a single weight can never go resident across reps (the docs/PERF.md
    round-2 trap — single-weight chains at M=16 measured 4.3 TB/s, >5x the
    HBM peak, and poisoned baseline.json until the round-4 regen).
    Returns seconds per single step (already divided by L)."""
    L = len(banks)
    width = len(banks[0])
    flat = tuple(x for b in banks for x in b)

    def rep(c, *flat_args):
        for i in range(L):
            c = step_fn(c, *flat_args[i * width : (i + 1) * width])
        return c

    return bench_chain(rep, carry_init, reps=reps, spinup=spinup, args=flat) / L


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
        if base and base > 0 and rec["ms"] > base * (1 + threshold):
            bad.append((rec["name"], rec["ms"], base, (rec["ms"] - base) / base * 100))
    return bad


def update_baseline(records, path=None):
    path = path or os.path.join(os.path.dirname(__file__), "baseline.json")
    baseline = load_baseline(path)
    for rec in records:
        # a non-positive "latency" is relay jitter, not a measurement —
        # never let it poison the regression gate
        if rec["ms"] > 0:
            baseline[rec["name"]] = rec["ms"]
    baseline = {k: v for k, v in baseline.items() if v > 0}
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
