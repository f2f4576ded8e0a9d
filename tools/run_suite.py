#!/usr/bin/env python
"""Fault-tolerant per-commit test suite runner.

Reference analogs: tests/run_suite.py (greedy time-balanced partitioning for
sharded CI runners) and tests/test_utils.py:16-58 (per-file subprocess
execution with hang SIGKILL of the process group, device-recovery wait, and
retries of signal-killed files via SGL_KERNEL_INFRA_RETRIES).

TPU translation: each test file runs in its own subprocess (a wedged Mosaic
compile or a faulted device buffer cannot take down the whole suite), hangs
are killed by process group after --timeout seconds, and a file that dies
on a signal (device wedge, OOM-kill) is retried after a device-health probe
(a trivial jax program in a fresh subprocess — the `xpu-smi health` analog)
up to SGL_KERNEL_TPU_INFRA_RETRIES times. Nonzero-but-clean pytest failures
are NOT retried — those are real test failures.

Usage: python tools/run_suite.py [--num-shards N] [--shard I] [--timeout S]

Without --shard, ALL N shards run as parallel worker subprocesses and the
exit code aggregates them (round-3 bug: the default --shard 0 silently ran
only a quarter of the suite — the CI and CLAUDE.md invocation). With
--shard I, only shard I runs (the per-worker mode used by CI matrices).
"""

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

# rough per-file cost weights (seconds, CPU interpret mode) for balancing
WEIGHTS = {
    "test_model.py": 25,
    "test_golden_numerics.py": 20,
    "test_engine_stress.py": 18,
    "test_attention.py": 15,
    "test_sweeps.py": 14,
    "test_gemm.py": 12,
    "test_parallel.py": 10,
    "test_multihost.py": 10,
    "test_moe.py": 8,
    "test_deepseek.py": 8,
    "test_quant.py": 6,
    "test_sweeps2.py": 6,
    "test_linear_attn.py": 5,
}

RETRIES = int(os.environ.get("SGL_KERNEL_TPU_INFRA_RETRIES", "1"))
RECOVER_WAIT = float(os.environ.get("SGL_KERNEL_TPU_RECOVER_WAIT", "5"))


def device_healthy(root: str) -> bool:
    """Health probe in a fresh subprocess: build + run a trivial jitted
    program. A wedged device/tunnel makes this hang or die; the probe's own
    process isolates us from that. Defaults to the CPU backend (the suite
    runs on the CPU mesh, and the shared TPU may be legitimately busy);
    set SGL_KERNEL_TPU_PROBE_TPU=1 to probe the real chip."""
    plat = "None" if os.environ.get("SGL_KERNEL_TPU_PROBE_TPU") else "'cpu'"
    code = (
        f"import jax; p = {plat}; "
        "jax.config.update('jax_platforms', p) if p else None; "
        "import jax.numpy as jnp; "
        "assert float(jax.jit(lambda x: (x*x).sum())(jnp.ones(8))) == 8.0; "
        "print('healthy')"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=root,
                           capture_output=True, timeout=120)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_file(path: str, root: str, timeout: float) -> int:
    """Run one test file in its own process group; SIGKILL the group on
    hang. Returns the pytest return code, or -signum on signal death,
    or -9 on our own hang kill."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "pytest", "-q", path],
        cwd=root, start_new_session=True,
    )
    try:
        return proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        print(f"TIMEOUT {os.path.basename(path)} (killed process group)", flush=True)
        return -signal.SIGKILL


def run_with_retries(path: str, root: str, timeout: float) -> int:
    rc = run_file(path, root, timeout)
    attempts = 0
    # rc < 0: died on a signal (hang kill, device wedge, OOM-kill) ->
    # infra failure, retry after a health probe. rc > 0: real test failure.
    while rc < 0 and attempts < RETRIES:
        attempts += 1
        print(f"RETRY {attempts}/{RETRIES} {os.path.basename(path)} "
              f"(signal {-rc}); waiting for device recovery", flush=True)
        time.sleep(RECOVER_WAIT)
        if not device_healthy(root):
            print("device health probe FAILED; waiting longer", flush=True)
            time.sleep(5 * RECOVER_WAIT)
        rc = run_file(path, root, timeout)
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", type=int, default=None,
                    help="run ONLY this shard (worker mode); default: run all")
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-file hang kill (seconds)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if args.shard is None and args.num_shards > 1:
        # driver mode: one worker subprocess per shard, all in parallel,
        # aggregate exit codes. This is what `--num-shards 4` means.
        procs = []
        for i in range(args.num_shards):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--shard", str(i), "--num-shards", str(args.num_shards),
                 "--timeout", str(args.timeout)],
                cwd=root,
            ))
        bad = [i for i, p in enumerate(procs) if p.wait() != 0]
        if bad:
            print(f"FAILED shards: {bad}")
            sys.exit(1)
        print(f"suite OK (all {args.num_shards} shards)")
        return

    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    files.sort(key=lambda f: -WEIGHTS.get(os.path.basename(f), 3))
    shards = [[] for _ in range(args.num_shards)]
    loads = [0.0] * args.num_shards
    for f in files:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(os.path.basename(f), 3)

    mine = shards[args.shard or 0]
    print(f"shard {args.shard or 0}/{args.num_shards}: "
          f"{[os.path.basename(f) for f in mine]}", flush=True)
    failures = []
    for f in mine:
        rc = run_with_retries(f, root, args.timeout)
        if rc not in (0, 5):  # 5 = no tests collected
            failures.append((os.path.basename(f), rc))
    if failures:
        print(f"FAILED files: {failures}")
        sys.exit(1)
    print("suite OK")


if __name__ == "__main__":
    main()
