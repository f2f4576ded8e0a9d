#!/usr/bin/env python
"""Run the benchmark suite and update/check baseline.json.

Reference analog: the pr-test-xpu.yml bench loop + update_baseline_from_log.py.
Usage: python benchmark/run_all.py [--update | --check] [--only substr]

--update rewrites baseline.json from this run; --check exits 1 when any
entry regresses >10% vs baseline (the CI perf gate); --only runs the
subset of scripts whose filename contains substr.
"""

import json
import subprocess
import sys
import os

SCRIPTS = [
    "bench_w4a16_gemm.py",
    "bench_attention.py",
    "bench_decode_dma.py",
    "bench_fused_moe.py",
    "bench_quant_gemm.py",
    "bench_quant_ops.py",
    "bench_misc_ops.py",
    "bench_kvcacheio.py",
    "bench_grid_ext.py",
    "bench_grid_ext2.py",
    "bench_deepseek_e2e.py",
]


def main():
    update = "--update" in sys.argv
    check = "--check" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    records = []
    failures = []
    for script in SCRIPTS:
        if only and only not in script:
            continue
        print(f"== {script} ==", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, script)],
            capture_output=True, text=True, cwd=root, timeout=7200,
        )
        print(proc.stdout)
        if proc.returncode != 0:
            # keep any records the script emitted before failing — a
            # partial grid is still a measurement
            failures.append(script)
            print(proc.stderr[-2000:], file=sys.stderr)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "ms" in rec:
                    records.append(rec)
                else:
                    # per-config error record (e.g. fused_moe loud skip)
                    failures.append(rec.get("name", line[:80]))
    if failures:
        # the repo's "no silent caps" rule: a dropped family must be LOUD
        print(f"!! {len(failures)} bench failures/skips: {failures}", flush=True)
    sys.path.insert(0, here)
    from bench_lib import check_regressions, load_baseline, update_baseline

    if update:
        update_baseline(records)
        print(f"baseline.json updated with {len(records)} entries")
        # physics audit: purge any stale row implying > chip peak so the
        # next regen re-measures it (the report()-time guard only stops
        # NEW impossible rows — VERDICT r4 #3)
        import audit_physics

        baseline = load_baseline()
        bad = audit_physics.audit(baseline)
        if bad:
            for name, ms, why in bad:
                print(f"PURGE impossible row {name} = {ms} ms ({why})")
                del baseline[name]
            with open(os.path.join(here, "baseline.json"), "w") as f:
                json.dump(baseline, f, indent=1, sort_keys=True)
    if check:
        bad = check_regressions(records, load_baseline())
        for name, ms, base, pct in bad:
            print(f"REGRESSION {name}: {ms:.4f} ms vs {base:.4f} (+{pct:.1f}%)")
        if bad:
            sys.exit(1)
        print(f"perf gate OK ({len(records)} entries)")


if __name__ == "__main__":
    main()
