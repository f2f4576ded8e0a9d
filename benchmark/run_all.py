#!/usr/bin/env python
"""Run the benchmark suite and update/check baseline.json.

Reference analog: the pr-test-xpu.yml bench loop + update_baseline_from_log.py.
Usage: python benchmark/run_all.py [--update]
"""

import json
import subprocess
import sys
import os

SCRIPTS = ["bench_w4a16_gemm.py", "bench_attention.py", "bench_fused_moe.py", "bench_quant_gemm.py"]


def main():
    update = "--update" in sys.argv
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    records = []
    for script in SCRIPTS:
        print(f"== {script} ==", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, script)],
            capture_output=True, text=True, cwd=root, timeout=1800,
        )
        print(proc.stdout)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    if update:
        sys.path.insert(0, here)
        from bench_lib import update_baseline

        update_baseline(records)
        print(f"baseline.json updated with {len(records)} entries")


if __name__ == "__main__":
    main()
