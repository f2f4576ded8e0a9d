#!/usr/bin/env python
"""Per-commit test suite runner (reference analog: tests/run_suite.py with
greedy time-balanced partitioning for sharded CI runners).

Usage: python tools/run_suite.py [--shard I --num-shards N]
"""

import argparse
import glob
import os
import subprocess
import sys

# rough per-file cost weights (seconds, CPU interpret mode) for balancing
WEIGHTS = {
    "test_model.py": 25,
    "test_attention.py": 15,
    "test_gemm.py": 12,
    "test_parallel.py": 10,
    "test_moe.py": 8,
    "test_deepseek.py": 8,
    "test_quant.py": 6,
    "test_linear_attn.py": 5,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    files.sort(key=lambda f: -WEIGHTS.get(os.path.basename(f), 3))
    shards = [[] for _ in range(args.num_shards)]
    loads = [0.0] * args.num_shards
    for f in files:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(os.path.basename(f), 3)

    mine = shards[args.shard]
    print(f"shard {args.shard}/{args.num_shards}: {[os.path.basename(f) for f in mine]}")
    rc = subprocess.run([sys.executable, "-m", "pytest", "-q", *mine], cwd=root).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
