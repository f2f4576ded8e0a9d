#!/usr/bin/env python
"""W4A16 GEMM latency grid (reference analog: bench_moe_w4a16_grouped_gemm.py)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4, w4a16_gemm

CONFIGS = [
    # (M, N, K) — Llama-8B decode/prefill shapes
    (16, 6144, 4096),    # fused qkv
    (16, 4096, 4096),    # o
    (16, 28672, 4096),   # fused gate_up
    (16, 4096, 14336),   # down
    (128, 28672, 4096),
    (1024, 4096, 4096),
]


def main():
    rng = np.random.default_rng(0)
    records = []
    for m, n, k in CONFIGS:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
        packed, scales, _ = quantize_w4(wf, group_size=128)

        def step(carry, packed=packed, scales=scales, k=k, n=n):
            o = w4a16_gemm(carry, packed, scales, group_size=128)
            w_ = min(n, k)
            return carry.at[:, :w_].add(o[:, :w_] * jnp.bfloat16(1e-8))

        sec = bench_chain(step, a, reps=64)
        gbs = (n * k // 2) / sec / 1e9
        records.append(report(f"w4a16_gemm:{m}-{n}-{k}-128", sec, gbs=round(gbs, 1)))
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
