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

# full M x shape grid: the 4 Llama-8B shapes at decode / small-prefill /
# large-prefill M buckets (VERDICT #3: every shape >= 85% of stream BW)
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
CONFIGS = [(m, n, k) for (n, k) in SHAPES for m in (16, 128, 1024)]


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
            return carry.at[:, :w_].add(o[:m, :w_] * jnp.bfloat16(1e-8))

        sec = bench_chain(step, a, reps=64 if m <= 128 else 16)
        gbs = (n * k // 2 + (k // 128) * n * 4) / sec / 1e9
        records.append(report(f"w4a16_gemm:{m}-{n}-{k}-128", sec, gbs=round(gbs, 1)))

    # grouped MoE W4A16 (reference bench_moe_w4a16_grouped_gemm.py)
    from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

    e, n, k, bm = 8, 1280, 3584, 128
    cap = 16 * bm
    xs = jnp.asarray(rng.standard_normal((cap, k)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(0, 255, (e, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((e, k // 128, n)).astype(np.float32) * 0.01)
    beids = jnp.asarray(rng.integers(0, e, (cap // bm,)), jnp.int32)

    def gstep(c):
        o = w4a16_grouped_mm(c, wq, sc, beids, group_size=128, bm=bm)
        return c.at[:, :n].add(o[:, :n] * jnp.bfloat16(1e-8))

    sec = bench_chain(gstep, xs, reps=32)
    records.append(report(f"w4a16_grouped_mm:{cap}-{e}-{n}-{k}", sec,
                          gbs=round(e * n * k // 2 / sec / 1e9, 1)))

    # mxfp4 format
    from sgl_kernel_tpu.ops.gemm.w4a16 import mxfp4_to_tpu_layout
    from sgl_kernel_tpu.ops.quant import per_token_group_quant_fp4

    wfm = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32)
    q4, s4 = per_token_group_quant_fp4(wfm)
    pk, scm = mxfp4_to_tpu_layout(q4, s4)
    a = jnp.asarray(rng.standard_normal((16, 4096)), jnp.bfloat16)

    def mstep(c):
        o = w4a16_gemm(c, pk, scm, group_size=32, fmt="mxfp4")
        return c + o[:, :4096] * jnp.bfloat16(1e-8)

    sec = bench_chain(mstep, a, reps=64)
    records.append(report("w4a16_gemm_mxfp4:16-4096-4096-32", sec))
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
