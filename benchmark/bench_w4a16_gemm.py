#!/usr/bin/env python
"""W4A16 GEMM latency grid (reference analog: bench_moe_w4a16_grouped_gemm.py).

Round-4 honest-residency rewrite (VERDICT weak #4): every record streams L
DISTINCT weight banks per chain rep (bench_chain_banks) so no weight can go
cache-resident across reps — the old single-weight chains measured
physically impossible numbers at M=16 (4.3 TB/s vs the 819 GB/s HBM peak).
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain_banks, compare_to_baseline, load_baseline, report
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
        # enough distinct banks that L * weight_bytes >> any cache level
        nbytes = n * k // 2
        L = max(2, min(12, (192 << 20) // nbytes))
        banks = []
        for _ in range(L):
            wf = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
            packed, scales, _ = quantize_w4(wf, group_size=128)
            banks.append((packed, scales))

        def step(carry, packed, scales, k=k, n=n, m=m):
            o = w4a16_gemm(carry, packed, scales, group_size=128)
            w_ = min(n, k)
            return carry.at[:, :w_].add(o[:m, :w_] * jnp.bfloat16(1e-8))

        # small-M rows are ~20-90us/step: the differenced window must dwarf
        # the relay's ~ms-scale call jitter or the gate records noise
        # (a 16-4096-14336 row read 1278 GB/s > HBM peak on the first
        # round-4 regen pass with reps=8)
        sec = bench_chain_banks(step, a, banks, reps=32 if m <= 128 else 4)
        gbs = (n * k // 2 + (k // 128) * n * 4) / sec / 1e9
        records.append(report(f"w4a16_gemm:{m}-{n}-{k}-128", sec, gbs=round(gbs, 1)))

    # grouped MoE W4A16 (reference bench_moe_w4a16_grouped_gemm.py)
    from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

    e, n, k, bm = 8, 1280, 3584, 128
    cap = 16 * bm
    xs = jnp.asarray(rng.standard_normal((cap, k)), jnp.bfloat16)
    beids = jnp.asarray(rng.integers(0, e, (cap // bm,)), jnp.int32)
    gbanks = []
    for _ in range(6):
        wq = jnp.asarray(rng.integers(0, 255, (e, k // 2, n)), jnp.uint8)
        sc = jnp.asarray(rng.random((e, k // 128, n)).astype(np.float32) * 0.01)
        gbanks.append((wq, sc))

    def gstep(c, wq, sc):
        o = w4a16_grouped_mm(c, wq, sc, beids, group_size=128, bm=bm)
        return c.at[:, :n].add(o[:, :n] * jnp.bfloat16(1e-8))

    sec = bench_chain_banks(gstep, xs, gbanks, reps=6)
    records.append(report(f"w4a16_grouped_mm:{cap}-{e}-{n}-{k}", sec,
                          gbs=round(e * n * k // 2 / sec / 1e9, 1)))

    # mxfp4 format
    from sgl_kernel_tpu.ops.gemm.w4a16 import mxfp4_to_tpu_layout
    from sgl_kernel_tpu.ops.quant import per_token_group_quant_fp4

    mbanks = []
    for _ in range(12):
        wfm = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32)
        q4, s4 = per_token_group_quant_fp4(wfm)
        mbanks.append(mxfp4_to_tpu_layout(q4, s4))
    a = jnp.asarray(rng.standard_normal((16, 4096)), jnp.bfloat16)

    def mstep(c, pk, scm):
        o = w4a16_gemm(c, pk, scm, group_size=32, fmt="mxfp4")
        return c + o[:, :4096] * jnp.bfloat16(1e-8)

    sec = bench_chain_banks(mstep, a, mbanks, reps=8)
    records.append(report("w4a16_gemm_mxfp4:16-4096-4096-32", sec))
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
