#!/usr/bin/env python
"""Quantized-GEMM family latency grid.

ZERO-MULTIPLY TRAP (round 4): feeding the output back as ``o * 0 + eps``
lets XLA's algebraic simplifier fold the product to a constant and
DEAD-CODE the entire GEMM — the round-3 rows measured the empty chain
(fp8 16-4096-4096 "ran" at 2.8 TB/s). Every feedback below multiplies by
a small NONZERO constant (or adds the raw column) so the kernel stays in
the dependency chain.

Original docstring: Quantized-GEMM family latency grid (reference analogs:
bench_fp8_gemm.py, bench_fp8_blockwise_gemm.py, bench_int8_gemm.py,
bench_qserve_w4a8_gemm.py — all declared-only on XPU; the TPU build
implements and tracks them, SURVEY.md §2.6).

Round-4 honest-residency rewrite (VERDICT weak #4): every weight-streaming
record cycles L DISTINCT weight banks per chain rep (bench_chain_banks) so
the regression gate tracks numbers that are physically possible — the old
single-weight chains had int8 M=1024 above the chip's int8 TOPS peak.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain_banks, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops.gemm import (
    fp8_blockwise_scaled_mm,
    fp8_scaled_mm,
    int8_scaled_mm,
    qserve_w4a8_per_chn_gemm,
)
from sgl_kernel_tpu.ops.gemm.blockwise_fp8 import prepare_blockwise_scales

rng = np.random.default_rng(0)
records = []


def banks_of(L, make):
    return [make() for _ in range(L)]


def nbanks(weight_bytes, lo=2, hi=12):
    return max(lo, min(hi, (192 << 20) // max(weight_bytes, 1)))


def main():
    # decode + prefill M at llama (4096) and DSv3 (7168) K
    for m, n, k in [(16, 4096, 4096), (1024, 4096, 4096),
                    (16, 4096, 7168), (1024, 4096, 7168),
                    (16, 14336, 4096)]:
        # INT8 scaled MM
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        sa = jnp.asarray(rng.random(m) * 0.01 + 0.001, jnp.float32)
        L = nbanks(k * n)
        ibanks = banks_of(L, lambda: (
            jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8),
            jnp.asarray(rng.random(n) * 0.01 + 0.001, jnp.float32)))

        def int8_chain(carry, b8, sb, sa=sa):
            o = int8_scaled_mm(carry.astype(jnp.int8), b8, sa, sb, out_dtype=jnp.bfloat16)
            return (carry + o[:, :1].astype(carry.dtype)).astype(carry.dtype)

        sec = bench_chain_banks(int8_chain, a8.astype(jnp.int32), ibanks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k, int_ops=True)
        records.append(report(f"int8_scaled_mm:{m}-{n}-{k}", sec,
                              gbs=round((m * k + k * n) / sec / 1e9, 1)))

        # FP8 scaled MM (per-tensor)
        af = jnp.asarray(rng.standard_normal((m, k)) * 0.2, jnp.float8_e4m3fn)
        fbanks = banks_of(L, lambda: (
            jnp.asarray(rng.standard_normal((k, n)) * 0.2, jnp.float8_e4m3fn),))

        def fp8_chain(carry, bf, k=k):
            o = fp8_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf,
                              jnp.float32(0.01), jnp.float32(0.01), out_dtype=jnp.bfloat16)
            return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

        sec = bench_chain_banks(fp8_chain, af.astype(jnp.bfloat16), fbanks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k)
        records.append(report(f"fp8_scaled_mm:{m}-{n}-{k}", sec,
                              gbs=round((m * k + k * n) / sec / 1e9, 1)))

        # FP8 blockwise (DeepSeek 1x128 / 128x128), weight-stationary scales
        sab = jnp.asarray(rng.random((m, k // 128)) + 0.5, jnp.float32)
        bbanks = banks_of(L, lambda: (
            jnp.asarray(rng.standard_normal((k, n)) * 0.2, jnp.float8_e4m3fn),
            prepare_blockwise_scales(
                jnp.asarray(rng.random((k // 128, n // 128)) + 0.5, jnp.float32))))

        def blk_chain(carry, bf, sbb, sab=sab):
            o = fp8_blockwise_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf, sab, sbb,
                                        out_dtype=jnp.bfloat16)
            return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

        sec = bench_chain_banks(blk_chain, af.astype(jnp.bfloat16), bbanks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k)
        name = f"fp8_blockwise_scaled_mm:{m}-{n}-{k}"
        gbs = (m * k + k * n) / sec / 1e9
        tf = 2 * m * n * k / sec / 1e12
        records.append(report(name, sec, gbs=round(gbs, 1), tflops=round(tf, 1)))

    # QServe W4A8 per-channel + per-group
    M, N, K = 16, 4096, 4096
    aq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    s1 = jnp.asarray(rng.random(N) * 0.01, jnp.float32)
    sa_tok = jnp.asarray(rng.random(M) * 0.01, jnp.float32)
    z1 = jnp.asarray(rng.random(N), jnp.float32)
    asums = jnp.asarray(rng.random(M), jnp.float32)
    Lq = nbanks(N * K)
    qbanks = banks_of(Lq, lambda: (
        jnp.asarray(rng.integers(0, 15, (N, K)), jnp.uint8),))

    def qserve_chain(carry, wq, s1=s1, z1=z1, sa_tok=sa_tok, asums=asums):
        o = qserve_w4a8_per_chn_gemm(carry.astype(jnp.int8), wq, s1, sa_tok, z1, asums)
        return carry + o[:, :1].astype(carry.dtype)

    sec = bench_chain_banks(qserve_chain, aq.astype(jnp.int32), qbanks, reps=8,
                            bytes_per_step=N * K)
    records.append(report(f"qserve_w4a8_per_chn:{M}-{N}-{K}", sec,
                          gbs=round((N * K) / sec / 1e9, 1)))

    from sgl_kernel_tpu.ops.gemm import qserve_w4a8_per_group_gemm

    g = 128
    s2 = jnp.asarray(rng.integers(1, 16, (N, K // g)), jnp.int8)
    zx = jnp.asarray((rng.integers(0, 15, (N, K // g)) * rng.integers(1, 16, (N, K // g))), jnp.int32).astype(jnp.int8)

    def qserve_g_chain(carry, wq, s2=s2, zx=zx, s1=s1, sa_tok=sa_tok):
        o = qserve_w4a8_per_group_gemm(carry.astype(jnp.int8), wq, zx, s2, s1, sa_tok, group_size=g)
        return carry + o[:, :1].astype(carry.dtype)

    sec = bench_chain_banks(qserve_g_chain, aq.astype(jnp.int32), qbanks, reps=8,
                            bytes_per_step=N * K)
    records.append(report(f"qserve_w4a8_per_group:{M}-{N}-{K}-{g}", sec,
                          gbs=round((N * K) / sec / 1e9, 1)))

    # bmm_fp8 (reference bench_bmm_fp8 analog: per-head attention-shaped bmm)
    from sgl_kernel_tpu.ops.gemm import bmm_fp8

    bb, mm, kk2, nn2 = 32, 16, 512, 128
    ab = jnp.asarray(rng.standard_normal((bb, mm, kk2)) * 0.2, jnp.float8_e4m3fn)
    mbanks = banks_of(12, lambda: (
        jnp.asarray(rng.standard_normal((bb, kk2, nn2)) * 0.2, jnp.float8_e4m3fn),))

    def bmm_chain(carry, bbm):
        o = bmm_fp8(carry.astype(jnp.float8_e4m3fn), bbm, jnp.float32(0.01),
                    jnp.float32(0.01), out_dtype=jnp.bfloat16)
        return carry.at[:, :, : o.shape[-1]].add((o * 1e-6).astype(carry.dtype))

    sec = bench_chain_banks(bmm_chain, ab.astype(jnp.bfloat16), mbanks, reps=8)
    records.append(report(f"bmm_fp8:{bb}-{mm}-{nn2}-{kk2}", sec))

    # grouped blockwise-FP8 MoE GEMM (DSv3 quantized MoE shape)
    from sgl_kernel_tpu.ops.gemm import fp8_blockwise_scaled_grouped_mm

    e, cap, kg, ng = 8, 2048, 1024, 1536
    ag = jnp.asarray(rng.standard_normal((cap, kg)) * 0.2, jnp.float8_e4m3fn)
    sag = jnp.asarray(rng.random((cap, kg // 128)) + 0.5, jnp.float32)
    eids = jnp.asarray(rng.integers(0, e, (cap // 128,)), jnp.int32)
    Lg = nbanks(e * kg * ng, hi=8)
    grbanks = banks_of(Lg, lambda: (
        jnp.asarray(rng.standard_normal((e, kg, ng)) * 0.2, jnp.float8_e4m3fn),
        jnp.asarray(rng.random((e, kg // 128, ng // 128)) + 0.5, jnp.float32)))

    def grp_chain(carry, wg, sbg, sag=sag, eids=eids):
        o = fp8_blockwise_scaled_grouped_mm(
            carry.astype(jnp.float8_e4m3fn), wg, sag, sbg, eids, out_dtype=jnp.bfloat16)
        return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

    sec = bench_chain_banks(grp_chain, ag.astype(jnp.bfloat16), grbanks, reps=4,
                            bytes_per_step=cap * kg + e * kg * ng)
    records.append(report(f"fp8_blockwise_grouped_mm:{cap}-{e}-{ng}-{kg}", sec,
                          gbs=round((cap * kg + e * kg * ng) / sec / 1e9, 1)))

    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
