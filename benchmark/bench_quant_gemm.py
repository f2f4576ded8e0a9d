#!/usr/bin/env python
"""Quantized-GEMM family latency grid (reference analogs:
bench_fp8_gemm.py, bench_fp8_blockwise_gemm.py, bench_int8_gemm.py,
bench_qserve_w4a8_gemm.py — all declared-only on XPU; the TPU build
implements and tracks them, SURVEY.md §2.6)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops.gemm import (
    fp8_blockwise_scaled_mm,
    fp8_scaled_mm,
    int8_scaled_mm,
    qserve_w4a8_per_chn_gemm,
)

M, N, K = 16, 4096, 4096
MP = 1024  # prefill-shape M


def _chain(fn, a0):
    def step(carry):
        o = fn(carry)
        w = min(o.shape[1], K)
        return carry.at[:, :w].add((o[:, :w] * 1e-6).astype(carry.dtype))

    return bench_chain(step, a0, reps=32)


def main():
    rng = np.random.default_rng(0)
    records = []

    for m in (M, MP):
        # INT8 scaled MM
        a8 = jnp.asarray(rng.integers(-127, 127, (m, K)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        sa = jnp.asarray(rng.random(m) * 0.01 + 0.001, jnp.float32)
        sb = jnp.asarray(rng.random(N) * 0.01 + 0.001, jnp.float32)

        def int8_step(carry, b8=b8, sa=sa, sb=sb):
            return int8_scaled_mm(carry, b8, sa, sb, out_dtype=jnp.bfloat16)

        def int8_chain(carry, b8=b8, sa=sa, sb=sb):
            o = int8_scaled_mm(carry.astype(jnp.int8), b8, sa, sb, out_dtype=jnp.bfloat16)
            return (carry + (o[:, :K] * 0).astype(carry.dtype) + 1).astype(carry.dtype)

        sec = bench_chain(int8_chain, a8.astype(jnp.int32), reps=32)
        records.append(report(f"int8_scaled_mm:{m}-{N}-{K}", sec, gbs=round((m * K + K * N) / sec / 1e9, 1)))

        # FP8 scaled MM
        af = jnp.asarray(rng.standard_normal((m, K)) * 0.2, jnp.float8_e4m3fn)
        bf = jnp.asarray(rng.standard_normal((K, N)) * 0.2, jnp.float8_e4m3fn)

        def fp8_chain(carry, bf=bf):
            o = fp8_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf,
                              jnp.float32(0.01), jnp.float32(0.01), out_dtype=jnp.bfloat16)
            return carry + (o[:, :K] * 0 + 1e-6).astype(carry.dtype)

        sec = bench_chain(fp8_chain, af.astype(jnp.bfloat16), reps=32)
        records.append(report(f"fp8_scaled_mm:{m}-{N}-{K}", sec, gbs=round((m * K + K * N) / sec / 1e9, 1)))

        # FP8 blockwise (DeepSeek 1x128 / 128x128)
        sab = jnp.asarray(rng.random((m, K // 128)) + 0.5, jnp.float32)
        sbb = jnp.asarray(rng.random((K // 128, N // 128)) + 0.5, jnp.float32)

        def blk_chain(carry, bf=bf, sab=sab, sbb=sbb):
            o = fp8_blockwise_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf, sab, sbb, out_dtype=jnp.bfloat16)
            return carry + (o[:, :K] * 0 + 1e-6).astype(carry.dtype)

        sec = bench_chain(blk_chain, af.astype(jnp.bfloat16), reps=32)
        records.append(report(f"fp8_blockwise_scaled_mm:{m}-{N}-{K}", sec, gbs=round((m * K + K * N) / sec / 1e9, 1)))

    # gate_up-shaped INT8/FP8 rows (N=14336 Llama-8B half gate_up)
    nn = 14336
    b8w = jnp.asarray(rng.integers(-127, 127, (K, nn)), jnp.int8)
    sbw = jnp.asarray(rng.random(nn) * 0.01 + 0.001, jnp.float32)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    sa = jnp.asarray(rng.random(M) * 0.01 + 0.001, jnp.float32)

    def int8_wide(carry, b8w=b8w, sa=sa, sbw=sbw):
        o = int8_scaled_mm(carry.astype(jnp.int8), b8w, sa, sbw, out_dtype=jnp.bfloat16)
        return (carry + (o[:, :K] * 0).astype(carry.dtype) + 1).astype(carry.dtype)

    sec = bench_chain(int8_wide, a8.astype(jnp.int32), reps=32)
    records.append(report(f"int8_scaled_mm:{M}-{nn}-{K}", sec, gbs=round((M * K + K * nn) / sec / 1e9, 1)))

    bfw = jnp.asarray(rng.standard_normal((K, nn)) * 0.2, jnp.float8_e4m3fn)

    def fp8_wide(carry, bfw=bfw):
        o = fp8_scaled_mm(carry.astype(jnp.float8_e4m3fn), bfw,
                          jnp.float32(0.01), jnp.float32(0.01), out_dtype=jnp.bfloat16)
        return carry + (o[:, :K] * 0 + 1e-6).astype(carry.dtype)

    af = jnp.asarray(rng.standard_normal((M, K)) * 0.2, jnp.float8_e4m3fn)
    sec = bench_chain(fp8_wide, af.astype(jnp.bfloat16), reps=32)
    records.append(report(f"fp8_scaled_mm:{M}-{nn}-{K}", sec, gbs=round((M * K + K * nn) / sec / 1e9, 1)))

    # QServe W4A8 per-channel
    aq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(0, 15, (N, K)), jnp.uint8)
    s1 = jnp.asarray(rng.random(N) * 0.01, jnp.float32)
    sa_tok = jnp.asarray(rng.random(M) * 0.01, jnp.float32)
    z1 = jnp.asarray(rng.random(N), jnp.float32)
    asums = jnp.asarray(rng.random(M), jnp.float32)

    def qserve_chain(carry, wq=wq, s1=s1, z1=z1, sa_tok=sa_tok, asums=asums):
        o = qserve_w4a8_per_chn_gemm(carry.astype(jnp.int8), wq, s1, sa_tok, z1, asums)
        return carry + (o[:, :K] * 0 + 1).astype(carry.dtype)

    sec = bench_chain(qserve_chain, aq.astype(jnp.int32), reps=32)
    records.append(report(f"qserve_w4a8_per_chn:{M}-{N}-{K}", sec, gbs=round((N * K) / sec / 1e9, 1)))

    # QServe W4A8 per-group (s2 int8 group scales + zeros, g=128)
    from sgl_kernel_tpu.ops.gemm import qserve_w4a8_per_group_gemm

    g = 128
    s2 = jnp.asarray(rng.integers(1, 16, (N, K // g)), jnp.int8)
    zx = jnp.asarray((rng.integers(0, 15, (N, K // g)) * rng.integers(1, 16, (N, K // g))), jnp.int32).astype(jnp.int8)

    def qserve_g_chain(carry, wq=wq, s2=s2, zx=zx, s1=s1, sa_tok=sa_tok):
        o = qserve_w4a8_per_group_gemm(carry.astype(jnp.int8), wq, zx, s2, s1, sa_tok, group_size=g)
        return carry + (o[:, :K] * 0 + 1).astype(carry.dtype)

    sec = bench_chain(qserve_g_chain, aq.astype(jnp.int32), reps=32)
    records.append(report(f"qserve_w4a8_per_group:{M}-{N}-{K}-{g}", sec, gbs=round((N * K) / sec / 1e9, 1)))

    # bmm_fp8 (reference bench_bmm_fp8 analog: per-head attention-shaped bmm)
    from sgl_kernel_tpu.ops.gemm import bmm_fp8

    bb, mm, kk2, nn2 = 32, 16, 512, 128
    ab = jnp.asarray(rng.standard_normal((bb, mm, kk2)) * 0.2, jnp.float8_e4m3fn)
    bbm = jnp.asarray(rng.standard_normal((bb, kk2, nn2)) * 0.2, jnp.float8_e4m3fn)

    def bmm_chain(carry, bbm=bbm):
        o = bmm_fp8(carry.astype(jnp.float8_e4m3fn), bbm, jnp.float32(0.01), jnp.float32(0.01), out_dtype=jnp.bfloat16)
        # feed back into the carry's leading nn2 columns (o is [B, M, nn2])
        return carry.at[:, :, : o.shape[-1]].add((o * 0 + 1e-6).astype(carry.dtype))

    sec = bench_chain(bmm_chain, ab.astype(jnp.bfloat16), reps=32)
    records.append(report(f"bmm_fp8:{bb}-{mm}-{nn2}-{kk2}", sec))

    # grouped blockwise-FP8 MoE GEMM (DSv3 quantized MoE shape)
    from sgl_kernel_tpu.ops.gemm import fp8_blockwise_scaled_grouped_mm

    e, cap, kg, ng = 8, 2048, 1024, 1536
    ag = jnp.asarray(rng.standard_normal((cap, kg)) * 0.2, jnp.float8_e4m3fn)
    wg = jnp.asarray(rng.standard_normal((e, kg, ng)) * 0.2, jnp.float8_e4m3fn)
    sag = jnp.asarray(rng.random((cap, kg // 128)) + 0.5, jnp.float32)
    sbg = jnp.asarray(rng.random((e, kg // 128, ng // 128)) + 0.5, jnp.float32)
    eids = jnp.asarray(rng.integers(0, e, (cap // 128,)), jnp.int32)

    def grp_chain(carry, wg=wg, sag=sag, sbg=sbg, eids=eids):
        o = fp8_blockwise_scaled_grouped_mm(
            carry.astype(jnp.float8_e4m3fn), wg, sag, sbg, eids, out_dtype=jnp.bfloat16)
        return carry + (o[:, :kg] * 0 + 1e-6).astype(carry.dtype)

    sec = bench_chain(grp_chain, ag.astype(jnp.bfloat16), reps=16)
    records.append(report(f"fp8_blockwise_grouped_mm:{cap}-{e}-{ng}-{kg}", sec,
                          gbs=round((cap * kg + e * kg * ng) / sec / 1e9, 1)))

    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
