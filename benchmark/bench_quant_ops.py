#!/usr/bin/env python
"""Quantization-op latency grid (reference analogs: bench_per_token_group_
quant_8bit.py, bench_per_token_quant_fp8.py, bench_fp4_quant.py,
bench_awq_dequant.py, bench_gguf.py)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops import quant

records = []
rng = np.random.default_rng(0)


def add(name, sec, **extra):
    records.append(report(name, sec, **extra))


def feed8(q, carry):
    return carry + q.astype(carry.dtype) * jnp.asarray(1e-6, carry.dtype)


def main():
    # per-token-group 8-bit quant grid
    for t, k in [(16, 4096), (1024, 4096), (1024, 7168)]:
        x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
        for dtype, tag in [(jnp.float8_e4m3fn, "fp8"), (jnp.int8, "int8")]:
            def step(c, dtype=dtype):
                q, s = quant.per_token_group_quant_8bit(c, group_size=128, dtype=dtype)
                return feed8(q.astype(jnp.bfloat16), c)

            sec = bench_chain(step, x, reps=64)
            add(f"per_token_group_quant_{tag}:{t}-{k}-128", sec,
                gbs=round(3 * t * k / sec / 1e9, 1))
    # ue8m0 variant
    x = jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16)

    def step_u(c):
        q, s = quant.per_token_group_quant_8bit(c, group_size=128, scale_ue8m0=True)
        return feed8(q.astype(jnp.bfloat16), c)

    sec = bench_chain(step_u, x, reps=64)
    add("per_token_group_quant_fp8_ue8m0:1024-4096-128", sec)

    # fused silu+mul quant (v2 path)
    x2 = jnp.asarray(rng.standard_normal((1024, 2 * 4096)), jnp.bfloat16)

    def step_f(c):
        q, s = quant.per_token_group_quant_8bit(c, group_size=128, fuse_silu_and_mul=True)
        return c.at[:, : q.shape[1]].add(q.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))

    sec = bench_chain(step_f, x2, reps=64)
    add("per_token_group_quant_fp8_silu_mul:1024-4096-128", sec)

    # per-token / per-tensor fp8
    for t in (16, 1024):
        x = jnp.asarray(rng.standard_normal((t, 4096)), jnp.bfloat16)

        def step_t(c):
            q, s = quant.per_token_quant_fp8(c)
            return feed8(q.astype(jnp.bfloat16), c)

        sec = bench_chain(step_t, x, reps=64)
        add(f"per_token_quant_fp8:{t}-4096", sec)
    x = jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16)

    def step_pt(c):
        q, s = quant.per_tensor_quant_fp8(c)
        return feed8(q.astype(jnp.bfloat16), c)

    sec = bench_chain(step_pt, x, reps=64)
    add("per_tensor_quant_fp8:1024-4096", sec)

    # NVFP4 quant
    from sgl_kernel_tpu.ops.gemm.fp4 import scaled_fp4_quant

    for t in (16, 1024):
        x = jnp.asarray(rng.standard_normal((t, 4096)), jnp.bfloat16)
        gs = jnp.float32(448.0 * 6.0 / 3.0)

        def step4(c):
            q, s = scaled_fp4_quant(c, gs)
            return c.at[:, : q.shape[1]].add(q.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))

        sec = bench_chain(step4, x, reps=64)
        add(f"scaled_fp4_quant:{t}-4096", sec)

    # mxfp4 dequant
    kq = jnp.asarray(rng.integers(0, 255, (4096, 2048)), jnp.uint8)
    ks = jnp.asarray(rng.integers(120, 130, (4096, 128)), jnp.uint8)  # K/32 groups

    def stepmx(c):
        from sgl_kernel_tpu.ops.quant import mxfp4_dequantize
        w = mxfp4_dequantize(kq, ks)
        return c + w[0, :4096].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

    sec = bench_chain(stepmx, jnp.zeros((4096,), jnp.bfloat16), reps=16)
    add("mxfp4_dequantize:4096-4096", sec, gbs=round(4096 * 2048 / sec / 1e9, 1))

    # AWQ dequant
    qw = jnp.asarray(rng.integers(0, 2**31, (4096, 512)), jnp.int32)
    sc = jnp.asarray(rng.random((32, 4096)).astype(np.float16))
    qz = jnp.asarray(rng.integers(0, 2**31, (32, 512)), jnp.int32)

    def stepawq(c):
        w = quant.awq_dequantize(qw, sc, qz)
        return c + w[:4096, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

    sec = bench_chain(stepawq, jnp.zeros((4096,), jnp.bfloat16), reps=16)
    add("awq_dequantize:4096-4096", sec)

    # GGUF matmul (Q4_K = type 12, Q8_0 = type 8)
    from sgl_kernel_tpu.ops.quant.gguf import ggml_mul_mat_a8

    n, k = 4096, 4096
    for qt, blksz, name in [(8, 34, "q8_0"), (12, 144, "q4_k")]:
        nblocks = k // (32 if qt == 8 else 256)
        qweight = jnp.asarray(rng.integers(0, 255, (n, nblocks * blksz)), jnp.uint8)
        x = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)

        def stepg(c, qweight=qweight, qt=qt):
            o = ggml_mul_mat_a8(qweight, c, qt, n)
            return c + o[:, :k].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

        try:
            sec = bench_chain(stepg, x, reps=8)
            add(f"gguf_mul_mat_{name}:16-{n}-{k}", sec)
        except Exception as e:
            print(f"SKIP gguf {name}: {str(e)[:120]}", flush=True)

    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
