#!/usr/bin/env python
"""Attention kernel latency grid (reference analog: bench_flash_attn.py
grid over batch/seq/heads, update_baseline_from_log.py:78-95 key schema)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops.attention import flash_attention, paged_attention_decode
from sgl_kernel_tpu.ops.attention.mla import mla_decode

PAGE = 128


def bench_decode(rng, b, ctx, hq, hkv, d, records):
    blocks = ctx // PAGE
    n_pages = b * blocks + 1
    kp = jnp.asarray(rng.standard_normal((hkv, n_pages, PAGE, d)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((hkv, n_pages, PAGE, d)), jnp.bfloat16)
    lengths = jnp.full((b,), ctx, jnp.int32)
    table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    def step(carry):
        o = paged_attention_decode(carry, kp, vp, lengths, table)
        return carry + o * jnp.bfloat16(1e-8)

    sec = bench_chain(step, q, reps=64)
    kv_gb = 2 * b * ctx * hkv * d * 2 / 1e9
    records.append(report(f"paged_decode:{b}-{ctx}-{hq}-{hkv}-{d}-{PAGE}", sec, kv_gbs=round(kv_gb / sec, 1)))


def bench_prefill(rng, b, s, hq, hkv, d, records):
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)

    def step(carry):
        o = flash_attention(carry, k, v, causal=True)
        return carry + o * jnp.bfloat16(1e-8)

    sec = bench_chain(step, q, reps=16)
    flops = 2 * b * hq * s * s * d  # causal ~ half; report raw
    records.append(report(f"flash_prefill:{b}-{s}-{hq}-{hkv}-{d}", sec, tflops=round(flops / sec / 1e12, 1)))


def bench_mla(rng, b, ctx, h, records):
    blocks = ctx // PAGE
    n_pages = b * blocks + 1
    pool = jnp.asarray(rng.standard_normal((n_pages, PAGE, 576)) * 0.3, jnp.bfloat16)
    lengths = jnp.full((b,), ctx, jnp.int32)
    table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
    qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)

    def step(carry):
        o = mla_decode(carry, qp, pool, lengths, table)
        return carry + o * jnp.bfloat16(1e-8)

    sec = bench_chain(step, qn, reps=32)
    kv_gb = b * ctx * 576 * 2 / 1e9
    records.append(report(f"mla_decode:{b}-{ctx}-{h}-{PAGE}", sec, kv_gbs=round(kv_gb / sec, 1)))


def main():
    rng = np.random.default_rng(0)
    records = []
    bench_decode(rng, 16, 1024, 32, 8, 128, records)
    bench_decode(rng, 8, 4096, 32, 8, 128, records)
    bench_prefill(rng, 1, 2048, 32, 8, 128, records)
    bench_mla(rng, 16, 1024, 16, records)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
