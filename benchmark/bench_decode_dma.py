#!/usr/bin/env python
"""A/B bench: BlockSpec-pipelined decode vs manual-DMA decode kernels.

Run one config per invocation (remote compiles are slow and serialized):
    python benchmark/bench_decode_dma.py old16 head16c4 ...
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, report
from sgl_kernel_tpu.ops.attention import paged_attention_decode
from sgl_kernel_tpu.ops.attention.paged_decode_dma import paged_attention_decode_dma

PAGE = 64


def run(name, b, ctx, hq, hkv, d, kernel, records, reps=512, kv_dtype=jnp.bfloat16, **kw):
    rng = np.random.default_rng(0)
    blocks = ctx // PAGE
    n_pages = b * blocks + 1
    layout = kw.get("layout", "head")
    shape = (1, hkv, n_pages, PAGE, d) if layout == "head" else (1, n_pages, hkv, PAGE, d)
    kp = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16).astype(kv_dtype)
    vp = jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16).astype(kv_dtype)
    if kv_dtype != jnp.bfloat16:
        kw.setdefault("k_scale", 1.0)
        kw.setdefault("v_scale", 1.0)
    lengths = jnp.full((b,), ctx, jnp.int32)
    table = jnp.asarray(rng.permutation(np.arange(1, n_pages)).reshape(b, blocks), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    def step(carry):
        o = kernel(carry, kp, vp, lengths, table, **kw)
        return carry + o * jnp.bfloat16(1e-8)

    sec = bench_chain(step, q, reps=reps)
    kv_gb = 2 * b * ctx * hkv * d * jnp.dtype(kv_dtype).itemsize / 1e9
    records.append(report(f"paged_dma_variant:{name}", sec, kv_gbs=round(kv_gb / sec, 1)))


CONFIGS = {
    # headline shape: B=16, ctx=1024 (Llama-3-8B heads)
    "old16": lambda r: run("old16", 16, 1024, 32, 8, 128, paged_attention_decode, r),
    "head16c4": lambda r: run("head16c4", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=4, layout="head"),
    "head16c8": lambda r: run("head16c8", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, layout="head"),
    "page16c4": lambda r: run("page16c4", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=4, layout="page"),
    "page16c8": lambda r: run("page16c8", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, layout="page"),
    "page16c16": lambda r: run("page16c16", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=16, layout="page"),
    "head16c16": lambda r: run("head16c16", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=16, layout="head"),
    # fp8 KV pages: half the DMA bytes (the fp8-KV win case)
    "fp8page16c8": lambda r: run("fp8page16c8", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, layout="page", kv_dtype=jnp.float8_e4m3fn),
    "fp8page16c16": lambda r: run("fp8page16c16", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=16, layout="page", kv_dtype=jnp.float8_e4m3fn),
    "fp8old16": lambda r: run("fp8old16", 16, 1024, 32, 8, 128, paged_attention_decode, r, kv_dtype=jnp.float8_e4m3fn),
    # e5m2: pure-shift upcast (no mask/rebias) — cheaper VPU chain than e4m3
    "e5m2page16c16": lambda r: run("e5m2page16c16", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=16, layout="page", kv_dtype=jnp.float8_e5m2),
    # int8 KV: upcast is ONE hardware convert; scales fold into sm_scale/output
    "int8page16c16": lambda r: run("int8page16c16", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=16, layout="page", kv_dtype=jnp.int8),
    "int8page16c8": lambda r: run("int8page16c8", 16, 1024, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, layout="page", kv_dtype=jnp.int8),
    # long-context small-batch (split-KV territory)
    "old1x8k": lambda r: run("old1x8k", 1, 8192, 32, 8, 128, paged_attention_decode, r),
    "head1x8k": lambda r: run("head1x8k", 1, 8192, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8),
    "head1x8ks4": lambda r: run("head1x8ks4", 1, 8192, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, num_splits=4),
    "page1x8k": lambda r: run("page1x8k", 1, 8192, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, layout="page"),
    "page1x8ks4": lambda r: run("page1x8ks4", 1, 8192, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, num_splits=4, layout="page"),
    "page1x8ks8": lambda r: run("page1x8ks8", 1, 8192, 32, 8, 128, paged_attention_decode_dma, r, chunk_pages=8, num_splits=8, layout="page"),
}


DEFAULT = ["head16c4", "head16c8", "page16c4", "page16c8", "page16c16"]


def main():
    records = []
    names = sys.argv[1:] or [n for n in DEFAULT if n in CONFIGS]
    for name in names:
        CONFIGS[name](records)
    from benchmark.bench_lib import compare_to_baseline, load_baseline
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
