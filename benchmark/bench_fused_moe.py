#!/usr/bin/env python
"""Fused MoE latency (reference analog: bench_fused_moe.py; baseline key
schema fused_moe:{tokens}-{experts}-{topk}-{hidden}-{inter}-{dtype}).

Round-5 fixes (VERDICT r4 #4): quantized banks build from ONE quantized
template expert tiled E times (the round-4 form materialized the full
bf16 original first — 14.7 GB for the DSv3 256-expert config — and OOM'd,
silently dropping the flagship rows), every config failure prints a LOUD
error record instead of dying, and the physics guard bounds each row by
the routed-expert weight bytes."""

import sys
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.ops import moe
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4

CONFIGS = [
    # tokens, experts, topk, hidden, inter, fmt
    (1, 64, 8, 3584, 1280, "bf16"),
    (128, 64, 8, 3584, 1280, "bf16"),
    (128, 8, 2, 4096, 7168, "bf16"),
    (128, 64, 8, 3584, 1280, "int4"),
    # Mixtral-8x7B decode/prefill shapes (reference fused_moe grid rows)
    (1, 8, 2, 4096, 14336, "bf16"),
    (16, 8, 2, 4096, 14336, "int4"),
    # DSv3 routed-expert shape (256 experts, moe_inter 2048)
    (16, 256, 8, 7168, 2048, "int4"),
    # quantized prefill bucket
    (1024, 64, 8, 3584, 1280, "int4"),
    # mxfp4 (the unified W4A16 kernel's second format — gpt-oss class)
    (1, 64, 8, 3584, 1280, "mxfp4"),
    (128, 64, 8, 3584, 1280, "mxfp4"),
    # per-expert bias variant (reference key ...-True-silu: 1-64-8-3584-
    # 1280-bf16-True-silu = 0.358 ms on the Arc B580)
    (1, 64, 8, 3584, 1280, "bf16-bias"),
]


def build_weights(rng, e, h, inter, fmt):
    """Expert banks. int4: ONE template expert quantized, tiled E times —
    distinct HBM buffers after the tile, no full-size bf16 original."""
    key = jax.random.PRNGKey(0)
    if fmt.startswith("bf16"):
        w1 = jax.random.normal(key, (e, h, 2 * inter), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(key, (e, inter, h), jnp.bfloat16) * 0.02
        bias = {}
        if fmt == "bf16-bias":
            bias = dict(b1=jax.random.normal(key, (e, 2 * inter), jnp.float32) * 0.01,
                        b2=jax.random.normal(key, (e, h), jnp.float32) * 0.01)
        return moe.MoeWeights(w1=w1, w2=w2, fmt="bf16", **bias)
    k1, k2 = jax.random.split(key)
    w1f = jax.random.normal(k1, (2 * inter, h), jnp.bfloat16) * 0.02
    w2f = jax.random.normal(k2, (h, inter), jnp.bfloat16) * 0.02
    if fmt == "mxfp4":
        from sgl_kernel_tpu.ops.gemm.w4a16 import mxfp4_to_tpu_layout
        from sgl_kernel_tpu.ops.quant import per_token_group_quant_fp4

        q1, sc1 = per_token_group_quant_fp4(w1f.astype(jnp.float32))
        q2, sc2 = per_token_group_quant_fp4(w2f.astype(jnp.float32))
        p1, s1 = mxfp4_to_tpu_layout(q1, sc1)
        p2, s2 = mxfp4_to_tpu_layout(q2, sc2)
        g = 32
    else:
        p1, s1, _ = quantize_w4(w1f, group_size=128)
        p2, s2, _ = quantize_w4(w2f, group_size=128)
        g = 128
    return moe.MoeWeights(
        w1=jnp.tile(p1[None], (e, 1, 1)), w2=jnp.tile(p2[None], (e, 1, 1)),
        w1_scales=jnp.tile(s1[None], (e, 1, 1)),
        w2_scales=jnp.tile(s2[None], (e, 1, 1)),
        fmt=fmt, group_size=g)


def bank_bytes(weights):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(weights._asdict())
               if hasattr(x, "size"))


def run_config(records, rng, t, e, k, h, inter, fmt):
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    tw, tids = moe.topk_softmax(g, k, renormalize=True)
    weights = build_weights(rng, e, h, inter, fmt)
    n_routed = len(np.unique(np.asarray(tids)))
    routed_bytes = bank_bytes(weights) * n_routed // e

    # expert banks ride as chain ARGS: GB-scale closure constants embed
    # in the shipped HLO and kill the relay transport (broken pipe).
    # Only the ARRAY leaves may ride args — MoeWeights.fmt is a str and
    # jit rejects it (round-4 regen TypeError); rebuild inside the step.
    # serving block-size policy: mean rows/expert (ops/moe/align.
    # pick_block_size — what fused_experts defaults to and the models run)
    bs = moe.pick_block_size(t, k, e)
    if fmt.startswith("bf16"):
        bias_kw = {} if weights.b1 is None else dict(b1=weights.b1, b2=weights.b2)

        def step(carry, w1, w2, tw=tw, tids=tids, bias_kw=bias_kw):
            ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16", **bias_kw)
            o = moe.fused_experts(carry, ws, tw, tids, block_size=bs)
            return carry + o * jnp.bfloat16(1e-8)

        args = (weights.w1, weights.w2)
    else:
        def step(carry, p1, p2, s1, s2, tw=tw, tids=tids, fmt=fmt,
                 g=weights.group_size):
            ws = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2,
                                fmt=fmt, group_size=g)
            o = moe.fused_experts(carry, ws, tw, tids, block_size=bs)
            return carry + o * jnp.bfloat16(1e-8)

        args = (weights.w1, weights.w2, weights.w1_scales, weights.w2_scales)
    sec = bench_chain(step, x, reps=16, args=args, bytes_per_step=routed_bytes)
    records.append(report(
        f"fused_moe:{t}-{e}-{k}-{h}-{inter}-{fmt}", sec,
        bank_gbs=round(routed_bytes / sec / 1e9, 1)))


def main():
    rng = np.random.default_rng(0)
    records = []
    for cfg in CONFIGS:
        try:
            run_config(records, rng, *cfg)
        except Exception as e:  # noqa: BLE001 — LOUD skip, never silent
            print(f'{{"name": "fused_moe:{"-".join(map(str, cfg))}", '
                  f'"error": "{type(e).__name__}: {str(e)[:200]}"}}', flush=True)
            traceback.print_exc(file=sys.stderr)
    if len(records) < len(CONFIGS):
        print(f"# WARNING: only {len(records)}/{len(CONFIGS)} fused_moe configs landed",
              flush=True)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
