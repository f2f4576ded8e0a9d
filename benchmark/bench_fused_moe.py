#!/usr/bin/env python
"""Fused MoE latency (reference analog: bench_fused_moe.py; baseline key
schema fused_moe:{tokens}-{experts}-{topk}-{hidden}-{inter}-{dtype})."""

import sys

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
]


def main():
    rng = np.random.default_rng(0)
    records = []
    for t, e, k, h, inter, fmt in CONFIGS:
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(g, k, renormalize=True)
        if fmt == "bf16":
            w1 = jax.random.normal(key, (e, h, 2 * inter), jnp.bfloat16) * 0.02
            w2 = jax.random.normal(key, (e, inter, h), jnp.bfloat16) * 0.02
            weights = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
        else:
            w1f = jax.random.normal(key, (e, 2 * inter, h), jnp.bfloat16) * 0.02
            w2f = jax.random.normal(key, (e, h, inter), jnp.bfloat16) * 0.02
            p1, s1 = jax.vmap(lambda w: quantize_w4(w, group_size=128)[:2])(w1f)
            p2, s2 = jax.vmap(lambda w: quantize_w4(w, group_size=128)[:2])(w2f)
            weights = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2, fmt="int4", group_size=128)

        # expert banks ride as chain ARGS: GB-scale closure constants embed
        # in the shipped HLO and kill the relay transport (broken pipe).
        # Only the ARRAY leaves may ride args — MoeWeights.fmt is a str and
        # jit rejects it (round-4 regen TypeError); rebuild inside the step.
        if fmt == "bf16":
            def step(carry, w1, w2, tw=tw, tids=tids):
                ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
                o = moe.fused_experts(carry, ws, tw, tids, block_size=64)
                return carry + o * jnp.bfloat16(1e-8)

            args = (weights.w1, weights.w2)
        else:
            def step(carry, p1, p2, s1, s2, tw=tw, tids=tids):
                ws = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2,
                                    fmt="int4", group_size=128)
                o = moe.fused_experts(carry, ws, tw, tids, block_size=64)
                return carry + o * jnp.bfloat16(1e-8)

            args = (weights.w1, weights.w2, weights.w1_scales, weights.w2_scales)
        sec = bench_chain(step, x, reps=16, args=args)
        records.append(report(f"fused_moe:{t}-{e}-{k}-{h}-{inter}-{fmt}", sec))
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
