#!/usr/bin/env python
"""Micro-split of the MoE glue at the V2-Lite decode geometry: align vs
scatter vs combine (launch-bound? sort-bound?)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, report
from sgl_kernel_tpu.ops import moe
from sgl_kernel_tpu.ops.moe.align import (
    apply_shuffle_mul_sum, moe_align_block_size, scatter_tokens_to_experts)

T, E, TOPK, H, BM, L = 16, 64, 6, 2048, 16, 26


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    tw, tids = moe.topk_softmax(g, TOPK, renormalize=True)
    al0 = moe_align_block_size(tids, tw, E, BM)
    cap = al0.sorted_pair_ids.shape[0]
    xs0 = jnp.asarray(rng.standard_normal((cap, H)) * 0.1, jnp.bfloat16)

    def loop(body):
        def step(c):
            return jax.lax.fori_loop(0, L, body, c)
        return step

    def align_body(i, c):
        al = moe_align_block_size(tids, tw, E, BM)
        return c.at[0, 0].add(al.pair_weight[0].astype(c.dtype) * 1e-6)

    sec = bench_chain(loop(align_body), x, reps=8) / L
    report("ablate_glue2:align_only", sec)

    def scatter_body(i, c):
        xs = scatter_tokens_to_experts(c, al0)
        return c.at[:, 0].add(xs[:T, 0] * jnp.bfloat16(1e-6))

    sec = bench_chain(loop(scatter_body), x, reps=8) / L
    report("ablate_glue2:scatter_only", sec)

    def combine_body(i, c):
        o = apply_shuffle_mul_sum(c, al0, T)
        return c.at[:T, :].add(o * jnp.bfloat16(1e-6))

    sec = bench_chain(loop(combine_body), xs0, reps=8) / L
    report("ablate_glue2:combine_only", sec)

    def topk_body(i, c):
        tw2, tids2 = moe.topk_softmax(c[:, :E].astype(jnp.float32), TOPK, renormalize=True)
        return c.at[:, 0].add(tw2[:, 0].astype(c.dtype) * jnp.bfloat16(1e-6))

    sec = bench_chain(loop(topk_body), x, reps=8) / L
    report("ablate_glue2:topk_only", sec)


if __name__ == "__main__":
    main()
