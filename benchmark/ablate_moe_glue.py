#!/usr/bin/env python
"""Ablate the fused_experts step at the V2-Lite e2e decode geometry
(t=16, topk=6, E=64, block=16, stacked L layers): where do the ms go
between the grouped GEMMs (~750 GB/s after the round-5 retune) and the
full MoE layer? Components: routing (biased_topk), align+scatter+combine
glue, activation, the two GEMMs."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, report
from sgl_kernel_tpu.ops import moe
from sgl_kernel_tpu.ops.activation import silu_and_mul
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4
from sgl_kernel_tpu.ops.moe.align import (
    apply_shuffle_mul_sum, moe_align_block_size, scatter_tokens_to_experts)
from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

T, E, TOPK, H, I, BM, L = 16, 64, 6, 2048, 1408, 16, 26


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    tw, tids = moe.topk_softmax(g, TOPK, renormalize=True)

    def qbank(n, k):
        w = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16) * 0.02
        pk, sc, _ = quantize_w4(w, group_size=128)
        return (jnp.tile(pk[None, None], (L, E, 1, 1)),
                jnp.tile(sc[None, None], (L, E, 1, 1)))
    p1, s1 = qbank(2 * I, H)
    p2, s2 = qbank(H, I)
    bank_l = E * (H // 2 * 2 * I + (H // 128) * 2 * I * 2 + I // 2 * H + (I // 128) * H * 2)

    # 1) full fused_experts, layer-stacked sweep (the in-model form)
    def full(c, p1, s1, p2, s2):
        def layer(lid, c):
            ws = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2,
                                fmt="int4", group_size=128)
            o = moe.fused_experts(c, ws, tw, tids, layer_id=lid, block_size=BM)
            return c + o * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    sec = bench_chain(full, x, reps=8, args=(p1, s1, p2, s2),
                      bytes_per_step=bank_l * L) / L
    report("ablate_moe:full_layer", sec, bank_gbs=round(bank_l / sec / 1e9, 1))

    # 2) the two grouped GEMMs + activation only (pre-aligned x)
    align = moe_align_block_size(tids, tw, E, BM)
    xs = scatter_tokens_to_experts(x, align)
    eids = align.block_expert_ids

    def gemms(c, p1, s1, p2, s2):
        def layer(lid, c):
            inter = w4a16_grouped_mm(c, p1, s1, eids, layer_id=lid,
                                     group_size=128, bm=BM)
            a = silu_and_mul(inter)
            o = w4a16_grouped_mm(a.astype(c.dtype), p2, s2, eids, layer_id=lid,
                                 group_size=128, bm=BM)
            return c + o[:, :H] * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    sec = bench_chain(gemms, xs, reps=8, args=(p1, s1, p2, s2),
                      bytes_per_step=bank_l * L) / L
    report("ablate_moe:gemms_only", sec, bank_gbs=round(bank_l / sec / 1e9, 1))

    # 3) align + scatter + combine only (identity "experts")
    def glue(c):
        def layer(lid, c):
            al = moe_align_block_size(tids, tw, E, BM)
            xs2 = scatter_tokens_to_experts(c, al)
            o = apply_shuffle_mul_sum(xs2, al, T)
            return c + o * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, L, layer, c)

    sec = bench_chain(glue, x, reps=8) / L
    report("ablate_moe:glue_only", sec)

    # 4) routing only
    def route(c):
        def layer(lid, c):
            tw2, tids2 = moe.topk_softmax(c[:, :E].astype(jnp.float32), TOPK,
                                          renormalize=True)
            return c.at[:, 0].add(tw2[:, 0].astype(c.dtype) * jnp.bfloat16(1e-6))
        return jax.lax.fori_loop(0, L, layer, c)

    sec = bench_chain(route, x, reps=8) / L
    report("ablate_moe:routing_only", sec)


if __name__ == "__main__":
    main()
