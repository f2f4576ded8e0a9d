#!/usr/bin/env python
"""On-chip sweep: the round-5 grouped W4A16 MoE GEMM retune (VERDICT r4 #1).

Times w4a16_grouped_mm directly at the production MoE geometries across
gmodes and tile overrides, reporting effective expert-bank GB/s (the
routed experts' packed+scale bytes over the measured step). Banks are
hundreds of MB (E x per-expert weights), far beyond any cache, so a single
bank is residency-honest (the docs/PERF.md round-2 trap only bites
single-weight chains of ~MB scale).

Run under flock /tmp/tpu.lock — concurrent TPU runs corrupt both.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, report
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4
from sgl_kernel_tpu.ops.moe.grouped_gemm import pick_group_tiles, w4a16_grouped_mm

# (tag, E, N, K, bm, n_blocks): decode-shaped grouped GEMMs. n_blocks =
# number of row blocks (distinct experts at decode: B*topk routed pairs
# over <= min(B*topk, E) experts, each padded to one bm block).
SHAPES = [
    # V2-Lite (the e2e bench geometry): B=16, topk 6 -> ~54 distinct experts
    ("v2lite_gate_up", 64, 2816, 2048, 16, 54),
    ("v2lite_down", 64, 2048, 1408, 16, 54),
    # DSv3 routed-expert geometry: 256 experts, B=16 topk 8 -> ~99 distinct
    ("dsv3_gate_up", 256, 4096, 7168, 16, 99),
    ("dsv3_down", 256, 7168, 2048, 16, 99),
    # gpt-oss-class (the fused_moe:128-64-8-3584-1280 row): t=128 topk=8,
    # 64 experts all hit, bm=64 -> 16 rows/expert -> 64 blocks
    ("gptoss_gate_up", 64, 2560, 3584, 64, 64),
    ("gptoss_down", 64, 3584, 1280, 64, 64),
]


def build_bank(rng, e, n, k):
    w = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16) * 0.02
    pk, sc, _ = quantize_w4(w, group_size=128)
    return jnp.tile(pk[None], (e, 1, 1)), jnp.tile(sc[None], (e, 1, 1))


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    rng = np.random.default_rng(0)
    records = []
    for tag, e, n, k, bm, n_blocks in SHAPES:
        if only and only not in tag:
            continue
        packed, scales = build_bank(rng, e, n, k)
        cap = n_blocks * bm
        # distinct experts per block (decode routing: one block per expert)
        eids = jnp.asarray(rng.permutation(e)[:n_blocks] if n_blocks <= e
                           else rng.integers(0, e, n_blocks), jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        n_routed = len(np.unique(np.asarray(eids)))
        bank_bytes = n_routed * (k // 2 * n + (k // 128) * n * 2)
        abn, abk = pick_group_tiles(n, k, 128, bm)
        variants = [("auto_inner", None, None, "inner"),
                    ("auto_inner2", None, None, "inner2"),
                    ("auto_inner4", None, None, "inner4"),
                    ("auto_loop", None, None, "loop"),
                    # round-4 shipped class: small dividing bn + whole-tile
                    ("r4_bn256loop", 256 if n % 256 == 0 else None, None, "loop")]
        for vtag, bn, bk, gmode in variants:
            if vtag.startswith("r4") and bn is None:
                continue
            try:
                # the CARRY is the activation: o depends on the previous
                # step's output, so XLA cannot hoist the loop-invariant
                # GEMM out of the rep loop (first sweep run measured 2us
                # "steps" — the whole chain had been LICM'd to one call)
                def step(carry, packed, scales, bn=bn, bk=bk, gmode=gmode):
                    o = w4a16_grouped_mm(carry, packed, scales, eids, group_size=128,
                                         bm=bm, bn=bn, bk=bk, gmode=gmode)
                    return carry + o[:, :1] * jnp.bfloat16(1e-6)

                sec = bench_chain(step, x, reps=64, args=(packed, scales),
                                  bytes_per_step=bank_bytes)
                records.append(report(
                    f"sweep_grouped:{tag}-{vtag}", sec,
                    bank_gbs=round(bank_bytes / sec / 1e9, 1),
                    tiles=f"{bn or abn}x{bk or abk}"))
            except Exception as ex:  # noqa: BLE001
                print(f"# {tag}-{vtag} failed: {type(ex).__name__}: {str(ex)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
