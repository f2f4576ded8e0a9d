#!/usr/bin/env python
"""End-to-end DeepSeek MLA decode tokens/s on one chip — the BASELINE.json
flagship config family ("DeepSeek-V3 MLA decode with FP8 KV-cache +
fused_experts_w4a16 MoE"), at DeepSeek-V2-Lite scale so the W4A16 weights
(+ fp8 latent pool) fit a single v5e's 16 GB HBM.

Weights are one layer quantized then tiled across layers/experts
(distinct HBM buffers — bench.py's honest-bandwidth recipe; creating the
full random bank first would need ~40 GB f32). Timing is the differenced
traced-rep-count chain (docs/PERF.md)."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report
from sgl_kernel_tpu.models import deepseek
from sgl_kernel_tpu.ops.attention.mla import D_CKV, D_LATENT, D_ROPE
from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4

BATCH = 16
CTX = 1024
# MLA pools want BIG pages: the BlockSpec decode pipeline is per-step-
# overhead-bound and page=1024 measures 602-647 GB/s vs 206-262 at
# page=128 (benchmark/ab_mla_pages.py, 2026-08-20)
PAGE = 1024


def v2_lite_cfg(**kv_kw):
    return deepseek.DeepseekConfig(
        vocab_size=102400, hidden_size=2048, num_layers=27, num_heads=16,
        qk_nope_dim=128, v_head_dim=128, num_experts=64, num_experts_per_tok=6,
        moe_intermediate=1408, dense_intermediate=10944, num_dense_layers=1,
        routed_scaling_factor=1.0, max_position=4096, dtype=jnp.bfloat16,
        quant="w4a16", group_size=128,
        **(kv_kw or dict(kv_dtype=jnp.float8_e4m3fn)),
    )


def build_weights(cfg):
    key = jax.random.PRNGKey(0)
    h, l, e = cfg.hidden_size, cfg.num_layers, cfg.num_experts
    nh, dn, dv = cfg.num_heads, cfg.qk_nope_dim, cfg.v_head_dim
    ks = iter(jax.random.split(key, 24))

    def qlin(n, k, tile_l=True):
        w = jax.random.normal(next(ks), (n, k), jnp.bfloat16) * 0.02
        pk, sc, _ = quantize_w4(w, group_size=cfg.group_size)
        if tile_l:
            return {"packed": jnp.tile(pk[None], (l, 1, 1)), "scales": jnp.tile(sc[None], (l, 1, 1))}
        return {"packed": pk, "scales": sc}

    def qexp(k, n):
        # one expert quantized (x @ W convention: quantize W.T), tiled [L, E]
        w = jax.random.normal(next(ks), (n, k), jnp.bfloat16) * 0.02
        pk, sc, _ = quantize_w4(w, group_size=cfg.group_size)
        return {"packed": jnp.tile(pk[None, None], (l, e, 1, 1)),
                "scales": jnp.tile(sc[None, None], (l, e, 1, 1))}

    def bf(shape, key_scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.bfloat16) * key_scale

    layers = {
        "input_norm": jnp.ones((l, h), cfg.dtype),
        "post_norm": jnp.ones((l, h), cfg.dtype),
        "kv_norm": jnp.ones((l, D_LATENT), cfg.dtype),
        "wq": qlin(nh * (dn + D_ROPE), h),
        "wkv_a": qlin(D_LATENT + D_ROPE, h),
        "w_uk": jnp.tile(bf((nh, dn, D_LATENT))[None], (l, 1, 1, 1)),
        "w_uv": jnp.tile(bf((nh, D_LATENT, dv))[None], (l, 1, 1, 1)),
        "wo": qlin(h, nh * dv),
        "gate": qlin(cfg.dense_intermediate, h),
        "up": qlin(cfg.dense_intermediate, h),
        "down": qlin(h, cfg.dense_intermediate),
        "router": jnp.tile(bf((e, h))[None], (l, 1, 1)).astype(cfg.dtype),
        "router_bias": jnp.zeros((l, e), jnp.float32),
        "moe_w1": qexp(h, 2 * cfg.moe_intermediate),
        "moe_w2": qexp(cfg.moe_intermediate, h),
        "shared_gate": qlin(cfg.moe_intermediate, h),
        "shared_up": qlin(cfg.moe_intermediate, h),
        "shared_down": qlin(h, cfg.moe_intermediate),
    }
    vocab_pad = ((cfg.vocab_size + 2047) // 2048) * 2048
    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, h), jnp.bfloat16) * 0.02,
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": qlin(vocab_pad, h, tile_l=False),
        "layers": layers,
    }


def run_one(records, tag, **kv_kw):
    cfg = v2_lite_cfg(**kv_kw)
    params = build_weights(cfg)
    num_pages = BATCH * (CTX // PAGE) + 1
    cache = deepseek.make_cache(cfg, num_pages, PAGE)
    rope = deepseek.build_rope_cache(cfg)

    tables = np.zeros((BATCH, CTX // PAGE), np.int32)
    pid = 1
    for b in range(BATCH):
        for j in range(CTX // PAGE):
            tables[b, j] = pid
            pid += 1
    lengths = jnp.full((BATCH,), CTX, jnp.int32)
    positions = jnp.full((BATCH,), CTX - 1, jnp.int32)
    slots = jnp.asarray(tables[:, -1] * PAGE + (CTX - 1) % PAGE, jnp.int32)
    tables = jnp.asarray(tables)

    # params ride as chain ARGS, not closure constants: the captured
    # weights (9.6 GB) embed in the shipped HLO and kill the relay
    # transport with a broken pipe (the fused_moe round-3 lesson — this
    # script was never fixed, which is why no deepseek_decode_e2e row
    # ever landed in baseline.json)
    def step(carry, params):
        tokens, cache = carry
        logits, cache = deepseek.decode_step(
            params, cfg, cache, tokens, positions, tables, lengths, slots, rope)
        return (jnp.argmax(logits, axis=-1).astype(jnp.int32), cache)

    sec = bench_chain(step, (jnp.zeros((BATCH,), jnp.int32), cache), reps=32,
                      args=(params,))
    tps = BATCH / sec

    # roofline: weight bytes + latent-pool reads per step. Expert banks
    # count only the EXPECTED ROUTED fraction — with uniform routing the
    # expected distinct experts per layer is E*(1-(1-topk/E)^B) (B=16,
    # topk=6, E=64 -> 50.7 of 64), and since round 5 the grouped kernel
    # genuinely streams only routed experts' tiles (num_valid clamp), so
    # a full-bank denominator overstates the floor (vs_roofline read 1.04
    # in the round-5 regen — the giveaway).
    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    e, topk = cfg.num_experts, cfg.num_experts_per_tok
    frac = 1.0 - (1.0 - topk / e) ** BATCH
    moe_bytes = nbytes(params["layers"]["moe_w1"]) + nbytes(params["layers"]["moe_w2"])
    wbytes = (nbytes(params["layers"]) - moe_bytes * (1.0 - frac)
              + nbytes(params["lm_head"]) + BATCH * cfg.hidden_size * 2)
    kv_bytes = cfg.num_layers * BATCH * CTX * D_CKV * cache.dtype.itemsize
    roof = BATCH / ((wbytes + kv_bytes) / 819e9)
    records.append(report(
        f"deepseek_decode_e2e:v2lite-w4a16-{tag}-{BATCH}-{CTX}", sec,
        tokens_per_s=round(tps, 1), vs_roofline=round(tps / roof, 4)))


def main():
    records = []
    run_one(records, "fp8kv")
    # int8 latent: ONE hardware upcast + folded kv_scale — the TPU-native
    # low-bit pool (docs/PERF.md round 3)
    run_one(records, "int8kv", kv_dtype=jnp.int8, kv_scale=1 / 16)
    # bf16 latent baseline (all latent dtypes ride the big-page pipeline)
    run_one(records, "bf16kv", kv_dtype=jnp.bfloat16)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError:
            if attempt == 4:
                raise
            time.sleep(120)
    main()
