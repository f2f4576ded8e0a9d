"""Mixtral-family model: the Llama decoder with a routed MoE MLP.

Reuses every Llama building block (models/llama.py: paged GQA attention,
fused decode RoPE, layer-stacked weights with scalar-prefetched
layer_id) and swaps the SwiGLU MLP for topk-softmax routing +
fused_experts (ops/moe — the reference's moe.py:403-867 orchestration).
Serving-side model for the reference's MoE kernel stack (grouped GEMMs,
MoEAlign, TopKSoftMax).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.moe import MoeWeights, fused_experts, topk_softmax
from ..ops.norm import rmsnorm
from ..ops.rope import rope_decode_fused, rotary_embedding
from ..ops.attention import flash_attention
from ..ops.attention.paged_decode_dma import paged_attention_decode_dma
from ..ops.kvcache import store_cache_all_layers, store_cache_stacked
from . import llama


@dataclasses.dataclass(frozen=True)
class MixtralConfig(llama.LlamaConfig):
    num_experts: int = 8
    top_k: int = 2

    @staticmethod
    def mixtral_8x7b(**kw):
        return MixtralConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
            rope_theta=1e6, num_experts=8, top_k=2, **kw
        )

    @staticmethod
    def tiny(**kw):
        return MixtralConfig(
            vocab_size=256, hidden_size=128, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256, dtype=jnp.float32, num_experts=4, top_k=2, **kw
        )


def init_weights(cfg: MixtralConfig, key) -> Dict[str, Any]:
    """quant="w4a16" packs the attention linears (llama helpers), the
    lm_head AND the per-expert MoE matrices into the K-paired int4 layout
    (ops/moe grouped kernel; reference: the W4A16 fused-MoE CI benches,
    bench_fused_experts_w4a16.py)."""
    assert not cfg.fused, "Mixtral paths emit separate q/k/v (fused=True unsupported)"
    params = llama.init_weights(
        dataclasses.replace(cfg, quant=None), key
    )
    lw = params["layers"]
    for name in ("gate", "up", "down"):
        lw.pop(name)
    l, h, i, e = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    ks = jax.random.split(jax.random.fold_in(key, 99), 3)
    scale = 1.0 / (h ** 0.5)
    lw["router"] = (jax.random.normal(ks[0], (l, e, h), jnp.float32) * scale).astype(cfg.dtype)
    moe_w1 = (jax.random.normal(ks[1], (l, e, h, 2 * i), jnp.float32) * scale).astype(cfg.dtype)
    moe_w2 = (jax.random.normal(ks[2], (l, e, i, h), jnp.float32) * (1.0 / i ** 0.5)).astype(cfg.dtype)
    if cfg.quant == "w4a16":
        from ..ops.gemm.w4a16 import quantize_w4

        # grouped-kernel weight layout wants [N, K] logical input per
        # expert: moe_w1 is [H, 2I] per expert -> quantize its transpose
        def qexp(w_le):  # [L, E, K, N] -> packed [L, E, K//2, N], scales
            q = jax.vmap(jax.vmap(lambda m: quantize_w4(m.T, group_size=cfg.group_size)[:2]))
            return q(w_le)
        w1p, w1s = qexp(moe_w1)
        w2p, w2s = qexp(moe_w2)
        lw["moe_w1"] = {"packed": w1p, "scales": w1s}
        lw["moe_w2"] = {"packed": w2p, "scales": w2s}

        def qz(wm):  # attention linears, llama layout
            pk, sc = jax.vmap(lambda m: quantize_w4(m, group_size=cfg.group_size)[:2])(wm)
            return {"packed": pk, "scales": sc}

        for name in ("q", "k", "v", "o"):
            lw[name] = qz(lw[name])
        params["lm_head"] = llama._quantize_matrix(params["lm_head"], cfg)
    elif cfg.quant == "mxfp4":
        # the gpt-oss checkpoint format: MoE expert banks in MXFP4
        # (E2M1 codes + UE8M0 group-32 scales), attention linears and
        # lm_head in bf16 (reference: the unified W4A16 grouped kernel's
        # mxfp4 mode, GroupGemmW4A16Xe20.cpp + mxfp4_utils.py)
        from ..ops.gemm.w4a16 import mxfp4_to_tpu_layout
        from ..ops.quant import per_token_group_quant_fp4

        def qexp4(w_le):  # [L, E, K, N] -> packed [L, E, K//2, N], bf16 scales
            def one(m):
                q, s = per_token_group_quant_fp4(m.T.astype(jnp.float32))
                return mxfp4_to_tpu_layout(q, s)
            return jax.vmap(jax.vmap(one))(w_le)

        w1p, w1s = qexp4(moe_w1)
        w2p, w2s = qexp4(moe_w2)
        lw["moe_w1"] = {"packed": w1p, "scales": w1s}
        lw["moe_w2"] = {"packed": w2p, "scales": w2s}
    else:
        lw["moe_w1"] = moe_w1
        lw["moe_w2"] = moe_w2
    return params


def moe_weights_for(lw, cfg) -> MoeWeights:
    """MoeWeights view over the (possibly quantized) stacked expert banks;
    fmt/group_size derive from cfg.quant (static), so the same call site
    serves bf16, int4 and mxfp4 checkpoints."""
    w1, w2 = lw["moe_w1"], lw["moe_w2"]
    b1, b2 = lw.get("moe_b1"), lw.get("moe_b2")  # gpt-oss expert biases
    if isinstance(w1, dict):
        fmt = "mxfp4" if cfg.quant == "mxfp4" else "int4"
        g = 32 if fmt == "mxfp4" else cfg.group_size
        return MoeWeights(w1=w1["packed"], w2=w2["packed"],
                          w1_scales=w1["scales"], w2_scales=w2["scales"],
                          b1=b1, b2=b2, fmt=fmt, group_size=g)
    return MoeWeights(w1=w1, w2=w2, b1=b1, b2=b2, fmt="bf16")


def _moe_mlp(h2, lw, lidx, cfg: MixtralConfig):
    logits = jnp.dot(h2.astype(jnp.float32), lw["router"][lidx].astype(jnp.float32).T)
    if "router_bias" in lw:
        logits = logits + lw["router_bias"][lidx].astype(jnp.float32)
    tw, tids = topk_softmax(logits, cfg.top_k, renormalize=True)
    # quantized or bf16, the STACKED banks go to the kernel whole; the
    # layer is scalar-prefetched (slicing [lidx] here would copy the
    # entire expert bank out of HBM every scan step — docs/PERF.md trap)
    w = moe_weights_for(lw, cfg)
    return fused_experts(h2, w, tw, tids, layer_id=lidx).astype(cfg.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def decode_step(params, cfg: MixtralConfig, k_cache, v_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
    b = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = llama._qkv(h, lw, cfg, b, layer_id=lidx)
        q, k = rope_decode_fused(positions, q, k, rope_cache)
        attn = paged_attention_decode_dma(
            q, kc, vc, lengths, page_tables, layer_id=lidx, fresh_k=k, fresh_v=v
        )
        x = llama._linear(attn.reshape(b, -1), lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        x = x + _moe_mlp(h2, lw, lidx, cfg)
        return (x, kc, vc), (k, v)

    (x, k_cache, v_cache), (k_all, v_all) = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    k_cache, v_cache = store_cache_all_layers(k_all, v_all, k_cache, v_cache, slot_loc)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = llama._linear(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def prefill(params, cfg: MixtralConfig, k_cache, v_cache, tokens, positions, q_lens, slot_loc, rope_cache):
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = llama._qkv(h, lw, cfg, b * s, layer_id=lidx)
        q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(k, v, kc, vc, slot_loc.reshape(-1), lidx)
        attn = flash_attention(
            q.reshape(b, s, cfg.num_heads, cfg.head_dim),
            k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
            q_lens, q_lens, causal=True,
        ).reshape(b * s, -1)
        x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        x = x + _moe_mlp(h2, lw, lidx, cfg)
        return (x, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


make_caches = llama.make_caches
build_rope_cache = llama.build_rope_cache


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max", "num_logits"), donate_argnums=(2, 3))
def prefill_extend(params, cfg: MixtralConfig, k_cache, v_cache, tokens,
                   positions, q_lens, kv_lens, page_tables, slot_loc,
                   rope_cache, *, prefix_max: int, num_logits: int = 1):
    """Chunked/extend prefill for the MoE family: llama's two-pass
    merge_state design (models/llama.prefill_extend) with the routed-MoE
    MLP — unlocks radix prefix reuse and chunked prompts in the engine."""
    from ..ops.attention import merge_state

    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    prefix_lens = kv_lens - q_lens
    pos_idx = jnp.arange(prefix_max)
    page_sz = k_cache.shape[-2]
    pre_slots = (
        page_tables[:, pos_idx // page_sz] * page_sz + (pos_idx % page_sz)[None, :]
    )

    def gather_prefix(kc, lidx):
        pid = pre_slots // page_sz
        off = pre_slots % page_sz
        return kc[lidx, pid, :, off]  # [B, pre, H, D]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = llama._qkv(h, lw, cfg, b * s, layer_id=lidx)
        q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(k, v, kc, vc, slot_loc.reshape(-1), lidx)
        qb = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        kb = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        vb = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        o1, l1 = flash_attention(
            qb, kb, vb, q_lens, q_lens,
            q_start=prefix_lens, kv_start=prefix_lens,
            causal=True, return_lse=True,
        )
        kpre = gather_prefix(kc, lidx).astype(qb.dtype)
        vpre = gather_prefix(vc, lidx).astype(qb.dtype)
        o2, l2 = flash_attention(
            qb, kpre, vpre, q_lens, prefix_lens,
            q_start=prefix_lens, kv_start=jnp.zeros_like(prefix_lens),
            causal=True, return_lse=True,
        )
        om, _ = merge_state(
            o1.reshape(b * s, cfg.num_heads, cfg.head_dim),
            jnp.swapaxes(l1, 1, 2).reshape(b * s, cfg.num_heads),
            o2.reshape(b * s, cfg.num_heads, cfg.head_dim),
            jnp.swapaxes(l2, 1, 2).reshape(b * s, cfg.num_heads),
        )
        attn = om.reshape(b * s, -1).astype(cfg.dtype)
        x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        x = x + _moe_mlp(h2, lw, lidx, cfg)
        return (x, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    if num_logits == 1:
        last = jnp.clip(q_lens - 1, 0, s - 1)
        x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
        return logits, k_cache, v_cache
    # last num_logits positions per sequence (speculative verify)
    n = num_logits
    idx = jnp.clip(q_lens[:, None] - n + jnp.arange(n)[None, :], 0, s - 1)
    x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    logits = llama._linear(x_sel.reshape(b * n, -1), params["lm_head"], cfg).astype(jnp.float32)
    return logits[:, : cfg.vocab_size].reshape(b, n, -1), k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "max_kvb"), donate_argnums=(2, 3))
def prefill_packed(params, cfg: MixtralConfig, k_cache, v_cache, tokens,
                   positions, blk_seq, blk_q0, seq_meta, last_idx, slot_loc,
                   rope_cache, *, max_kvb: int):
    """Token-packed multi-prompt prefill for the MoE family
    (models/llama.prefill_packed with the routed-MoE MLP)."""
    from ..ops.attention import flash_attention_packed

    tp = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = llama._qkv(h, lw, cfg, tp, layer_id=lidx)
        q, k = rotary_embedding(positions, q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(k, v, kc, vc, slot_loc, lidx)
        attn = flash_attention_packed(
            q.reshape(tp, cfg.num_heads, cfg.head_dim),
            k.reshape(tp, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(tp, cfg.num_kv_heads, cfg.head_dim),
            blk_seq, blk_q0, seq_meta, max_kvb=max_kvb, causal=True,
        ).reshape(tp, -1)
        x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        x = x + _moe_mlp(h2, lw, lidx, cfg)
        return (x, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x_last = x[last_idx]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache
