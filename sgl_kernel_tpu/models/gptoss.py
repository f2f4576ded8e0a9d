"""gpt-oss model family: MoE decoder with attention sinks, alternating
sliding-window layers, and the clamped-swiglu activation.

The reference carries gpt-oss-specific kernels (SwigluAlphaLimit.cpp —
swiglu with sigmoid alpha + limit clamp; FMHA attn-sinks support,
fmha_fusion.hpp; MoE grouped GEMM fused swiglu-gpt-oss activation,
moe_mainloop.hpp). This model composes them: the Mixtral skeleton with
``activation="swiglu_gpt_oss"`` in fused_experts, per-head sink logits in
both attention paths, and a sliding window on alternate layers
(gpt-oss's 128-token local layers).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from ..ops.attention.paged_decode_dma import paged_attention_decode_dma
from ..ops.kvcache import store_cache_all_layers, store_cache_stacked
from ..ops.moe import MoeWeights, fused_experts, topk_softmax
from ..ops.norm import rmsnorm
from ..ops.rope import rope_decode_fused, rotary_embedding
from . import llama, mixtral


@dataclasses.dataclass(frozen=True)
class GptOssConfig(mixtral.MixtralConfig):
    sliding_window: int = 128
    # even layers use the sliding window, odd layers are global
    swiglu_alpha: float = 1.702
    swiglu_limit: float = 7.0

    @staticmethod
    def tiny(**kw):
        return GptOssConfig(
            vocab_size=256, hidden_size=128, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256, dtype=jnp.float32, num_experts=4, top_k=2,
            sliding_window=16, **kw
        )


def init_weights(cfg: GptOssConfig, key) -> Dict[str, Any]:
    params = mixtral.init_weights(cfg, key)
    params["layers"]["sinks"] = jnp.zeros((cfg.num_layers, cfg.num_heads), cfg.dtype)
    return params


def _moe(h2, lw, lidx, cfg: GptOssConfig):
    logits = jnp.dot(h2.astype(jnp.float32), lw["router"][lidx].astype(jnp.float32).T)
    if "router_bias" in lw:
        logits = logits + lw["router_bias"][lidx].astype(jnp.float32)
    tw, tids = topk_softmax(logits, cfg.top_k, renormalize=True)
    # gpt-oss ships MXFP4 expert banks (quant="mxfp4"); bf16 otherwise
    w = mixtral.moe_weights_for(lw, cfg)
    return fused_experts(
        h2, w, tw, tids, layer_id=lidx, activation="swiglu_gpt_oss",
        gemm1_alpha=cfg.swiglu_alpha, gemm1_limit=cfg.swiglu_limit,
    ).astype(cfg.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def decode_step(params, cfg: GptOssConfig, k_cache, v_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
    b = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def make_layer(window):
        def layer_fn(carry, lidx):
            x, kc, vc = carry
            h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
            q, k, v = llama._qkv(h, lw, cfg, b, layer_id=lidx)
            q, k = rope_decode_fused(positions, q, k, rope_cache)
            attn = paged_attention_decode_dma(
                q, kc, vc, lengths, page_tables, layer_id=lidx,
                fresh_k=k, fresh_v=v, sinks=lw["sinks"][lidx],
                sliding_window=window,
            )
            x = llama._linear(attn.reshape(b, -1), lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = x + _moe(h2, lw, lidx, cfg)
            return (x, kc, vc), (k, v)
        return layer_fn

    # alternating window/global layers: sliding_window is a static kernel
    # arg, so run the stack as a scan over each parity's layer subset
    # interleaved via cond-free double scan (layers are independent in
    # window param only; order preserved by scanning all layers with the
    # window chosen per parity through lax.switch on two kernels)
    local_fn = make_layer(cfg.sliding_window)
    global_fn = make_layer(None)

    def layer_fn(carry, lidx):
        return jax.lax.cond(lidx % 2 == 0, local_fn, global_fn, carry, lidx)

    (x, k_cache, v_cache), (k_all, v_all) = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    k_cache, v_cache = store_cache_all_layers(k_all, v_all, k_cache, v_cache, slot_loc)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = llama._linear(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3))
def prefill(params, cfg: GptOssConfig, k_cache, v_cache, tokens, positions, q_lens, slot_loc, rope_cache):
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]

    def make_layer(window):
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
                q_lens, q_lens, causal=True, sinks=lw["sinks"][lidx],
                sliding_window=window,
            ).reshape(b * s, -1)
            x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = x + _moe(h2, lw, lidx, cfg)
            return (x, kc, vc), None
        return layer_fn

    local_fn = make_layer(cfg.sliding_window)
    global_fn = make_layer(None)

    def layer_fn(carry, lidx):
        return jax.lax.cond(lidx % 2 == 0, local_fn, global_fn, carry, lidx)

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


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max"), donate_argnums=(2, 3))
def prefill_extend(params, cfg: GptOssConfig, k_cache, v_cache, tokens,
                   positions, q_lens, kv_lens, page_tables, slot_loc,
                   rope_cache, *, prefix_max: int):
    """Chunked/extend prefill with sinks + alternating sliding window:
    both passes run sink-FREE, merge_state combines, and apply_sinks
    renormalizes once (the sink enters the softmax denominator exactly
    once, matching the single-kernel semantics — ops/attention/
    merge_state.apply_sinks)."""
    from ..ops.attention import apply_sinks, flash_attention, merge_state

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
        return kc[lidx, pid, :, off]

    def make_layer(window):
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
                causal=True, sliding_window=window, return_lse=True,
            )
            kpre = gather_prefix(kc, lidx).astype(qb.dtype)
            vpre = gather_prefix(vc, lidx).astype(qb.dtype)
            o2, l2 = flash_attention(
                qb, kpre, vpre, q_lens, prefix_lens,
                q_start=prefix_lens, kv_start=jnp.zeros_like(prefix_lens),
                causal=True, sliding_window=window, return_lse=True,
            )
            om, lm = merge_state(
                o1.reshape(b * s, cfg.num_heads, cfg.head_dim),
                jnp.swapaxes(l1, 1, 2).reshape(b * s, cfg.num_heads),
                o2.reshape(b * s, cfg.num_heads, cfg.head_dim),
                jnp.swapaxes(l2, 1, 2).reshape(b * s, cfg.num_heads),
            )
            om = apply_sinks(om, lm, lw["sinks"][lidx])
            attn = om.reshape(b * s, -1).astype(cfg.dtype)
            x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = x + _moe(h2, lw, lidx, cfg)
            return (x, kc, vc), None
        return layer_fn

    local_fn = make_layer(cfg.sliding_window)
    global_fn = make_layer(None)

    def layer_fn(carry, lidx):
        return jax.lax.cond(lidx % 2 == 0, local_fn, global_fn, carry, lidx)

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "max_kvb"), donate_argnums=(2, 3))
def prefill_packed(params, cfg: GptOssConfig, k_cache, v_cache, tokens,
                   positions, blk_seq, blk_q0, seq_meta, last_idx, slot_loc,
                   rope_cache, *, max_kvb: int):
    """Token-packed multi-prompt prefill with sinks + alternating sliding
    window (flash_packed supports both natively — single launch, no merge
    needed)."""
    from ..ops.attention import flash_attention_packed

    tp = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def make_layer(window):
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
                sinks=lw["sinks"][lidx], sliding_window=window,
            ).reshape(tp, -1)
            x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=lidx, bias=lw.get("o_bias"))
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = x + _moe(h2, lw, lidx, cfg)
            return (x, kc, vc), None
        return layer_fn

    local_fn = make_layer(cfg.sliding_window)
    global_fn = make_layer(None)

    def layer_fn(carry, lidx):
        return jax.lax.cond(lidx % 2 == 0, local_fn, global_fn, carry, lidx)

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x_last = x[last_idx]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache
