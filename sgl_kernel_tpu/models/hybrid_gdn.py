"""Hybrid GDN model (Qwen3-Next-style): alternating linear-attention
(Gated DeltaNet) and full GQA attention layers.

Serving model for the reference's GDN stack (src/sycl/gdn_attn/ — the
fused unzip→conv→delta-rule pipeline, sgl_kernel_ops.h:1124-1169, here
ops/linear_attn/gdn.py). Even layers run GDN with per-sequence conv+SSM
state caches (no KV pages needed — O(1) state per sequence, the point of
linear attention); odd layers are standard paged GQA reusing the Llama
blocks. Per-type weight stacks are indexed with ``lidx // 2`` so memory
is not duplicated across the two families.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from ..ops.attention.merge_state import merge_state
from ..ops.attention.paged_decode_dma import paged_attention_decode_dma
from ..ops.kvcache import store_cache_stacked
from ..ops.linear_attn import gdn_attention_decode, gdn_attention_prefill
from ..ops.norm import rmsnorm
from ..ops.rope import rope_decode_fused, rotary_embedding
from . import llama


@dataclasses.dataclass(frozen=True)
class HybridGdnConfig(llama.LlamaConfig):
    num_k_heads: int = 4
    num_v_heads: int = 8
    head_k_dim: int = 64
    head_v_dim: int = 64
    conv_width: int = 4

    @property
    def qkvz_dim(self):
        g = self.num_v_heads // self.num_k_heads
        return self.num_k_heads * (2 * self.head_k_dim + 2 * g * self.head_v_dim)

    @property
    def ba_dim(self):
        return self.num_k_heads * 2 * (self.num_v_heads // self.num_k_heads)

    @property
    def conv_dim(self):
        return 2 * self.num_k_heads * self.head_k_dim + self.num_v_heads * self.head_v_dim

    @staticmethod
    def tiny(**kw):
        return HybridGdnConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256, dtype=jnp.float32,
            num_k_heads=2, num_v_heads=4, head_k_dim=16, head_v_dim=16, **kw
        )


def init_weights(cfg: HybridGdnConfig, key) -> Dict[str, Any]:
    """Attention weights stacked over the ceil(L/2) odd layers; GDN
    weights over the ceil(L/2) even layers."""
    base = llama.init_weights(cfg, key)
    la = cfg.num_layers // 2  # odd layers are attention
    lw = base["layers"]
    for name in ("q", "k", "v", "o", "gate", "up", "down", "input_norm", "post_norm"):
        lw[name] = lw[name][:la]
    lg = (cfg.num_layers + 1) // 2
    h = cfg.hidden_size
    ks = jax.random.split(jax.random.fold_in(key, 7), 6)
    s = 1.0 / (h ** 0.5)
    lw["gdn_norm"] = jnp.ones((lg, h), cfg.dtype)
    lw["gdn_qkvz"] = (jax.random.normal(ks[0], (lg, cfg.qkvz_dim, h), jnp.float32) * s).astype(cfg.dtype)
    lw["gdn_ba"] = (jax.random.normal(ks[1], (lg, cfg.ba_dim, h), jnp.float32) * s).astype(cfg.dtype)
    lw["gdn_conv_w"] = (jax.random.normal(ks[2], (lg, cfg.conv_dim, cfg.conv_width), jnp.float32) * 0.3).astype(cfg.dtype)
    lw["gdn_conv_b"] = jnp.zeros((lg, cfg.conv_dim), cfg.dtype)
    lw["gdn_a_log"] = (jax.random.normal(ks[3], (lg, cfg.num_v_heads), jnp.float32) * 0.1).astype(jnp.float32)
    lw["gdn_dt_bias"] = (jax.random.normal(ks[4], (lg, cfg.num_v_heads), jnp.float32) * 0.1).astype(jnp.float32)
    lw["gdn_out"] = (jax.random.normal(ks[5], (lg, h, cfg.num_v_heads * cfg.head_v_dim), jnp.float32) * s).astype(cfg.dtype)
    return base


def make_states(cfg: HybridGdnConfig, max_seqs: int):
    """Per-sequence GDN state pools: conv [Lg, S, W-1, conv_dim],
    ssm [Lg, S, Hv, dv, dk] (the linear_attn state_cache layout)."""
    lg = (cfg.num_layers + 1) // 2
    conv = jnp.zeros((lg, max_seqs, cfg.conv_width - 1, cfg.conv_dim), cfg.dtype)
    ssm = jnp.zeros((lg, max_seqs, cfg.num_v_heads, cfg.head_v_dim, cfg.head_k_dim), jnp.float32)
    return conv, ssm


def make_caches(cfg: HybridGdnConfig, num_pages: int, page_size: int, kv_dtype=None):
    """KV pools sized for the L//2 attention layers only."""
    half = dataclasses.replace(cfg, num_layers=max(cfg.num_layers // 2, 1))
    return llama.make_caches(half, num_pages, page_size, kv_dtype)


build_rope_cache = llama.build_rope_cache


def _gdn_kw(cfg):
    return dict(
        num_k_heads=cfg.num_k_heads, num_v_heads=cfg.num_v_heads,
        head_k_dim=cfg.head_k_dim, head_v_dim=cfg.head_v_dim,
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3, 4, 5))
def decode_step(params, cfg: HybridGdnConfig, k_cache, v_cache, conv_state, ssm_state, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
    """conv_state/ssm_state rows are indexed by batch row here; the engine
    maps request→state-slot with ops/linear_attn/state_cache."""
    b = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    for lidx in range(cfg.num_layers):
        half = lidx // 2
        if lidx % 2 == 0:  # GDN layer
            h = rmsnorm(x, lw["gdn_norm"][half], cfg.rms_eps)
            qkvz = jnp.dot(h, lw["gdn_qkvz"][half].T).astype(cfg.dtype)
            ba = jnp.dot(h, lw["gdn_ba"][half].T).astype(cfg.dtype)
            o, z, cs, ss = gdn_attention_decode(
                qkvz, ba, lw["gdn_conv_w"][half], lw["gdn_conv_b"][half],
                lw["gdn_a_log"][half], lw["gdn_dt_bias"][half],
                conv_state[half], ssm_state[half], **_gdn_kw(cfg),
            )
            conv_state = conv_state.at[half].set(cs)
            ssm_state = ssm_state.at[half].set(ss)
            zf = z.astype(jnp.float32)
            gated = (o.astype(jnp.float32) * zf * jax.nn.sigmoid(zf)).reshape(b, -1)
            x = x + jnp.dot(gated.astype(cfg.dtype), lw["gdn_out"][half].T).astype(cfg.dtype)
        else:  # GQA attention layer
            h = rmsnorm(x, lw["input_norm"][half], cfg.rms_eps)
            q, k, v = llama._qkv(h, lw, cfg, b, layer_id=half)
            q, k = rope_decode_fused(positions, q, k, rope_cache)
            attn = paged_attention_decode_dma(
                q, k_cache, v_cache, lengths, page_tables, layer_id=half,
                fresh_k=k, fresh_v=v, **llama._kv_att_kwargs(cfg),
            )
            from ..ops.kvcache import store_cache_stacked as _scs
            k_cache, v_cache = _scs(llama._kv_quant(cfg, k), llama._kv_quant(cfg, v),
                                    k_cache, v_cache, slot_loc, half)
            x = llama._linear(attn.reshape(b, -1), lw["o"], cfg, residual=x, layer_id=half)
            h2 = rmsnorm(x, lw["post_norm"][half], cfg.rms_eps)
            x = llama._mlp(h2, lw, cfg, residual=x, layer_id=half)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = llama._linear(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache, conv_state, ssm_state


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2, 3, 4, 5))
def prefill(params, cfg: HybridGdnConfig, k_cache, v_cache, conv_state, ssm_state, tokens, positions, q_lens, slot_loc, rope_cache):
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]

    for lidx in range(cfg.num_layers):
        half = lidx // 2
        if lidx % 2 == 0:
            h = rmsnorm(x, lw["gdn_norm"][half], cfg.rms_eps)
            qkvz = jnp.dot(h, lw["gdn_qkvz"][half].T).astype(cfg.dtype).reshape(b, s, -1)
            ba = jnp.dot(h, lw["gdn_ba"][half].T).astype(cfg.dtype).reshape(b, s, -1)
            o, z, cs, ss = gdn_attention_prefill(
                qkvz, ba, lw["gdn_conv_w"][half], lw["gdn_conv_b"][half],
                lw["gdn_a_log"][half], lw["gdn_dt_bias"][half],
                conv_state[half], ssm_state[half], q_lens, **_gdn_kw(cfg),
            )
            conv_state = conv_state.at[half].set(cs)
            ssm_state = ssm_state.at[half].set(ss)
            zf = z.astype(jnp.float32)
            gated = (o.astype(jnp.float32) * zf * jax.nn.sigmoid(zf)).reshape(b * s, -1)
            x = x + jnp.dot(gated.astype(cfg.dtype), lw["gdn_out"][half].T).astype(cfg.dtype)
        else:
            h = rmsnorm(x, lw["input_norm"][half], cfg.rms_eps)
            q, k, v = llama._qkv(h, lw, cfg, b * s, layer_id=half)
            q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
            k_cache, v_cache = store_cache_stacked(llama._kv_quant(cfg, k), llama._kv_quant(cfg, v), k_cache, v_cache, slot_loc.reshape(-1), half)
            attn = flash_attention(
                q.reshape(b, s, cfg.num_heads, cfg.head_dim),
                k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
                v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
                q_lens, q_lens, causal=True,
            ).reshape(b * s, -1)
            x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=half)
            h2 = rmsnorm(x, lw["post_norm"][half], cfg.rms_eps)
            x = llama._mlp(h2, lw, cfg, residual=x, layer_id=half)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache, conv_state, ssm_state


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max"), donate_argnums=(2, 3, 4, 5))
def prefill_extend(params, cfg: HybridGdnConfig, k_cache, v_cache, conv_state,
                   ssm_state, tokens, positions, q_lens, kv_lens, page_tables,
                   slot_loc, rope_cache, *, prefix_max: int):
    """Chunked (extend) prefill for the hybrid family: the q tokens are the
    suffix of sequences whose earlier chunks already ran through this model.

    GDN layers continue the recurrence from the carried conv/SSM states —
    both ops take initial states, so a chunk is just "one more call"
    (reference: gdn_attention handles prefill/decode/spec sub-batches in
    one entry, gdn_attn_interface_impl.hpp:382-475; chunking there is the
    same state-carry). GQA layers run the two-pass extend of
    llama.prefill_extend (fresh chunk causal at global offsets + cached
    prefix fully visible, merge_state combine).

    NOTE: unlike llama, extend here requires the STATES to be the ones
    left by this sequence's previous chunk — radix prefix reuse across
    requests is NOT valid for this family (state is not prefix-shareable);
    the serving adapter advertises supports_prefix_reuse=False.
    """
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    prefix_lens = kv_lens - q_lens  # [B]
    pos_idx = jnp.arange(prefix_max)
    page_sz = k_cache.shape[-2]
    pre_slots = (
        page_tables[:, pos_idx // page_sz] * page_sz + (pos_idx % page_sz)[None, :]
    )  # [B, prefix_max]

    def gather_prefix(kc, lidx):
        pid = pre_slots // page_sz
        off = pre_slots % page_sz
        return kc[lidx, pid, :, off]  # [B, pre, H, D]

    for lidx in range(cfg.num_layers):
        half = lidx // 2
        if lidx % 2 == 0:  # GDN layer: continue recurrence from carried state
            h = rmsnorm(x, lw["gdn_norm"][half], cfg.rms_eps)
            qkvz = jnp.dot(h, lw["gdn_qkvz"][half].T).astype(cfg.dtype).reshape(b, s, -1)
            ba = jnp.dot(h, lw["gdn_ba"][half].T).astype(cfg.dtype).reshape(b, s, -1)
            o, z, cs, ss = gdn_attention_prefill(
                qkvz, ba, lw["gdn_conv_w"][half], lw["gdn_conv_b"][half],
                lw["gdn_a_log"][half], lw["gdn_dt_bias"][half],
                conv_state[half], ssm_state[half], q_lens, **_gdn_kw(cfg),
            )
            conv_state = conv_state.at[half].set(cs)
            ssm_state = ssm_state.at[half].set(ss)
            zf = z.astype(jnp.float32)
            gated = (o.astype(jnp.float32) * zf * jax.nn.sigmoid(zf)).reshape(b * s, -1)
            x = x + jnp.dot(gated.astype(cfg.dtype), lw["gdn_out"][half].T).astype(cfg.dtype)
        else:  # GQA layer: two-pass extend + merge
            h = rmsnorm(x, lw["input_norm"][half], cfg.rms_eps)
            q, k, v = llama._qkv(h, lw, cfg, b * s, layer_id=half)
            q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
            k_cache, v_cache = store_cache_stacked(llama._kv_quant(cfg, k), llama._kv_quant(cfg, v), k_cache, v_cache, slot_loc.reshape(-1), half)
            qb = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
            kb = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
            vb = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
            o1, l1 = flash_attention(
                qb, kb, vb, q_lens, q_lens,
                q_start=prefix_lens, kv_start=prefix_lens,
                causal=True, return_lse=True,
            )
            kpre = llama._kv_deq(cfg, gather_prefix(k_cache, half), qb.dtype)
            vpre = llama._kv_deq(cfg, gather_prefix(v_cache, half), qb.dtype)
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
            x = llama._linear(attn, lw["o"], cfg, residual=x, layer_id=half)
            h2 = rmsnorm(x, lw["post_norm"][half], cfg.rms_eps)
            x = llama._mlp(h2, lw, cfg, residual=x, layer_id=half)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = llama._linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache, conv_state, ssm_state
