"""Llama-family model built on the op library (bf16 or W4A16 int4).

The serving-side model the reference delegates to SGLang: decoder-only
transformer with RMSNorm + RoPE + GQA attention over a paged KV cache +
SwiGLU MLP. Weights live in a flat pytree with layer-stacked arrays so the
whole forward is one ``lax.scan`` over layers (O(1) compile time in depth).

Two entry points:
  - ``prefill``: flash-attention over the prompt, writes KV into the paged
    pools, returns last-token logits.
  - ``decode_step``: one token per sequence against the paged cache
    (ops.attention.paged_attention_decode), the serving hot loop.

Quantization: ``quant="w4a16"`` stores every linear as the packed int4
layout of ops/gemm/w4a16.py and runs the dequant-fused Pallas GEMM — the
BASELINE.json north-star configuration (W4A16 Llama-8B decode).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention, merge_state
from ..ops.attention.paged_decode_dma import paged_attention_decode_dma
from ..ops.gemm.w4a16 import quantize_w4, w4a16_gemm
from ..ops.kvcache import store_cache, store_cache_all_layers, store_cache_stacked
from ..ops.norm import rmsnorm
from ..ops.rope import (
    compute_cos_sin_cache,
    rope_decode_fused,
    rope_decode_fused_qkv,
    rotary_embedding,
)
from ..utils import round_up


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    max_position: int = 8192
    dtype: Any = jnp.bfloat16
    quant: Optional[str] = None  # None | "w4a16"
    group_size: int = 128
    # fuse q/k/v and gate/up into single GEMMs (fewer kernel launches; the
    # fused row layout is not TP-shardable, so parallel execution requires
    # fused=False)
    fused: bool = False
    # W4A16 decode-GEMM kernel: "pipeline" (BlockSpec, w4a16.py) or "dma"
    # (manual double-buffered weight DMA, w4a16_dma.py). Decode bucket
    # (M <= 32) only; prefill always uses the pipeline kernel.
    gemm_impl: str = "pipeline"
    # KV cache dtype: None -> model dtype; jnp.float8_e4m3fn/e5m2 or
    # jnp.int8 halve the decode-attention KV bytes (the paged kernel
    # upcasts in-VMEM; int8 is ONE hardware convert — the TPU-native fast
    # path; reference fp8 contract: flash_attention.cpp:46-74)
    kv_dtype: Any = None
    # symmetric per-tensor KV quantization scale: stores write
    # round(x/kv_scale) (int8) or (x/kv_scale).astype(kv_dtype) (fp8) and
    # every attention read folds the scale back in via k_scale/v_scale.
    # Required for int8 pools; optional for fp8 (None = scale 1.0).
    kv_scale: Optional[float] = None
    # Qwen-family options: per-head RMSNorm on q/k before RoPE (Qwen3),
    # biases on the qkv projections (Qwen2)
    qk_norm: bool = False
    qkv_bias: bool = False

    @staticmethod
    def llama3_8b(**kw):
        return LlamaConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128, **kw
        )

    @staticmethod
    def qwen3_8b(**kw):
        return LlamaConfig(
            vocab_size=151936, hidden_size=4096, intermediate_size=12288,
            num_layers=36, num_heads=32, num_kv_heads=8, head_dim=128,
            rope_theta=1e6, qk_norm=True, **kw
        )

    @staticmethod
    def tiny(**kw):
        return LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256, dtype=jnp.float32, **kw
        )


def init_weights(cfg: LlamaConfig, key) -> Dict[str, Any]:
    """Random weights (layer-stacked pytree) for benchmarking/testing."""
    h, d = cfg.hidden_size, cfg.head_dim
    nq, nkv, l = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    keys = jax.random.split(key, 10)

    def w(key, shape, scale=None):
        scale = scale if scale is not None else (1.0 / (shape[-1] ** 0.5))
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.dtype)

    params = {
        "embed": w(keys[0], (cfg.vocab_size, h), 0.02),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": w(keys[1], (cfg.vocab_size, h)),
        # separate projections (not fused) so tensor parallelism can shard
        # each on its head/intermediate axis with contiguous slices
        "layers": {
            "input_norm": jnp.ones((l, h), cfg.dtype),
            "post_norm": jnp.ones((l, h), cfg.dtype),
            "q": w(keys[2], (l, nq * d, h)),
            "k": w(keys[3], (l, nkv * d, h)),
            "v": w(keys[4], (l, nkv * d, h)),
            "o": w(keys[5], (l, h, nq * d)),
            "gate": w(keys[6], (l, cfg.intermediate_size, h)),
            "up": w(keys[7], (l, cfg.intermediate_size, h)),
            "down": w(keys[8], (l, h, cfg.intermediate_size)),
        },
    }
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((l, d), cfg.dtype)
        params["layers"]["k_norm"] = jnp.ones((l, d), cfg.dtype)
    if cfg.qkv_bias:
        params["layers"]["q_bias"] = jnp.zeros((l, nq * d), cfg.dtype)
        params["layers"]["k_bias"] = jnp.zeros((l, nkv * d), cfg.dtype)
        params["layers"]["v_bias"] = jnp.zeros((l, nkv * d), cfg.dtype)
    if cfg.quant == "w4a16":
        params["layers"] = _quantize_layers(params["layers"], cfg)
        params["lm_head"] = _quantize_matrix(params["lm_head"], cfg)
    elif cfg.fused:
        # bf16 fused layouts (convert.py:64-66 builds the same keys)
        ly = params["layers"]
        ly["qkv"] = jnp.concatenate([ly.pop("q"), ly.pop("k"), ly.pop("v")], axis=1)
        ly["gate_up"] = jnp.concatenate([ly.pop("gate"), ly.pop("up")], axis=1)
    return params


def _quantize_matrix(wm, cfg):
    # pad N (vocab) to a multiple of 2048 so the W4A16 kernel can use its
    # efficient large-N tiles; extra logits are sliced off after the GEMM
    n = wm.shape[0]
    n_pad = round_up(n, 2048)
    if n_pad != n:
        wm = jnp.pad(wm, ((0, n_pad - n), (0, 0)))
    packed, scales, _ = quantize_w4(wm, group_size=cfg.group_size)
    return {"packed": packed, "scales": scales}


def _quantize_layers(layers, cfg):
    out = dict(layers)

    def qz(wm):
        packed, scales = jax.vmap(lambda x: quantize_w4(x, group_size=cfg.group_size)[:2])(wm)
        return {"packed": packed, "scales": scales}

    if cfg.fused:
        out["qkv"] = qz(jnp.concatenate([layers.pop("q"), layers.pop("k"), layers.pop("v")], axis=1))
        out["gate_up"] = qz(jnp.concatenate([layers.pop("gate"), layers.pop("up")], axis=1))
        for name in ("q", "k", "v", "gate", "up"):
            out.pop(name, None)
        for name in ("o", "down"):
            out[name] = qz(layers[name])
        return out
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        out[name] = qz(layers[name])
    return out


def _w4_kernel_for(cfg, m: int):
    if cfg.gemm_impl == "dma" and m <= 32:
        from ..ops.gemm.w4a16_dma import w4a16_gemm_dma

        return w4a16_gemm_dma
    return w4a16_gemm


def _linear(x, w, cfg: LlamaConfig, residual=None, layer_id=None, norm=None, bias=None):
    """layer_id: when given, w is the FULL layer-stacked weight ([L, ...])
    and the quantized kernel selects the layer via scalar-prefetch — a
    pre-sliced Pallas operand would materialize a per-layer HBM copy
    (~4GB/step across an 8B model's scan; docs/PERF.md).

    ``norm``: optional rmsnorm weight ([K], or stacked [L, K] with
    layer_id) applied to x BEFORE the matmul. On the quantized fast path
    the norm fuses into the GEMM prologue (w4a16_gemm norm_weight — one
    Pallas launch instead of two, round 4); every other path applies the
    standalone rmsnorm, so callers can pass the raw residual stream
    unconditionally."""
    kern = _w4_kernel_for(cfg, x.shape[0]) if isinstance(w, dict) else None
    if norm is not None and kern is not w4a16_gemm:
        nw = norm[layer_id] if layer_id is not None else norm
        x = rmsnorm(x, nw, cfg.rms_eps)
        norm = None
    if isinstance(w, dict):
        kw = {} if norm is None else {"norm_weight": norm, "norm_eps": cfg.rms_eps}
        out = kern(
            x, w["packed"], w["scales"], residual=residual, layer_id=layer_id,
            group_size=cfg.group_size, out_dtype=cfg.dtype, **kw,
        )
    else:
        wl = w[layer_id] if layer_id is not None else w  # XLA fuses the slice
        out = jnp.dot(x, wl.T, preferred_element_type=jnp.float32).astype(cfg.dtype)
        if residual is not None:
            out = out + residual
    if bias is not None:
        bl = bias[layer_id] if layer_id is not None and bias.ndim == 2 else bias
        out = out + bl.astype(out.dtype)
    return out


def make_caches(cfg: LlamaConfig, num_pages: int, page_size: int, kv_dtype=None):
    """Stacked per-layer page-major pools [L, P, Hkv, page, D] (x2 for K
    and V). Page-major keeps each page one contiguous [Hkv, page, D]
    block — the unit the manual-DMA decode kernel streams (measured 821
    vs 270 GB/s against per-(head,page) DMAs; docs/PERF.md)."""
    kv_dtype = kv_dtype or cfg.kv_dtype or cfg.dtype
    assert not (kv_dtype == jnp.int8 and cfg.kv_scale is None), (
        "int8 KV pools require cfg.kv_scale — without it the store's astype "
        "truncates bf16 K/V to {-1, 0, 1} codes silently")
    shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, page_size, cfg.head_dim)
    return jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype)


def _qkv(h, weights, cfg, n_tokens, layer_id=None):
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.fused:
        qkv = _linear(h, weights["qkv"], cfg, layer_id=layer_id)
        q = qkv[:, : nq * d].reshape(n_tokens, nq, d)
        k = qkv[:, nq * d : (nq + nkv) * d].reshape(n_tokens, nkv, d)
        v = qkv[:, (nq + nkv) * d :].reshape(n_tokens, nkv, d)
    else:
        q = _linear(h, weights["q"], cfg, layer_id=layer_id).reshape(n_tokens, nq, d)
        k = _linear(h, weights["k"], cfg, layer_id=layer_id).reshape(n_tokens, nkv, d)
        v = _linear(h, weights["v"], cfg, layer_id=layer_id).reshape(n_tokens, nkv, d)
    if cfg.qkv_bias:
        def bsel(name):
            bb = weights[name]
            return bb[layer_id] if layer_id is not None else bb
        q = q + bsel("q_bias").reshape(1, nq, d)
        k = k + bsel("k_bias").reshape(1, nkv, d)
        v = v + bsel("v_bias").reshape(1, nkv, d)
    if cfg.qk_norm:
        qw = weights["q_norm"][layer_id] if layer_id is not None else weights["q_norm"]
        kw = weights["k_norm"][layer_id] if layer_id is not None else weights["k_norm"]
        q = rmsnorm(q, qw, cfg.rms_eps)
        k = rmsnorm(k, kw, cfg.rms_eps)
    return q, k, v


def _mlp(h2, weights, cfg, residual=None, layer_id=None, norm=None):
    """``norm``: optional post-norm weight — h2 is then the RAW residual
    stream and the norm fuses into the gate_up GEMM (or applies standalone
    on the non-fused/dense paths)."""
    w = weights["down"]
    if cfg.fused:
        gu = _linear(h2, weights["gate_up"], cfg, layer_id=layer_id, norm=norm)
        norm = None
        # fused_gate_up requires the down proj's packed K to equal the true
        # intermediate size: quantize_w4 zero-pads non-group-multiple K, and
        # the fused path cannot pad the interleaved [M, 2K] activation
        # (w4a16.py asserts k_pad == k). Fall back to the slice path there.
        if (isinstance(w, dict)
                and _w4_kernel_for(cfg, gu.shape[0]) is w4a16_gemm
                and gu.shape[-1] // 2 == w["packed"].shape[-2] * 2):
            # feed the FUSED gate_up output straight into the down GEMM's
            # silu prologue (two BlockSpecs over one array) — the
            # gate/up slices were standalone XLA fusion kernels between
            # two Pallas calls (~24us/launch on this runtime, PERF.md)
            return w4a16_gemm(
                gu, w["packed"], w["scales"], residual=residual,
                layer_id=layer_id, prologue="silu_mul", fused_gate_up=True,
                group_size=cfg.group_size, out_dtype=cfg.dtype,
            )
        inter = gu.shape[-1] // 2
        gate, up = gu[:, :inter], gu[:, inter:]
    else:
        if norm is not None:
            nw = norm[layer_id] if layer_id is not None else norm
            h2 = rmsnorm(h2, nw, cfg.rms_eps)
        gate = _linear(h2, weights["gate"], cfg, layer_id=layer_id)
        up = _linear(h2, weights["up"], cfg, layer_id=layer_id)
    if isinstance(w, dict):
        # silu-mul prologue + residual epilogue fused into the down GEMM
        return _w4_kernel_for(cfg, gate.shape[0])(
            gate, w["packed"], w["scales"], a2=up, residual=residual, layer_id=layer_id,
            prologue="silu_mul", group_size=cfg.group_size, out_dtype=cfg.dtype,
        )
    if layer_id is not None:
        w = w[layer_id]
    g = gate.astype(jnp.float32)
    act = (g * jax.nn.sigmoid(g) * up.astype(jnp.float32)).astype(cfg.dtype)
    out = jnp.dot(act, w.T, preferred_element_type=jnp.float32).astype(cfg.dtype)
    return out + residual if residual is not None else out


def _maybe_psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _kv_quant(cfg, x):
    """Fresh bf16 K/V -> pool representation before a cache store.
    int8: symmetric per-tensor scale, round-to-nearest, clip to +-127.
    fp8 with kv_scale: divide then cast (RTNE). No scale: identity (the
    store's own astype handles plain fp8/bf16 pools)."""
    if cfg.kv_scale is None:
        return x
    y = x.astype(jnp.float32) * (1.0 / cfg.kv_scale)
    if cfg.kv_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(cfg.kv_dtype)


def _kv_att_kwargs(cfg):
    """k_scale/v_scale kwargs for the decode attention call (the kernel
    folds k_scale into q and v_scale into the output — zero per-element
    cost on the KV stream)."""
    if cfg.kv_scale is None:
        return {}
    return {"k_scale": cfg.kv_scale, "v_scale": cfg.kv_scale}


def _kv_deq(cfg, x, dtype):
    """Dequantize a gathered KV prefix to the compute dtype."""
    x = x.astype(dtype)
    return x if cfg.kv_scale is None else x * jnp.asarray(cfg.kv_scale, dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3))
def decode_step(params, cfg: LlamaConfig, k_cache, v_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache, *, tp_axis=None):
    """One decode step. tokens/positions/lengths/slot_loc: [B];
    page_tables [B, max_pages]. Returns (logits [B, V], k_cache, v_cache).

    ``tp_axis``: mesh axis name when running inside shard_map under tensor
    parallelism — cfg then describes the per-shard (local) head counts and
    the row-parallel projections (o, down) psum over the axis."""
    x = params["embed"][tokens].astype(cfg.dtype)
    x, k_cache, v_cache = decode_layers(
        params["layers"], cfg, k_cache, v_cache, x, positions, page_tables,
        lengths, slot_loc, rope_cache, tp_axis=tp_axis,
    )
    # final_norm fuses into the lm_head GEMM prologue (quantized path)
    logits = _linear(x, params["lm_head"], cfg,
                     norm=params["final_norm"]).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


def decode_layers(lw, cfg: LlamaConfig, k_cache, v_cache, x, positions, page_tables, lengths, slot_loc, rope_cache, *, tp_axis=None):
    """Run a stack of decoder layers on hidden states x [B, H]. ``lw`` is
    the stacked layer weights [Lstack, ...]; the caches' layer dim must
    match Lstack (pipeline stages pass their stage-local slab). The embed/lm_head boundary ops live in
    ``decode_step`` so pipeline parallelism (parallel/pp.py) can run just
    this middle section per stage."""
    b = x.shape[0]
    n_stack = jax.tree_util.tree_leaves(lw)[0].shape[0]

    def layer_fn(carry, lidx):
        # stacked caches AND stacked weights stay whole: the attention and
        # GEMM kernels select the layer via scalar-prefetched layer_id, so
        # the scan body contains no per-layer dynamic-slice of big arrays
        # (a sliced Pallas operand would be a materialized HBM copy).
        # The pools are closure constants, NOT scan carry: threading a
        # read-only multi-GB buffer through the carry defeats XLA's
        # in-place analysis for the deferred store below (measured
        # ~7 ms/step of pool copies on the headline decode).
        x = carry
        weights = lw
        if cfg.fused and not cfg.qkv_bias and not cfg.qk_norm:
            # input_norm fuses into the qkv GEMM prologue (round 4:
            # norm_weight — one Pallas launch instead of two), then
            # GEMM -> split+rope in ONE Pallas call (three BlockSpecs over
            # the unsplit qkv output): the q/k/v slices were standalone XLA
            # fusion kernels between two Pallas calls (docs/PERF.md)
            qkv = _linear(x, weights["qkv"], cfg, layer_id=lidx,
                          norm=weights["input_norm"])
            q, k, v = rope_decode_fused_qkv(
                positions, qkv, rope_cache, num_q=cfg.num_heads,
                num_kv=cfg.num_kv_heads, head_dim=cfg.head_dim)
        else:
            h = rmsnorm(x, weights["input_norm"][lidx], cfg.rms_eps)
            q, k, v = _qkv(h, weights, cfg, b, layer_id=lidx)
            q, k = rope_decode_fused(positions, q, k, rope_cache)
        attn = paged_attention_decode_dma(
            q, k_cache, v_cache, lengths, page_tables, layer_id=lidx,
            fresh_k=k, fresh_v=v, **_kv_att_kwargs(cfg)
        )
        if tp_axis is None:
            x = _linear(attn.reshape(b, -1), weights["o"], cfg, residual=x, layer_id=lidx)
            # post_norm fuses into the gate_up GEMM the same way
            x = _mlp(x, weights, cfg, residual=x, layer_id=lidx,
                     norm=weights["post_norm"])
        else:
            x = x + _maybe_psum(_linear(attn.reshape(b, -1), weights["o"], cfg, layer_id=lidx), tp_axis)
            x = x + _maybe_psum(_mlp(x, weights, cfg, layer_id=lidx,
                                     norm=weights["post_norm"]), tp_axis)
        return x, (k, v)

    x, (k_all, v_all) = jax.lax.scan(layer_fn, x, jnp.arange(n_stack))
    k_cache, v_cache = store_cache_all_layers(
        _kv_quant(cfg, k_all), _kv_quant(cfg, v_all), k_cache, v_cache, slot_loc)
    return x, k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3))
def prefill(params, cfg: LlamaConfig, k_cache, v_cache, tokens, positions, q_lens, slot_loc, rope_cache, *, tp_axis=None):
    """Prefill a padded batch. tokens/positions [B, S]; q_lens [B];
    slot_loc [B, S] flat cache slots per token (−1 beyond q_len).
    Returns (last-token logits [B, V], k_cache, v_cache)."""
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)  # [B*S, H]
    x, k_cache, v_cache = prefill_layers(
        params["layers"], cfg, k_cache, v_cache, x, positions, q_lens,
        slot_loc, rope_cache, tp_axis=tp_axis,
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    # gather last valid token per sequence
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


def prefill_layers(lw, cfg: LlamaConfig, k_cache, v_cache, x, positions, q_lens, slot_loc, rope_cache, *, tp_axis=None):
    """Run a stack of decoder layers in prefill mode on hidden states
    x [B*S, H] (flash attention over the fresh padded batch + stacked KV
    store per layer). The embed/lm_head boundary lives in ``prefill`` so
    pipeline parallelism (parallel/pp.py) can run just this middle section
    per stage — the prefill analog of ``decode_layers``."""
    b, s = positions.shape
    n_stack = jax.tree_util.tree_leaves(lw)[0].shape[0]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        weights = lw
        h = rmsnorm(x, weights["input_norm"][lidx], cfg.rms_eps)
        q, k, v = _qkv(h, weights, cfg, b * s, layer_id=lidx)
        q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(_kv_quant(cfg, k), _kv_quant(cfg, v), kc, vc, slot_loc.reshape(-1), lidx)
        attn = flash_attention(
            q.reshape(b, s, cfg.num_heads, cfg.head_dim),
            k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim),
            q_lens, q_lens, causal=True,
        ).reshape(b * s, -1)
        if tp_axis is None:
            x = _linear(attn, weights["o"], cfg, residual=x, layer_id=lidx)
            h2 = rmsnorm(x, weights["post_norm"][lidx], cfg.rms_eps)
            x = _mlp(h2, weights, cfg, residual=x, layer_id=lidx)
        else:
            x = x + _maybe_psum(_linear(attn, weights["o"], cfg, layer_id=lidx), tp_axis)
            h2 = rmsnorm(x, weights["post_norm"][lidx], cfg.rms_eps)
            x = x + _maybe_psum(_mlp(h2, weights, cfg, layer_id=lidx), tp_axis)
        return (x, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(n_stack)
    )
    return x, k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "max_kvb", "tp_axis"), donate_argnums=(2, 3))
def prefill_packed(params, cfg: LlamaConfig, k_cache, v_cache, tokens,
                   positions, blk_seq, blk_q0, seq_meta, last_idx, slot_loc,
                   rope_cache, *, max_kvb: int, tp_axis=None):
    """Token-packed multi-prompt prefill: several prompts block-aligned
    packed into ONE launch (ops/attention/flash_packed.py), so a mixed
    batch pays per-sequence padding < block instead of bucket - len
    (reference: cu_seqlens-packed varlen prefill end-to-end).

    tokens/positions/slot_loc [TP] packed; blk_seq/blk_q0 [NQB];
    seq_meta [B, 6] (make_seq_meta); last_idx [B] packed index of each
    prompt's final token. Returns (logits [B, V], k_cache, v_cache).
    """
    from ..ops.attention import flash_attention_packed

    tp = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = _qkv(h, lw, cfg, tp, layer_id=lidx)
        q, k = rotary_embedding(positions, q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(_kv_quant(cfg, k), _kv_quant(cfg, v), kc, vc, slot_loc, lidx)
        attn = flash_attention_packed(
            q.reshape(tp, cfg.num_heads, cfg.head_dim),
            k.reshape(tp, cfg.num_kv_heads, cfg.head_dim),
            v.reshape(tp, cfg.num_kv_heads, cfg.head_dim),
            blk_seq, blk_q0, seq_meta, max_kvb=max_kvb, causal=True,
        ).reshape(tp, -1)
        if tp_axis is None:
            x = _linear(attn, lw["o"], cfg, residual=x, layer_id=lidx)
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = _mlp(h2, lw, cfg, residual=x, layer_id=lidx)
        else:
            x = x + _maybe_psum(_linear(attn, lw["o"], cfg, layer_id=lidx), tp_axis)
            h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
            x = x + _maybe_psum(_mlp(h2, lw, cfg, layer_id=lidx), tp_axis)
        return (x, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x_last = x[last_idx]  # [B, H]
    logits = _linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, k_cache, v_cache


def build_rope_cache(cfg: LlamaConfig):
    return compute_cos_sin_cache(cfg.head_dim, cfg.max_position, cfg.rope_theta)


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max", "tp_axis", "num_logits"), donate_argnums=(2, 3))
def prefill_extend(
    params,
    cfg: LlamaConfig,
    k_cache,
    v_cache,
    tokens,
    positions,
    q_lens,
    kv_lens,
    page_tables,
    slot_loc,
    rope_cache,
    *,
    prefix_max: int,
    tp_axis=None,
    num_logits: int = 1,
):
    """Chunked/extend prefill: the q tokens are the *suffix* of sequences
    whose prefix KV already lives in the paged cache (radix prefix reuse).

    tokens/positions/slot_loc [B, S] (fresh suffix, padded); q_lens [B]
    suffix lengths; kv_lens [B] total lengths; page_tables [B, max_pages].
    Attention = merge_state( flash(q, fresh_kv | causal at global offsets),
                             flash(q, gathered_prefix | fully visible) ) —
    the reference's chunked two-launch design (flash_attention.cpp:1207-1325)
    expressed with this framework's offset-aware kernel + merge primitive.
    """
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    prefix_lens = kv_lens - q_lens  # [B]
    # flat slot ids of the first prefix_max cached positions per sequence
    pos_idx = jnp.arange(prefix_max)
    page_sz = k_cache.shape[-2]
    pre_slots = (
        page_tables[:, pos_idx // page_sz] * page_sz + (pos_idx % page_sz)[None, :]
    )  # [B, prefix_max]

    def gather_prefix(kc, lidx):
        # page-major pool [L, P, H, page, D]
        pid = pre_slots // page_sz
        off = pre_slots % page_sz
        return kc[lidx, pid, :, off]  # [B, pre, H, D]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        weights = lw
        h = rmsnorm(x, weights["input_norm"][lidx], cfg.rms_eps)
        q, k, v = _qkv(h, weights, cfg, b * s, layer_id=lidx)
        q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(_kv_quant(cfg, k), _kv_quant(cfg, v), kc, vc, slot_loc.reshape(-1), lidx)
        qb = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        kb = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        vb = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        # pass 1: fresh suffix, causal at global offsets
        o1, l1 = flash_attention(
            qb, kb, vb, q_lens, q_lens,
            q_start=prefix_lens, kv_start=prefix_lens,
            causal=True, return_lse=True,
        )
        # pass 2: cached prefix, fully visible (masked by prefix length)
        kpre = _kv_deq(cfg, gather_prefix(kc, lidx), qb.dtype)
        vpre = _kv_deq(cfg, gather_prefix(vc, lidx), qb.dtype)
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
        x = x + _maybe_psum(_linear(attn, weights["o"], cfg, layer_id=lidx), tp_axis)
        h2 = rmsnorm(x, weights["post_norm"][lidx], cfg.rms_eps)
        mlp = _maybe_psum(_mlp(h2, weights, cfg, layer_id=lidx), tp_axis)
        return (x + mlp, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    if num_logits == 1:
        last = jnp.clip(q_lens - 1, 0, s - 1)
        x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = _linear(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
        return logits, k_cache, v_cache
    # last num_logits positions per sequence (speculative verify needs the
    # whole chain's logits); positions before the suffix start are clipped
    # to 0 and produce garbage rows the caller masks out
    n = num_logits
    idx = jnp.clip(q_lens[:, None] - n + jnp.arange(n)[None, :], 0, s - 1)  # [B, n]
    x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)  # [B, n, H]
    logits = _linear(x_sel.reshape(b * n, -1), params["lm_head"], cfg).astype(jnp.float32)
    return logits[:, : cfg.vocab_size].reshape(b, n, -1), k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max"), donate_argnums=(2, 3))
def mixed_step(params, cfg: LlamaConfig, k_cache, v_cache,
               dec_tokens, dec_positions, dec_tables, dec_lengths, dec_slots,
               pf_tokens, pf_positions, pf_q_len, pf_kv_len, pf_table, pf_slots,
               rope_cache, *, prefix_max: int):
    """ONE fused step serving a decode batch AND one prefill chunk — the
    reference's chunked mixed batch (two complementary launches over one
    output, flash_attention.cpp:1207-1325), TPU-native: the decode rows
    and the chunk tokens run as one packed token stream through every
    weight-streaming GEMM (the weights are read ONCE per layer instead of
    once for the decode launch and again for the prefill launch — decode
    is weight-bandwidth-bound, so the second read was the stall), then the
    stream splits for attention: paged-DMA decode for the first Bd rows,
    two-pass extend (fresh chunk causal + gathered prefix, merge_state)
    for the chunk. One host->device dispatch per scheduler tick instead of
    two (the axon relay charges ~26ms per dispatch).

    dec_*: [Bd] / dec_tables [Bd, P] — padded decode batch (slot -1 rows
    are dead). pf_*: ONE chunked-prefill request: tokens/positions/slots
    [S] (padded), q_len/kv_len scalars, table [P2].
    Returns (dec_logits [Bd, V], pf_logits [V], k_cache, v_cache).
    """
    bd = dec_tokens.shape[0]
    s = pf_tokens.shape[0]
    t = bd + s
    tokens = jnp.concatenate([dec_tokens, pf_tokens])
    positions = jnp.concatenate([dec_positions, pf_positions])
    slots = jnp.concatenate([dec_slots, pf_slots])
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]
    prefix_len = pf_kv_len - pf_q_len  # scalar [1]-shaped
    pos_idx = jnp.arange(prefix_max)
    page_sz = k_cache.shape[-2]
    pre_slots = (pf_table[pos_idx // page_sz] * page_sz + pos_idx % page_sz)[None, :]

    def gather_prefix(kc, lidx):
        pid = pre_slots // page_sz
        off = pre_slots % page_sz
        return kc[lidx, pid, :, off]  # [1, pre, Hkv, D]

    def layer_fn(carry, lidx):
        x = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = _qkv(h, lw, cfg, t, layer_id=lidx)
        q, k = rotary_embedding(positions, q, k, cfg.head_dim, rope_cache)
        # decode attention: paged DMA over history + in-kernel fresh row
        attn_d = paged_attention_decode_dma(
            q[:bd], k_cache, v_cache, dec_lengths, dec_tables, layer_id=lidx,
            fresh_k=k[:bd], fresh_v=v[:bd], **_kv_att_kwargs(cfg),
        )
        # prefill chunk: two-pass extend (fresh causal at global offsets +
        # cached prefix) — the chunk's own KV is attended in-tensor, so the
        # deferred pool store (below) is invisible to it
        qb = q[bd:].reshape(1, s, cfg.num_heads, cfg.head_dim)
        kb = k[bd:].reshape(1, s, cfg.num_kv_heads, cfg.head_dim)
        vb = v[bd:].reshape(1, s, cfg.num_kv_heads, cfg.head_dim)
        o1, l1 = flash_attention(
            qb, kb, vb, pf_q_len.reshape(1), pf_q_len.reshape(1),
            q_start=prefix_len.reshape(1), kv_start=prefix_len.reshape(1),
            causal=True, return_lse=True,
        )
        kpre = _kv_deq(cfg, gather_prefix(k_cache, lidx), qb.dtype)
        vpre = _kv_deq(cfg, gather_prefix(v_cache, lidx), qb.dtype)
        o2, l2 = flash_attention(
            qb, kpre, vpre, pf_q_len.reshape(1), prefix_len.reshape(1),
            q_start=prefix_len.reshape(1), kv_start=jnp.zeros((1,), jnp.int32),
            causal=True, return_lse=True,
        )
        om, _ = merge_state(
            o1.reshape(s, cfg.num_heads, cfg.head_dim),
            jnp.swapaxes(l1, 1, 2).reshape(s, cfg.num_heads),
            o2.reshape(s, cfg.num_heads, cfg.head_dim),
            jnp.swapaxes(l2, 1, 2).reshape(s, cfg.num_heads),
        )
        attn = jnp.concatenate(
            [attn_d.reshape(bd, -1), om.reshape(s, -1).astype(cfg.dtype)])
        x = _linear(attn, lw["o"], cfg, residual=x, layer_id=lidx)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        x = _mlp(h2, lw, cfg, residual=x, layer_id=lidx)
        return x, (k, v)

    x, (k_all, v_all) = jax.lax.scan(layer_fn, x, jnp.arange(cfg.num_layers))
    k_cache, v_cache = store_cache_all_layers(
        _kv_quant(cfg, k_all), _kv_quant(cfg, v_all), k_cache, v_cache, slots)
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    # lm_head only on the rows that need logits: the decode batch + the
    # chunk's last fresh token
    last_pf = bd + jnp.clip(pf_q_len - 1, 0, s - 1)
    sel = jnp.concatenate([jnp.arange(bd), last_pf.reshape(1)])
    logits = _linear(x[sel], params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits[:bd], logits[bd], k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max"), donate_argnums=(2, 3))
def prefill_tree(params, cfg: LlamaConfig, k_cache, v_cache, tokens, positions,
                 tree_mask, prefix_lens, page_tables, slot_loc, rope_cache, *,
                 prefix_max: int):
    """Tree-masked verify forward (EAGLE-style speculative trees): the dt
    fresh tokens form a draft TREE — node i attends its ancestors-or-self
    via ``tree_mask`` [B, dt, dt] (build_tree_kernel_efficient) instead of
    the chunk-causal rule, plus the whole cached prefix.

    tokens/positions/slot_loc [B, dt] (slot_loc = per-NODE cache slots —
    siblings share a position but need distinct rows; the spec round moves
    accepted rows to their position slots afterwards); prefix_lens [B].
    Returns (logits [B, dt, V], k_cache, v_cache) — logits for EVERY node.

    dt is small (1 + gamma*topk), so the fresh-tree pass is a dense masked
    attention (f32, base-2 lse) merged with the gathered-prefix pass via
    merge_state — the reference's two-launch/one-output chunked scheme
    (flash_attention.cpp:1207-1325) with a tree mask on launch 1.
    """
    b, dt = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    pos_idx = jnp.arange(prefix_max)
    page_sz = k_cache.shape[-2]
    pre_slots = (
        page_tables[:, pos_idx // page_sz] * page_sz + (pos_idx % page_sz)[None, :]
    )
    _LOG2E = 1.4426950408889634
    sm = 1.0 / (cfg.head_dim ** 0.5)
    grp = cfg.num_heads // cfg.num_kv_heads

    def gather_prefix(kc, lidx):
        pid = pre_slots // page_sz
        off = pre_slots % page_sz
        return kc[lidx, pid, :, off]  # [B, pre, Hkv, D]

    def layer_fn(carry, lidx):
        x, kc, vc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q, k, v = _qkv(h, lw, cfg, b * dt, layer_id=lidx)
        q, k = rotary_embedding(positions.reshape(-1), q, k, cfg.head_dim, rope_cache)
        kc, vc = store_cache_stacked(_kv_quant(cfg, k), _kv_quant(cfg, v), kc, vc, slot_loc.reshape(-1), lidx)
        qb = q.reshape(b, dt, cfg.num_heads, cfg.head_dim)
        kb = k.reshape(b, dt, cfg.num_kv_heads, cfg.head_dim)
        vb = v.reshape(b, dt, cfg.num_kv_heads, cfg.head_dim)
        # pass 1: dense tree-masked attention over the fresh dt nodes
        kbr = jnp.repeat(kb, grp, axis=2).astype(jnp.float32)
        vbr = jnp.repeat(vb, grp, axis=2).astype(jnp.float32)
        s2 = jnp.einsum("bihd,bjhd->bhij", qb.astype(jnp.float32), kbr) * (sm * _LOG2E)
        s2 = jnp.where(tree_mask[:, None], s2, -jnp.inf)
        m = jnp.max(s2, axis=-1)  # [B, H, dt] (diagonal always visible)
        p = jnp.exp2(s2 - m[..., None])
        l1 = jnp.sum(p, axis=-1)
        o1 = jnp.einsum("bhij,bjhd->bihd", p, vbr) / l1[..., None].swapaxes(1, 2)
        lse1 = (m + jnp.log2(l1)).swapaxes(1, 2)  # [B, dt, H]
        # pass 2: cached prefix, fully visible to every node
        kpre = _kv_deq(cfg, gather_prefix(kc, lidx), qb.dtype)
        vpre = _kv_deq(cfg, gather_prefix(vc, lidx), qb.dtype)
        o2, l2 = flash_attention(
            qb, kpre, vpre, jnp.full((b,), dt, jnp.int32), prefix_lens,
            causal=False, return_lse=True,
        )
        om, _ = merge_state(
            o1.reshape(b * dt, cfg.num_heads, cfg.head_dim),
            lse1.reshape(b * dt, cfg.num_heads),
            o2.reshape(b * dt, cfg.num_heads, cfg.head_dim).astype(jnp.float32),
            jnp.swapaxes(l2, 1, 2).reshape(b * dt, cfg.num_heads),
        )
        attn = om.reshape(b * dt, -1).astype(cfg.dtype)
        x = x + _linear(attn, lw["o"], cfg, layer_id=lidx)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        mlp = _mlp(h2, lw, cfg, layer_id=lidx)
        return (x + mlp, kc, vc), None

    (x, k_cache, v_cache), _ = jax.lax.scan(
        layer_fn, (x, k_cache, v_cache), jnp.arange(cfg.num_layers)
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _linear(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits.reshape(b, dt, -1), k_cache, v_cache
