"""DeepSeek-V3-style model: MLA attention + biased-top-k MoE.

The second flagship family (BASELINE.json config: "DeepSeek-V3 MLA decode
with FP8 KV-cache + fused_experts MoE"). Uses the op library's MLA kernels
(ops/attention/mla.py) with the weight-absorption formulation:

  q_nope' = q_nope @ W_UK   (per head, into the 512-dim latent)      decode
  scores  = q_nope' . kv_c + q_pe . k_pe                     (one 576 read)
  out_h   = attn_latent @ W_UV                               (per head)

The KV cache stores only the 576-dim latent per token (MLA's point).
MoE layers use biased top-k routing (DSv3 scoring) + fused_experts; the
first ``num_dense_layers`` layers use a dense MLP.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention.mla import D_CKV, D_LATENT, D_ROPE, mla_decode, mla_prefill
from ..ops.kvcache import store_cache_mla
from ..ops.moe import MoeWeights, biased_topk, fused_experts, pick_block_size
from ..ops.norm import rmsnorm
from ..ops.rope import compute_cos_sin_cache, rotary_embedding


@dataclasses.dataclass(frozen=True)
class DeepseekConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 4
    num_heads: int = 16
    qk_nope_dim: int = 128  # per-head nope dim (projected to latent via W_UK)
    v_head_dim: int = 128
    # q low-rank path (real DeepSeek-V3/R1 checkpoints: q_a_proj [rank, h]
    # -> q_a_layernorm -> q_b_proj [nh*(dn+rope), rank]; V2-Lite uses the
    # direct q_proj layout = None). Reference MLA shape contract:
    # /root/reference/python/sgl_kernel/attention.py:54-132.
    q_lora_rank: Optional[int] = None
    # MoE
    num_experts: int = 16
    num_experts_per_tok: int = 4
    moe_intermediate: int = 512
    dense_intermediate: int = 4096
    num_dense_layers: int = 1
    routed_scaling_factor: float = 2.5
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    max_position: int = 4096
    dtype: Any = jnp.bfloat16
    # DSv4 NSA sparse attention (decode): a lightweight fp8 indexer cache
    # scores every cached token per step, top-`index_topk` latent rows are
    # gathered for sparse MLA (reference: fp8_paged_mqa_logits + fast_topk
    # + flash_mla_sparse_decode pipeline, sgl_flash_kernel_ops.h:96-139)
    nsa: bool = False
    index_topk: int = 2048
    idx_heads: int = 4
    idx_dim: int = 128  # power of two (hadamard rotation)
    # W4A16: pack every linear (wq/wkv_a/wo, dense MLP, shared expert,
    # routed expert banks, lm_head) into the K-paired int4 layout; the
    # small absorbed einsum factors (w_uk/w_uv) stay in cfg.dtype
    quant: Optional[str] = None
    group_size: int = 128
    # symmetric per-tensor latent quantization scale: stores write
    # round(kv/kv_scale) (int8) or (kv/kv_scale).astype (fp8); pool reads
    # fold the scale into sm_scale (logits) and one output multiply —
    # int8 latent is the TPU-native low-bit pool (ONE hardware upcast,
    # docs/PERF.md round 3). Dense/NSA families only (compress rings gate).
    kv_scale: Any = None
    # latent KV-cache dtype (BASELINE flagship: fp8 latent pool; the MLA
    # decode kernel upcasts via the integer-bitcast fast path)
    kv_dtype: Any = None
    # DSv4 KV compression ("flash compress", ops/compression.py; reference
    # CompressPlan.cpp + FlashCompress{4,128}.cpp): decode attends over
    # [ring of compressed tokens] + [recent uncompressed window] and
    # merges via merge_state; prefill is exact (full attention) and
    # builds the ring. "c4" = ratio 4 overlapping windows of 8;
    # "c128" = ratio 128 plain windows.
    compress: Optional[str] = None  # None | "c4" | "c128"
    compress_ring: int = 64  # compressed tokens kept per sequence (ring eviction)
    # recent tokens attended uncompressed; must be >= the compress ratio,
    # or tokens older than the window but not yet pooled would be invisible
    # to decode (None = max(64, ratio))
    compress_local: Optional[int] = None

    @staticmethod
    def tiny(**kw):
        return DeepseekConfig(
            vocab_size=128, hidden_size=64, num_layers=2, num_heads=2,
            qk_nope_dim=32, v_head_dim=32, num_experts=4, num_experts_per_tok=2,
            moe_intermediate=64, dense_intermediate=128, num_dense_layers=1,
            max_position=128, dtype=jnp.float32, **kw,
        )


def init_weights(cfg: DeepseekConfig, key):
    h = cfg.hidden_size
    nh, dn, dv = cfg.num_heads, cfg.qk_nope_dim, cfg.v_head_dim
    l = cfg.num_layers
    ks = iter(jax.random.split(key, 24))

    def w(shape, scale=None):
        scale = scale if scale is not None else (1.0 / (shape[-1] ** 0.5))
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(cfg.dtype)

    layers = {
        "input_norm": jnp.ones((l, h), cfg.dtype),
        "post_norm": jnp.ones((l, h), cfg.dtype),
        "kv_norm": jnp.ones((l, D_LATENT), cfg.dtype),
        # kv down-projection to latent + shared rope key
        "wkv_a": w((l, D_LATENT + D_ROPE, h)),
        # absorption matrices
        "w_uk": w((l, nh, dn, D_LATENT)),  # q_nope -> latent
        "w_uv": w((l, nh, D_LATENT, dv)),  # attn latent -> per-head value
        "wo": w((l, h, nh * dv)),
        # dense MLP (used for layers < num_dense_layers)
        "gate": w((l, cfg.dense_intermediate, h)),
        "up": w((l, cfg.dense_intermediate, h)),
        "down": w((l, h, cfg.dense_intermediate)),
        # MoE
        "router": w((l, cfg.num_experts, h), 0.02),
        "router_bias": jnp.zeros((l, cfg.num_experts), jnp.float32),
        "moe_w1": w((l, cfg.num_experts, h, 2 * cfg.moe_intermediate)),
        "moe_w2": w((l, cfg.num_experts, cfg.moe_intermediate, h)),
        # shared expert (DSv3 has one shared expert alongside routed ones)
        "shared_gate": w((l, cfg.moe_intermediate, h)),
        "shared_up": w((l, cfg.moe_intermediate, h)),
        "shared_down": w((l, h, cfg.moe_intermediate)),
    }
    if cfg.q_lora_rank:
        r = cfg.q_lora_rank
        layers.update({
            "wq_a": w((l, r, h)),
            "q_a_norm": jnp.ones((l, r), cfg.dtype),
            "wq_b": w((l, nh * (dn + D_ROPE), r)),
        })
    else:
        # q projection: per head nope + rope parts (V2-Lite direct layout)
        layers["wq"] = w((l, nh * (dn + D_ROPE), h))
    if cfg.nsa:
        # with q-LoRA the indexer q projects from the shared q latent c_q
        # (real DSv3.2 indexer.wq_b input), else from the hidden state
        idx_in = cfg.q_lora_rank or h
        layers.update({
            "wq_idx": w((l, cfg.idx_heads * cfg.idx_dim, idx_in)),
            "wk_idx": w((l, cfg.idx_dim, h)),
            "idx_norm": jnp.ones((l, cfg.idx_dim), cfg.dtype),
            "w_idx_gate": w((l, cfg.idx_heads, h), 0.02),
        })
    if cfg.compress:
        wlen = _comp_window(cfg)
        layers.update({
            # per-token score row (same width as the latent row; the
            # reference compress kernels take kv+scores side by side)
            "comp_score": w((l, D_CKV, h), 0.02),
            # additive positional embedding over the pooled window
            "comp_ape": w((l, wlen, D_CKV), 0.02).astype(jnp.float32),
        })
    lm_head = w((cfg.vocab_size, h))
    if cfg.quant == "w4a16":
        from ..ops.gemm.w4a16 import quantize_w4

        def qz(wm):  # [L, N, K] stacked linear
            pk, sc = jax.vmap(lambda m: quantize_w4(m, group_size=cfg.group_size)[:2])(wm)
            return {"packed": pk, "scales": sc}

        def qexp(w_le):  # [L, E, K, N] expert banks (x @ W convention)
            q = jax.vmap(jax.vmap(lambda m: quantize_w4(m.T, group_size=cfg.group_size)[:2]))
            pk, sc = q(w_le)
            return {"packed": pk, "scales": sc}

        qnames = ["wkv_a", "wo", "gate", "up", "down",
                  "shared_gate", "shared_up", "shared_down"]
        qnames += ["wq_a", "wq_b"] if cfg.q_lora_rank else ["wq"]
        if cfg.compress:
            qnames.append("comp_score")
        for name in qnames:
            layers[name] = qz(layers[name])
        layers["moe_w1"] = qexp(layers["moe_w1"])
        layers["moe_w2"] = qexp(layers["moe_w2"])
        from .llama import _quantize_matrix

        lm_head = _quantize_matrix(lm_head, cfg)
    return {
        "embed": w((cfg.vocab_size, h), 0.02),
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": lm_head,
        "layers": layers,
    }


def make_cache(cfg: DeepseekConfig, num_pages: int, page_size: int, kv_dtype=None):
    """Latent KV cache [L, P, page, 576] — single pool (MLA)."""
    dt = kv_dtype or cfg.kv_dtype or cfg.dtype
    assert not (dt == jnp.int8 and cfg.kv_scale is None), (
        "int8 latent pools require cfg.kv_scale — without it the store's "
        "astype truncates the bf16 latent to {-1, 0, 1} codes silently")
    return jnp.zeros((cfg.num_layers, num_pages, page_size, D_CKV), dt)


def _lin(x, w, cfg, lidx=None):
    """Linear with optional W4A16 packing; quantized stacked weights ride
    the layer_id scalar prefetch (models/llama._linear pattern)."""
    if isinstance(w, dict):
        from ..ops.gemm.w4a16 import w4a16_gemm

        return w4a16_gemm(x, w["packed"], w["scales"], layer_id=lidx,
                          group_size=cfg.group_size, out_dtype=cfg.dtype)
    if lidx is not None:
        w = w[lidx]
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(cfg.dtype)


def _silu_mlp(x, gate_w, up_w, down_w, cfg, lidx=None):
    g = _lin(x, gate_w, cfg, lidx).astype(jnp.float32)
    u = _lin(x, up_w, cfg, lidx).astype(jnp.float32)
    a = (g * jax.nn.sigmoid(g) * u).astype(cfg.dtype)
    return _lin(a, down_w, cfg, lidx)


def _maybe_psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _moe_block(x, weights, lidx, cfg, tp_axis=None):
    tw, tids = biased_topk(
        jnp.dot(x.astype(jnp.float32), weights["router"][lidx].astype(jnp.float32).T),
        weights["router_bias"][lidx],
        cfg.num_experts_per_tok,
        renormalize=True,
        routed_scaling_factor=cfg.routed_scaling_factor,
        apply_routed_scaling_factor_on_output=True,
    )
    w1, w2 = weights["moe_w1"], weights["moe_w2"]
    if tp_axis is not None:
        # TP/EP: tokens replicated across tp, experts sharded — each shard
        # evaluates only pairs routed to its local expert range, partials
        # psum (the TP-MoE formulation; tokens are NOT tp-sharded here, so
        # the all-to-all dispatch variant does not apply)
        ep = jax.lax.psum(1, tp_axis)
        rank = jax.lax.axis_index(tp_axis)
        e_local = cfg.num_experts // ep
        local = tids - rank * e_local
        in_range = (local >= 0) & (local < e_local)
        tids = jnp.where(in_range, local, 0)
        tw = jnp.where(in_range, tw, 0.0)
    # alignment block size by mean rows/expert (ops/moe/align.pick_block_size):
    # decode-class steps get tiny blocks (small cap -> small glue, mostly-
    # valid blocks), dense prefill gets bm=128 for full MXU sublane width
    bs = pick_block_size(x.shape[0], tids.shape[1], cfg.num_experts)
    if isinstance(w1, dict):
        # stacked quantized banks: layer selected by scalar prefetch inside
        # the grouped kernel (slicing [lidx] would copy the bank per step)
        mw = MoeWeights(w1=w1["packed"], w2=w2["packed"],
                        w1_scales=w1["scales"], w2_scales=w2["scales"],
                        fmt="int4", group_size=cfg.group_size)
        routed = fused_experts(x, mw, tw, tids, layer_id=lidx, block_size=bs)
    else:
        mw = MoeWeights(w1=w1, w2=w2, fmt="bf16")
        routed = fused_experts(x, mw, tw, tids, layer_id=lidx, block_size=bs)
    shared = _silu_mlp(x, weights["shared_gate"], weights["shared_up"], weights["shared_down"], cfg, lidx)
    # one combined psum covers the routed partials AND the tp-sharded
    # shared-expert/dense intermediates
    return _maybe_psum(routed + shared, tp_axis)


def _q_proj(x, weights, lidx, cfg):
    """q projection: direct (wq) or low-rank (wq_a -> q_a_norm -> wq_b,
    real V3/R1 layout). Returns (q [T, nh*(dn+64)], c_q or None) — c_q is
    the shared q latent the DSv3.2 NSA indexer also projects from."""
    if cfg.q_lora_rank:
        c_q = rmsnorm(_lin(x, weights["wq_a"], cfg, lidx),
                      weights["q_a_norm"][lidx], cfg.rms_eps)
        return _lin(c_q, weights["wq_b"], cfg, lidx), c_q
    return _lin(x, weights["wq"], cfg, lidx), None


def _mla_qkv_full(x, weights, lidx, cfg, n_tokens, positions, rope_cache):
    """Project to (q_nope_latent [T, H, 512], q_pe [T, H, 64], kv_row
    [T, 576], c_q [T, rank] or None)."""
    nh, dn = cfg.num_heads, cfg.qk_nope_dim
    q, c_q = _q_proj(x, weights, lidx, cfg)
    q = q.reshape(n_tokens, nh, dn + D_ROPE)
    kv = _lin(x, weights["wkv_a"], cfg, lidx)
    if n_tokens <= 64:
        # decode bucket: ONE Pallas call for the whole qkv-prep glue chain
        # (nope/pe splits, both rope fusions, latent rmsnorm, kv_row
        # concat — each a standalone XLA kernel otherwise; docs/PERF.md)
        from ..ops.rope import mla_qkv_prep

        q_nope, q_pe, kv_row = mla_qkv_prep(
            positions, lidx, q, kv, weights["kv_norm"], rope_cache,
            nope_dim=dn, eps=cfg.rms_eps)
    else:
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        q_pe, _ = rotary_embedding(positions, q_pe, None, D_ROPE, rope_cache)
        kv_c = rmsnorm(kv[:, :D_LATENT], weights["kv_norm"][lidx], cfg.rms_eps)
        k_pe = kv[:, D_LATENT:]
        k_pe, _ = rotary_embedding(positions, k_pe[:, None, :], None, D_ROPE, rope_cache)
        kv_row = jnp.concatenate([kv_c, k_pe[:, 0]], axis=-1)  # [T, 576]
    # absorb W_UK: [T, H, dn] x [H, dn, 512] -> [T, H, 512]
    w_uk = weights["w_uk"][lidx]
    q_lat = jnp.einsum("thd,hdl->thl", q_nope.astype(jnp.float32), w_uk.astype(jnp.float32)).astype(cfg.dtype)
    return q_lat, q_pe, kv_row, c_q


def _mla_qkv(x, weights, lidx, cfg, n_tokens, positions, rope_cache):
    return _mla_qkv_full(x, weights, lidx, cfg, n_tokens, positions, rope_cache)[:3]


def _mla_out(attn_lat, weights, lidx, cfg, n_tokens):
    """attn_lat [T, H, 512] -> hidden via W_UV absorption + o proj."""
    w_uv = weights["w_uv"][lidx]
    o = jnp.einsum("thl,hlv->thv", attn_lat.astype(jnp.float32), w_uv.astype(jnp.float32))
    o = o.reshape(n_tokens, -1).astype(cfg.dtype)
    return _lin(o, weights["wo"], cfg, lidx)


def _sm_scale(cfg):
    return 1.0 / ((cfg.qk_nope_dim + D_ROPE) ** 0.5)


def _lat_quant(cfg, kv_row):
    """Fresh latent row -> pool representation (see cfg.kv_scale)."""
    if cfg.kv_scale is None:
        return kv_row
    y = kv_row.astype(jnp.float32) * (1.0 / cfg.kv_scale)
    if cfg.kv_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(cfg.kv_dtype)


def _lat_sm(cfg):
    """sm_scale for POOL reads: the latent quant scale folds into the
    logit scale (pool rows hold kv/s, so logits pick up a factor s)."""
    return _sm_scale(cfg) * (cfg.kv_scale if cfg.kv_scale is not None else 1.0)


def _lat_rescale(cfg, attn):
    """Output-side fold for POOL reads: attn latents are p @ (kv/s)."""
    if cfg.kv_scale is None:
        return attn
    return attn * jnp.asarray(cfg.kv_scale, attn.dtype)


def _lat_deq(cfg, rows, dtype):
    """Dequantize gathered pool rows to the compute dtype."""
    rows = rows.astype(dtype)
    return rows if cfg.kv_scale is None else rows * jnp.asarray(cfg.kv_scale, dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2,))
def decode_step(params, cfg: DeepseekConfig, kv_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache, *, tp_axis=None):
    """One decode step: tokens [B]; kv_cache [L, P, page, 576].

    tp_axis: inside shard_map, heads (wq/w_uk/w_uv/wo rows) and the MoE
    expert range are per-shard LOCAL (cfg already divided); the latent
    pool is REPLICATED over tp (MLA has one shared latent head — the
    standard MLA-TP tradeoff); o-proj partials and MoE/shared/dense
    partials psum over tp."""
    b = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, cache = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b, positions, rope_cache)
        # stacked pool stays whole: scatter at layer-offset slots and let the
        # kernel select the layer via scalar-prefetched layer_id (a sliced
        # Pallas operand would be a materialized per-layer pool copy)
        l, np_, pg, dd = cache.shape
        off_slots = jnp.where(slot_loc >= 0, lidx * np_ * pg + slot_loc, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        attn = _lat_rescale(cfg, mla_decode(q_lat, q_pe, cache, lengths, page_tables, layer_id=lidx, sm_scale=_lat_sm(cfg)))
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, cache), None

    (x, kv_cache), _ = jax.lax.scan(layer_fn, (x, kv_cache), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _lin(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2,))
def prefill(params, cfg: DeepseekConfig, kv_cache, tokens, positions, q_lens, slot_loc, rope_cache, *, tp_axis=None):
    """Prefill padded batch [B, S]; causal MLA over the fresh latent rows.
    tp_axis: shard_map TP (see decode_step)."""
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]

    def layer_fn(carry, lidx):
        x, cache = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b * s, positions.reshape(-1), rope_cache)
        l, np_, pg, dd = cache.shape
        sl = slot_loc.reshape(-1)
        off_slots = jnp.where(sl >= 0, lidx * np_ * pg + sl, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        attn = mla_prefill(
            q_lat.reshape(b, s, cfg.num_heads, D_LATENT),
            q_pe.reshape(b, s, cfg.num_heads, D_ROPE),
            kv_row.reshape(b, s, D_CKV),
            q_lens, q_lens, sm_scale=_sm_scale(cfg),
        ).reshape(b * s, cfg.num_heads, D_LATENT)
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b * s), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, cache), None

    (x, kv_cache), _ = jax.lax.scan(layer_fn, (x, kv_cache), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache


def build_rope_cache(cfg: DeepseekConfig):
    return compute_cos_sin_cache(D_ROPE, cfg.max_position, cfg.rope_theta)


def _mla_attend_packed(q_lat, q_pe, kv_row, blk_seq, blk_q0, seq_meta, cfg,
                       tp, max_kvb):
    """Packed MLA self-attention: 1-head MQA over the block-aligned packed
    latent rows (ops/attention/flash_packed.py), latent doubles as V."""
    from ..ops.attention import flash_attention_packed

    q = jnp.concatenate(
        [q_lat.reshape(tp, cfg.num_heads, D_LATENT),
         q_pe.reshape(tp, cfg.num_heads, D_ROPE)], axis=-1)
    kv = kv_row.reshape(tp, 1, D_CKV)
    v = jnp.pad(kv[..., :D_LATENT], ((0, 0), (0, 0), (0, D_ROPE)))
    out = flash_attention_packed(
        q, kv.astype(q.dtype), v.astype(q.dtype), blk_seq, blk_q0, seq_meta,
        max_kvb=max_kvb, causal=True, sm_scale=_sm_scale(cfg),
    )
    return out[..., :D_LATENT]


@functools.partial(jax.jit, static_argnames=("cfg", "max_kvb", "with_indexer"), donate_argnums=(2, 3, 4))
def prefill_packed(params, cfg: DeepseekConfig, kv_cache, idx_k, idx_s,
                   tokens, positions, blk_seq, blk_q0, seq_meta, last_idx,
                   slot_loc, rope_cache, *, max_kvb: int,
                   with_indexer: bool = False, idx_rope_cache=None):
    """Token-packed multi-prompt MLA prefill (models/llama.prefill_packed
    analog): several prompts block-aligned packed into one launch. With
    ``with_indexer`` the NSA fp8 indexer keys are ingested per token too
    (idx_caches = (idx_k, idx_s)). Returns (logits [B, V], kv_cache
    [, idx_k, idx_s])."""
    tp = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    pool_tokens = np_ * pg

    def layer_fn(carry, lidx):
        if with_indexer:
            x, cache, ik, isc = carry
        else:
            x, cache = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, tp, positions, rope_cache)
        off_slots = jnp.where(slot_loc >= 0, lidx * pool_tokens + slot_loc, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        if with_indexer:
            ik, isc = _indexer_ingest(h, lw, lidx, cfg, positions, slot_loc,
                                      ik, isc, idx_rope_cache, pool_tokens)
        attn = _mla_attend_packed(q_lat, q_pe, kv_row, blk_seq, blk_q0,
                                  seq_meta, cfg, tp, max_kvb)
        x = x + _mla_out(attn.reshape(tp, cfg.num_heads, D_LATENT), lw, lidx, cfg, tp)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx),
            lambda h2: _moe_block(h2, lw, lidx, cfg),
            h2,
        )
        out = (x + mlp, cache, ik, isc) if with_indexer else (x + mlp, cache)
        return out, None

    init = (x, kv_cache, idx_k, idx_s) if with_indexer else (x, kv_cache)
    carry, _ = jax.lax.scan(layer_fn, init, jnp.arange(cfg.num_layers))
    x = carry[0]
    kv_cache = carry[1]
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x_last = x[last_idx]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    if with_indexer:
        return logits, kv_cache, carry[2], carry[3]
    return logits, kv_cache


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max", "tp_axis", "num_logits"), donate_argnums=(2,))
def prefill_extend(params, cfg: DeepseekConfig, kv_cache, tokens, positions,
                   q_lens, kv_lens, page_tables, slot_loc, rope_cache, *,
                   prefix_max: int, tp_axis=None, num_logits: int = 1):
    """Chunked/extend MLA prefill: the q tokens are the suffix of sequences
    whose prefix LATENTS already live in the paged cache (radix prefix
    reuse / chunked prompt ingestion). Two-pass design as the GQA analog
    (models/llama.prefill_extend; reference flash_attention.cpp:1207-1325):
    pass 1 attends causally over the fresh chunk latents at global offsets,
    pass 2 attends fully over the gathered prefix latents, merge_state
    combines via the base-2 lse.

    tokens/positions/slot_loc [B, S]; q_lens [B] chunk lengths; kv_lens [B]
    total lengths; page_tables [B, max_pages]; kv_cache [L, P, page, 576].
    """
    from ..ops.attention.merge_state import merge_state

    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    prefix_lens = kv_lens - q_lens  # [B]
    pos_idx = jnp.arange(prefix_max)
    page_sz = kv_cache.shape[-2]
    pre_slots = (
        page_tables[:, pos_idx // page_sz] * page_sz + (pos_idx % page_sz)[None, :]
    )  # [B, prefix_max]

    def layer_fn(carry, lidx):
        x, cache = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b * s, positions.reshape(-1), rope_cache)
        l, np_, pg, dd = cache.shape
        sl = slot_loc.reshape(-1)
        off_slots = jnp.where(sl >= 0, lidx * np_ * pg + sl, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        qn = q_lat.reshape(b, s, cfg.num_heads, D_LATENT)
        qp = q_pe.reshape(b, s, cfg.num_heads, D_ROPE)
        # pass 1: fresh chunk latents, causal at global offsets
        o1, l1 = mla_prefill(
            qn, qp, kv_row.reshape(b, s, D_CKV), q_lens, q_lens,
            q_start=prefix_lens, kv_start=prefix_lens,
            sm_scale=_sm_scale(cfg), return_lse=True,
        )
        # pass 2: cached prefix latents, fully visible (length-masked)
        pid = pre_slots // pg
        off = pre_slots % pg
        kv_pre = cache[lidx, pid, off]  # [B, prefix_max, 576]
        o2, l2 = mla_prefill(
            qn, qp, _lat_deq(cfg, kv_pre, qn.dtype), q_lens, prefix_lens,
            q_start=prefix_lens, kv_start=jnp.zeros_like(prefix_lens),
            sm_scale=_sm_scale(cfg), return_lse=True,
        )
        om, _ = merge_state(
            o1.reshape(b * s, cfg.num_heads, D_LATENT),
            jnp.swapaxes(l1, 1, 2).reshape(b * s, cfg.num_heads),
            o2.reshape(b * s, cfg.num_heads, D_LATENT),
            jnp.swapaxes(l2, 1, 2).reshape(b * s, cfg.num_heads),
        )
        attn = om.reshape(b * s, cfg.num_heads, D_LATENT)
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b * s), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx),
            lambda h2: _moe_block(h2, lw, lidx, cfg),
            h2,
        )
        return (x + mlp, cache), None

    (x, kv_cache), _ = jax.lax.scan(layer_fn, (x, kv_cache), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    if num_logits == 1:
        last = jnp.clip(q_lens - 1, 0, s - 1)
        x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
        return logits, kv_cache
    # last num_logits positions per sequence (speculative chain verify)
    n = num_logits
    idx = jnp.clip(q_lens[:, None] - n + jnp.arange(n)[None, :], 0, s - 1)
    x_sel = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    logits = _lin(x_sel.reshape(b * n, -1), params["lm_head"], cfg).astype(jnp.float32)
    return logits[:, : cfg.vocab_size].reshape(b, n, -1), kv_cache


# ---------------------------------------------------------------------------
# DSv4 NSA sparse decode (fp8 indexer -> fast_topk -> sparse MLA gather)
# ---------------------------------------------------------------------------


def make_indexer_cache(cfg: DeepseekConfig, num_pages: int, page_size: int):
    """fp8 indexer K pool + per-token f32 descale, flat layer-stacked
    ([L*P*page, idx_dim] / [L*P*page]) — the reference packs the fp8 row
    and scale into one 132-byte slot (nsa.py:159); two aligned pools is
    the TPU-native split."""
    s = cfg.num_layers * num_pages * page_size
    return (
        jnp.zeros((s, cfg.idx_dim), jnp.float8_e4m3fn),
        jnp.zeros((s,), jnp.float32),
    )


def build_idx_rope_cache(cfg: DeepseekConfig):
    return compute_cos_sin_cache(cfg.idx_dim, cfg.max_position, cfg.rope_theta)


def _indexer_ingest(h, lw, lidx, cfg, positions, slot_loc, idx_k, idx_s,
                    idx_rope, pool_tokens):
    """Project h to the indexer key and scatter (norm+rope+hadamard+fp8)."""
    from ..ops.attention.nsa import fused_k_indexer_norm_rope_quant_store

    k_i = jnp.dot(h, lw["wk_idx"][lidx].T, preferred_element_type=jnp.float32).astype(cfg.dtype)
    off = jnp.where(slot_loc >= 0, lidx * pool_tokens + slot_loc, -1)
    return fused_k_indexer_norm_rope_quant_store(
        k_i, positions, idx_rope, lw["idx_norm"][lidx], idx_k, idx_s, off,
        eps=cfg.rms_eps,
    )


def _indexer_select(h, h_q, lw, lidx, cfg, positions, lengths, page_tables,
                    idx_k, idx_s, idx_rope, num_pages, page_size):
    """Score the cached tokens with the fp8 indexer and return the
    top-`index_topk` flat LATENT-pool slots (layer-local). ``h_q`` is the
    indexer-q projection input: the shared q latent c_q under q-LoRA
    (real DSv3.2 indexer.wq_b), else the hidden state; the head-gate
    projection always reads the hidden state (indexer.weights_proj)."""
    from ..ops.attention.nsa import (
        fast_topk_transform_fused,
        fp8_paged_mqa_logits,
        fused_q_indexer_rope_hadamard_quant,
    )

    b = h.shape[0]
    q_i = jnp.dot(h_q, lw["wq_idx"][lidx].T, preferred_element_type=jnp.float32)
    q_i = q_i.reshape(b, cfg.idx_heads, cfg.idx_dim).astype(cfg.dtype)
    q8, qs = fused_q_indexer_rope_hadamard_quant(q_i, positions, idx_rope)
    q_deq = q8.astype(jnp.bfloat16) * qs.astype(jnp.bfloat16)  # MXU-native
    gate = jax.nn.sigmoid(
        jnp.dot(h.astype(jnp.float32), lw["w_idx_gate"][lidx].astype(jnp.float32).T)
    )  # [B, Hi]
    # full stacked pool + layer-offset page ids: no per-layer pool slice
    kv_pages = idx_k.reshape(cfg.num_layers * num_pages, page_size, cfg.idx_dim)
    kv_scales = idx_s.reshape(cfg.num_layers * num_pages, page_size)
    pt_off = page_tables + lidx * num_pages
    logits = fp8_paged_mqa_logits(q_deq, kv_pages, gate, lengths, pt_off, kv_scales)
    return fast_topk_transform_fused(
        logits, lengths, page_tables, page_size, topk=cfg.index_topk
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3, 4))
def decode_step_nsa(params, cfg: DeepseekConfig, kv_cache, idx_k, idx_s,
                    tokens, positions, page_tables, lengths, slot_loc,
                    rope_cache, idx_rope_cache, *, tp_axis=None):
    """NSA decode step: per layer, the fp8 indexer scores every cached
    token (streaming Pallas kernel), fast_topk picks ``index_topk`` tokens,
    and sparse MLA attends only to the gathered latent rows — O(topk)
    attention instead of O(ctx) (reference DSv4 pipeline:
    fp8_paged_mqa_logits -> fast_topk_transform -> flash_mla_sparse_decode,
    sgl_flash_kernel_ops.h:96-139). Prefill stays dense (prefill_nsa
    ingests the indexer keys)."""
    from ..ops.attention.nsa import sparse_mla_decode

    b = tokens.shape[0]
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    pool_tokens = np_ * pg

    def layer_fn(carry, lidx):
        x, cache, ik, isc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row, c_q = _mla_qkv_full(h, lw, lidx, cfg, b, positions, rope_cache)
        off_slots = jnp.where(slot_loc >= 0, lidx * pool_tokens + slot_loc, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        ik, isc = _indexer_ingest(h, lw, lidx, cfg, positions, slot_loc, ik, isc,
                                  idx_rope_cache, pool_tokens)
        slots = _indexer_select(h, c_q if c_q is not None else h, lw, lidx, cfg,
                                positions, lengths, page_tables,
                                ik, isc, idx_rope_cache, np_, pg)
        slots_off = jnp.where(slots >= 0, lidx * pool_tokens + slots, -1)
        attn = _lat_rescale(cfg, sparse_mla_decode(
            q_lat, q_pe, cache.reshape(l * pool_tokens, dd), slots_off,
            sm_scale=_lat_sm(cfg),
        ))
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, cache, ik, isc), None

    (x, kv_cache, idx_k, idx_s), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, idx_k, idx_s), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _lin(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, idx_k, idx_s


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3, 4))
def prefill_nsa(params, cfg: DeepseekConfig, kv_cache, idx_k, idx_s, tokens,
                positions, q_lens, slot_loc, rope_cache, idx_rope_cache, *, tp_axis=None):
    """Dense causal prefill that ALSO ingests the per-layer indexer keys so
    subsequent decode_step_nsa steps can score the full history."""
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    pool_tokens = np_ * pg

    def layer_fn(carry, lidx):
        x, cache, ik, isc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b * s, positions.reshape(-1), rope_cache)
        sl = slot_loc.reshape(-1)
        off_slots = jnp.where(sl >= 0, lidx * pool_tokens + sl, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        ik, isc = _indexer_ingest(h, lw, lidx, cfg, positions.reshape(-1), sl,
                                  ik, isc, idx_rope_cache, pool_tokens)
        attn = mla_prefill(
            q_lat.reshape(b, s, cfg.num_heads, D_LATENT),
            q_pe.reshape(b, s, cfg.num_heads, D_ROPE),
            kv_row.reshape(b, s, D_CKV),
            q_lens, q_lens, sm_scale=_sm_scale(cfg),
        ).reshape(b * s, cfg.num_heads, D_LATENT)
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b * s), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, cache, ik, isc), None

    (x, kv_cache, idx_k, idx_s), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, idx_k, idx_s), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, idx_k, idx_s


@functools.partial(jax.jit, static_argnames=("cfg", "prefix_max", "tp_axis"), donate_argnums=(2, 3, 4))
def prefill_extend_nsa(params, cfg: DeepseekConfig, kv_cache, idx_k, idx_s,
                       tokens, positions, q_lens, kv_lens, page_tables,
                       slot_loc, rope_cache, idx_rope_cache, *,
                       prefix_max: int, tp_axis=None):
    """Chunked/extend NSA prefill: the dense two-pass MLA extend
    (prefill_extend) plus per-chunk indexer-key ingest, so later
    decode_step_nsa steps can score the whole history. Indexer ingest is
    per-token (no history dependence), so the chunk path only adds the
    fused norm+rope+hadamard+fp8 scatter per layer."""
    b, s = tokens.shape
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    from ..ops.attention.merge_state import merge_state

    prefix_lens = kv_lens - q_lens
    pos_idx = jnp.arange(prefix_max)
    l, np_, pg, dd = kv_cache.shape
    pool_tokens = np_ * pg
    pre_slots = (
        page_tables[:, pos_idx // pg] * pg + (pos_idx % pg)[None, :]
    )

    def layer_fn(carry, lidx):
        x, cache, ik, isc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b * s, positions.reshape(-1), rope_cache)
        sl = slot_loc.reshape(-1)
        off_slots = jnp.where(sl >= 0, lidx * pool_tokens + sl, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        ik, isc = _indexer_ingest(h, lw, lidx, cfg, positions.reshape(-1), sl,
                                  ik, isc, idx_rope_cache, pool_tokens)
        qn = q_lat.reshape(b, s, cfg.num_heads, D_LATENT)
        qp = q_pe.reshape(b, s, cfg.num_heads, D_ROPE)
        o1, l1 = mla_prefill(
            qn, qp, kv_row.reshape(b, s, D_CKV), q_lens, q_lens,
            q_start=prefix_lens, kv_start=prefix_lens,
            sm_scale=_sm_scale(cfg), return_lse=True,
        )
        pid = pre_slots // pg
        off = pre_slots % pg
        kv_pre = cache[lidx, pid, off]
        o2, l2 = mla_prefill(
            qn, qp, _lat_deq(cfg, kv_pre, qn.dtype), q_lens, prefix_lens,
            q_start=prefix_lens, kv_start=jnp.zeros_like(prefix_lens),
            sm_scale=_sm_scale(cfg), return_lse=True,
        )
        om, _ = merge_state(
            o1.reshape(b * s, cfg.num_heads, D_LATENT),
            jnp.swapaxes(l1, 1, 2).reshape(b * s, cfg.num_heads),
            o2.reshape(b * s, cfg.num_heads, D_LATENT),
            jnp.swapaxes(l2, 1, 2).reshape(b * s, cfg.num_heads),
        )
        x = x + _maybe_psum(_mla_out(om.reshape(b * s, cfg.num_heads, D_LATENT), lw, lidx, cfg, b * s), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, cache, ik, isc), None

    (x, kv_cache, idx_k, idx_s), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, idx_k, idx_s), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, idx_k, idx_s


# ---------------------------------------------------------------------------
# DSv4 KV compression consumption ("flash compress" serving integration).
#
# Reference surface: CompressPlan.cpp (plans), FlashCompress{4,128}.cpp
# (ring-buffer cache rewrite) — the reference ships only the data plane;
# the consuming attention lives SGLang-side. Here the full loop is native:
# prefill runs EXACT attention, stores latent + score rows, and builds the
# per-layer compressed ring (plan_compress_prefill + compress_window);
# decode attends over [live ring tokens] + [last compress_local
# uncompressed tokens] and combines the two partial states via
# merge_state — KV reads per step are bounded by ring + local instead of
# the context length.
# ---------------------------------------------------------------------------


def _comp_ratio(cfg):
    return 4 if cfg.compress == "c4" else 128


def _comp_window(cfg):
    r = _comp_ratio(cfg)
    return 2 * r if r == 4 else r


def _comp_local(cfg):
    r = _comp_ratio(cfg)
    local = cfg.compress_local if cfg.compress_local is not None else max(64, r)
    assert local >= r, (
        f"compress_local={local} < ratio {r}: tokens older than the local "
        "window but not yet pooled would be attended by NEITHER branch")
    return local


def make_compress_caches(cfg: DeepseekConfig, num_pages: int, page_size: int, max_slots: int = 16):
    """(latent pool, score pool, comp ring pool [L, S, ring, 576])."""
    kv = make_cache(cfg, num_pages, page_size)
    sc = jnp.zeros((cfg.num_layers, num_pages, page_size, D_CKV), cfg.dtype)
    comp = jnp.zeros((cfg.num_layers, max_slots, cfg.compress_ring, D_CKV), cfg.dtype)
    return kv, sc, comp


_LOG2E = 1.4426950408889634


def _dense_mla_attend(q_lat, q_pe, rows, mask, scale):
    """Dense masked MLA attention over gathered latent rows.

    q_lat [B, H, 512]; q_pe [B, H, 64]; rows [B, K, 576]; mask [B, K].
    Returns (o [B, H, 512] f32, lse [B, H] base-2, matching merge_state).
    An all-masked row yields (0, -inf) — merge_state treats that branch
    as weightless when the other side is finite.
    """
    q = jnp.concatenate([q_lat, q_pe], axis=-1).astype(jnp.float32)
    r = rows.astype(jnp.float32)
    s2 = jnp.einsum("bhd,bkd->bhk", q, r) * (scale * _LOG2E)
    s2 = jnp.where(mask[:, None, :], s2, -jnp.inf)
    m = jnp.max(s2, axis=-1)  # [B, H]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(mask[:, None, :], jnp.exp2(s2 - m_safe[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhk,bkd->bhd", p, r[..., :D_LATENT]) / jnp.maximum(l, 1e-30)[..., None]
    lse = jnp.where(l > 0, m_safe + jnp.log2(jnp.maximum(l, 1e-30)), -jnp.inf)
    return o, lse


def _comp_flat_rows(comp_cache):
    l, s, ring, d = comp_cache.shape
    return comp_cache.reshape(l * s * ring, d)


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3, 4))
def decode_step_c(params, cfg: DeepseekConfig, kv_cache, score_cache, comp_cache,
                  tokens, positions, page_tables, lengths, slot_loc, state_slots,
                  rope_cache, *, tp_axis=None):
    """Compressed-KV decode step.

    kv_cache/score_cache [L, P, page, 576]; comp_cache [L, S, ring, 576]
    with per-request ring rows selected by ``state_slots`` [B] (the
    engine's recurrent-state slot machinery). ``lengths`` includes the
    fresh token. Per layer: store latent+score rows, fire the compress
    event when the length crosses a ratio multiple (plan_compress_decode
    semantics), then attend [ring ∪ last compress_local tokens] and merge.
    """
    assert cfg.kv_scale is None, (
        "kv_scale applies to the dense/NSA latent pools; the compress family's"
        " pooled rings keep unscaled latents")
    from ..ops.attention.merge_state import merge_state
    from ..ops.compression import compress_window, plan_compress_decode

    b = tokens.shape[0]
    ratio = _comp_ratio(cfg)
    ring, local = cfg.compress_ring, _comp_local(cfg)
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    s_slots = comp_cache.shape[1]
    slots_r = jnp.asarray(state_slots, jnp.int32)

    src, dst, _ = plan_compress_decode(lengths, compress_ratio=ratio, ring_size=ring)
    any_event = jnp.any(dst >= 0)  # 1 step in `ratio` fires; skip the rest
    n_comp = jnp.minimum(lengths // ratio, ring)
    # local-window token positions + their flat pool rows (layer-offset added per layer)
    loc_pos = lengths[:, None] - local + jnp.arange(local)[None, :]  # [B, local]
    loc_valid = loc_pos >= 0
    safe_pos = jnp.where(loc_valid, loc_pos, 0)
    loc_flat0 = jnp.take_along_axis(page_tables, safe_pos // pg, axis=1) * pg + safe_pos % pg
    src_valid = src >= 0
    src_safe = jnp.where(src_valid, src, 0)
    src_flat0 = jnp.take_along_axis(page_tables, src_safe // pg, axis=1) * pg + src_safe % pg

    def layer_fn(carry, lidx):
        x, kvc, scc, comp = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b, positions, rope_cache)
        score_row = _lin(h, lw["comp_score"], cfg, lidx)
        off_slots = jnp.where(slot_loc >= 0, lidx * np_ * pg + slot_loc, -1)
        kvc = store_cache_mla(kv_row, kvc.reshape(l * np_, pg, dd), off_slots).reshape(kvc.shape)
        scc = store_cache_mla(score_row.astype(scc.dtype), scc.reshape(l * np_, pg, dd), off_slots).reshape(scc.shape)
        kv_flat = kvc.reshape(l * np_ * pg, dd)
        sc_flat = scc.reshape(l * np_ * pg, dd)

        # compress event: pool the window through the FLAT layer-offset view
        # (slicing kvc[lidx] inside the scan would copy the pool per step);
        # the whole block is cond-skipped on the ~(ratio-1)/ratio of steps
        # where no sequence crosses a ratio boundary
        def _fire(comp):
            win_kv = kv_flat[lidx * np_ * pg + src_flat0]  # [B, W, D]
            win_sc = sc_flat[lidx * np_ * pg + src_flat0].astype(jnp.float32)
            win_sc = jnp.where(src_valid[..., None], win_sc, -jnp.inf)
            pooled = compress_window(win_kv, win_sc, lw["comp_ape"][lidx]).astype(comp.dtype)
            rid = jnp.where(dst >= 0, lidx * s_slots * ring + slots_r * ring + dst, l * s_slots * ring)
            return _comp_flat_rows(comp).at[rid].set(pooled, mode="drop").reshape(comp.shape)

        comp = jax.lax.cond(any_event, _fire, lambda c: c, comp)

        # branch 1: recent uncompressed window
        loc_rows = kv_flat[lidx * np_ * pg + loc_flat0]
        o_loc, lse_loc = _dense_mla_attend(q_lat, q_pe, loc_rows, loc_valid, _sm_scale(cfg))
        # branch 2: live compressed ring tokens
        crid = lidx * s_slots * ring + slots_r[:, None] * ring + jnp.arange(ring)[None, :]
        comp_rows = _comp_flat_rows(comp)[crid]  # [B, ring, D]
        cmask = jnp.arange(ring)[None, :] < n_comp[:, None]
        o_c, lse_c = _dense_mla_attend(q_lat, q_pe, comp_rows, cmask, _sm_scale(cfg))
        attn, _ = merge_state(o_loc, lse_loc, o_c, lse_c)

        x = x + _maybe_psum(_mla_out(attn.astype(cfg.dtype), lw, lidx, cfg, b), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, kvc, scc, comp), None

    (x, kv_cache, score_cache, comp_cache), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, score_cache, comp_cache), jnp.arange(cfg.num_layers))
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _lin(x, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, score_cache, comp_cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"), donate_argnums=(2, 3, 4))
def prefill_c(params, cfg: DeepseekConfig, kv_cache, score_cache, comp_cache,
              tokens, positions, q_lens, slot_loc, state_slots, rope_cache, *,
              tp_axis=None):
    """Compressed-family prefill: EXACT causal attention over the prompt
    (compression only bounds decode reads), stores latent + score rows,
    then builds each layer's compressed ring for the prompt
    (plan_compress_prefill + compress_window over the stored windows)."""
    assert cfg.kv_scale is None, (
        "kv_scale applies to the dense/NSA latent pools; the compress family's"
        " pooled rings keep unscaled latents")
    from ..ops.compression import compress_window, plan_compress_prefill

    b, s = tokens.shape
    ratio = _comp_ratio(cfg)
    ring = cfg.compress_ring
    x = params["embed"][tokens.reshape(-1)].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    s_slots = comp_cache.shape[1]
    slots_r = jnp.asarray(state_slots, jnp.int32)

    def layer_fn(carry, lidx):
        x, kvc, scc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, b * s, positions.reshape(-1), rope_cache)
        score_row = _lin(h, lw["comp_score"], cfg, lidx)
        sl = slot_loc.reshape(-1)
        off_slots = jnp.where(sl >= 0, lidx * np_ * pg + sl, -1)
        kvc = store_cache_mla(kv_row, kvc.reshape(l * np_, pg, dd), off_slots).reshape(kvc.shape)
        scc = store_cache_mla(score_row.astype(scc.dtype), scc.reshape(l * np_, pg, dd), off_slots).reshape(scc.shape)
        attn = mla_prefill(
            q_lat.reshape(b, s, cfg.num_heads, D_LATENT),
            q_pe.reshape(b, s, cfg.num_heads, D_ROPE),
            kv_row.reshape(b, s, D_CKV),
            q_lens, q_lens, sm_scale=_sm_scale(cfg),
        ).reshape(b * s, cfg.num_heads, D_LATENT)
        x = x + _maybe_psum(_mla_out(attn, lw, lidx, cfg, b * s), tp_axis)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _maybe_psum(_silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx), tp_axis),
            lambda h2: _moe_block(h2, lw, lidx, cfg, tp_axis),
            h2,
        )
        return (x + mlp, kvc, scc), None

    (x, kv_cache, score_cache), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, score_cache), jnp.arange(cfg.num_layers))

    # ---- build the compressed rings: scan over ring events so the peak
    # gather is [L, B, W, D] per step, not an [L, B, ring, W, D] transient
    # (multi-GB at c128 real scale) ----
    src, dst, _ = plan_compress_prefill(q_lens, compress_ratio=ratio, ring_size=ring)
    valid = src >= 0  # [B, n_max, W]
    slot_of = jnp.take_along_axis(
        slot_loc, jnp.where(valid, src, 0).reshape(b, -1), axis=1).reshape(src.shape)
    kv_flat = kv_cache.reshape(l, np_ * pg, dd)
    sc_flat = score_cache.reshape(l, np_ * pg, dd)
    ape = params["layers"]["comp_ape"][:, None]  # [L, 1, W, D]
    lids = jnp.arange(l)[:, None]

    def ring_step(comp_flat, i):
        v_i = valid[:, i]  # [B, W]
        win_kv = kv_flat[:, slot_of[:, i]]  # [L, B, W, D]
        win_sc = sc_flat[:, slot_of[:, i]].astype(jnp.float32)
        win_sc = jnp.where(v_i[None, ..., None], win_sc, -jnp.inf)
        pooled = compress_window(win_kv, win_sc, ape).astype(comp_cache.dtype)  # [L, B, D]
        rid = jnp.where(
            (dst[:, i] >= 0)[None],
            lids * s_slots * ring + slots_r[None, :] * ring + jnp.maximum(dst[:, i], 0)[None],
            l * s_slots * ring,
        )
        return comp_flat.at[rid.reshape(-1)].set(pooled.reshape(-1, dd), mode="drop"), None

    comp_flat, _ = jax.lax.scan(ring_step, _comp_flat_rows(comp_cache), jnp.arange(dst.shape[1]))
    comp_cache = comp_flat.reshape(comp_cache.shape)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x = x.reshape(b, s, -1)
    last = jnp.clip(q_lens - 1, 0, s - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, score_cache, comp_cache


@functools.partial(jax.jit, static_argnames=("cfg", "max_kvb"), donate_argnums=(2, 3, 4))
def prefill_packed_c(params, cfg: DeepseekConfig, kv_cache, score_cache,
                     comp_cache, tokens, positions, blk_seq, blk_q0, seq_meta,
                     last_idx, slot_loc, state_slots, rope_cache, *, max_kvb: int):
    """Token-packed multi-prompt prefill for the compressed-KV family:
    the packed MLA prefill (exact attention) + per-token score-row stores,
    then each sequence's compressed ring built from the packed layout
    (sequence i's tokens start at packed index seq_kvblk0 * block — the
    engine lays blocks out contiguously, engine._prefill_packed_batch)."""
    assert cfg.kv_scale is None, (
        "kv_scale applies to the dense/NSA latent pools; the compress family's"
        " pooled rings keep unscaled latents")
    from ..ops.compression import compress_window, plan_compress_prefill

    tp = tokens.shape[0]
    ratio = _comp_ratio(cfg)
    ring = cfg.compress_ring
    x = params["embed"][tokens].astype(cfg.dtype)
    lw = params["layers"]
    l, np_, pg, dd = kv_cache.shape
    pool_tokens = np_ * pg
    s_slots = comp_cache.shape[1]
    slots_r = jnp.asarray(state_slots, jnp.int32)

    def layer_fn(carry, lidx):
        x, cache, scc = carry
        h = rmsnorm(x, lw["input_norm"][lidx], cfg.rms_eps)
        q_lat, q_pe, kv_row = _mla_qkv(h, lw, lidx, cfg, tp, positions, rope_cache)
        score_row = _lin(h, lw["comp_score"], cfg, lidx)
        off_slots = jnp.where(slot_loc >= 0, lidx * pool_tokens + slot_loc, -1)
        cache = store_cache_mla(_lat_quant(cfg, kv_row), cache.reshape(l * np_, pg, dd), off_slots).reshape(cache.shape)
        scc = store_cache_mla(score_row.astype(scc.dtype), scc.reshape(l * np_, pg, dd), off_slots).reshape(scc.shape)
        attn = _mla_attend_packed(q_lat, q_pe, kv_row, blk_seq, blk_q0,
                                  seq_meta, cfg, tp, max_kvb)
        x = x + _mla_out(attn.reshape(tp, cfg.num_heads, D_LATENT), lw, lidx, cfg, tp)
        h2 = rmsnorm(x, lw["post_norm"][lidx], cfg.rms_eps)
        is_dense = lidx < cfg.num_dense_layers
        mlp = jax.lax.cond(
            is_dense,
            lambda h2: _silu_mlp(h2, lw["gate"], lw["up"], lw["down"], cfg, lidx),
            lambda h2: _moe_block(h2, lw, lidx, cfg),
            h2,
        )
        return (x + mlp, cache, scc), None

    (x, kv_cache, score_cache), _ = jax.lax.scan(
        layer_fn, (x, kv_cache, score_cache), jnp.arange(cfg.num_layers))

    # ---- ring build from the packed layout (per-event scan, prefill_c) ----
    q_lens = seq_meta[:, 0]
    block = tp // blk_seq.shape[0]
    seq_q0 = seq_meta[:, 4] * block  # packed index of each sequence's first token
    src, dst, _ = plan_compress_prefill(q_lens, compress_ratio=ratio, ring_size=ring)
    valid = src >= 0  # [B, n_max, W]
    slot_of = slot_loc[seq_q0[:, None, None] + jnp.where(valid, src, 0)]
    kv_flat = kv_cache.reshape(l, pool_tokens, dd)
    sc_flat = score_cache.reshape(l, pool_tokens, dd)
    ape = params["layers"]["comp_ape"][:, None]  # [L, 1, W, D]
    lids = jnp.arange(l)[:, None]

    def ring_step(comp_flat, i):
        v_i = valid[:, i]
        win_kv = kv_flat[:, slot_of[:, i]]  # [L, B, W, D]
        win_sc = sc_flat[:, slot_of[:, i]].astype(jnp.float32)
        win_sc = jnp.where(v_i[None, ..., None], win_sc, -jnp.inf)
        pooled = compress_window(win_kv, win_sc, ape).astype(comp_cache.dtype)
        rid = jnp.where(
            (dst[:, i] >= 0)[None],
            lids * s_slots * ring + slots_r[None, :] * ring + jnp.maximum(dst[:, i], 0)[None],
            l * s_slots * ring,
        )
        return comp_flat.at[rid.reshape(-1)].set(pooled.reshape(-1, dd), mode="drop"), None

    comp_flat, _ = jax.lax.scan(ring_step, _comp_flat_rows(comp_cache), jnp.arange(dst.shape[1]))
    comp_cache = comp_flat.reshape(comp_cache.shape)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    x_last = x[last_idx]
    logits = _lin(x_last, params["lm_head"], cfg).astype(jnp.float32)[:, : cfg.vocab_size]
    return logits, kv_cache, score_cache, comp_cache
