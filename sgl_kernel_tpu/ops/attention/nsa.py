"""NSA / DSv3.2 sparse-attention indexer + sparse MLA.

TPU-native equivalents of the reference's sparse pipeline (SURVEY §5):
fp8 MQA logits (src/sycl/Fp8MqaLogitsXe20.cpp + python nsa.py), fast radix
top-k with fixed k=2048 (src/sycl/TopKTransform.cpp; python top_k.py:27-33),
and top-k-indexed sparse MLA attention (src/sycl/mla_sparse_decode.cpp).

Design follows the reference's own default: the 2-stage gather->dense
scheme (src/CMakeLists.txt:19-23 chooses gather as the default over the
fused single-pass variant) — XLA's native gather pulls the selected latent
rows at HBM speed, then dense attention runs over the gathered block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .mla import D_CKV, D_LATENT, D_ROPE

FAST_TOPK_K = 2048  # reference contract: fixed topk (top_k.py:27-33)


@functools.partial(jax.jit, static_argnames=("topk",))
def fp8_paged_mqa_logits(q, kv_pages, weights, lengths, page_table, *, topk: Optional[int] = None):
    """Indexer scoring: logits[b, t] = sum_h w[h] * relu(q[b,h] . k[t]).

    q: [B, H, D] (fp8 or bf16); kv_pages: [P, page, D]; weights: [H];
    lengths [B]; page_table [B, max_pages]. Returns logits [B, max_tokens]
    with -inf beyond length (reference contract: fp8_paged_mqa_logits,
    torch_extension_sycl.cc:489-493; pure-torch prefill oracle nsa.py).
    """
    b, h, d = q.shape
    n_pages, page, _ = kv_pages.shape
    max_tokens = page_table.shape[1] * page
    # gather pages -> [B, max_tokens, D]
    k = kv_pages[page_table].reshape(b, max_tokens, d)
    qk = jnp.einsum(
        "bhd,btd->bht", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.einsum("bht,h->bt", jax.nn.relu(qk), weights.astype(jnp.float32))
    pos = jnp.arange(max_tokens)[None, :]
    return jnp.where(pos < lengths[:, None], logits, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("clean_logits",))
def fp8_mqa_logits(q_fp8, kv_fp8, weights, ks, ke, clean_logits: bool = False):
    """Ragged (prefill/extend) NSA indexer scores (reference nsa.py:112-142):
    q_fp8 [Nq, H, D] fp8; kv_fp8 = (k_fp8 [Nk, D], k_scale [Nk] f32);
    weights [Nq, H] f32 head gates; ks/ke [Nq] visibility range.
    score[i, j] = sum_h relu(q_i_h . k_j) * w[i, h] * k_scale[j], masked to
    [ks_i, ke_i). The MXU runs the dots in bf16 (fp8 operands upcast on
    read); XLA fuses the relu/weight/scale epilogue."""
    k_fp8, k_scale = kv_fp8
    nq, h, d = q_fp8.shape
    qf = q_fp8.astype(jnp.bfloat16).reshape(nq * h, d)
    kf = k_fp8.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    score = jnp.sum(
        jax.nn.relu(dots.reshape(nq, h, -1)) * weights[..., None].astype(jnp.float32), axis=1
    ) * k_scale[None, :].astype(jnp.float32)
    j = jnp.arange(kf.shape[0], dtype=jnp.int32)[None, :]
    mask = (j >= ks[:, None]) & (j < ke[:, None])
    return jnp.where(mask, score, 0.0)


@functools.partial(jax.jit, static_argnames=("topk",))
def fast_topk(logits, lengths, topk: int = FAST_TOPK_K):
    """Top-k token indices per row (fixed k; short rows pad with -1).

    Reference: fast_topk (TopKTransform.cpp; radix select on Xe — on TPU a
    single fused sort is bandwidth-optimal)."""
    b, t = logits.shape
    k = min(topk, t)
    _, idx = jax.lax.top_k(logits, k)
    rank = jnp.arange(k)[None, :]
    valid = rank < jnp.minimum(lengths, k)[:, None]
    idx = jnp.where(valid, idx, -1)
    if k < topk:
        idx = jnp.pad(idx, ((0, 0), (0, topk - k)), constant_values=-1)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("page_size", "topk"))
def fast_topk_transform_fused(logits, lengths, src_page_table, page_size: int, topk: int = FAST_TOPK_K):
    """fast_topk fused with page-table transform: returns the *flat slot
    ids* of the selected tokens (src page table applied), the layout the
    sparse MLA gather consumes (reference fast_topk_transform_fused writes
    the dst page table directly)."""
    idx = fast_topk(logits, lengths, topk)  # token positions or -1
    pages = src_page_table[jnp.arange(idx.shape[0])[:, None], jnp.maximum(idx, 0) // page_size]
    slots = pages * page_size + jnp.maximum(idx, 0) % page_size
    return jnp.where(idx >= 0, slots, -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("page_size", "topk"))
def fast_topk_transform_ragged_fused(logits, ks, ke, src_page_table, page_size: int, topk: int = FAST_TOPK_K):
    """Ragged variant of fast_topk_transform_fused (reference top_k.py):
    visibility window [ks, ke) per query instead of [0, length)."""
    nq, nk = logits.shape
    j = jnp.arange(nk, dtype=jnp.int32)[None, :]
    masked = jnp.where((j >= ks[:, None]) & (j < ke[:, None]), logits, -jnp.inf)
    _, idx = jax.lax.top_k(masked, topk)
    valid = jnp.take_along_axis(masked, idx, axis=1) > -jnp.inf
    pages = jnp.take_along_axis(src_page_table, idx // page_size, axis=1)
    slots = pages * page_size + idx % page_size
    return jnp.where(valid, slots, -1)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def sparse_mla_decode(q_nope, q_pe, kv_pool_flat, slot_indices, *, sm_scale: Optional[float] = None):
    """Sparse MLA decode over top-k selected latent rows.

    q_nope [B, H, 512]; q_pe [B, H, 64]; kv_pool_flat [num_slots, 576]
    (the paged latent pool viewed flat); slot_indices [B, K] flat slots
    from fast_topk_transform_fused (-1 = invalid). Returns [B, H, 512].
    Reference: flash_mla_sparse_decode (2-stage gather->dense default).
    """
    b, h, _ = q_nope.shape
    kk = slot_indices.shape[1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (D_CKV**0.5)
    kv = kv_pool_flat[jnp.maximum(slot_indices, 0)]  # [B, K, 576]
    q = jnp.concatenate([q_nope, q_pe], axis=-1).astype(jnp.float32)  # [B, H, 576]
    s = jnp.einsum("bhd,bkd->bhk", q, kv.astype(jnp.float32)) * sm_scale
    s = jnp.where((slot_indices >= 0)[:, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhk,bkd->bhd", p, kv[..., :D_LATENT].astype(jnp.float32))
    return (out / jnp.maximum(l, 1e-38)).astype(q_nope.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def sparse_mla_prefill(q_nope, q_pe, kv_pool_flat, slot_indices, *, sm_scale: Optional[float] = None):
    """Ragged-prefill variant: per-token index sets.

    q_nope [T, H, 512]; q_pe [T, H, 64]; slot_indices [T, K].
    Returns [T, H, 512]. (Same math as decode — per-token index sets make
    prefill and decode identical after the gather.)"""
    return sparse_mla_decode(q_nope, q_pe, kv_pool_flat, slot_indices, sm_scale=sm_scale)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_k_indexer_norm_rope_quant_store(
    k, positions, cos_sin_cache, norm_weight, idx_cache, idx_scale_cache, slot_loc, *, eps: float = 1e-6
):
    """DSv4 k-indexer ingest (reference compress_norm_rope_store indexer
    path, fused_norm_rope_v2_torch.py:474-557 — there the fp8 row + f32
    scale pack into one 132-byte cache slot; here they live in two
    aligned pools, the TPU-native layout): RMSNorm -> RoPE -> hadamard ->
    per-token fp8 quant -> scatter at slot_loc.

    k [T, D]; idx_cache [S, D] fp8; idx_scale_cache [S] f32; slot_loc [T]
    (−1 drops). Returns the updated (idx_cache, idx_scale_cache).
    """
    from ..hadamard import hadamard_transform
    from ..norm import rmsnorm
    from ..quant import per_token_quant_fp8
    from ..rope import rotary_embedding

    t, d = k.shape
    kn = rmsnorm(k, norm_weight, eps)
    k_rot, _ = rotary_embedding(positions, kn[:, None, :], None, d, cos_sin_cache)
    k_had = hadamard_transform(k_rot[:, 0], scale=1.0 / (d**0.5))
    k8, scale = per_token_quant_fp8(k_had)
    smax = idx_cache.shape[0]
    safe = jnp.where(slot_loc >= 0, slot_loc, smax)
    idx_cache = idx_cache.at[safe].set(k8, mode="drop")
    idx_scale_cache = idx_scale_cache.at[safe].set(scale.reshape(t), mode="drop")
    return idx_cache, idx_scale_cache


def fused_q_indexer_rope_hadamard_quant(q, positions, cos_sin_cache, *, eps: float = 1e-10):
    """DSv4 q-indexer preprocessing (reference
    fused_q_indexer_rope_hadamard_quant_torch.py): RoPE the query, apply a
    128-point Walsh-Hadamard rotation (1/sqrt(D) normalized), then
    per-token fp8 e4m3 quantization.

    q [T, H, D] (D a power of two, 128 in DSv4); returns (q_fp8, scales
    [T, H, 1]).
    """
    from ..hadamard import hadamard_transform
    from ..quant import per_token_quant_fp8
    from ..rope import rotary_embedding

    t, h, d = q.shape
    q_rot, _ = rotary_embedding(positions, q, None, d, cos_sin_cache)
    q_had = hadamard_transform(q_rot, scale=1.0 / (d**0.5))
    return per_token_quant_fp8(q_had)
