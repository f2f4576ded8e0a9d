"""FlashAttention-style convenience API (reference python flash_attn.py).

The reference exposes flash-attn-compatible entry points
(``flash_attn_with_kvcache`` flash_attn.py:103-300,
``flash_attn_varlen_func`` :301-380, plus decode/extended helpers) that
SGLang calls; the native kernels sit underneath. Same arrangement here:
these wrappers translate the flash-attn calling conventions onto the
framework's padded/paged kernels.

Layout note (TPU-native divergence, documented): paged KV pools use the
framework's page-major layout [P, Hkv, page, D] (ops/attention/
paged_decode_dma.py "page"), close to flash-attn's [P, page, Hkv, D]:
each page is one contiguous block (the decode kernel's DMA unit), with
(head, token) ordered head-first inside the page for MXU-friendly
per-head slicing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .flash_prefill import flash_attention
from .paged_decode_dma import paged_attention_decode_dma


def _store(cache, rows, slots):
    """rows [T, H, D] -> cache [P, H, page, D] at flat slots [T] (drop <0)."""
    p, h, page, d = cache.shape
    pid = jnp.where(slots >= 0, slots // page, p)
    off = jnp.where(slots >= 0, slots % page, 0)
    return cache.at[pid, :, off].set(rows.astype(cache.dtype), mode="drop")


def flash_attn_with_kvcache(
    q,
    k_cache,
    v_cache,
    k=None,
    v=None,
    cache_seqlens=None,
    page_table=None,
    softmax_scale=None,
    sinks=None,
    causal=False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    return_softmax_lse: bool = False,
):
    """q [B, Sq, Hq, D]; paged caches [P, Hkv, page, D]; page_table
    [B, maxp]; cache_seqlens [B] = tokens already in the cache. When k/v
    ([B, Sq, Hkv, D]) are given they are appended at positions
    cache_seqlens..cache_seqlens+Sq-1 before attention (the flash-attn
    incremental-decoding contract). Returns out [B, Sq, Hq, D]
    (+ base-2 lse [B, Hq, Sq])."""
    b, sq, hq, d = q.shape
    page = k_cache.shape[-2]  # [P, Hkv, page, D]

    if k is not None:
        pos = cache_seqlens[:, None] + jnp.arange(sq)[None, :]  # [B, Sq]
        slots = jnp.take_along_axis(page_table, pos // page, axis=1) * page + pos % page
        k_cache = _store(k_cache, k.reshape(b * sq, -1, d), slots.reshape(-1))
        v_cache = _store(v_cache, v.reshape(b * sq, -1, d), slots.reshape(-1))
        total = cache_seqlens + sq
    else:
        total = cache_seqlens

    if sq == 1:
        res = paged_attention_decode_dma(
            q[:, 0], k_cache, v_cache, total, page_table,
            sm_scale=softmax_scale,
            sliding_window=window_size[0] if window_size[0] >= 0 else None,
            logit_soft_cap=softcap or None, sinks=sinks,
            return_lse=return_softmax_lse,
        )
        if return_softmax_lse:
            out, lse = res
            return out[:, None], lse[:, :, None], k_cache, v_cache  # [B,Hq,Sq=1]
        return res[:, None], k_cache, v_cache

    # multi-token: gather the cache into dense [B, Skv] and run flash
    maxp = page_table.shape[1]
    slot_grid = page_table[:, :, None] * page + jnp.arange(page)[None, None, :]
    slot_grid = slot_grid.reshape(b, maxp * page)
    pid, off = slot_grid // page, slot_grid % page
    kd = k_cache[pid, :, off]  # [B, Skv, Hkv, D]
    vd = v_cache[pid, :, off]
    res = flash_attention(
        q, kd, vd, jnp.full((b,), sq, jnp.int32), total,
        q_start=total - sq, kv_start=jnp.zeros_like(total),
        causal=causal, sm_scale=softmax_scale, sinks=sinks,
        sliding_window=window_size[0] if window_size[0] >= 0 else None,
        logit_soft_cap=softcap or None, return_lse=return_softmax_lse,
    )
    if return_softmax_lse:
        return res[0], res[1], k_cache, v_cache
    return res, k_cache, v_cache


def flash_attn_varlen_func(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    softmax_scale=None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    return_softmax_lse: bool = False,
):
    """Packed-varlen flash attention (reference flash_attn.py:301-380):
    q [Tq, Hq, D], k/v [Tk, Hkv, D], cu_seqlens_* [B+1]. Unpacks to the
    padded batch layout the flash kernel tiles over, repacks after. B and
    max_seqlen_* are static."""
    b = cu_seqlens_q.shape[0] - 1
    hq, d = q.shape[1], q.shape[2]

    def unpack(x, cu, smax):
        starts = cu[:-1]
        idx = starts[:, None] + jnp.arange(smax)[None, :]
        idx = jnp.minimum(idx, x.shape[0] - 1)
        return x[idx]  # [B, smax, H, D]

    qb = unpack(q, cu_seqlens_q, max_seqlen_q)
    kb = unpack(k, cu_seqlens_k, max_seqlen_k)
    vb = unpack(v, cu_seqlens_k, max_seqlen_k)
    q_lens = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    k_lens = (cu_seqlens_k[1:] - cu_seqlens_k[:-1]).astype(jnp.int32)
    res = flash_attention(
        qb, kb, vb, q_lens, k_lens,
        q_start=k_lens - q_lens, kv_start=jnp.zeros_like(k_lens),
        causal=causal, sm_scale=softmax_scale,
        sliding_window=window_size[0] if window_size[0] >= 0 else None,
        logit_soft_cap=softcap or None, return_lse=return_softmax_lse,
    )
    out = res[0] if return_softmax_lse else res
    # repack [B, smax, H, D] -> [Tq, H, D]
    rows = jnp.arange(max_seqlen_q)[None, :] + cu_seqlens_q[:-1, None]
    valid = jnp.arange(max_seqlen_q)[None, :] < q_lens[:, None]
    tq = q.shape[0]
    safe = jnp.where(valid, rows, tq)
    packed = jnp.zeros((tq + 1, hq, d), out.dtype).at[safe.reshape(-1)].set(
        out.reshape(-1, hq, d), mode="drop"
    )[:tq]
    if return_softmax_lse:
        return packed, res[1]
    return packed
