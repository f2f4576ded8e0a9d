"""Inkling model family: short-conv (sconv) layer + fused attention prologue.

TPU-native equivalents of the reference's Inkling stack
(src/sycl/InklingSconv.cpp:1-2180, InklingAttnPrologue.cpp:1-1052;
python inkling_sconv.py / inkling_attn_prologue.py). The exact math
(InklingAttnPrologue.cpp:263-435):

  q path:  per-head RMSNorm over head_dim=128 channels, scaled by a
           per-channel gamma (compute_q_head, :264-278).
  k/v path: depthwise causal conv of width W over the raw projection,
           prefix taps coming from a conv state cache (slot =
           cache_indices[seq], zeroed when cache_mask is false), the
           last tap applied to the current token; optional silu; optional
           residual (+x) (verify_or_extend_conv_value, :281-320); K gets
           the same gamma-RMSNorm afterwards, V does not (:389-395);
           results are scattered into paged k/v buffers at ``loc``
           (:397-406).

On TPU these are jnp compositions (XLA fuses the conv taps + norm +
scatter); the conv state caches reuse the linear_attn state-cache layout.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

HEAD_DIM = 128
PAD_SLOT_ID = -1  # reference inkling_sconv.py:7
CHUNK_SIZE = 64   # reference inkling_sconv.py:8


def _head_rmsnorm(x, gamma, eps):
    """x [..., H*128] -> per-head rmsnorm * gamma[128]."""
    shp = x.shape
    xh = x.reshape(*shp[:-1], shp[-1] // HEAD_DIM, HEAD_DIM).astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(xh), axis=-1, keepdims=True) + eps)
    return (xh * inv * gamma.astype(jnp.float32)).reshape(shp)


def sconv_decode_metadata(cache_indices):
    """(cache_mask, safe_idx) for a decode batch — functional form of
    inkling_fused_decode_sconv_metadata (inkling_sconv.py:79-98)."""
    ci = cache_indices.astype(jnp.int32)
    return ci >= 0, jnp.maximum(ci, 0)


def sconv_extend_metadata(cache_indices, extend_seq_lens, tokens_per_seq: int):
    """Extend-mode metadata: query_start_loc (bos per seq in the padded
    [B*T] token stream), has_initial_state, cache_mask, safe_idx
    (inkling_fused_extend_sconv_metadata, inkling_sconv.py:100-136)."""
    b = cache_indices.shape[0]
    mask, safe = sconv_decode_metadata(cache_indices)
    qsl = jnp.arange(b + 1, dtype=jnp.int32) * tokens_per_seq
    return qsl, mask, mask, safe


def _conv_with_prefix(x, prefix, weight, activation, use_residual):
    """x [B, T, D]; prefix [B, W-1, D] (already masked); weight [D, W].
    Causal depthwise conv where positions before the segment start read
    the prefix (the reference's verify_or_extend_conv_value)."""
    b, t, d = x.shape
    w = weight.shape[1]
    xp = jnp.concatenate([prefix.astype(jnp.float32), x.astype(jnp.float32)], axis=1)
    acc = jnp.zeros((b, t, d), jnp.float32)
    for iw in range(w):
        acc = acc + xp[:, iw : iw + t] * weight[:, iw].astype(jnp.float32)[None, None, :]
    if activation == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    if use_residual:
        acc = acc + x.astype(jnp.float32)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "q_off", "k_off", "v_off", "dq", "dkv", "tokens_per_seq",
        "activation", "use_residual", "do_store", "update_cache", "eps",
    ),
)
def inkling_attn_prologue(
    qkvr,
    k_conv_cache,
    v_conv_cache,
    cache_indices,
    cache_mask,
    k_weight,
    v_weight,
    q_gamma,
    k_gamma,
    loc,
    k_buf,
    v_buf,
    *,
    q_off: int,
    k_off: int,
    v_off: int,
    dq: int,
    dkv: int,
    tokens_per_seq: int = 1,
    eps: float = 1e-6,
    activation: Optional[str] = None,
    use_residual: bool = True,
    do_store: bool = True,
    update_cache: bool = True,
):
    """The fused prologue for decode (tokens_per_seq=1), extend, and
    verify (tokens_per_seq=draft_token_num) sub-batches.

    qkvr [T, Dtot] with T = B * tokens_per_seq; conv caches [S, W-1, dkv];
    cache_indices/cache_mask [B]; loc [T] flat kv-buffer slots (−1 drops);
    k_buf/v_buf [slots, dkv]. Returns (q_out [T, dq], k_out, v_out
    [T, dkv], k_buf, v_buf, k_conv_cache, v_conv_cache).
    """
    t_total = qkvr.shape[0]
    b = t_total // tokens_per_seq
    w = k_weight.shape[1]

    q_out = _head_rmsnorm(qkvr[:, q_off : q_off + dq], q_gamma, eps).astype(qkvr.dtype)

    def kv_path(x_off, cache, weight):
        x = qkvr[:, x_off : x_off + dkv].reshape(b, tokens_per_seq, dkv)
        safe = jnp.maximum(cache_indices, 0)
        prefix = cache[safe] * cache_mask[:, None, None].astype(cache.dtype)
        y = _conv_with_prefix(x, prefix, weight, activation, use_residual)
        # new conv tail: last W-1 inputs (prefix-extended for short segments)
        xp = jnp.concatenate([prefix.astype(jnp.float32), x.astype(jnp.float32)], axis=1)
        tail = xp[:, -(w - 1) :] if w > 1 else xp[:, :0]
        return y, tail.astype(cache.dtype)

    k_raw, k_tail = kv_path(k_off, k_conv_cache, k_weight)
    v_raw, v_tail = kv_path(v_off, v_conv_cache, v_weight)
    k_out = _head_rmsnorm(k_raw.reshape(t_total, dkv), k_gamma, eps).astype(qkvr.dtype)
    v_out = v_raw.reshape(t_total, dkv).astype(qkvr.dtype)

    if do_store:
        safe_loc = jnp.where(loc >= 0, loc, k_buf.shape[0])
        k_buf = k_buf.at[safe_loc].set(k_out, mode="drop")
        v_buf = v_buf.at[safe_loc].set(v_out, mode="drop")
    if update_cache:
        s = k_conv_cache.shape[0]
        safe_ci = jnp.where(cache_indices >= 0, cache_indices, s)
        k_conv_cache = k_conv_cache.at[safe_ci].set(k_tail, mode="drop")
        v_conv_cache = v_conv_cache.at[safe_ci].set(v_tail, mode="drop")
    return q_out, k_out, v_out, k_buf, v_buf, k_conv_cache, v_conv_cache


inkling_attn_prologue_decode = functools.partial(inkling_attn_prologue, tokens_per_seq=1)


def inkling_attn_prologue_verify(*args, draft_token_num: int, **kw):
    """Verify sub-batch: draft_token_num tokens per sequence, conv windows
    NOT committed to the cache (the accepted token's window is committed
    later by fused_draft_extend_sconv_cache)."""
    kw.setdefault("update_cache", False)
    return inkling_attn_prologue(*args, tokens_per_seq=draft_token_num, **kw)


inkling_attn_prologue_extend = inkling_attn_prologue


def save_intermediate_conv_windows(qkvr, k_conv_cache, cache_indices, cache_mask, *, x_off: int, dkv: int, tokens_per_seq: int, width: int):
    """Per-token conv windows [B, T, W-1, dkv] (the reference's
    SaveWindows path, InklingAttnPrologue.cpp:369-386): window[t] = the
    W-1 inputs preceding token t (prefix taps from the cache)."""
    t_total = qkvr.shape[0]
    b = t_total // tokens_per_seq
    x = qkvr[:, x_off : x_off + dkv].reshape(b, tokens_per_seq, dkv)
    safe = jnp.maximum(cache_indices, 0)
    prefix = k_conv_cache[safe] * cache_mask[:, None, None].astype(k_conv_cache.dtype)
    xp = jnp.concatenate([prefix.astype(x.dtype), x], axis=1)
    idx = jnp.arange(tokens_per_seq)[:, None] + jnp.arange(width - 1)[None, :]
    return xp[:, idx]  # [B, T, W-1, dkv]


def fused_draft_extend_sconv_cache(conv_cache, windows, x, cache_indices, accept_index):
    """Commit the ACCEPTED draft token's conv window to the cache
    (spec-decode rollback; reference fused_draft_extend_sconv_cache,
    inkling_sconv.py:285-316): new tail = window[accept] shifted by the
    accepted token itself. windows [B, T, W-1, D]; x [B, T, D] raw conv
    inputs; accept_index [B] position of the last accepted token."""
    b, t, wm1, d = windows.shape
    win = jnp.take_along_axis(windows, accept_index[:, None, None, None], axis=1)[:, 0]
    tok = jnp.take_along_axis(x, accept_index[:, None, None], axis=1)[:, 0]
    tail = jnp.concatenate([win[:, 1:], tok[:, None, :]], axis=1) if wm1 > 0 else win
    s = conv_cache.shape[0]
    safe = jnp.where(cache_indices >= 0, cache_indices, s)
    return conv_cache.at[safe].set(tail.astype(conv_cache.dtype), mode="drop")


def update_sconv_cache(conv_cache, cache_indices, tails):
    """Plain cache update (inkling_sconv.py:229-243)."""
    s = conv_cache.shape[0]
    safe = jnp.where(cache_indices >= 0, cache_indices, s)
    return conv_cache.at[safe].set(tails.astype(conv_cache.dtype), mode="drop")


def migrate_sconv_cache(conv_cache, src_indices, dst_indices):
    """Copy cache rows src -> dst (request migration)."""
    s = conv_cache.shape[0]
    rows = conv_cache[jnp.maximum(src_indices, 0)]
    safe_dst = jnp.where((dst_indices >= 0) & (src_indices >= 0), dst_indices, s)
    return conv_cache.at[safe_dst].set(rows, mode="drop")


def fused_gather_scatter_to_sconv_cache(hidden_states, conv_cache, track_conv_idx, mask, dst_indices):
    """Gather per-request conv windows out of a token stream and scatter
    them into the cache: cache[dst[b], w] = hidden[track_idx[b, w]] where
    mask[b] and dst[b] != PAD (reference inkling_gather_scatter_sconv_cache,
    InklingSconv.cpp:775-833; oracle tests/sconv_reference.py:157-168).

    hidden_states [total_tokens, D]; conv_cache [S, W-1, D];
    track_conv_idx [B, W-1] int32 token ids (from ``track_conv_indices``);
    mask [B] bool; dst_indices [B] cache slots. Returns the updated cache.
    """
    rows = hidden_states[jnp.maximum(track_conv_idx, 0)]  # [B, W-1, D]
    s = conv_cache.shape[0]
    ok = mask & (dst_indices != PAD_SLOT_ID)
    safe_dst = jnp.where(ok, dst_indices, s)
    return conv_cache.at[safe_dst].set(rows.astype(conv_cache.dtype), mode="drop")


class SconvMetadata(NamedTuple):
    """Reference SconvDecodeMetadata / SconvExtendMetadata
    (inkling_sconv.py:138-180): cache_mask [B,1,1], safe_idx [B],
    cu [B+1] token start offsets, si [T] token -> sequence ids."""

    cache_mask: jax.Array
    safe_idx: jax.Array
    cu: jax.Array
    si: jax.Array


def precompute_helion_decode_metadata(cache_indices, has_initial_state):
    """Decode-mode metadata (reference precompute_helion_decode_metadata,
    inkling_sconv.py:138-156): one token per sequence, so cu/si are
    trivial aranges."""
    ci = cache_indices.astype(jnp.int32)
    b = ci.shape[0]
    cache_mask = (has_initial_state & (ci != PAD_SLOT_ID))[:, None, None]
    return SconvMetadata(
        cache_mask=cache_mask,
        safe_idx=jnp.maximum(ci, 0),
        cu=jnp.arange(b + 1, dtype=jnp.int32),
        si=jnp.arange(b, dtype=jnp.int32),
    )


def precompute_helion_extend_metadata(cache_indices, has_initial_state, query_start_loc, *, total_tokens: int):
    """Extend-mode metadata (reference precompute_helion_extend_metadata,
    inkling_sconv.py:158-180): si maps each of the ``total_tokens`` ragged
    tokens to its sequence via searchsorted over query_start_loc."""
    ci = cache_indices.astype(jnp.int32)
    b = ci.shape[0]
    cache_mask = (has_initial_state & (ci != PAD_SLOT_ID))[:, None, None]
    cu = query_start_loc.astype(jnp.int32)
    t = jnp.arange(total_tokens, dtype=jnp.int32)
    si = jnp.clip(jnp.searchsorted(cu, t, side="right") - 1, 0, b - 1).astype(jnp.int32)
    return SconvMetadata(cache_mask=cache_mask, safe_idx=jnp.maximum(ci, 0), cu=cu, si=si)


def track_conv_indices(query_start_loc, mamba_track_seqlens, extend_prefix_lens,
                       width_minus_one: int, chunk_size: int = CHUNK_SIZE,
                       total_tokens: Optional[int] = None):
    """[B, W-1] token indices of the conv window ending at each request's
    last chunk-aligned tracked position (reference
    inkling_track_conv_indices, InklingSconv.cpp:1348-1392): per request,
    the tracked length is max(mamba_track_seqlens - extend_prefix_lens, 0)
    rounded DOWN to chunk_size, and the window covers the W-1 tokens
    before that offset within the request's segment; indices clamp to
    [0, total_tokens - 1]."""
    if total_tokens is None:
        total_tokens = int(query_start_loc[-1])
    b = mamba_track_seqlens.shape[0]
    lens = jnp.maximum(
        mamba_track_seqlens.astype(jnp.int32) - extend_prefix_lens.astype(jnp.int32)[:b], 0)
    aligned = (lens // chunk_size) * chunk_size
    base = query_start_loc.astype(jnp.int32)[:b] + aligned - width_minus_one
    idx = base[:, None] + jnp.arange(width_minus_one, dtype=jnp.int32)[None, :]
    return jnp.clip(idx, 0, max(0, total_tokens - 1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("activation", "use_residual"))
def fused_causal_conv1d_update_decode(
    x, weight, sconv_cache, cache_indices, cache_mask,
    activation: Optional[str] = None, use_residual: bool = True,
    track_mask=None, track_indices=None,
):
    """One decode step of the depthwise causal conv WITH the cache update
    fused (reference inkling_fused_decode_update_sconv,
    InklingSconv.cpp:484-582): per token t,

        y[t] = x[t] * w[:, W-1] + sum_p mask[t] * cache[ci[t], p] * w[:, p]

    (optional silu, optional +x residual), then the cache window shifts
    x in: cache[ci[t]] = [masked cache rows 1..W-2, x[t]]. When
    track_mask[t], the same new window is ALSO written at slot
    track_indices[t] (spec-decode draft tracking).

    x [T, D]; weight [D, W]; sconv_cache [S, W-1, D]; cache_indices /
    cache_mask [T]. Returns (y [T, D], new_cache) — functional form of the
    reference's in-place update.
    """
    ci = cache_indices.astype(jnp.int32)
    valid = ci != PAD_SLOT_ID
    safe = jnp.maximum(ci, 0)
    # the helion metadata contract pre-gates cache_mask on validity
    # (precompute_helion_decode_metadata); gate here too so a raw
    # has_initial_state mask cannot read slot 0 through a PAD index
    mask = cache_mask.reshape(-1) & valid
    prefix = sconv_cache[safe] * mask[:, None, None].astype(sconv_cache.dtype)
    xp = jnp.concatenate(
        [prefix.astype(jnp.float32), x.astype(jnp.float32)[:, None, :]], axis=1
    )  # [T, W, D]; column W-1 of the weight taps the current token
    acc = jnp.einsum("twd,dw->td", xp, weight.astype(jnp.float32))
    if activation == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    if use_residual:
        acc = acc + x.astype(jnp.float32)
    y = acc.astype(x.dtype)

    tail = xp[:, 1:].astype(sconv_cache.dtype)  # [T, W-1, D] shifted window
    s = sconv_cache.shape[0]
    new_cache = sconv_cache.at[jnp.where(valid, ci, s)].set(tail, mode="drop")
    if track_indices is not None:
        tm = valid if track_mask is None else (valid & track_mask.reshape(-1))
        tdst = jnp.where(tm, track_indices.astype(jnp.int32), s)
        new_cache = new_cache.at[tdst].set(tail, mode="drop")
    return y, new_cache
