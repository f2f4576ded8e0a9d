"""Reference-name compatibility layer.

Thin aliases mapping the reference's public Python names
(python/sgl_kernel/*.py) onto this framework's TPU-native ops, for
drop-in porting of SGLang-side call sites. Only names whose semantics
are genuinely covered elsewhere live here — anything requiring real
logic has its own module (see README parity map).

The ``_inplace``/``_xpu`` suffixes in the reference signal in-place torch
mutation / device placement; JAX is functional, so these return the
updated arrays instead (same math).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops import kvcache as _kv
from .ops.activation import swiglu_alpha_limit
from .ops.attention.nsa import fast_topk as _fast_topk
from .ops.linear_attn import causal_conv1d_fwd, causal_conv1d_update
from .ops.rope import mrope_rotary_embedding, rotary_embedding
from .utils import cdiv as ceil_div, query_device, round_up as ceil_align

# --- rope family (Rope.cpp / MRope.cpp wrapper names) ---
apply_rope_with_cos_sin_cache_inplace = rotary_embedding
fused_qk_rope_with_cos_sin_cache_inplace = rotary_embedding
multimodal_rotary_embedding = mrope_rotary_embedding

# --- activation (SwigluAlphaLimit.cpp) ---
swiglu_gpt_oss_sigmoid_alpha = swiglu_alpha_limit

# --- mamba/conv (causal_conv1d.cpp wrapper names) ---
# The reference API (python/sgl_kernel/mamba.py:6-30) is channel-first:
# batched x [B, D, S], or packed varlen x [D, total] + query_start_loc
# cu-offsets, with conv_states [N, D, W-1] gathered by cache_indices. The
# native op here is time-major ([B, S, D] + per-row seq_lens), so these are
# real adapters, not aliases (a bare alias silently treated channels as
# time).


def causal_conv1d_fn_xpu(
    x,
    weight,
    bias=None,
    conv_states=None,
    query_start_loc=None,
    cache_indices=None,
    has_initial_state=None,
    activation="silu",
    pad_slot_id=-1,
):
    """Reference causal_conv1d_fn_xpu (mamba.py:6-30; causal_conv1d.cpp).

    Batched form: x [B, D, S] -> returns (y [B, D, S], final_states
    [B, D, W-1]). Packed varlen (x [D, total] + query_start_loc) requires
    concrete (host) start offsets and returns (y [D, total], final_states
    [num_seqs, D, W-1]). JAX is functional: conv_states is consumed as the
    initial state (where has_initial_state) and the updated states are
    returned instead of written in place.
    """
    import numpy as _np

    act = activation if activation in ("silu", "swish") else None

    def _initial(n):
        if conv_states is None:
            return None
        idx = _np.arange(n) if cache_indices is None else _np.asarray(cache_indices)[:n]
        init = jnp.swapaxes(jnp.asarray(conv_states)[jnp.asarray(idx)], 1, 2)  # [n, W-1, D]
        if has_initial_state is not None:
            init = jnp.where(jnp.asarray(has_initial_state)[:n, None, None], init, 0.0).astype(init.dtype)
        return init

    if x.ndim == 3:  # [B, D, S]
        b = x.shape[0]
        y, fin = causal_conv1d_fwd(jnp.swapaxes(x, 1, 2), weight, bias, None, _initial(b), activation=act)
        return jnp.swapaxes(y, 1, 2), jnp.swapaxes(fin, 1, 2)

    if query_start_loc is None:
        raise ValueError("packed x [D, total] requires query_start_loc")
    starts = _np.asarray(query_start_loc)
    lens = starts[1:] - starts[:-1]
    n, smax = len(lens), int(lens.max()) if len(lens) else 0
    xt = jnp.swapaxes(x, 0, 1)  # [total, D]
    batched = jnp.zeros((n, smax, x.shape[0]), x.dtype)
    for i, (s0, ln) in enumerate(zip(starts[:-1], lens)):
        batched = batched.at[i, : int(ln)].set(xt[int(s0) : int(s0 + ln)])
    y, fin = causal_conv1d_fwd(batched, weight, bias, jnp.asarray(lens, jnp.int32), _initial(n), activation=act)
    packed = jnp.concatenate([y[i, : int(ln)] for i, ln in enumerate(lens)], axis=0)
    return jnp.swapaxes(packed, 0, 1), jnp.swapaxes(fin, 1, 2)


def causal_conv1d_update_xpu(
    x,
    conv_state,
    weight,
    bias=None,
    activation=None,
    cache_seqlens=None,
    conv_state_indices=None,
    pad_slot_id=-1,
):
    """Reference causal_conv1d_update_xpu (mamba.py:33-60): x [B, D] or
    [B, D, 1], conv_state [N, D, W-1] channel-first. Returns (y same shape
    as x, updated conv_state rows [B, D, W-1])."""
    squeeze = x.ndim == 3
    if squeeze:
        assert x.shape[-1] == 1, "decode update takes one token"
        x = x[..., 0]
    state = conv_state if conv_state_indices is None else conv_state[jnp.asarray(conv_state_indices)]
    act = activation if activation in ("silu", "swish") else None
    y, new_state = causal_conv1d_update(x, jnp.swapaxes(state, 1, 2), weight, bias, activation=act)
    if squeeze:
        y = y[..., None]
    return y, jnp.swapaxes(new_state, 1, 2)

# --- kv cache (KVCache.cpp / KVCacheIO.cpp "direct" copy fallbacks) ---
store_cache_xpu = _kv.store_cache
transfer_kv_direct = _kv.transfer_kv_per_layer
transfer_kv_all_layer_direct_lf_pf = _kv.transfer_kv_all_layer_lf_pf
transfer_kv_per_layer_direct_pf_lf = _kv.transfer_kv_per_layer_pf_lf
transfer_kv_all_layer_mla_lf_pf = _kv.transfer_kv_all_layer_mla_lf_pf
transfer_kv_per_layer_mla_pf_lf = _kv.transfer_kv_per_layer_mla_pf_lf

# --- top-k (TopKTransform.cpp v2 = same contract, tuned differently) ---
fast_topk_v2 = _fast_topk


def get_device_capability(device=None):
    """(major, minor) — reference utils.py:52-56 maps Xe2 to (2, 0); the
    TPU generation is reported through query_device."""
    return query_device()


def cvt_float_to_fp8_e4m3(x):
    """Scalar/array float -> fp8 e4m3 (comm/Numerics.h helper)."""
    return jnp.asarray(x).astype(jnp.float8_e4m3fn)


def pack_fp8x2_e4m3(lo, hi):
    """Pack two fp8 values into a uint16 (lo in low byte)."""
    lo8 = jnp.asarray(lo).astype(jnp.float8_e4m3fn).view(jnp.uint8).astype(jnp.uint16)
    hi8 = jnp.asarray(hi).astype(jnp.float8_e4m3fn).view(jnp.uint8).astype(jnp.uint16)
    return lo8 | (hi8 << 8)


def maybe_contiguous(x):
    return x  # JAX arrays have no strided views


def flash_mla_get_workspace_size(*a, **k):
    """TPU kernels allocate scratch via Pallas scratch_shapes — no
    caller-managed workspace (mla_decode.cpp workspace contract)."""
    return 0


flash_mla_prefill_get_workspace_size = flash_mla_get_workspace_size


# ===========================================================================
# Round-4 export-parity extension: every remaining reference __init__ name
# (python/sgl_kernel/__init__.py) gains a compat entry here. Same ground
# rules as above — genuine aliases stay aliases; layout/convention gaps get
# real adapters; everything is functional (updated arrays returned, never
# mutated in place).
# ===========================================================================

import sys as _sys

import jax as _jax
import numpy as _np

from .ops import inkling as _inkling
from .ops.attention.mla import mla_decode as _mla_decode, mla_prefill as _mla_prefill
from .ops.attention.nsa import (
    fp8_paged_mqa_logits as _fp8_paged_mqa_logits,
    fused_k_indexer_norm_rope_quant_store as _k_indexer_store,
    fused_q_indexer_rope_hadamard_quant,
    sparse_mla_decode as _sparse_mla_decode,
)
from .ops.compression import (
    flash_compress4_decode,
    flash_compress4_prefill,
    flash_compress128_decode,
    flash_compress128_prefill,
    plan_compress_decode,
    plan_compress_decode_legacy,
    plan_compress_prefill,
    plan_compress_prefill_legacy,
)
from .ops.attention.merge_state import apply_sinks as _apply_sinks
from .ops.gemm.fp4 import fp4_group_mm as _fp4_group_mm, fp4_scaled_mm as _fp4_scaled_mm
from .ops.grammar import apply_token_bitmask as _apply_token_bitmask
from .ops.inkling import (
    SconvMetadata,
    fused_causal_conv1d_update_decode,
    fused_draft_extend_sconv_cache,
    fused_gather_scatter_to_sconv_cache,
    inkling_attn_prologue_extend,
    inkling_attn_prologue_verify,
    precompute_helion_decode_metadata,
    precompute_helion_extend_metadata,
    save_intermediate_conv_windows,
    track_conv_indices,
)
from .ops.linear_attn.gdn import (
    gdn_attention_decode as _gdn_decode,
    gdn_attention_prefill as _gdn_prefill,
)
from .ops.norm import rmsnorm as _rmsnorm
from .ops.quant import (
    per_tensor_quant_fp8 as _per_tensor_quant_fp8,
    per_token_group_quant_8bit as _ptg_quant_8bit,
    per_token_group_quant_fp4 as _ptg_quant_fp4,
    per_token_quant_fp8 as _per_token_quant_fp8,
)
from .ops.sampling import top_k_renorm_probs, top_p_renorm_probs

# reference __init__.py:13 exports the raw extension module; the TPU analog
# is the package itself (flat functional API at the root).
common_ops = _sys.modules[__package__]

# singular aliases (reference __init__.py renames *_probs -> *_prob)
top_k_renorm_prob = top_k_renorm_probs
top_p_renorm_prob = top_p_renorm_probs

# decode prologue keeps the reference's _decode suffix (inkling_attn_prologue.py:126)
inkling_attn_prologue_decode = _inkling.inkling_attn_prologue


def is_xe2_arch() -> bool:
    """Reference utils.py:52-56 — this framework never runs on Xe2."""
    return False


def apply_token_bitmask_inplace_cuda(logits, bitmask, indices=None):
    """grammar.py:6-15 — functional: returns the masked logits."""
    if isinstance(indices, list):
        indices = jnp.asarray(indices, jnp.int32)
    return _apply_token_bitmask(logits, bitmask, indices)


def compile_inkling_attn_prologue(dtype=None, w: int = 0, use_silu: bool = False,
                                  use_residual: bool = True, use_mxfp8: bool = False):
    """inkling_attn_prologue.py:260-272 — AOT warm-up hook. jax.jit compiles
    on first call and caches persistently (utils/profiling.py); nothing to
    pre-build here."""
    del dtype, w, use_silu, use_residual, use_mxfp8


# --- quant wrappers (gemm.py:85-243; functional: (q, s) returned, the
# reference's pre-allocated output_q/output_s args are accepted and unused) ---

def sgl_per_token_group_quant_8bit(input, output_q=None, output_s=None, group_size=128,
                                   eps=1e-10, fp8_min=None, fp8_max=None,
                                   scale_ue8m0=False, fuse_silu_and_mul=False,
                                   masked_m=None, enable_v2=None):
    """gemm.py:85-122. The quant dtype follows output_q's dtype when given,
    else fp8_max selects it (448 -> e4m3, 127 -> int8)."""
    del enable_v2  # v1/v2 split is a CUDA codegen detail; one path here
    if output_q is not None:
        dtype = output_q.dtype
    elif fp8_max is not None and fp8_max <= 127:
        dtype = jnp.int8
    else:
        dtype = jnp.float8_e4m3fn
    return _ptg_quant_8bit(
        input, group_size=group_size, eps=eps, qmin=fp8_min, qmax=fp8_max,
        dtype=dtype, scale_ue8m0=scale_ue8m0,
        fuse_silu_and_mul=fuse_silu_and_mul, masked_m=masked_m)


sgl_per_token_group_quant_fp8 = sgl_per_token_group_quant_8bit
sgl_per_token_group_quant_int8 = sgl_per_token_group_quant_8bit


def sgl_per_tensor_quant_fp8(input, output_q=None, output_s=None, is_static=False):
    """gemm.py:129-137: static -> quantize with the given scale; dynamic ->
    compute the amax scale. Returns (q, scale)."""
    scale = output_s if is_static else None
    return _per_tensor_quant_fp8(input, scale)


def sgl_per_token_quant_fp8(input, output_q=None, output_s=None):
    """gemm.py:236-241. Returns (q [T, K] fp8, scales [T] f32)."""
    del output_q, output_s
    return _per_token_quant_fp8(input)


def sgl_per_token_group_quant_fp4(x, group_size: int = 32, eps: float = 1e-10,
                                  x_secondary=None, column_major_scales=False):
    """gemm.py:140-233 (MXFP4 + UE8M0 scales). column_major_scales is a
    CUTLASS memory-layout detail; JAX consumers transpose at use."""
    del column_major_scales
    return _ptg_quant_fp4(x, x_secondary, group_size=group_size, eps=eps)


def cutlass_scaled_fp4_mm(a, b, block_scale_a, block_scale_b, alpha,
                          out_dtype=jnp.bfloat16):
    """gemm.py:244-254: A [M, K/2] x B [N, K/2] NVFP4 -> [M, N]."""
    return _fp4_scaled_mm(a, b, block_scale_a, block_scale_b, alpha, out_dtype)


def cutlass_fp4_group_mm(a_fp4, b_fp4, a_blockscale, b_blockscale, alphas,
                         out_dtype=jnp.bfloat16, device=None, params=None):
    """moe.py:325-383: grouped NVFP4 MoE GEMM. params carries the CUTLASS
    sideband — only expert_offsets (token starts per expert) is semantic on
    TPU; strides/problem_sizes are derivable from shapes."""
    del device
    off = jnp.asarray(params["expert_offsets"], jnp.int32)
    group_sizes = off[1:] - off[:-1]
    return _fp4_group_mm(a_fp4, b_fp4, a_blockscale, b_blockscale, alphas,
                         group_sizes, out_dtype)


# --- FlashMLA names (attention.py:54-419) ---

def _compact_valid_indices(idx, num_slots, topk_length=None):
    """The reference sparse contract allows invalid entries (-1 or
    >= num_slots) ANYWHERE in indices; the native kernel takes the
    fast_topk layout (valid-first, -1 suffix, length-masked). Compact:
    stable-sort valid entries to the front, return (indices, counts)."""
    k = idx.shape[-1]
    valid = (idx >= 0) & (idx < num_slots)
    if topk_length is not None:
        valid &= jnp.arange(k)[None, :] < jnp.asarray(topk_length)[:, None]
    order = jnp.argsort(~valid, axis=-1, stable=True)
    idx_c = jnp.take_along_axis(jnp.where(valid, idx, -1), order, axis=-1)
    return idx_c, jnp.sum(valid, axis=-1).astype(jnp.int32)

def flash_mla_decode(q_nope, q_pe, kv_c_and_k_pe_cache, seq_lens, page_table,
                     workspace=None, sm_scale=None, num_kv_splits: int = 1):
    """attention.py:54-147. workspace is a SYCL scratch contract; Pallas
    kernels allocate scratch via scratch_shapes, so it is accepted and
    ignored. Returns [B, H, 512]."""
    del workspace
    return _mla_decode(q_nope, q_pe, kv_c_and_k_pe_cache, seq_lens, page_table,
                       sm_scale=sm_scale, num_splits=max(int(num_kv_splits), 1))


def flash_mla_prefill(q_nope, q_pe, kv_c_and_k_pe_cache, cu_seqlens_q,
                      seq_lens_k, max_seqlen_q: int, page_table,
                      workspace=None, sm_scale=None, causal: bool = True,
                      num_kv_splits: int = -1):
    """attention.py:149-234: ragged varlen-Q MLA prefill over the paged
    cache (incremental prefill: q rows align to the END of each kv run).

    Adapter: gathers pages to the [B, Skv, 576] pre-cache layout and
    re-batches the ragged q (host-concrete cu_seqlens, like the reference's
    int32 host tensor). Native callers use ops.attention.mla.mla_prefill /
    models.deepseek directly."""
    del workspace, num_kv_splits
    cu = _np.asarray(cu_seqlens_q)
    lens_q = cu[1:] - cu[:-1]
    bsz = len(lens_q)
    smax_q = int(max_seqlen_q)
    d = kv_c_and_k_pe_cache.shape[-1]
    page = kv_c_and_k_pe_cache.shape[1]
    n_blocks = page_table.shape[1]
    h = q_nope.shape[1]

    # paged gather -> [B, n_blocks*page, D] dense latent runs
    kv = kv_c_and_k_pe_cache[jnp.maximum(page_table, 0)].reshape(bsz, n_blocks * page, d)
    qn = jnp.zeros((bsz, smax_q, h, q_nope.shape[-1]), q_nope.dtype)
    qp = jnp.zeros((bsz, smax_q, h, q_pe.shape[-1]), q_pe.dtype)
    for i, (s0, ln) in enumerate(zip(cu[:-1], lens_q)):
        qn = qn.at[i, : int(ln)].set(q_nope[int(s0) : int(s0 + ln)])
        qp = qp.at[i, : int(ln)].set(q_pe[int(s0) : int(s0 + ln)])
    q_lens = jnp.asarray(lens_q, jnp.int32)
    kv_lens = jnp.asarray(seq_lens_k, jnp.int32)
    out = _mla_prefill(qn, qp, kv, q_lens, kv_lens, sm_scale=sm_scale,
                       causal=causal, q_start=kv_lens - q_lens)
    return jnp.concatenate([out[i, : int(ln)] for i, ln in enumerate(lens_q)], axis=0)


def flash_mla_with_kvcache(q, k_cache, block_table=None, cache_seqlens=None,
                           head_dim_v: int = 512, tile_scheduler_metadata=None,
                           num_splits=None, softmax_scale=None, causal=False,
                           is_fp8_kvcache=False, indices=None, attn_sink=None,
                           extra_k_cache=None, extra_indices_in_kvcache=None,
                           topk_length=None, extra_topk_length=None):
    """attention.py:250-354 (DeepSeek-V4 MLA decode, dense or sparse).

    q [B, s_q, H, D_qk]; k_cache [num_pages, page, 1, D]. Dense path
    (block_table given): paged split-KV MLA decode. Sparse path (indices
    given): dual-pool top-k MLA decode. Returns (out [B, s_q, H, dv],
    lse [B, H, s_q] f32) like the reference."""
    del tile_scheduler_metadata, num_splits, causal, is_fp8_kvcache
    b, s_q, h, d_qk = q.shape
    dv = head_dim_v
    qn = q[..., :dv].reshape(b * s_q, h, dv)
    qp = q[..., dv:].reshape(b * s_q, h, d_qk - dv)

    if block_table is not None:
        cache = k_cache.reshape(k_cache.shape[0], k_cache.shape[1], -1)
        pt = jnp.repeat(block_table, s_q, axis=0)
        lens = jnp.repeat(jnp.asarray(cache_seqlens, jnp.int32), s_q, axis=0)
        out, lse = _mla_decode(qn, qp, cache, lens, pt,
                               sm_scale=softmax_scale, return_lse=True)
    else:
        assert indices is not None, "sparse decode needs indices"
        page = k_cache.shape[1]
        pool = k_cache.reshape(-1, k_cache.shape[-1])
        idx = jnp.asarray(indices)
        if idx.ndim == 4:  # [B, s_q, h_kv=1, topk]
            idx = idx[:, :, 0]
        idx = idx.reshape(b * s_q, -1) if idx.ndim == 3 else idx
        extra_pool = None
        if extra_k_cache is not None:
            extra_pool = extra_k_cache.reshape(-1, extra_k_cache.shape[-1])
        # topk_length is [B] per the reference contract regardless of s_q
        # (attention.py:250-354) — repeat per query position, don't reshape
        # (a reshape to (b*s_q,) crashes any s_q>1 MTP call; advisor r4)
        tl = (None if topk_length is None
              else jnp.repeat(jnp.asarray(topk_length).reshape(b), s_q))
        etl = (None if extra_topk_length is None
               else jnp.repeat(jnp.asarray(extra_topk_length).reshape(b), s_q))
        ei = (None if extra_indices_in_kvcache is None
              else jnp.asarray(extra_indices_in_kvcache).reshape(b * s_q, -1))
        idx, tl = _compact_valid_indices(idx, pool.shape[0], tl)
        if ei is not None:
            ei, etl = _compact_valid_indices(ei, extra_pool.shape[0], etl)
        # sink applied AFTER the lse read — the reference contract keeps
        # lse sink-free (attention.py:381-383)
        out, lse = _sparse_mla_decode(
            qn, qp, pool, idx, sm_scale=softmax_scale, topk_length=tl,
            extra_pool_flat=extra_pool, extra_indices=ei,
            extra_topk_length=etl, attn_sink=None, return_lse=True,
            page=page)
        if attn_sink is not None:
            out = _apply_sinks(out, lse, attn_sink)
    out = out.reshape(b, s_q, h, dv)
    # this framework's lse is base-2; the reference reports natural log
    lse = (lse * 0.6931471805599453).reshape(b, s_q, h).transpose(0, 2, 1)
    return out, lse.astype(jnp.float32)


def flash_mla_sparse_fwd(q, kv, indices, sm_scale, d_v: int = 512,
                         attn_sink=None, topk_length=None):
    """attention.py:356-419: sparse MLA prefill over per-token index sets.

    q [s_q, h_q, d_qk]; kv [s_kv, h_kv=1, d_qk]; indices [s_q, h_kv, topk].
    Returns (out [s_q, h_q, d_v] bf16, max_logits [s_q, h_q] f32,
    lse [s_q, h_q] f32 natural-log). max_logits is recomputed by a chunked
    gather pass (the Pallas kernel tracks its running max internally but
    does not emit it)."""
    pool = kv[:, 0, :]
    idx = indices[:, 0, :] if indices.ndim == 3 else indices
    s_q, h, d_qk = q.shape
    qn, qp = q[..., :d_v], q[..., d_v:]
    idx_c, counts = _compact_valid_indices(idx, pool.shape[0], topk_length)
    out, lse = _sparse_mla_decode(qn, qp, pool, idx_c, sm_scale=sm_scale,
                                  topk_length=counts,
                                  attn_sink=None, return_lse=True)
    if attn_sink is not None:
        # output-only effect; lse and max_logits stay sink-free
        # (attention.py:375-379)
        out = _apply_sinks(out, lse, attn_sink)

    # chunked max-logit pass (no O(s_q*topk*d) residency)
    k = idx.shape[1]
    chunk = min(k, 256)
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    idx_p = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
    qf = q.astype(jnp.float32)
    s_kv = pool.shape[0]
    tl = None if topk_length is None else jnp.asarray(topk_length)

    def body(c, sl):
        ii = _jax.lax.dynamic_slice_in_dim(idx_p, sl * chunk, chunk, axis=1)
        valid = (ii >= 0) & (ii < s_kv)
        if tl is not None:
            kpos = sl * chunk + jnp.arange(chunk)[None, :]
            valid &= kpos < tl[:, None]
        rows = pool[jnp.maximum(ii, 0)].astype(jnp.float32)  # [s_q, C, D]
        lg = jnp.einsum("thd,tcd->thc", qf, rows) * sm_scale
        lg = jnp.where(valid[:, None, :], lg, -jnp.inf)
        return jnp.maximum(c, jnp.max(lg, axis=-1)), None

    init = jnp.full((s_q, h), -jnp.inf, jnp.float32)
    max_logits, _ = _jax.lax.scan(body, init, jnp.arange(n_chunks))
    # base-2 lse -> natural log (the reference's convention)
    return out, max_logits, (lse * 0.6931471805599453).astype(jnp.float32)


def fp8_paged_mqa_logits_triton(q_fp8, kvcache_fp8, weight, seq_lens,
                                page_table, deep_gemm_metadata=None,
                                max_seq_len: int = 0, clean_logits: bool = False):
    """fp8_paged_mqa_logits.py:82-176: the reference packs each fp8 KV row
    with its f32 scale in the last 4 bytes ([P, page, 1, D+4]). The adapter
    splits that inline scale out and calls the Pallas streaming indexer."""
    del deep_gemm_metadata, clean_logits
    b = q_fp8.shape[0]
    d = q_fp8.shape[-1]
    qd = q_fp8.reshape(b, *q_fp8.shape[2:])  # squeeze s_q=1
    kv = kvcache_fp8[:, :, 0, :]
    data = kv[..., :d]
    scale_u8 = _jax.lax.bitcast_convert_type(kv[..., d:], jnp.uint8).reshape(
        kv.shape[0], kv.shape[1], 4)
    kv_scales = _jax.lax.bitcast_convert_type(scale_u8, jnp.float32)
    if seq_lens.ndim > 1:
        seq_lens = seq_lens.reshape(-1)
    logits = _fp8_paged_mqa_logits(qd, data, weight, seq_lens, page_table, kv_scales)
    return logits[:, : int(max_seq_len)] if max_seq_len else logits


# --- fused rope variants (elementwise.py:143-760, FusedQKNormRope.cpp) ---

def _rope_interleaved(x, re, im):
    """Rotate interleaved (re,im) pairs: x [..., R], re/im [..., R//2]."""
    x0, x1 = x[..., 0::2], x[..., 1::2]
    y = jnp.stack([x0 * re - x1 * im, x0 * im + x1 * re], axis=-1)
    return y.reshape(x.shape)


def _freqs_cis_rows(freqs_cis, positions):
    """Interleaved [max_pos, R] (re0,im0,re1,im1,...) -> per-token re/im."""
    rows = freqs_cis[positions.astype(jnp.int32)].astype(jnp.float32)
    return rows[..., 0::2], rows[..., 1::2]


def fused_inplace_qknorm_rope(q, k, q_weight, k_weight, cos_sin_cache,
                              positions, is_neox: bool, eps: float = 1e-6,
                              head_dim: int = 0, rope_dim: int = 0):
    """elementwise.py:143-204 — functional: returns (q, k) normed + roped.
    q/k [T, H*D] or [T, H, D]; cos_sin_cache [max_pos, rope_dim] = [cos|sin]."""
    hd = head_dim or (q.shape[-1] if q.ndim == 3 else q_weight.shape[-1])
    cache = cos_sin_cache if not rope_dim else cos_sin_cache[..., :rope_dim]

    def norm(x, w):
        flat = x.reshape(-1, hd)
        return _rmsnorm(flat, w, eps).reshape(x.shape).astype(x.dtype)

    return rotary_embedding(positions, norm(q, q_weight), norm(k, k_weight),
                            hd, cache, is_neox=is_neox)


def fused_qk_rope(qkv, num_heads_q: int, num_heads_k: int, num_heads_v: int,
                  head_dim: int, q_weight, k_weight, base: float,
                  is_neox: bool, position_ids, factor: float = 1.0,
                  low: float = 1.0, high: float = 1.0,
                  attention_factor: float = 1.0, rotary_dim: int = None):
    """elementwise.py:464-549 — per-dim weight scaling + YARN RoPE over the
    packed QKV row; functional (returns the updated qkv). YARN frequency
    blend matches computeFreqYarn (FusedQKNormRope.cpp:44-67): ramp on the
    even dim index between low/high, extrapolation at ramp=1."""
    rot = rotary_dim or head_dim
    t = qkv.shape[0]
    hq, hk, hv = num_heads_q, num_heads_k, num_heads_v
    x = qkv.reshape(t, hq + hk + hv, head_dim)

    i2 = jnp.arange(0, rot, 2, dtype=jnp.float32)
    freq = base ** (-i2 / rot)
    if factor != 1.0:
        high_adj = high + 0.001 if abs(low - high) <= 1e-6 else high
        ramp = jnp.clip((i2 - low) / (high_adj - low), 0.0, 1.0)
        freq = (freq / factor) * (1.0 - ramp) + freq * ramp
    ang = position_ids.astype(jnp.float32)[:, None] * freq[None, :]
    cos = (jnp.cos(ang) * attention_factor)[:, None, :]
    sin = (jnp.sin(ang) * attention_factor)[:, None, :]

    def rope_part(part, w):
        p = (part.astype(jnp.float32) * w.astype(jnp.float32)[None, None, :])
        r, tail = p[..., :rot], p[..., rot:]
        if is_neox:
            a, bb = r[..., : rot // 2], r[..., rot // 2 :]
            r = jnp.concatenate([a * cos - bb * sin, a * sin + bb * cos], axis=-1)
        else:
            a, bb = r[..., 0::2], r[..., 1::2]
            r = jnp.stack([a * cos - bb * sin, a * sin + bb * cos], axis=-1).reshape(r.shape)
        return jnp.concatenate([r, tail], axis=-1).astype(part.dtype)

    q = rope_part(x[:, :hq], q_weight)
    kk = rope_part(x[:, hq : hq + hk], k_weight)
    return jnp.concatenate([q, kk, x[:, hq + hk :]], axis=1).reshape(qkv.shape)


def fused_q_norm_rope(q_input, q_output=None, freqs_cis=None, positions=None,
                      eps: float = 1e-6):
    """elementwise.py:644-683 (DeepSeek-V4 Q path): unweighted RMSNorm over
    the FULL head_dim, then interleaved-complex RoPE on the LAST rope_dim
    elements. Functional: returns the result (q_output accepted, unused)."""
    del q_output
    b, h, hd = q_input.shape
    rot = freqs_cis.shape[-1]
    x = q_input.astype(jnp.float32)
    x = x * _jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    re, im = _freqs_cis_rows(freqs_cis, positions)
    roped = _rope_interleaved(x[..., hd - rot :], re[:, None, :], im[:, None, :])
    return jnp.concatenate([x[..., : hd - rot], roped], axis=-1).astype(q_input.dtype)


def fused_k_norm_rope_flashmla(kv, kv_weight, freqs_cis, positions, out_loc,
                               kvcache, eps: float, page_size: int = 0):
    """elementwise.py:686-723 + FusedQKNormRope.cpp:1336-1460 (DSv4 K path):
    weighted RMSNorm over the full 512 row, interleaved RoPE on the last
    rope_dim elements, scatter at out_loc (negative skips). The reference
    packs fp8-nope + bf16-rope + UE8M0 scales into uint8 page bytes; the
    TPU cache is the typed paged pool [P, page, head_dim] (fp8 latent pools
    use the kv_scale machinery, ops/kvcache.py). Returns the updated cache."""
    del page_size
    rot = freqs_cis.shape[-1]
    hd = kv.shape[-1]
    x = _rmsnorm(kv, kv_weight, eps).astype(jnp.float32)
    re, im = _freqs_cis_rows(freqs_cis, positions)
    roped = _rope_interleaved(x[..., hd - rot :], re, im)
    row = jnp.concatenate([x[..., : hd - rot], roped], axis=-1)
    p, page, d = kvcache.shape
    flat = kvcache.reshape(p * page, d)
    safe = jnp.where(out_loc >= 0, out_loc, p * page)
    return flat.at[safe].set(row.astype(kvcache.dtype), mode="drop").reshape(kvcache.shape)


def _interleaved_to_cos_sin(freqs_cis):
    """Interleaved complex rows -> this framework's [cos | sin] cache."""
    return jnp.concatenate([freqs_cis[..., 0::2], freqs_cis[..., 1::2]], axis=-1)


def compress_norm_rope_store(input, plan, norm_weight, norm_eps, freq_cis,
                             out_loc, kvcache, is_decode: bool,
                             compress_ratio: int, page_size: int,
                             use_fp4: bool = False):
    """fused_norm_rope_v2_torch.py:474-560: plan-driven norm+rope+store of
    compressed tokens. plan is the reference's packed (N, 16)-uint8 record
    (decoded per _decode_plan_c/_decode_plan_d, :schema at lines 60-78);
    inactive rows store nowhere (slot -1, dropped scatter).

    head_dim 512 -> FlashMLA paged store (typed pool [P, page, 512+rope]);
    head_dim 128 -> indexer store: kvcache must be the (idx_cache,
    idx_scale_cache) pair (the TPU indexer pool keeps the fp8 row and the
    f32 scale as separate arrays; use_fp4 maps to the same fp8 store — v5e
    has no fp4 compute path). Functional: returns the updated cache(s)."""
    n, head_dim = input.shape
    r = compress_ratio
    i32 = _jax.lax.bitcast_convert_type(plan.reshape(n, 4, 4), jnp.int32)
    if not is_decode:
        seq_len = i32[:, 0]
        i16 = _jax.lax.bitcast_convert_type(plan.reshape(n, 8, 2), jnp.int16)
        ragged = i16[:, 2].astype(jnp.int32) & 0xFFFF
        active = seq_len != -1  # u32 0xFFFFFFFF marks invalid
        pos = jnp.maximum(seq_len - r, 0)
        locs = jnp.where(active, out_loc[jnp.clip(ragged, 0, out_loc.shape[0] - 1)], -1)
    else:
        seq_len = i32[:, 0]
        active = (seq_len % r == 0) & (seq_len > 0)
        pos = jnp.maximum(seq_len - r, 0)
        locs = jnp.where(active, out_loc[: n], -1)

    if head_dim == 128:
        idx_cache, idx_scale_cache = kvcache
        return _k_indexer_store(input, pos, _interleaved_to_cos_sin(freq_cis),
                                norm_weight, idx_cache, idx_scale_cache,
                                locs, eps=norm_eps)
    return fused_k_norm_rope_flashmla(input, norm_weight, freq_cis, pos, locs,
                                      kvcache, norm_eps, page_size)


# --- inkling sconv metadata + conv (inkling_sconv.py:79-243) ---

def fused_decode_sconv_metadata(B: int, cache_indices, out=None):
    """inkling_sconv.py:79-98: returns (query_start_loc, has_initial_state,
    SconvMetadata) for a decode batch (one token per sequence)."""
    del out
    mask, safe = _inkling.sconv_decode_metadata(cache_indices)
    qsl = jnp.arange(B + 1, dtype=jnp.int32)
    si = jnp.arange(B, dtype=jnp.int32)
    return qsl, mask, SconvMetadata(cache_mask=mask, safe_idx=safe, cu=qsl, si=si)


def fused_extend_sconv_metadata(*, B: int, T: int = 0, cache_indices,
                                his_mode: int = 0, extend_seq_lens=None,
                                his_src=None, draft_token_num=None, out=None):
    """inkling_sconv.py:100-136 + InklingSconv.cpp:1248-1304. his_mode:
    0=zeros, 1=prefix (his_src>0), 2=seq-minus-ext (his_src-len>0),
    3=ones (uniform draft_token_num tokens/seq)."""
    del out
    valid, safe = _inkling.sconv_decode_metadata(cache_indices)
    if his_mode == 3:
        tps = int(draft_token_num or 1)
        lens = jnp.full((B,), tps, jnp.int32)
    else:
        lens = jnp.asarray(extend_seq_lens, jnp.int32)
    cu = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(lens)])
    total = int(T) if T else int(_np.asarray(lens).sum())
    si = jnp.sum(jnp.arange(total, dtype=jnp.int32)[:, None] >= cu[None, 1:B], axis=1)
    if his_mode == 0:
        his = jnp.zeros((B,), bool)
    elif his_mode == 1:
        his = jnp.asarray(his_src) > 0
    elif his_mode == 2:
        his = (jnp.asarray(his_src) - lens) > 0
    else:
        his = jnp.ones((B,), bool)
    his = his & valid
    return cu, his, SconvMetadata(cache_mask=his, safe_idx=safe, cu=cu, si=si)


def causal_conv1d(x, weight, sconv_cache, cache_mask, safe_idx, cu, si,
                  activation=None, use_residual: bool = True,
                  is_decode: bool = False):
    """inkling_sconv.py:201-226 (inkling sconv forward): packed token-major
    x [T, D] against the depthwise weight [D, W], reading the initial
    window from sconv_cache rows where cache_mask. Functional — the cache
    is NOT updated here (update_sconv_cache does that, as in the
    reference). Decode: one token per row, prefix from the cache.
    Extend: per-sequence causal conv via host-concrete cu offsets."""
    if x.shape[0] == 0:
        return x
    if is_decode:
        prefix = jnp.where(cache_mask.reshape(-1, 1, 1),
                           sconv_cache[safe_idx].astype(jnp.float32), 0.0)
        xp = jnp.concatenate([prefix, x.astype(jnp.float32)[:, None, :]], axis=1)
        w = weight.astype(jnp.float32)
        y = jnp.einsum("twd,dw->td", xp, w)
        if activation in ("silu", "swish"):
            y = y * _jax.nn.sigmoid(y)
        if use_residual:
            y = y + x.astype(jnp.float32)
        return y.astype(x.dtype)
    cu_h = _np.asarray(cu)
    lens = cu_h[1:] - cu_h[:-1]
    n, smax = len(lens), int(lens.max()) if len(lens) else 0
    batched = jnp.zeros((n, smax, x.shape[-1]), x.dtype)
    for i, (s0, ln) in enumerate(zip(cu_h[:-1], lens)):
        batched = batched.at[i, : int(ln)].set(x[int(s0) : int(s0 + ln)])
    init = jnp.where(cache_mask.reshape(-1, 1, 1),
                     sconv_cache[safe_idx], 0.0).astype(sconv_cache.dtype)
    act = activation if activation in ("silu", "swish") else None
    y, _ = causal_conv1d_fwd(batched, weight, None,
                             jnp.asarray(lens, jnp.int32), init, activation=act)
    if use_residual:
        y = (y.astype(jnp.float32) + batched.astype(jnp.float32)).astype(y.dtype)
    return jnp.concatenate([y[i, : int(ln)] for i, ln in enumerate(lens)], axis=0)


def update_sconv_cache(x, sconv_cache, cache_indices, has_initial_state,
                       query_start_loc):
    """inkling_sconv.py:229-243: write each sequence's final conv window
    (last W-1 tokens, left-padded with the prior cache when the segment is
    shorter and has_initial_state) back to its cache row. Functional:
    returns the updated cache. Host-concrete query_start_loc."""
    wm1 = sconv_cache.shape[1]
    cu = _np.asarray(query_start_loc)
    rows = []
    for i, (s0, s1) in enumerate(zip(cu[:-1], cu[1:])):
        ln = int(s1 - s0)
        take = min(ln, wm1)
        seg = x[int(s1) - take : int(s1)].astype(sconv_cache.dtype)
        if take < wm1:
            # short segment: the window's older taps shift in from the
            # prior cache row (zeros when no initial state)
            prior = jnp.where(
                has_initial_state[i],
                sconv_cache[jnp.maximum(cache_indices[i], 0)][take:],
                jnp.zeros((wm1 - take, x.shape[-1]), sconv_cache.dtype))
            seg = jnp.concatenate([prior.astype(sconv_cache.dtype), seg], axis=0)
        rows.append(seg)
    tails = jnp.stack(rows) if rows else jnp.zeros((0, wm1, x.shape[-1]), sconv_cache.dtype)
    return _inkling.update_sconv_cache(sconv_cache, cache_indices, tails)


# --- GDN mega-dispatcher (gdn_attn.py:55-200) ---

def gdn_attention(core_attn_out, z, projected_states_qkvz, projected_states_ba,
                  num_k_heads: int, num_v_heads: int, head_k_dim: int,
                  head_v_dim: int, conv_state, ssm_state, conv_weights,
                  conv_bias, activation: str, A_log, dt_bias,
                  num_prefills: int, num_decodes: int, num_spec_decodes: int,
                  has_initial_state=None, non_spec_query_start_loc=None,
                  non_spec_token_indx=None, non_spec_state_indices_tensor=None,
                  spec_query_start_loc=None, spec_token_indx=None,
                  spec_state_indices_tensor=None, num_accepted_tokens=None,
                  num_actual_tokens: int = 0, tp_size: int = 1,
                  reorder_input: bool = False):
    """gdn_attn.py:55-200: the reference's fused GDN entry handling mixed
    prefill/decode/spec batches in one call. Functional adapter — returns
    (core_attn_out, z, conv_state, ssm_state) instead of in-place writes.

    Sub-batches route to the native ops: prefills via gdn_attention_prefill
    (ragged via host-concrete query_start_loc), decodes via
    gdn_attention_decode, spec-decode drafts via a per-sequence short
    prefill from the slot-0 spec state (per-draft-token intermediate states
    are the engine's concern on TPU — models/spec.py keeps tree state
    functionally; only the final state lands back in the pool here). A_log,
    dt_bias, conv params follow the native op contracts (ops/linear_attn/
    gdn.py)."""
    del core_attn_out, z, num_actual_tokens, tp_size, reorder_input
    kw = dict(num_k_heads=num_k_heads, num_v_heads=num_v_heads,
              head_k_dim=head_k_dim, head_v_dim=head_v_dim,
              activation=activation or "silu")
    qkvz, ba = projected_states_qkvz, projected_states_ba
    if non_spec_token_indx is not None:
        ns_qkvz = qkvz[non_spec_token_indx]
        ns_ba = ba[non_spec_token_indx]
    else:
        ns_qkvz, ns_ba = qkvz, ba

    outs, zs = [], []
    sidx = (jnp.arange(num_prefills + num_decodes, dtype=jnp.int32)
            if non_spec_state_indices_tensor is None
            else jnp.asarray(non_spec_state_indices_tensor, jnp.int32))

    if num_prefills or num_decodes:
        cu = (_np.asarray(non_spec_query_start_loc)
              if non_spec_query_start_loc is not None
              else _np.arange(num_decodes + 1))
        lens = cu[1:] - cu[:-1]
        # prefill sequences first (SGLang batch layout), then 1-token decodes
        if num_prefills:
            p_lens = lens[:num_prefills]
            smax = int(p_lens.max())
            bat_q = jnp.zeros((num_prefills, smax, ns_qkvz.shape[-1]), ns_qkvz.dtype)
            bat_b = jnp.zeros((num_prefills, smax, ns_ba.shape[-1]), ns_ba.dtype)
            for i, (s0, ln) in enumerate(zip(cu[:num_prefills], p_lens)):
                bat_q = bat_q.at[i, : int(ln)].set(ns_qkvz[int(s0) : int(s0 + ln)])
                bat_b = bat_b.at[i, : int(ln)].set(ns_ba[int(s0) : int(s0 + ln)])
            rows = sidx[:num_prefills]
            cs, ss = conv_state[rows], ssm_state[rows]
            if has_initial_state is not None:
                keep = jnp.asarray(has_initial_state)[:num_prefills]
                cs = jnp.where(keep[:, None, None], cs, 0)
                ss = jnp.where(keep[:, None, None, None], ss, 0)
            o, zz, cs, ss = _gdn_prefill(bat_q, bat_b, conv_weights, conv_bias,
                                         A_log, dt_bias, cs, ss,
                                         jnp.asarray(p_lens, jnp.int32), **kw)
            conv_state = conv_state.at[rows].set(cs)
            ssm_state = ssm_state.at[rows].set(ss)
            for i, ln in enumerate(p_lens):
                outs.append(o[i, : int(ln)])
                zs.append(zz[i, : int(ln)])
        if num_decodes:
            d0 = int(cu[num_prefills])
            dq = ns_qkvz[d0 : d0 + num_decodes]
            db = ns_ba[d0 : d0 + num_decodes]
            rows = sidx[num_prefills : num_prefills + num_decodes]
            o, zz, cs, ss = _gdn_decode(dq, db, conv_weights, conv_bias,
                                        A_log, dt_bias, conv_state[rows],
                                        ssm_state[rows], **kw)
            conv_state = conv_state.at[rows].set(cs)
            ssm_state = ssm_state.at[rows].set(ss)
            outs.append(o)
            zs.append(zz)

    if num_spec_decodes:
        s_qkvz = qkvz[spec_token_indx] if spec_token_indx is not None else qkvz
        s_ba = ba[spec_token_indx] if spec_token_indx is not None else ba
        cu = _np.asarray(spec_query_start_loc)
        lens = cu[1:] - cu[:-1]
        smax = int(lens.max())
        bat_q = jnp.zeros((num_spec_decodes, smax, s_qkvz.shape[-1]), s_qkvz.dtype)
        bat_b = jnp.zeros((num_spec_decodes, smax, s_ba.shape[-1]), s_ba.dtype)
        for i, (s0, ln) in enumerate(zip(cu[:-1], lens)):
            bat_q = bat_q.at[i, : int(ln)].set(s_qkvz[int(s0) : int(s0 + ln)])
            bat_b = bat_b.at[i, : int(ln)].set(s_ba[int(s0) : int(s0 + ln)])
        rows = jnp.asarray(spec_state_indices_tensor)[:, 0]
        run = (jnp.asarray(lens, jnp.int32)
               if num_accepted_tokens is None
               else jnp.minimum(jnp.asarray(num_accepted_tokens, jnp.int32),
                                jnp.asarray(lens, jnp.int32)))
        o, zz, cs, ss = _gdn_prefill(bat_q, bat_b, conv_weights, conv_bias,
                                     A_log, dt_bias, conv_state[rows],
                                     ssm_state[rows], run, **kw)
        conv_state = conv_state.at[rows].set(cs)
        ssm_state = ssm_state.at[rows].set(ss)
        for i, ln in enumerate(lens):
            outs.append(o[i, : int(ln)])
            zs.append(zz[i, : int(ln)])

    core = jnp.concatenate([o.reshape(-1, *o.shape[-2:]) for o in outs], axis=0)
    zout = jnp.concatenate([zx.reshape(-1, *zx.shape[-2:]) for zx in zs], axis=0)
    return core, zout, conv_state, ssm_state


def prepare_moe_input(topk_ids, expert_offsets=None, problem_sizes1=None,
                      problem_sizes2=None, input_permutation=None,
                      output_permutation=None, num_experts: int = 0,
                      n: int = 0, k: int = 0, blockscale_offsets=None):
    """moe.py:278-302 + MoEPrepareInputs.cpp:18-170: grouped-GEMM sideband
    from topk_ids. Functional — returns (expert_offsets [E+1],
    problem_sizes1 [E,3]=(m_e, 2n, k), problem_sizes2 [E,3]=(m_e, k, n),
    input_permutation (sorted-pos -> flat token idx), output_permutation
    (flat token idx -> sorted pos), blockscale_offsets [E+1] (4-row
    aligned) or None)."""
    del expert_offsets, problem_sizes1, problem_sizes2
    del input_permutation, output_permutation
    flat = topk_ids.reshape(-1).astype(jnp.int32)
    e = int(num_experts)
    counts = jnp.bincount(flat, length=e).astype(jnp.int32)
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    ps1 = jnp.stack([counts,
                     jnp.full((e,), 2 * n, jnp.int32),
                     jnp.full((e,), k, jnp.int32)], axis=1)
    ps2 = jnp.stack([counts,
                     jnp.full((e,), k, jnp.int32),
                     jnp.full((e,), n, jnp.int32)], axis=1)
    in_perm = jnp.argsort(flat, stable=True).astype(jnp.int32)
    out_perm = jnp.argsort(in_perm).astype(jnp.int32)
    del blockscale_offsets  # always returned; callers that don't need it drop it
    padded = ((counts + 3) // 4) * 4
    bso = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)])
    return off, ps1, ps2, in_perm, out_perm, bso
