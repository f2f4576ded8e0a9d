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
