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
causal_conv1d_fn_xpu = causal_conv1d_fwd
causal_conv1d_update_xpu = causal_conv1d_update

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
