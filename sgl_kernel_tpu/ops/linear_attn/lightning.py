"""MiniMax lightning-attention decode step.

TPU-native implementation of the reference's declared-only
``lightning_attention_decode`` (include/sgl_kernel_ops.h:102-109, SURVEY
§2.6 roadmap): single-token linear attention with per-head exponential
decay over a [dk, dv] recurrent state.

    state' = exp(-slope) * state + k^T v
    o      = q @ state'
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def lightning_attention_decode(q, k, v, past_kv, slope):
    """q/k [B, H, 1, dk]; v [B, H, 1, dv]; past_kv [B, H, dk, dv];
    slope [H, 1, 1] decay rates. Returns (o [B, H, 1, dv], new_kv)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    decay = jnp.exp(-slope.astype(jnp.float32)).reshape(1, -1, 1, 1)
    new_kv = past_kv.astype(jnp.float32) * decay + jnp.einsum("bhik,bhiv->bhkv", kf, vf)
    o = jnp.einsum("bhik,bhkv->bhiv", qf, new_kv)
    return o.astype(v.dtype), new_kv.astype(past_kv.dtype)
