"""Recurrent-state cache management for conv/SSM layers.

TPU-native equivalents of the reference's sconv/ssm cache ops used by
speculative decoding (torch_extension_sycl.cc:238-247: cache update,
gather-scatter, draft-extend rollback): per-request conv windows and SSM
states live in request-indexed pools; speculative drafts snapshot, roll
back, and commit states by index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def state_cache_update(cache, state_indices, new_states):
    """cache [R, ...]; state_indices [B] request slots; new_states [B, ...]."""
    safe = jnp.where(state_indices >= 0, state_indices, cache.shape[0])
    return cache.at[safe].set(new_states.astype(cache.dtype), mode="drop")


@jax.jit
def state_cache_gather(cache, state_indices):
    """Gather request states: [B, ...] (negative indices -> zeros)."""
    safe = jnp.where(state_indices >= 0, state_indices, 0)
    out = cache[safe]
    valid = (state_indices >= 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(valid, out, 0)


@jax.jit
def state_cache_gather_scatter(cache, src_indices, dst_indices):
    """Copy states between request slots (spec-decode fork/accept):
    cache[dst[i]] = cache[src[i]]."""
    rows = cache[jnp.where(src_indices >= 0, src_indices, 0)]
    safe_dst = jnp.where((src_indices >= 0) & (dst_indices >= 0), dst_indices, cache.shape[0])
    return cache.at[safe_dst].set(rows, mode="drop")
