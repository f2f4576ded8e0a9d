"""Small remaining op-surface parity items.

  - timestep_embedding: diffusion sinusoidal embedding
    (include/sgl_kernel/jit_kernel/diffusion/timestep_embedding.hpp).
  - moe_sum / moe_sum_reduce: top-k expert-output reduction
    (src/sycl/MoESum.cpp, MoE_sum_reduce.cpp).
  - weak_ref_tensor: CUDA-graph alias helper — a no-op under XLA's
    functional buffers (kept for API parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("dim", "max_period"))
def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding [T] -> [T, dim] (cos | sin halves)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(jnp.float32(max_period)) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@jax.jit
def moe_sum(x):
    """Sum over the top-k axis: [T, K, D] -> [T, D] (MoESum.cpp)."""
    return jnp.sum(x.astype(jnp.float32), axis=1).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("routed_scaling_factor",))
def moe_sum_reduce(x, routed_scaling_factor: float = 0.0):
    """Top-k sum with optional routed scaling (MoE_sum_reduce.cpp)."""
    out = jnp.sum(x.astype(jnp.float32), axis=1)
    if routed_scaling_factor:
        out = out * routed_scaling_factor
    return out.astype(x.dtype)


def weak_ref_tensor(x):
    """API parity with the reference's weak_ref_tensor (weak_ref_tensor.cpp):
    XLA buffers are immutable/functional, so the alias is the array itself."""
    return x
