"""Gated-MLP activation ops.

TPU-native equivalents of the reference's activation kernels
(src/sycl/TripleOps.cpp, SiluAndMulClamp.cpp, SwigluAlphaLimit.cpp):
silu_and_mul / gelu_and_mul / gelu_tanh_and_mul, the DSv4 clamped variant,
and the gpt-oss swiglu with sigmoid alpha + limit.

These are elementwise chains — XLA fuses them into neighbouring matmuls on
TPU, so jnp is the speed-of-light implementation (no Pallas indirection).
All ops accept [..., 2*d] gate|up-concatenated input and return [..., d],
matching the reference ABI (torch_extension_sycl.cc:29-39, 90-91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x):
    return x * jax.nn.sigmoid(x)


def _split(x):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


@jax.jit
def silu_and_mul(x):
    gate, up = _split(x)
    return (silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)


@jax.jit
def gelu_and_mul(x):
    gate, up = _split(x)
    return (jax.nn.gelu(gate.astype(jnp.float32), approximate=False) * up.astype(jnp.float32)).astype(x.dtype)


@jax.jit
def gelu_tanh_and_mul(x):
    gate, up = _split(x)
    return (jax.nn.gelu(gate.astype(jnp.float32), approximate=True) * up.astype(jnp.float32)).astype(x.dtype)


@jax.jit
def gelu_quick(x):
    """quick-gelu: x * sigmoid(1.702 x)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


@jax.jit
def silu_and_mul_clamp(x, limit: float = 7.0, alpha: float = 1.702):
    """DSv4-style clamped gated silu (SiluAndMulClamp.cpp): gate clamped to
    [-limit, limit], up clamped to [-limit, limit] before the product."""
    gate, up = _split(x.astype(jnp.float32))
    gate = jnp.clip(gate, -limit, limit)
    up = jnp.clip(up, -limit, limit)
    return (silu(gate) * up).astype(x.dtype)


@jax.jit
def swiglu_alpha_limit(x, alpha: float = 1.702, limit: float = 7.0):
    """gpt-oss swiglu (SwigluAlphaLimit.cpp): interleaved gate/up pairs,
    gate clipped above by limit, up to [-limit, limit]:
    out = (gate * sigmoid(alpha*gate)) * (up + 1).
    Here gate = x[..., ::2], up = x[..., 1::2] (interleaved layout)."""
    xf = x.astype(jnp.float32)
    gate = xf[..., 0::2]
    up = xf[..., 1::2]
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    out = (gate * jax.nn.sigmoid(alpha * gate)) * (up + 1.0)
    return out.astype(x.dtype)


ACTIVATIONS = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_tanh": gelu_tanh_and_mul,
    "silu_clamp": silu_and_mul_clamp,
    "swiglu_gpt_oss": swiglu_alpha_limit,
}
