"""RMSNorm family.

TPU-native equivalents of the reference's norm kernels
(src/sycl/RMSNorm.cpp, Norm.h; torch registrations
torch_extension_sycl.cc:41-51): rmsnorm, fused_add_rmsnorm and the gemma
(weight+1) variants, plus l2norm used by the GDN path.

All statistics are computed in float32 regardless of input dtype (the
reference compiles with value-safe FP flags for the same reason —
cmake/BuildFlags.cmake:80-86), then cast back. XLA fuses the whole chain
into one HBM pass, so jnp is optimal here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rms(x, eps):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


@functools.partial(jax.jit, static_argnames=("eps", "gemma"))
def rmsnorm(x, weight, eps: float = 1e-6, *, gemma: bool = False):
    """out = x / sqrt(mean(x^2) + eps) * w   (gemma: * (w + 1))."""
    xf = x.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    if gemma:
        wf = wf + 1.0
    return (_rms(xf, eps) * wf).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "gemma"))
def fused_add_rmsnorm(x, residual, weight, eps: float = 1e-6, *, gemma: bool = False):
    """residual' = x + residual;  out = rmsnorm(residual') * w.

    Returns (out, residual'). Functional form of the reference's in-place
    fused_add_rms_norm (RMSNorm.cpp).
    """
    res = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rmsnorm(res, weight, eps, gemma=gemma), res


gemma_rmsnorm = functools.partial(rmsnorm, gemma=True)
gemma_fused_add_rmsnorm = functools.partial(fused_add_rmsnorm, gemma=True)


@functools.partial(jax.jit, static_argnames=("eps",))
def l2norm(x, eps: float = 1e-6):
    """x / sqrt(sum(x^2) + eps) over the last dim (GDN qk-norm helper)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + eps)).astype(x.dtype)
