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
from jax.experimental import pallas as pl

from ..utils import pallas_interpret, round_up


def _rms(x, eps):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps, gemma):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    wf = w_ref[...].astype(jnp.float32)
    if gemma:
        wf = wf + 1.0
    o_ref[...] = (x * jax.lax.rsqrt(var + eps) * wf).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "gemma"))
def rmsnorm(x, weight, eps: float = 1e-6, *, gemma: bool = False):
    """out = x / sqrt(mean(x^2) + eps) * w   (gemma: * (w + 1)).

    Lowered as one Pallas kernel for well-tiled 2D+ shapes: on the axon
    runtime an XLA fusion launch costs ~24us while a Pallas call costs
    ~0.7us (docs/PERF.md), so hot-path elementwise ops go through Pallas.
    """
    d = x.shape[-1]
    rows = 1
    for n in x.shape[:-1]:
        rows *= n
    if d % 128 == 0 and rows >= 1 and weight.ndim == 1:
        x2 = x.reshape(rows, d)
        # row-block by a 4 MB VMEM budget: the flat 512-row cap put an
        # 8 MB block (16+ MB with the f32 cast) on h=8192 inputs and
        # Mosaic refused the kernel (round-5 regen, rmsnorm:1024-8192);
        # h <= 4096 keeps the previous 512-row blocks
        bq_max = max(8, ((4 << 20) // (d * x.dtype.itemsize)) // 8 * 8)
        bq = min(round_up(rows, 8), 512, bq_max)
        rp = round_up(rows, bq)
        if rp != rows:
            x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_rmsnorm_kernel, eps=eps, gemma=gemma),
            grid=(rp // bq,),
            in_specs=[
                pl.BlockSpec((bq, d), lambda i: (i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bq, d), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
            interpret=pallas_interpret(),
        )(x2, weight.reshape(1, d))
        return out[:rows].reshape(x.shape)
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
