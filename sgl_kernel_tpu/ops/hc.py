"""mHC / hyper-connections ops (DSv4-style multi-stream residuals).

TPU-native equivalents of the reference's HC kernels
(src/sycl/HCSplitSinkhorn.cpp, HCPreFuse.cpp, HCPreGemmSqrSum.cpp,
HCPost.cpp; python composition mhc.py:176-252). hc_mult streams of the
residual are mixed by Sinkhorn-normalized coefficients computed from the
token itself:

  mixes  = (residual_flat @ fn^T) * rsqrt(mean(residual_flat^2) + eps)
  pre    = sigmoid(mixes[:, :H] * s0 + b0) + eps           (stream -> layer)
  post   = 2 * sigmoid(mixes[:, H:2H] * s1 + b1)           (layer -> stream)
  comb   = sinkhorn(softmax_rows(mixes[:, 2H:] * s2 + b2)) (stream mixing)

Sinkhorn follows the reference's exact schedule (HCSplitSinkhorn.cpp:58-96):
row-softmax + eps, column-normalize, then (iters-1) x (row-normalize,
column-normalize), all with +eps regularization.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .norm import rmsnorm


@functools.partial(jax.jit, static_argnames=("hc_mult", "sinkhorn_iters", "eps"))
def hc_split_sinkhorn(
    mixes,
    hc_scale,
    hc_base,
    hc_mult: int = 4,
    sinkhorn_iters: int = 20,
    eps: float = 1e-6,
):
    """mixes [..., (2+H)*H] f32; hc_scale [3]; hc_base [(2+H)*H].

    Returns (pre [..., H], post [..., H], comb [..., H, H]).
    """
    h = hc_mult
    lead = mixes.shape[:-1]
    m = mixes.astype(jnp.float32).reshape(-1, (2 + h) * h)
    base = hc_base.astype(jnp.float32)
    s0, s1, s2 = (hc_scale.astype(jnp.float32)[i] for i in range(3))

    pre = jax.nn.sigmoid(m[:, :h] * s0 + base[:h]) + eps
    post = 2.0 * jax.nn.sigmoid(m[:, h : 2 * h] * s1 + base[h : 2 * h])

    logits = (m[:, 2 * h :] * s2 + base[2 * h :]).reshape(-1, h, h)
    comb = jax.nn.softmax(logits, axis=-1) + eps
    comb = comb / (jnp.sum(comb, axis=-2, keepdims=True) + eps)
    for _ in range(sinkhorn_iters - 1):
        comb = comb / (jnp.sum(comb, axis=-1, keepdims=True) + eps)
        comb = comb / (jnp.sum(comb, axis=-2, keepdims=True) + eps)
    return (
        pre.reshape(*lead, h),
        post.reshape(*lead, h),
        comb.reshape(*lead, h, h),
    )


@functools.partial(
    jax.jit,
    static_argnames=("hc_mult", "sinkhorn_iters", "rms_eps", "hc_pre_eps", "hc_sinkhorn_eps", "norm_eps"),
)
def mhc_pre(
    residual,
    fn,
    hc_scale,
    hc_base,
    norm_weight=None,
    *,
    hc_mult: int = 4,
    sinkhorn_iters: int = 20,
    rms_eps: float = 1e-6,
    hc_pre_eps: float = 1e-6,
    hc_sinkhorn_eps: float = 1e-6,
    norm_eps: float = 1e-6,
):
    """Pre-layer HC mix (mhc.py:176-252 + HCPreFuse.cpp semantics).

    residual [T, H, D]; fn [(2+H)*H, H*D] mixing projection.
    Returns (post_mix [T, H], comb_mix [T, H, H], layer_input [T, D]).
    """
    t, h, d = residual.shape
    a = residual.reshape(t, h * d).astype(jnp.float32)
    # RMS-normalized mixing logits (gemm + row sqr-sum fused in the reference)
    inv_rms = jax.lax.rsqrt(jnp.mean(jnp.square(a), axis=-1, keepdims=True) + rms_eps)
    mixes = (a @ fn.astype(jnp.float32).T) * inv_rms
    pre, post, comb = hc_split_sinkhorn(
        mixes, hc_scale, hc_base, hc_mult, sinkhorn_iters, hc_sinkhorn_eps
    )
    pre = pre + (hc_pre_eps - hc_sinkhorn_eps) if hc_pre_eps != hc_sinkhorn_eps else pre
    layer_input = jnp.einsum("th,thd->td", pre, residual.astype(jnp.float32))
    if norm_weight is not None:
        layer_input = rmsnorm(layer_input, norm_weight, norm_eps)
    return post, comb, layer_input.astype(jnp.bfloat16)


@jax.jit
def hc_post(x, residual, post_layer_mix, comb_res_mix):
    """Post-layer HC combine (HCPost.cpp):
    out[t, i] = post[t, i] * x[t] + sum_j comb[t, i, j] * residual[t, j].

    x [T, D]; residual [T, H, D]; post [T, H]; comb [T, H, H].
    """
    xf = x.astype(jnp.float32)
    rf = residual.astype(jnp.float32)
    out = post_layer_mix.astype(jnp.float32)[..., None] * xf[:, None, :]
    out = out + jnp.einsum("tij,tjd->tid", comb_res_mix.astype(jnp.float32), rf)
    return out.astype(residual.dtype)
