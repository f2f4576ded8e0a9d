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


@functools.partial(jax.jit, static_argnames=("n_splits",))
def hc_pre_gemm_sqr_sum(a, fn, n_splits: int = 1):
    """Stage 1 of the split mHC-pre pipeline (reference
    hc_pre_gemm_sqr_sum, mhc.py:163-169 + HCPreGemmSqrSum.cpp): the mixing
    GEMM and the row square-sum of A computed together, PARTIAL over
    ``n_splits`` K-slices (the reference splits K across workgroups and
    lets hc_pre_big_fuse reduce).

    a [T, H*D]; fn [(2+H)*H, H*D]. Returns
    (gemm_out_mul [S, T, (2+H)*H] f32, gemm_out_sqrsum [S, T] f32) —
    sum over the S axis gives the full GEMM / square-sum.
    """
    t, k = a.shape
    assert k % n_splits == 0, (k, n_splits)
    ks = k // n_splits
    a3 = a.astype(jnp.float32).reshape(t, n_splits, ks)
    f3 = fn.astype(jnp.float32).reshape(fn.shape[0], n_splits, ks)
    mul = jnp.einsum("tsk,msk->stm", a3, f3)
    sqr = jnp.sum(jnp.square(a3), axis=-1).T
    return mul, sqr


@functools.partial(
    jax.jit,
    static_argnames=(
        "hc_mult", "sinkhorn_iters", "rms_eps", "hc_pre_eps",
        "hc_sinkhorn_eps", "hc_post_mult_value", "norm_eps",
    ),
)
def hc_pre_big_fuse(
    gemm_out_mul,
    gemm_out_sqrsum,
    hc_scale,
    hc_base,
    residual,
    *,
    hc_mult: int = 4,
    sinkhorn_iters: int = 20,
    rms_eps: float = 1e-5,
    hc_pre_eps: float = 1e-6,
    hc_sinkhorn_eps: float = 1e-6,
    hc_post_mult_value: float = 2.0,
    norm_weight=None,
    norm_eps: float = 1e-6,
):
    """Stage 2 of the split mHC-pre pipeline (reference hc_pre_big_fuse,
    mhc.py:94-149 + HCPreFuse.cpp:1-609): reduce the per-split partial
    GEMM/square-sum, RMS-normalize the mixing logits, run the
    split+sinkhorn, and produce the pre-mixed layer input (+ optional
    fused rmsnorm). Functional form of the reference's out-param writes:
    returns (post_mix [T, H], comb_mix [T, H, H], layer_input [T, D]).

    gemm_out_mul [S, T, (2+H)*H]; gemm_out_sqrsum [S, T];
    residual [T, H, D] (the reference passes it flat [T, H*D]).
    """
    t, h, d = residual.shape
    mixes_raw = jnp.sum(gemm_out_mul.astype(jnp.float32), axis=0)
    sqr = jnp.sum(gemm_out_sqrsum.astype(jnp.float32), axis=0)
    inv_rms = jax.lax.rsqrt(sqr[:, None] / (h * d) + rms_eps)
    mixes = mixes_raw * inv_rms
    pre, post, comb = hc_split_sinkhorn(
        mixes, hc_scale, hc_base, hc_mult, sinkhorn_iters, hc_sinkhorn_eps
    )
    pre = pre + (hc_pre_eps - hc_sinkhorn_eps) if hc_pre_eps != hc_sinkhorn_eps else pre
    post = post * (hc_post_mult_value / 2.0)  # hc_split_sinkhorn bakes 2.0 in
    layer_input = jnp.einsum("th,thd->td", pre, residual.astype(jnp.float32))
    if norm_weight is not None:
        layer_input = rmsnorm(layer_input, norm_weight, norm_eps)
    return post, comb, layer_input.astype(jnp.bfloat16)


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
    """Pre-layer HC mix (mhc.py:176-252): composes the two split entry
    points exactly as the reference does (hc_pre_gemm_sqr_sum then
    hc_pre_big_fuse) — under jit XLA fuses the pipeline, so the split is
    free here while SGLang ports can call the stages separately.

    residual [T, H, D]; fn [(2+H)*H, H*D] mixing projection.
    Returns (post_mix [T, H], comb_mix [T, H, H], layer_input [T, D]).
    """
    t, h, d = residual.shape
    a = residual.reshape(t, h * d)
    mul, sqr = hc_pre_gemm_sqr_sum(a, fn, n_splits=1)
    return hc_pre_big_fuse(
        mul, sqr, hc_scale, hc_base, residual,
        hc_mult=hc_mult, sinkhorn_iters=sinkhorn_iters, rms_eps=rms_eps,
        hc_pre_eps=hc_pre_eps, hc_sinkhorn_eps=hc_sinkhorn_eps,
        norm_weight=norm_weight, norm_eps=norm_eps,
    )


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
