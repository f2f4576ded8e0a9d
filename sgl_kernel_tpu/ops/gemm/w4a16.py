"""W4A16 dequant-fused GEMM (int4 / MXFP4) — the north-star Pallas kernel.

TPU-native replacement for the reference's W4A16 grouped-GEMM mainloop
(src/sycl/kernels/moe/xe20/w4a16/gemm_xe2.hpp: in-register dequant feeding
DPAS). Here the weight matrix is stored as a native ``jnp.int4`` (or uint4
for MXFP4 / asymmetric) array: Mosaic loads the packed nibbles directly from
HBM (half the bandwidth of bf16 — the whole point of W4A16 for decode) and
the kernel dequantizes in VMEM right before each MXU matmul:

    out[M, N] = A[M, K] @ dequant(W[N, K])^T (+ bias)

Dequant contracts (reference include/sgl_kernel_ops.h:692-712):
  - int4 symmetric:   w = code * scale            (signed code, bf16 scale)
  - int4 asymmetric:  w = (code - zero) * scale   (unsigned code, raw zero)
  - mxfp4:            w = e2m1(code) * 2^(scale_byte - 127)

Grid is (N tiles, M tiles, K tiles) with K innermost accumulating into an
f32 VMEM scratch; N/M are "parallel" for megacore, K "arbitrary".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up


def _dequant_tile(w, scales, zeros, fmt: str, group_size: int):
    """Dequantize an int4/uint4 code tile [bn, bk] to bf16 using per-group
    scales [bn, bk // group_size] (and optional zeros)."""
    bn, bk = w.shape
    ng = bk // group_size
    if fmt == "mxfp4":
        c = w.astype(jnp.int32)  # uint4 e2m1 codes 0..15
        mag = c & 0x7
        sign = jnp.where((c >> 3) != 0, -1.0, 1.0)
        m = (mag & 1).astype(jnp.float32)
        e = (mag >> 1).astype(jnp.float32)
        # e=0: subnormal 0.5*m ; e>0: (1 + 0.5 m) * 2^(e-1)
        val = jnp.where(e == 0.0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2(e - 1.0))
        wf = sign * val
        s = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    else:
        wf = w.astype(jnp.float32)
        s = scales.astype(jnp.float32)
        if zeros is not None:
            wf = (wf.reshape(bn, ng, group_size) - zeros.astype(jnp.float32)[..., None]).reshape(bn, bk)
    wf = (wf.reshape(bn, ng, group_size) * s[..., None]).reshape(bn, bk)
    return wf.astype(jnp.bfloat16)


def _kernel(a_ref, w_ref, s_ref, z_ref, b_ref, o_ref, acc_ref, *, fmt, group_size, n_k, has_bias):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wf = _dequant_tile(w_ref[...], s_ref[...], z_ref[...] if z_ref is not None else None, fmt, group_size)
    acc_ref[...] += jax.lax.dot_general(
        a_ref[...],
        wf,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == n_k - 1)
    def _done():
        acc = acc_ref[...]
        if has_bias:
            acc = acc + b_ref[...].astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "fmt", "out_dtype", "bm", "bn", "bk"),
)
def w4a16_gemm(
    a,
    w,
    scales,
    zeros=None,
    bias=None,
    *,
    group_size: int = 128,
    fmt: str = "int4",
    out_dtype=None,
    bm: Optional[int] = None,
    bn: int = 256,
    bk: int = 512,
):
    """A[M, K] @ dequant(W[N, K])^T with 4-bit weights.

    Args:
      a: [M, K] activations (bf16/f16/f32).
      w: [N, K] weight codes — jnp.int4 (symmetric int4), or jnp.uint4
         (asymmetric int4 with ``zeros`` / MXFP4 e2m1 codes).
      scales: [N, K // group_size] — float multiplier (int4) or uint8 UE8M0
         exponent bytes (mxfp4).
      zeros: optional [N, K // group_size] raw zero points (int4 asymmetric).
      bias: optional [N].
      fmt: "int4" | "mxfp4".
    Returns [M, N] in out_dtype (defaults to a.dtype).
    """
    m, k = a.shape
    n = w.shape[0]
    out_dtype = out_dtype or a.dtype
    assert w.shape[1] == k and scales.shape == (n, k // group_size)
    if fmt == "mxfp4":
        assert group_size == 32 and scales.dtype == jnp.uint8

    bm = bm or min(256, round_up(m, 8))
    bn = min(bn, n)
    bk = min(bk, k)
    assert k % bk == 0 and bk % group_size == 0, (k, bk, group_size)
    assert n % bn == 0, (n, bn)

    mp = round_up(m, bm)
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))

    grid = (n // bn, mp // bm, k // bk)
    ngb = bk // group_size

    in_specs = [
        pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk)),
        pl.BlockSpec((bn, bk), lambda j, i, kk: (j, kk)),
        pl.BlockSpec((bn, ngb), lambda j, i, kk: (j, kk)),
    ]
    inputs = [a, w, scales]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((bn, ngb), lambda j, i, kk: (j, kk)))
        inputs.append(zeros)
    has_bias = bias is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda j, i, kk: (0, j)))
        inputs.append(bias.reshape(1, n))

    kernel = functools.partial(
        _kernel_entry,
        has_zeros=zeros is not None,
        has_bias=has_bias,
        fmt=fmt,
        group_size=group_size,
        n_k=k // bk,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, i, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + n * k // 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(*inputs)
    return out[:m] if mp != m else out


def _kernel_entry(*refs, has_zeros, has_bias, fmt, group_size, n_k):
    # refs layout: a, w, s, [z], [bias], o, acc
    a_ref, w_ref, s_ref = refs[0], refs[1], refs[2]
    idx = 3
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    b_ref = refs[idx] if has_bias else None
    idx += int(has_bias)
    o_ref = refs[idx]
    acc_ref = refs[idx + 1]
    _kernel(a_ref, w_ref, s_ref, z_ref, b_ref, o_ref, acc_ref, fmt=fmt, group_size=group_size, n_k=n_k, has_bias=has_bias)


# ---------------------------------------------------------------------------
# Weight preparation (offline, XLA)
# ---------------------------------------------------------------------------


def quantize_w4(w, *, group_size: int = 128, symmetric: bool = True):
    """Quantize a float weight [N, K] to the kernel's int4 layout.

    Returns (codes int4|uint4 [N,K], scales bf16 [N,K//G], zeros or None).
    """
    n, k = w.shape
    wf = w.astype(jnp.float32).reshape(n, k // group_size, group_size)
    if symmetric:
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1, keepdims=True), 1e-10)
        scale = amax / 7.0
        codes = jnp.clip(jnp.rint(wf / scale), -8, 7).astype(jnp.int4).reshape(n, k)
        return codes, scale[..., 0].astype(jnp.bfloat16), None
    wmin = jnp.min(wf, axis=-1, keepdims=True)
    wmax = jnp.max(wf, axis=-1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
    zero = jnp.rint(-wmin / scale)
    codes = jnp.clip(jnp.rint(wf / scale) + zero, 0, 15).astype(jnp.uint4).reshape(n, k)
    return codes, scale[..., 0].astype(jnp.bfloat16), zero[..., 0].astype(jnp.bfloat16)


def awq_to_tpu_layout(qweight, scales, qzeros):
    """Convert an AWQ checkpoint (qweight [K, N//8] int32, scales [K//G, N],
    qzeros [K//G, N//8] int32) into this kernel's layout:
    (codes uint4 [N, K], scales [N, K//G], zeros [N, K//G])."""
    from ..quant.formats import awq_unpack_int32

    codes_kn = awq_unpack_int32(qweight)  # [K, N] uint8
    zeros_gn = awq_unpack_int32(qzeros)  # [K//G, N]
    codes = codes_kn.T.astype(jnp.uint4)  # [N, K]
    return codes, scales.T, zeros_gn.T.astype(scales.dtype)


def mxfp4_to_tpu_layout(q_packed, scale_bytes):
    """Convert MXFP4 packed bytes [N, K//2] + UE8M0 scales [N, K//32] into
    (codes uint4 [N, K], scales uint8)."""
    from ..quant.formats import unpack_int4

    return unpack_int4(q_packed).astype(jnp.uint4), scale_bytes


def dequant_w4(w, scales, zeros=None, *, group_size: int = 128, fmt: str = "int4", dtype=jnp.bfloat16):
    """XLA reference dequant of the kernel's weight layout -> [N, K] dtype."""
    n, k = w.shape
    wf = w.astype(jnp.float32)
    if fmt == "mxfp4":
        c = w.astype(jnp.int32)
        mag = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])[c & 7]
        wf = jnp.where((c >> 3) != 0, -mag, mag)
        s = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    else:
        s = scales.astype(jnp.float32)
        if zeros is not None:
            wf = wf.reshape(n, -1, group_size) - zeros.astype(jnp.float32)[..., None]
            wf = wf.reshape(n, k)
    wf = (wf.reshape(n, -1, group_size) * s[..., None]).reshape(n, k)
    return wf.astype(dtype)
