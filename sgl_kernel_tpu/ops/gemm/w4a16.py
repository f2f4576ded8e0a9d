"""W4A16 dequant-fused GEMM (int4 / MXFP4) — the north-star Pallas kernel.

TPU-native replacement for the reference's W4A16 grouped-GEMM mainloop
(src/sycl/kernels/moe/xe20/w4a16/gemm_xe2.hpp: in-register dequant feeding
DPAS). The weight matrix is stored packed two-codes-per-byte as uint8
[N, K // 2] so HBM traffic is half of bf16 (the whole point of W4A16 for
decode); the kernel unpacks + dequantizes in VMEM right before each MXU
matmul:

    out[M, N] = A[M, K] @ dequant(W[N, K])^T (+ bias)

**Nibble layout (block-half packing)**: K is split into pack blocks of
``PB = 8 * group_size`` codes (or all of K when that doesn't divide).
Within each pack block, byte j packs code ``j`` in the low nibble and code
``j + PB/2`` in the high nibble. The kernel's K-tile equals one pack
block, so unpacking is a single 2D lane-concat ``[lo | hi]`` and the
group-scale expansion is a 2D ``jnp.repeat`` — the only nibble-unpack
shapes Mosaic lowers without an element-shuffle relayout.
``pack_w4_tpu`` / converters below produce this layout from logical
codes / AWQ / MXFP4 checkpoints.

Dequant contracts (reference include/sgl_kernel_ops.h:692-712):
  - int4 symmetric:   w = code * scale            (two's-complement nibble)
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


def pack_block_size(k: int, group_size: int) -> int:
    """K-tile / pack-block size: 8 scale groups per tile (the Mosaic block
    rule wants the scale tile's sublane dim to be a multiple of 8), falling
    back to all of K when that doesn't divide."""
    pb = 8 * group_size
    return pb if k % pb == 0 else k


def _dequant_tile(w_packed, scales, zeros, fmt: str, group_size: int):
    """Unpack + dequantize a packed uint8 tile [bn, bk // 2] to bf16 [bn, bk].

    Block-half nibble layout (module docstring): the tile's codes in K
    order are ``concat([low nibbles, high nibbles])``. ``scales``/``zeros``
    are pre-decoded float32 [bn, bk // group_size] (UE8M0 bytes are turned
    into exp2 values by the wrapper — scale tensors are K/G smaller than
    weights, so decoding them outside the kernel is free and keeps the
    VMEM tiles in well-supported dtypes). Everything here is 2D: lane
    concat + jnp.repeat are the nibble-unpack shapes Mosaic supports."""
    w8 = w_packed.astype(jnp.int32)
    c = jnp.concatenate([w8 & 0xF, w8 >> 4], axis=-1)  # [bn, bk] codes 0..15
    if fmt == "mxfp4":
        mag = c & 0x7
        sign = jnp.where((c >> 3) != 0, -1.0, 1.0)
        m = (mag & 1).astype(jnp.float32)
        e = (mag >> 1).astype(jnp.float32)
        # e=0: subnormal 0.5*m ; e>0: (1 + 0.5 m) * 2^(e-1)
        val = jnp.where(e == 0.0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2(e - 1.0))
        wf = sign * val
    elif zeros is not None:
        wf = c.astype(jnp.float32) - jnp.repeat(zeros, group_size, axis=-1)
    else:
        # two's-complement nibble
        wf = jnp.where(c >= 8, c - 16, c).astype(jnp.float32)
    wf = wf * jnp.repeat(scales, group_size, axis=-1)
    return wf.astype(jnp.bfloat16)


def _kernel(a_ref, w_ref, s_ref, z_ref, b_ref, o_ref, acc_ref, *, fmt, group_size, n_k, has_bias):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wf = _dequant_tile(
        w_ref[...], s_ref[..., 0], z_ref[..., 0] if z_ref is not None else None, fmt, group_size
    )  # noqa: keeping 2D scale slices
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
      w: [N, K // 2] packed uint8 codes in group-half layout (pack_w4_tpu).
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
    assert w.shape[1] == k // 2 and w.dtype == jnp.uint8, (w.shape, w.dtype)
    assert scales.shape == (n, k // group_size)
    if fmt == "mxfp4":
        assert group_size == 32 and scales.dtype == jnp.uint8

    bm = bm or min(256, round_up(m, 8))
    bn = min(bn, n)
    # the K tile must equal the stored pack block (block-half nibble layout)
    bk = pack_block_size(k, group_size)
    assert n % bn == 0, (n, bn)

    # pre-decode scales to f32 (+ trailing singleton for the block rule)
    if fmt == "mxfp4":
        scales_f = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    else:
        scales_f = scales.astype(jnp.float32)
    scales_f = scales_f[..., None]  # [N, K/G, 1]
    zeros_f = zeros.astype(jnp.float32)[..., None] if zeros is not None else None

    mp = round_up(m, bm)
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))

    grid = (n // bn, mp // bm, k // bk)
    ngb = bk // group_size

    in_specs = [
        pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk)),
        pl.BlockSpec((bn, bk // 2), lambda j, i, kk: (j, kk)),
        pl.BlockSpec((bn, ngb, 1), lambda j, i, kk: (j, kk, 0)),
    ]
    inputs = [a, w, scales_f]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((bn, ngb, 1), lambda j, i, kk: (j, kk, 0)))
        inputs.append(zeros_f)
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


@functools.partial(jax.jit, static_argnames=("group_size",))
def pack_w4_tpu(codes, *, group_size: int = 128):
    """Pack logical uint4 codes [N, K] (values 0..15; two's complement for
    signed int4) into the kernel's block-half uint8 layout [N, K // 2]."""
    n, k = codes.shape
    pb = pack_block_size(k, group_size)
    half = pb // 2
    c = codes.astype(jnp.uint8).reshape(n, k // pb, pb)
    lo = c[..., :half]
    hi = c[..., half:]
    return ((lo & 0xF) | (hi << 4)).reshape(n, k // 2)


@functools.partial(jax.jit, static_argnames=("group_size",))
def unpack_w4_tpu(packed, *, group_size: int = 128):
    """Inverse of pack_w4_tpu -> uint8 logical codes [N, K] (values 0..15)."""
    n, kh = packed.shape
    k = 2 * kh
    pb = pack_block_size(k, group_size)
    p = packed.reshape(n, -1, pb // 2)
    lo = p & 0xF
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(n, k)


@functools.partial(jax.jit, static_argnames=("group_size", "symmetric"))
def quantize_w4(w, *, group_size: int = 128, symmetric: bool = True):
    """Quantize a float weight [N, K] into the kernel's packed layout.

    Returns (packed uint8 [N, K//2], scales bf16 [N, K//G], zeros or None).
    """
    n, k = w.shape
    wf = w.astype(jnp.float32).reshape(n, k // group_size, group_size)
    if symmetric:
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1, keepdims=True), 1e-10)
        scale = amax / 7.0
        codes = jnp.clip(jnp.rint(wf / scale), -8, 7).astype(jnp.int32)
        codes = jnp.where(codes < 0, codes + 16, codes).astype(jnp.uint8).reshape(n, k)
        return pack_w4_tpu(codes, group_size=group_size), scale[..., 0].astype(jnp.bfloat16), None
    wmin = jnp.min(wf, axis=-1, keepdims=True)
    wmax = jnp.max(wf, axis=-1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
    zero = jnp.rint(-wmin / scale)
    codes = jnp.clip(jnp.rint(wf / scale) + zero, 0, 15).astype(jnp.uint8).reshape(n, k)
    return (
        pack_w4_tpu(codes, group_size=group_size),
        scale[..., 0].astype(jnp.bfloat16),
        zero[..., 0].astype(jnp.bfloat16),
    )


@functools.partial(jax.jit, static_argnames=("group_size",))
def awq_to_tpu_layout(qweight, scales, qzeros, *, group_size: int = 128):
    """Convert an AWQ checkpoint (qweight [K, N//8] int32, scales [K//G, N],
    qzeros [K//G, N//8] int32) into this kernel's layout:
    (packed uint8 [N, K//2], scales [N, K//G], zeros [N, K//G])."""
    from ..quant.formats import awq_unpack_int32

    codes_kn = awq_unpack_int32(qweight)  # [K, N] uint8
    zeros_gn = awq_unpack_int32(qzeros)  # [K//G, N]
    packed = pack_w4_tpu(codes_kn.T, group_size=group_size)
    return packed, scales.T, zeros_gn.T.astype(scales.dtype)


@jax.jit
def mxfp4_to_tpu_layout(q_packed, scale_bytes):
    """Convert MXFP4 packed bytes [N, K//2] (adjacent-pair nibbles, quant
    module layout) + UE8M0 scales [N, K//32] into the kernel's group-half
    packing: (packed uint8 [N, K//2], scales uint8)."""
    from ..quant.formats import unpack_int4

    return pack_w4_tpu(unpack_int4(q_packed), group_size=32), scale_bytes


@functools.partial(jax.jit, static_argnames=("group_size", "fmt", "dtype"))
def dequant_w4(w, scales, zeros=None, *, group_size: int = 128, fmt: str = "int4", dtype=jnp.bfloat16):
    """XLA reference dequant of the kernel's packed layout -> [N, K] dtype."""
    n = w.shape[0]
    k = w.shape[1] * 2
    c = unpack_w4_tpu(w, group_size=group_size).astype(jnp.int32)
    if fmt == "mxfp4":
        mag = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])[c & 7]
        wf = jnp.where((c >> 3) != 0, -mag, mag)
        s = jnp.exp2(scales.astype(jnp.float32) - 127.0)
    else:
        s = scales.astype(jnp.float32)
        if zeros is not None:
            wf = c.astype(jnp.float32).reshape(n, -1, group_size) - zeros.astype(jnp.float32)[..., None]
            wf = wf.reshape(n, k)
        else:
            wf = jnp.where(c >= 8, c - 16, c).astype(jnp.float32)
    wf = (wf.reshape(n, -1, group_size) * s[..., None]).reshape(n, k)
    return wf.astype(dtype)
