"""Quantization ops (TPU-native, XLA-fused).

Covers the reference's quant kernel family with identical scale semantics:
  - per_tensor_quant_fp8      (src/sycl/per_tensor_quant_fp8.cpp)
  - per_token_quant_fp8       (src/sycl/per_token_quant_fp8.cpp)
  - per_token_group_quant_8bit / _v2 incl. scale_ue8m0, fused silu_and_mul,
    masked_m                  (src/sycl/per_token_group_quant_8bit{,_v2}.cpp)
  - per_token_group_quant_fp4 (MXFP4 E2M1 + UE8M0 group-32 scales, optional
    silu-mul fusion and column-major scales)
                              (src/sycl/per_token_group_quant_fp4.cpp)
  - awq_dequantize            (src/sycl/awq_dequantize.cpp)

These are single-pass bandwidth-bound elementwise+reduce ops: on TPU, XLA
already fuses the abs-max reduce with the scale/cast pass at HBM speed, so
they are written as jnp (no Pallas needed). The Pallas wins live in the GEMMs
that *consume* these formats (ops/gemm/).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..activation import silu
from . import formats
from .formats import (
    awq_pack_int32,
    awq_unpack_int32,
    e2m1_decode,
    e2m1_encode,
    pack_int4,
    ue8m0_decode,
    ue8m0_encode_ceil,
    ue8m0_encode_from_amax,
    unpack_int4,
)

FP8_E4M3 = jnp.float8_e4m3fn
FP8_E5M2 = jnp.float8_e5m2


def _finfo_max(dtype) -> float:
    return float(jnp.finfo(dtype).max)


@partial(jax.jit, static_argnames=("dtype",))
def per_tensor_quant_fp8(x, scale=None, *, dtype=FP8_E4M3):
    """FP8 per-tensor quant. Static (given scale) or dynamic (amax/fp8_max).

    Returns (q[dtype], scale[float32] shape (1,)).
    Reference: sgl_per_tensor_quant_fp8 (per_tensor_quant_fp8.cpp).
    """
    fmax = _finfo_max(dtype)
    xf = x.astype(jnp.float32)
    if scale is None:
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax / fmax, 1e-12)
    scale = jnp.asarray(scale, jnp.float32).reshape(())
    q = jnp.clip(xf / scale, -fmax, fmax).astype(dtype)
    return q, scale.reshape(1)


@partial(jax.jit, static_argnames=("dtype",))
def per_token_quant_fp8(x, *, dtype=FP8_E4M3):
    """FP8 dynamic per-token (last-dim) quant.

    Returns (q[dtype] same shape, scales[float32] shape x.shape[:-1] + (1,)).
    Reference: sgl_per_token_quant_fp8 (per_token_quant_fp8.cpp).
    """
    fmax = _finfo_max(dtype)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / fmax, 1e-12)
    q = jnp.clip(xf / scale, -fmax, fmax).astype(dtype)
    return q, scale


@partial(
    jax.jit,
    static_argnames=("group_size", "eps", "qmin", "qmax", "dtype", "scale_ue8m0",
                     "column_major_scales", "fuse_silu_and_mul"),
)
def per_token_group_quant_8bit(
    x,
    *,
    group_size: int,
    eps: float = 1e-10,
    qmin: Optional[float] = None,
    qmax: Optional[float] = None,
    dtype=FP8_E4M3,
    scale_ue8m0: bool = False,
    column_major_scales: bool = False,
    fuse_silu_and_mul: bool = False,
    masked_m=None,
):
    """Per-token-group 8-bit quant (fp8 or int8), matching the reference scale
    semantics (per_token_group_quant_8bit.cpp:140-170):

      scale = max(|x_group|, eps·/impl) / qmax, optionally rounded UP to a
      power of two (UE8M0, exponent byte = ceil(log2(scale)) + 127).

    ``fuse_silu_and_mul``: input last dim is [gate | up] (2*K); quantizes
    silu(gate) * up (v2 behaviour). ``masked_m``: optional [E] per-expert valid
    row counts for [E, M, K]-shaped input; rows >= masked_m[e] produce zeros.

    Returns (q[dtype], scales) where scales is float32, or uint8 exponent
    bytes when scale_ue8m0.
    """
    if qmax is None:
        qmax = _finfo_max(dtype) if jnp.issubdtype(dtype, jnp.floating) else float(jnp.iinfo(dtype).max)
    if qmin is None:
        qmin = -qmax if jnp.issubdtype(dtype, jnp.floating) else float(jnp.iinfo(dtype).min)

    xf = x.astype(jnp.float32)
    if fuse_silu_and_mul:
        k = xf.shape[-1] // 2
        xf = silu(xf[..., :k]) * xf[..., k:]

    gshape = xf.shape[:-1] + (xf.shape[-1] // group_size, group_size)
    g = xf.reshape(gshape)
    amax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), eps)
    scale = amax / qmax
    if scale_ue8m0:
        sbyte, scale = ue8m0_encode_ceil(scale)
    q = jnp.clip(g / scale, qmin, qmax)
    if not jnp.issubdtype(dtype, jnp.floating):
        q = jnp.rint(q)
    q = q.astype(dtype).reshape(xf.shape)
    scales = (sbyte if scale_ue8m0 else scale.astype(jnp.float32))[..., 0]

    if masked_m is not None:
        # [E, M, K] layout: zero rows beyond the per-expert count.
        rows = jax.lax.broadcasted_iota(jnp.int32, q.shape[:2], 1)
        valid = rows < masked_m[:, None]
        q = jnp.where(valid[..., None], q, jnp.zeros_like(q))
        scales = jnp.where(valid[..., None], scales, jnp.zeros_like(scales))
    if column_major_scales:
        # reference runtime flag (per_token_group_quant_8bit.hpp:173-180):
        # scales laid out [..., K/G, M] for column-major-consuming GEMMs
        scales = jnp.swapaxes(scales, -1, -2)
    return q, scales


per_token_group_quant_fp8 = per_token_group_quant_8bit


@partial(jax.jit, static_argnames=("group_size", "eps", "fuse_silu_and_mul"))
def per_token_group_quant_fp4(
    x,
    x_secondary=None,
    *,
    group_size: int = 32,
    eps: float = 1e-10,
    fuse_silu_and_mul: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """MXFP4 per-token-group quant: E2M1 codes + UE8M0 group-32 scales.

    shared_exp = clamp(floor(log2(absmax)) - 2, -127, 127) per the OCP MX
    spec (per_token_group_quant_fp4.cpp:244-256); two E2M1 values packed per
    byte, low nibble first. With ``x_secondary`` quantizes silu(x)·x_secondary.

    Returns (q_packed uint8 [..., K//2], scales uint8 [..., K//group_size]).
    (Column-major scale layout is a memory layout detail of the reference's
    MoE path; JAX callers transpose at the consumer instead.)
    """
    assert group_size == 32, "MXFP4 requires group_size=32"
    xf = x.astype(jnp.float32)
    if x_secondary is not None or fuse_silu_and_mul:
        if x_secondary is not None:
            xf = silu(xf) * x_secondary.astype(jnp.float32)
        else:
            k = xf.shape[-1] // 2
            xf = silu(xf[..., :k]) * xf[..., k:]
    g = xf.reshape(*xf.shape[:-1], -1, group_size)
    amax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1), eps)
    sbyte, sval = ue8m0_encode_from_amax(amax)
    q = e2m1_encode(g / sval[..., None])
    packed = pack_int4(q.reshape(*xf.shape[:-1], -1))
    return packed, sbyte


@jax.jit
def mxfp4_dequantize(q_packed, scales):
    """Inverse of per_token_group_quant_fp4 -> float32 [..., K]."""
    codes = unpack_int4(q_packed)
    vals = e2m1_decode(codes)
    assert scales.shape == (*vals.shape[:-1], vals.shape[-1] // 32), (
        scales.shape, vals.shape)  # one ue8m0 byte per 32-elem group
    sval = ue8m0_decode(scales)
    g = vals.reshape(*vals.shape[:-1], -1, 32) * sval[..., None]
    return g.reshape(*vals.shape[:-1], -1)


@partial(jax.jit, static_argnames=("out_dtype",))
def awq_dequantize(qweight, scales, qzeros, *, out_dtype=jnp.float16):
    """AWQ int4 -> float dequant: (code - zero) * scale.

    qweight [K, N//8] int32, scales [K//G, N] float, qzeros [K//G, N//8] int32.
    Returns [K, N] out_dtype. Reference: awq_dequantize.cpp + the torch oracle
    in tests/test_awq_dequant.py:32-62.
    """
    k = qweight.shape[0]
    group_size = k // scales.shape[0]
    w = awq_unpack_int32(qweight).astype(jnp.float32)  # [K, N]
    z = awq_unpack_int32(qzeros).astype(jnp.float32)  # [K//G, N]
    zs = jnp.repeat(z, group_size, axis=0)
    ss = jnp.repeat(scales.astype(jnp.float32), group_size, axis=0)
    return ((w - zs) * ss).astype(out_dtype)


__all__ = [
    "FP8_E4M3",
    "FP8_E5M2",
    "per_tensor_quant_fp8",
    "per_token_quant_fp8",
    "per_token_group_quant_8bit",
    "per_token_group_quant_fp8",
    "per_token_group_quant_fp4",
    "mxfp4_dequantize",
    "awq_dequantize",
    "formats",
    "awq_pack_int32",
    "awq_unpack_int32",
    "pack_int4",
    "unpack_int4",
    "e2m1_encode",
    "e2m1_decode",
    "ue8m0_decode",
    "ue8m0_encode_ceil",
    "ue8m0_encode_from_amax",
]

from .gguf import (  # noqa: F401,E402
    ggml_dequantize,
    ggml_moe_a8,
    ggml_moe_a8_vec,
    ggml_moe_get_block_size,
    ggml_mul_mat_a8,
    ggml_mul_mat_vec_a8,
)
