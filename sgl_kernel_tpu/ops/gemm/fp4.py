"""NVFP4 scaled GEMMs.

TPU-native equivalents of the reference's declared NVFP4 surface
(sgl_kernel_ops.h:560-566, 587-588, 765-784: ``scaled_fp4_quant``,
``cutlass_scaled_fp4_mm``, ``scaled_fp4_experts_quant``,
``cutlass_fp4_group_mm`` — declared-but-unimplemented on XPU, SURVEY.md
§2.6, named in-scope for this build).

NVFP4 recap: values are E2M1 (16 codes), quantized in groups of 16 along
K with an FP8-E4M3 per-group scale, plus one global FP32 scale per
tensor. The reference layout swizzles scales for tensor-core fragment
loads; TPU has no fp4 or fragment-swizzle hardware, so we keep the
natural layouts (packed codes ``[*, K//2]`` uint8 low-nibble-first,
scales ``[*, K//16]`` fp8) and compute GEMMs by dequantizing to bf16 and
using the MXU. fp4 operands are 4.5 bits/element, so the HBM cost of
dequant-then-matmul is tiny and XLA fuses the dequant into the matmul's
operand reads; a Pallas in-kernel-dequant version is only worth it at
decode M where the W4A16 path (w4a16.py) already covers weight-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..quant.formats import e2m1_decode, e2m1_encode, pack_int4, unpack_int4

FP4_GROUP = 16
_F8_MAX = 448.0


def _quant_groups(x, global_scale):
    """x [..., K] -> (codes [..., K] uint8 in 0..15, scales [..., K//16] f8e4m3).

    Per-group scale = amax / 6 * global_scale, stored in fp8 (the
    reference's ``input_global_scale`` convention: decode multiplies by
    scale_f8 / global_scale).
    """
    orig = x.shape
    k = orig[-1]
    assert k % FP4_GROUP == 0, f"K={k} not a multiple of {FP4_GROUP}"
    g = x.astype(jnp.float32).reshape(*orig[:-1], k // FP4_GROUP, FP4_GROUP)
    amax = jnp.max(jnp.abs(g), axis=-1)
    # clamp at fp8-e4m3's min subnormal: a smaller clip makes scale_f8 == 0
    # and the stored codes saturate to garbage +-6 for near-zero groups
    scale = jnp.clip(amax / 6.0 * global_scale, 2.0 ** -9, _F8_MAX)
    scale_f8 = scale.astype(jnp.float8_e4m3fn)
    inv = (global_scale / scale_f8.astype(jnp.float32))[..., None]
    codes = e2m1_encode(g * inv)  # signed e2m1 bit patterns 0..15
    return codes.reshape(orig).astype(jnp.uint8), scale_f8


@functools.partial(jax.jit, static_argnames=())
def scaled_fp4_quant(x, global_scale):
    """Quantize to NVFP4: returns (packed [..., K//2] uint8, scales
    [..., K//16] float8_e4m3fn). reference: scaled_fp4_quant
    (sgl_kernel_ops.h:560-562)."""
    codes, scale_f8 = _quant_groups(x, global_scale)
    return pack_int4(codes), scale_f8


def _dequant(packed, scales, global_scale, dtype):
    codes = unpack_int4(packed)
    vals = e2m1_decode(codes)  # float32 e2m1 values
    k = vals.shape[-1]
    sf = scales.astype(jnp.float32) / global_scale
    vals = vals.reshape(*vals.shape[:-1], k // FP4_GROUP, FP4_GROUP) * sf[..., None]
    return vals.reshape(*vals.shape[:-2], k).astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fp4_scaled_mm(a_packed, b_packed, scales_a, scales_b, alpha, out_dtype=jnp.bfloat16):
    """out = (deq(A) @ deq(B)^T) * alpha. A [M, K//2], B [N, K//2] packed
    uint8; scales [M, K//16]/[N, K//16] fp8; alpha = 1/(gs_a*gs_b)
    restores the global scales. reference: cutlass_scaled_fp4_mm
    (sgl_kernel_ops.h:563-566)."""
    af = _dequant(a_packed, scales_a, 1.0, jnp.bfloat16)
    bf = _dequant(b_packed, scales_b, 1.0, jnp.bfloat16)
    out = jnp.dot(af, bf.T, preferred_element_type=jnp.float32)
    return (out * alpha.astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=())
def scaled_fp4_experts_quant(x, global_scales, expert_offsets):
    """Per-expert NVFP4 quant of pre-scattered activations.

    x [M, K] rows grouped by expert (moe align order), global_scales [E],
    expert_offsets [E+1] row starts. Each row uses its expert's global
    scale. reference: scaled_fp4_experts_quant (sgl_kernel_ops.h:765-776).
    """
    m, k = x.shape
    e = global_scales.shape[0]
    # row -> expert id via offsets (static E, traced offsets)
    rows = jnp.arange(m)[:, None]
    eid = jnp.sum(rows >= expert_offsets[None, 1:e], axis=1)
    gs = global_scales[eid]
    codes, scale_f8 = _quant_groups(x, gs[:, None])
    return pack_int4(codes), scale_f8


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fp4_group_mm(a_packed, b_packed, scales_a, scales_b, alphas, group_sizes, out_dtype=jnp.bfloat16):
    """Grouped NVFP4 GEMM for MoE: a [M, K//2] rows sorted by expert,
    b [E, N, K//2], scales_a [M, K//16], scales_b [E, N, K//16],
    alphas [E], group_sizes [E]. reference: cutlass_fp4_group_mm
    (sgl_kernel_ops.h:777-784). Dequant + ragged_dot (MXU bf16)."""
    af = _dequant(a_packed, scales_a, 1.0, jnp.bfloat16)
    bf = _dequant(b_packed, scales_b, 1.0, jnp.bfloat16)  # [E, N, K]
    out = jax.lax.ragged_dot(
        af, jnp.swapaxes(bf, 1, 2), group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.float32,
    )
    e = alphas.shape[0]
    rows = jnp.arange(out.shape[0])[:, None]
    eid = jnp.sum(rows >= jnp.cumsum(group_sizes)[None, : e - 1], axis=1)
    return (out * alphas[eid][:, None].astype(jnp.float32)).astype(out_dtype)
