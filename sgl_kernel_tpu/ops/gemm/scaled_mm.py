"""INT8 / FP8 scaled matmuls (per-tensor and per-token scales).

TPU-native implementations of the reference's declared scaled-MM surface
(include/sgl_kernel_ops.h:567-599: int8_scaled_mm, fp8_scaled_mm, bmm_fp8).
XLA lowers int8xint8->int32 and fp8 dots straight onto the MXU with the
scale epilogue fused, so these are jnp — Pallas adds nothing here. The
Pallas wins live in w4a16.py / blockwise_fp8.py where dequant needs to be
staged per K-tile.

Math contract (tests/test_int8_gemm.py:16-36, test_fp8_gemm.py):
    out = (A_q @ B_q) * scale_a[:, None] * scale_b[None, :] (+ bias)
with A [M, K] row-major, B [K, N], scale_a per-token [M] or scalar,
scale_b per-channel [N] or scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _apply_scales(acc, scales_a, scales_b, bias, out_dtype):
    acc = acc.astype(jnp.float32)
    if scales_a is not None:
        sa = jnp.asarray(scales_a, jnp.float32)
        acc = acc * (sa.reshape(-1, 1) if sa.ndim else sa)
    if scales_b is not None:
        sb = jnp.asarray(scales_b, jnp.float32)
        acc = acc * (sb.reshape(1, -1) if sb.ndim else sb)
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int8_scaled_mm(a, b, scales_a, scales_b, out_dtype=jnp.bfloat16, bias=None):
    """int8 GEMM with f32 scale epilogue: A [M,K] int8, B [K,N] int8."""
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return _apply_scales(acc, scales_a, scales_b, bias, out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fp8_scaled_mm(a, b, scales_a, scales_b, out_dtype=jnp.bfloat16, bias=None):
    """fp8 GEMM with f32 scale epilogue: A [M,K] fp8, B [K,N] fp8."""
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return _apply_scales(acc, scales_a, scales_b, bias, out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def bmm_fp8(a, b, scale_a, scale_b, out_dtype=jnp.bfloat16):
    """Batched fp8 matmul: A [B,M,K] @ B [B,K,N] * scale_a * scale_b.

    Reference: bmm_fp8 (include/sgl_kernel_ops.h:591-599) — per-tensor scales.
    """
    acc = jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    acc = acc * jnp.asarray(scale_a, jnp.float32) * jnp.asarray(scale_b, jnp.float32)
    return acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def dsv3_router_gemm(hidden, router_weight, out_dtype=jnp.float32):
    """(out_dtype defaults to f32: router logits feed expert top-k, where a
    bf16 ulp can flip ties vs the reference's f32 logits.)

    DeepSeek-V3 router GEMM: [T, 7168] x [E, 7168]^T -> [T, E]
    (reference dsv3_router_gemm, tests/test_dsv3_router_gemm.py). A
    skinny matmul XLA already tiles optimally on the MXU."""
    out = jnp.dot(hidden, router_weight.T, preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


@jax.jit
def dsv3_fused_a_gemm(hidden, wa_t):
    """DeepSeek-V3 fused q_a/kv_a down-projection: [T, 7168] x
    [7168, 2112] -> [T, 2112] (reference dsv3_fused_a_gemm,
    tests/test_dsv3_fused_a_gemm.py; weight passed K-major)."""
    return jnp.dot(hidden, wa_t, preferred_element_type=jnp.float32).astype(hidden.dtype)
