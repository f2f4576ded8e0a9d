"""Quantized number formats: E2M1 (MXFP4), UE8M0 scales, int4 packing, AWQ order.

Semantics match the reference contracts:
  - E2M1 code table + round-ties-to-even boundaries:
    reference src/sycl/per_token_group_quant_fp4.cpp:53-106
  - UE8M0 scale = power-of-two exponent + 127 bias:
    reference src/sycl/per_token_group_quant_fp4.cpp:244-256,
    src/sycl/per_token_group_quant_8bit.cpp:160-165
  - int4 nibble packing (two 4-bit codes per byte, low nibble first):
    reference include/sgl_kernel_ops.h:692-712
  - AWQ interleave order [0,4,1,5,2,6,3,7] over 8 nibbles of an int32:
    reference tests/test_awq_dequant.py:13-27

All functions are pure jnp (traceable / jittable) and are used both by the
runtime ops and by the test oracles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# E2M1 (FP4) — 1 sign, 2 exponent, 1 mantissa
# ---------------------------------------------------------------------------

# Value of each 3-bit magnitude code (sign handled separately).
E2M1_VALUES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32)
E2M1_MAX = 6.0
E2M1_EMAX = 2  # floor(log2(4.0)): exponent of the largest binade

# Upper decision boundaries for round-ties-to-even, per the reference table:
# <=0.25 -> 0.0; <0.75 -> 0.5; <=1.25 -> 1.0; <1.75 -> 1.5; <=2.5 -> 2.0;
# <3.5 -> 3.0; <=5.0 -> 4.0; else 6.0.  "<=" for even targets, "<" for odd.


def e2m1_encode(x):
    """Round float values to the nearest E2M1 code (uint8 in [0,15]).

    Round-ties-to-even at midpoints, exactly matching the reference
    boundary table (per_token_group_quant_fp4.cpp:79-106).
    """
    sign = (x < 0.0).astype(jnp.uint8)
    a = jnp.abs(x)
    # Accumulate the code by counting how many boundaries we passed.
    code = jnp.zeros(x.shape, jnp.uint8)
    code += (a > 0.25).astype(jnp.uint8)
    code += (a >= 0.75).astype(jnp.uint8)
    code += (a > 1.25).astype(jnp.uint8)
    code += (a >= 1.75).astype(jnp.uint8)
    code += (a > 2.5).astype(jnp.uint8)
    code += (a >= 3.5).astype(jnp.uint8)
    code += (a > 5.0).astype(jnp.uint8)
    return (sign << 3) | code


def e2m1_decode(code):
    """Decode uint8 E2M1 codes (low 4 bits used) to float32 values."""
    code = code.astype(jnp.int32) & 0xF
    mag = jnp.asarray(E2M1_VALUES)[code & 0x7]
    sign = jnp.where((code >> 3) != 0, -1.0, 1.0)
    return (sign * mag).astype(jnp.float32)


# ---------------------------------------------------------------------------
# UE8M0 scales (biased power-of-two exponent byte)
# ---------------------------------------------------------------------------


def ue8m0_encode_from_amax(amax, emax: int = E2M1_EMAX):
    """OCP MX shared scale: clamp(floor(log2(amax)) - emax, -127, 127) + 127.

    Returns (scale_byte uint8, scale_value float32).
    """
    log2s = jnp.floor(jnp.log2(amax)) - float(emax)
    e = jnp.clip(log2s.astype(jnp.int32), -127, 127)
    return (e + 127).astype(jnp.uint8), jnp.exp2(e.astype(jnp.float32))


def ue8m0_encode_ceil(scale):
    """8-bit UE8M0 from a real scale, rounding the exponent up (ceil).

    Matches the 8-bit quant kernels' scale_ue8m0 path
    (per_token_group_quant_8bit.cpp:160-165): exp = ceil(log2(max(s, 1e-10))).
    Returns (scale_byte uint8, quantized_scale float32).
    """
    e = jnp.ceil(jnp.log2(jnp.maximum(scale, 1e-10))).astype(jnp.int32)
    return (e + 127).astype(jnp.uint8), jnp.exp2(e.astype(jnp.float32))


def ue8m0_decode(byte):
    """Decode UE8M0 byte -> float32 power-of-two scale."""
    return jnp.exp2(byte.astype(jnp.float32) - 127.0)


# ---------------------------------------------------------------------------
# 4-bit nibble packing
# ---------------------------------------------------------------------------


def pack_int4(codes):
    """Pack uint4 codes [..., K] -> bytes [..., K//2], low nibble first."""
    lo = codes[..., 0::2].astype(jnp.uint8) & 0xF
    hi = codes[..., 1::2].astype(jnp.uint8) & 0xF
    return lo | (hi << 4)


def unpack_int4(packed):
    """Unpack bytes [..., K//2] -> uint8 codes [..., K], low nibble first."""
    packed = packed.astype(jnp.uint8)
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


# ---------------------------------------------------------------------------
# AWQ int32 packing order
# ---------------------------------------------------------------------------

# logical[k] = nibble[AWQ_ORDER[k]]; nibble[p] = logical[AWQ_INV_ORDER[p]]
AWQ_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7], dtype=np.int32)
AWQ_INV_ORDER = np.argsort(AWQ_ORDER).astype(np.int32)  # [0,2,4,6,1,3,5,7]


def awq_unpack_int32(q):
    """Unpack AWQ int32 [..., C//8] -> uint8 codes [..., C] in logical order.

    AWQ packs 8 nibbles per int32 interleaved: logical code ``k`` of a word
    lives in nibble ``AWQ_ORDER[k]`` (tests/test_awq_dequant.py:13-27).
    """
    q = q.astype(jnp.uint32)
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    nibbles = (q[..., None] >> shifts) & 0xF  # [..., C//8, 8] in nibble order
    logical = nibbles[..., jnp.asarray(AWQ_ORDER)]
    return logical.reshape(*q.shape[:-1], -1).astype(jnp.uint8)


def awq_pack_int32(codes):
    """Pack uint8 codes [..., C] (logical order) -> AWQ int32 [..., C//8]."""
    c = codes.reshape(*codes.shape[:-1], -1, 8).astype(jnp.uint32) & 0xF
    c = c[..., jnp.asarray(AWQ_INV_ORDER)]  # logical -> nibble positions
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    return jnp.sum(c << shifts, axis=-1).astype(jnp.int32)
