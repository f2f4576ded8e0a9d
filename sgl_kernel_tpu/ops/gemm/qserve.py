"""QServe W4A8 GEMMs (per-channel and per-group rescale epilogues).

TPU-native implementation of the reference's declared QServe surface
(include/sgl_kernel_ops.h:1063-1079; oracles
tests/test_qserve_w4a8_per_chn_gemm.py and ..._per_group_gemm.py).

The Xe/CUDA repack layouts (tensor-core nibble interleaves) are hardware
artifacts; on TPU weights are stored as native uint4 [N, K] logical codes
and Mosaic handles packing. What is preserved is the *math*:

per-channel (w4a8_per_chn):
    out = s_a * s_w * (A_q @ W_q^T) - s_a_sum * (s_w * zero)
  implemented via the zero-point correction: A_q @ (W_q - z)^T
  = A_q @ W_q^T - sum_k(A_q) * z, with a_sum ≈ s_a * sum_k(A_q) supplied by
  the caller (the per-token sum of the *float* activations).

per-group (w4a8_per_group): progressive dequant —
    W_int8 = (W_q - zero_g) * s2_g     (stays in int8 range)
    out = s_a * chn_scale * (A_q @ W_int8^T)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pallas_interpret, round_up


def _per_group_kernel(a_ref, w_ref, s2_ref, z2_ref, o_ref, acc_ref, *, group_size, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bn, bk = w_ref.shape
    ng = bk // group_size
    # u8 -> i32 -> f32: Mosaic has no direct uint8->float32 vector cast
    # (found in the on-chip baseline regen; interpret mode allows it)
    w = w_ref[...].astype(jnp.int32).astype(jnp.float32).reshape(bn, ng, group_size)
    # (code * s2 - z2s2): z2_ref already holds zero*s2 (reference packs
    # zeros pre-multiplied by the group scale, test_qserve_w4a8_per_group_gemm.py:82-90)
    w = w * s2_ref[..., 0][..., None] - z2_ref[..., 0][..., None]
    wf = w.reshape(bn, bk).astype(jnp.bfloat16)
    # int8 activations are exactly representable in bf16; accumulate f32.
    acc_ref[...] += jax.lax.dot_general(
        a_ref[...].astype(jnp.bfloat16), wf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype", "bm", "bn", "bk"))
def qserve_w4a8_per_group_gemm(
    a_q,
    w_q,
    zeros_x_s2,
    scales_i8,
    wscales,
    ascales,
    *,
    group_size: int = 128,
    out_dtype=jnp.float16,
    bm: int = 128,
    bn: int = 256,
    bk: int = 512,
):
    """A_q [M,K] int8; W_q [N,K] uint4 codes; scales_i8 [N, K/G] int8 group
    scales (s2); zeros_x_s2 [N, K/G] = zero_g * s2 (precomputed); wscales [N]
    f16 per-channel; ascales [M] f16 per-token."""
    m, k = a_q.shape
    n = w_q.shape[0]
    bm = min(bm, round_up(m, 8))
    bn = min(bn, n)
    # prefer 8 groups per k-tile, but any K that is a multiple of
    # group_size must WORK: fall back to the largest group-multiple tile
    # that divides K (e.g. llama-7B down_proj K=11008, g=128 -> bk=1376)
    bk = min(max(bk, 8 * group_size), k)
    if k % bk != 0:
        ngk = k // group_size
        best = 1
        for cand in range(ngk, 0, -1):
            if ngk % cand == 0 and cand * group_size <= max(bk, 8 * group_size):
                best = cand
                break
        bk = best * group_size
    assert k % bk == 0 and bk % group_size == 0 and n % bn == 0
    mp = round_up(m, bm)
    if mp != m:
        a_q = jnp.pad(a_q, ((0, mp - m), (0, 0)))

    s2_f = scales_i8.astype(jnp.float32)[..., None]
    z2_f = zeros_x_s2.astype(jnp.float32)[..., None]
    ng = bk // group_size
    out = pl.pallas_call(
        functools.partial(_per_group_kernel, group_size=group_size, n_k=k // bk),
        grid=(n // bn, mp // bm, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk)),
            pl.BlockSpec((bn, bk), lambda j, i, kk: (j, kk)),
            pl.BlockSpec((bn, ng, 1), lambda j, i, kk: (j, kk, 0)),
            pl.BlockSpec((bn, ng, 1), lambda j, i, kk: (j, kk, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(a_q, w_q, s2_f, z2_f)
    out = out[:m]
    out = out * ascales.astype(jnp.float32).reshape(-1, 1) * wscales.astype(jnp.float32).reshape(1, -1)
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def qserve_w4a8_per_chn_gemm(a_q, w_q, wscales, ascales, w_szeros, a_sums, *, out_dtype=jnp.float16):
    """A_q [M,K] int8; W_q [N,K] uint4; wscales [N] f16 (s1); ascales [M]
    f16 per-token; w_szeros [N] = zero * s1; a_sums [M] = per-token sum of
    the float activations.

    out = ascales ⊗ wscales * (A_q @ W_q^T) - a_sums ⊗ w_szeros
    (tests/test_qserve_w4a8_per_chn_gemm.py:83-110).

    The main int8 x int4 product runs on the MXU via an int8 dot (uint4
    codes fit int8 exactly); the zero-point term is a rank-1 update.
    """
    acc = jax.lax.dot_general(
        a_q, w_q.astype(jnp.int8), (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = acc * ascales.astype(jnp.float32).reshape(-1, 1) * wscales.astype(jnp.float32).reshape(1, -1)
    out = out - a_sums.astype(jnp.float32).reshape(-1, 1) * w_szeros.astype(jnp.float32).reshape(1, -1)
    return out.astype(out_dtype)
