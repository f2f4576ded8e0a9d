"""FP8 blockwise-scaled GEMM (DeepSeek-style 1x128 / 128x128 scale blocks).

TPU-native implementation of the reference's declared
``fp8_blockwise_scaled_mm`` (include/sgl_kernel_ops.h:577-586; oracle
tests/test_fp8_blockwise_gemm.py:23-81):

    out[M, N] = sum_k (scale_a[m, k//128] * A[m, k]) * (scale_b[k//128, n//128] * B[k, n])

A Pallas kernel with bk = bn = 128 makes each K-step's scales a column
vector (scale_a) times a scalar (scale_b), applied to the f32 partial dot
before accumulation — dequantized operands are never materialized in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pallas_interpret, round_up

BLOCK = 128


def _kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref, *, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # scale_a: [bm, 1] column for this k-block; scale_b: scalar block scale.
    acc_ref[...] += part * sa_ref[0] * sb_ref[0, 0, 0, 0]

    @pl.when(k_idx == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm"))
def fp8_blockwise_scaled_mm(a, b, scales_a, scales_b, out_dtype=jnp.bfloat16, *, bm: int = 128):
    """A [M,K] fp8, B [K,N] fp8, scales_a [M, K/128] f32, scales_b [K/128, N/128] f32."""
    m, k = a.shape
    n = b.shape[1]
    assert k % BLOCK == 0 and n % BLOCK == 0, (m, k, n)
    assert scales_a.shape == (m, k // BLOCK)
    assert scales_b.shape == (k // BLOCK, n // BLOCK)

    bm = min(bm, round_up(m, 8))
    mp = round_up(m, bm)
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))
        scales_a = jnp.pad(scales_a, ((0, mp - m), (0, 0)))

    n_k = k // BLOCK
    grid = (n // BLOCK, mp // bm, n_k)
    # [K/128, M, 1] layout satisfies the Mosaic block rule (last dim == 1)
    sa_t = jnp.swapaxes(scales_a, 0, 1)[..., None]
    sb4 = scales_b[..., None, None]  # trailing (1, 1) == array dims

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, BLOCK), lambda j, i, kk: (i, kk)),
            pl.BlockSpec((BLOCK, BLOCK), lambda j, i, kk: (kk, j)),
            pl.BlockSpec((1, bm, 1), lambda j, i, kk: (kk, i, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda j, i, kk: (kk, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, BLOCK), lambda j, i, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, BLOCK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(a, b, sa_t, sb4)
    return out[:m] if mp != m else out


def _grouped_kernel(eids_ref, a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref, *, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot_general(
        a_ref[...], b_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[...] += part * sa_ref[0] * sb_ref[0, 0, 0, 0, 0]

    @pl.when(k_idx == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm"))
def fp8_blockwise_scaled_grouped_mm(a, b, scales_a, scales_b, expert_ids, out_dtype=jnp.bfloat16, *, bm: int = 128):
    """Grouped DeepSeek-style blockwise-FP8 GEMM for MoE.

    TPU-native equivalent of the reference's declared
    ``fp8_blockwise_scaled_grouped_mm`` (include/sgl_kernel_ops.h:660-678;
    SURVEY.md §2.6 in-scope quantized-GEMM subset).

    a: [M, K] fp8, rows sorted by expert and padded so each ``bm``-row
       block belongs to ONE expert (the moe/align.py block-aligned sort).
    b: [E, K, N] fp8.  scales_a: [M, K/128] f32.
    scales_b: [E, K/128, N/128] f32.  expert_ids: [M/bm] int32 — the
    expert owning each row block (scalar-prefetched, as in the W4A16
    grouped kernel, moe/grouped_gemm.py).
    """
    m, k = a.shape
    e, _, n = b.shape
    assert k % BLOCK == 0 and n % BLOCK == 0 and m % bm == 0, (m, k, n, bm)
    assert scales_b.shape == (e, k // BLOCK, n // BLOCK)
    assert scales_a.shape == (m, k // BLOCK), (
        f"scales_a must be [M, K/128]={m, k // BLOCK}, got {scales_a.shape}")
    assert expert_ids.shape == (m // bm,), (
        f"expert_ids is PER ROW BLOCK [M/bm]={m // bm,}, got "
        f"{expert_ids.shape} (per-row ids silently misroute blocks)")

    n_k = k // BLOCK
    grid = (m // bm, n // BLOCK, n_k)
    sa_t = jnp.swapaxes(scales_a, 0, 1)[..., None]
    sb5 = scales_b[..., None, None]

    return pl.pallas_call(
        functools.partial(_grouped_kernel, n_k=n_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, BLOCK), lambda i, j, kk, eids: (i, kk)),
                pl.BlockSpec((1, BLOCK, BLOCK), lambda i, j, kk, eids: (eids[i], kk, j)),
                pl.BlockSpec((1, bm, 1), lambda i, j, kk, eids: (kk, i, 0)),
                pl.BlockSpec((1, 1, 1, 1, 1), lambda i, j, kk, eids: (eids[i], kk, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, BLOCK), lambda i, j, kk, eids: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, BLOCK), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(expert_ids.astype(jnp.int32), a, b, sa_t, sb5)
