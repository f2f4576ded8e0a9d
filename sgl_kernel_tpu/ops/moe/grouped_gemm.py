"""Grouped (per-expert) GEMMs for MoE.

Two paths, replacing the reference's CUTLASS grouped mainloops:

  - BF16: ``jax.lax.ragged_dot`` over the expert-sorted activations — XLA's
    native grouped GEMM for TPU (replaces GroupGemmXe20.cpp).
  - W4A16 (int4/MXFP4): a Pallas kernel over block-aligned expert segments
    (moe_align_block_size guarantees every bm-row block maps to exactly one
    expert, whose id is scalar-prefetched to index the weight/scale fetch) —
    replaces GroupGemmW4A16Xe20.cpp with the same dequant contracts as
    ops/gemm/w4a16.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pallas_interpret
from ..gemm.w4a16 import _dequant_tile, pack_block_size


def ragged_grouped_mm(x_sorted, weights, group_sizes):
    """BF16 grouped GEMM: x_sorted [M, K] (rows sorted by expert),
    weights [E, K, N], group_sizes [E] -> [M, N]."""
    return jax.lax.ragged_dot(x_sorted, weights, group_sizes.astype(jnp.int32))


def _w4_kernel(
    expert_ids_ref,  # [n_blocks] scalar prefetch
    a_ref,  # [bm, bk]
    w_ref,  # [1, bn, bk//2] packed
    s_ref,  # [1, bn, bk//G]
    z_ref,  # [1, bn, bk//G] or None
    o_ref,  # [bm, bn]
    acc_ref,
    *,
    fmt,
    group_size,
    n_k,
):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wf = _dequant_tile(
        w_ref[0], s_ref[0, ..., 0], z_ref[0, ..., 0] if z_ref is not None else None, fmt, group_size
    )
    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], wf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "fmt", "bm", "bn", "bk", "out_dtype"))
def w4a16_grouped_mm(
    x_sorted,
    w,
    scales,
    block_expert_ids,
    zeros=None,
    *,
    group_size: int = 128,
    fmt: str = "int4",
    bm: int = 128,
    bn: int = 256,
    bk: int = 512,
    out_dtype=None,
):
    """Block-aligned grouped W4A16 GEMM.

    x_sorted: [cap, K] activations in expert-sorted block-aligned order
      (cap multiple of bm — from moe_align_block_size(block_size=bm)).
    w: [E, N, K//2] packed uint8 (pack_w4_tpu layout); scales [E, N, K//G];
      zeros opt [E, N, K//G].
    block_expert_ids: [cap // bm] expert id per row-block (scalar-prefetched).
    Returns [cap, N].
    """
    cap, k = x_sorted.shape
    e, n = w.shape[0], w.shape[1]
    assert w.shape[2] == k // 2 and w.dtype == jnp.uint8, (w.shape, w.dtype)
    assert cap % bm == 0
    bn = min(bn, n)
    # the K tile must equal the stored pack block (block-half nibble layout)
    bk = pack_block_size(k, group_size)
    assert n % bn == 0
    out_dtype = out_dtype or x_sorted.dtype
    ngb = bk // group_size
    n_k = k // bk

    if fmt == "mxfp4":
        scales_f = jnp.exp2(scales.astype(jnp.float32) - 127.0)[..., None]
    else:
        scales_f = scales.astype(jnp.float32)[..., None]
    zeros_f = zeros.astype(jnp.float32)[..., None] if zeros is not None else None

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk, eids: (i, kk)),
        pl.BlockSpec((1, bn, bk // 2), lambda i, j, kk, eids: (eids[i], j, kk)),
        pl.BlockSpec((1, bn, ngb, 1), lambda i, j, kk, eids: (eids[i], j, kk, 0)),
    ]
    inputs = [x_sorted, w, scales_f]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((1, bn, ngb, 1), lambda i, j, kk, eids: (eids[i], j, kk, 0)))
        inputs.append(zeros_f)

    kernel = functools.partial(
        _w4_kernel_entry,
        has_zeros=zeros is not None,
        fmt=fmt,
        group_size=group_size,
        n_k=n_k,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cap // bm, n // bn, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, eids: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((cap, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * n * k,
            bytes_accessed=cap * k * 2 + min(e, cap // bm) * n * k // 2 + cap * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(block_expert_ids, *inputs)


def _w4_kernel_entry(eids_ref, *refs, has_zeros, fmt, group_size, n_k):
    a_ref, w_ref, s_ref = refs[0], refs[1], refs[2]
    idx = 3
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    o_ref, acc_ref = refs[idx], refs[idx + 1]
    _w4_kernel(eids_ref, a_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, fmt=fmt, group_size=group_size, n_k=n_k)
