"""Grouped (per-expert) GEMMs for MoE.

Two paths, replacing the reference's CUTLASS grouped mainloops:

  - BF16: ``jax.lax.ragged_dot`` over the expert-sorted activations — XLA's
    native grouped GEMM for TPU (replaces GroupGemmXe20.cpp).
  - W4A16 (int4/MXFP4): a Pallas kernel over block-aligned expert segments
    (moe_align_block_size guarantees every bm-row block maps to exactly one
    expert, whose id is scalar-prefetched to index the weight/scale fetch) —
    replaces GroupGemmW4A16Xe20.cpp. Uses the same fast design as
    ops/gemm/w4a16.py: K-paired int4 bitcast decode (MXU rhs
    orientation, no transpose) + per-group partial dots with
    output-side scaling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import dividing_tile, pallas_interpret
from ..gemm.w4a16 import GROUPS_PER_KTILE, _decode_tile


def ragged_grouped_mm(x_sorted, weights, group_sizes):
    """BF16 grouped GEMM: x_sorted [M, K] (rows sorted by expert),
    weights [E, K, N], group_sizes [E] -> [M, N]."""
    return jax.lax.ragged_dot(x_sorted, weights, group_sizes.astype(jnp.int32))


def _bf16_kernel(expert_ids_ref, a_ref, w_ref, o_ref, acc_ref, *, n_k):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _bf16_kernel_stacked(expert_ids_ref, lid_ref, a_ref, w_ref, o_ref, acc_ref, *, n_k):
    # the layer-id scalar ref is consumed by the BlockSpec index maps
    _bf16_kernel(expert_ids_ref, a_ref, w_ref, o_ref, acc_ref, n_k=n_k)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def bf16_grouped_mm(
    x_sorted,
    w,
    block_expert_ids,
    layer_id=None,
    *,
    bm: int = 128,
    bn: int = 1024,
    bk: int = 1024,
    out_dtype=None,
):
    """Block-aligned grouped BF16 GEMM with scalar-prefetched expert (and
    optionally layer) indexing.

    The XLA path (``ragged_dot``) needs the per-layer weight bank as a
    materialized operand, so a scan-over-layers model must dynamic-slice
    the whole [E, K, N] bank out of the stacked [L, E, K, N] array every
    step — ~GB-scale HBM copies at Mixtral size (the docs/PERF.md weight-
    slice trap, measured ~5 ms/step on Llama-8B decode). This kernel
    fetches only the routed experts' (bk, bn) tiles, indexed by the
    scalar-prefetched block_expert_ids and traced layer_id, matching the
    quantized grouped path (reference analog: GroupGemmXe20.cpp grouped
    mainloop over per-expert row blocks).

    x_sorted: [cap, K] expert-sorted block-aligned rows (cap % bm == 0).
    w: [E, K, N], or layer-stacked [L, E, K, N] with a traced layer_id.
    block_expert_ids: [cap // bm] expert id per row-block.
    """
    cap, k = x_sorted.shape
    stacked = layer_id is not None
    assert w.ndim == (4 if stacked else 3), (w.shape, stacked)
    n = w.shape[-1]
    assert w.shape[-2] == k, (w.shape, k)
    assert cap % bm == 0
    # non-power-of-two model dims (gpt-oss 2880/5760) need dividing tiles
    bn = dividing_tile(n, bn, 128)
    bk = dividing_tile(k, bk, 8)
    assert n % bn == 0 and k % bk == 0, (n, k, bn, bk)
    out_dtype = out_dtype or x_sorted.dtype
    n_k = k // bk

    if stacked:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, lid: (i, kk)),
            pl.BlockSpec((None, 1, bk, bn), lambda i, j, kk, eids, lid: (lid[0], eids[i], kk, j)),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, lid: (i, j))
        scalar_args = (block_expert_ids, jnp.asarray(layer_id, jnp.int32).reshape(1))
        kernel = functools.partial(_bf16_kernel_stacked, n_k=n_k)
        nsp = 2
    else:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids: (i, kk)),
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, eids: (eids[i], kk, j)),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids: (i, j))
        scalar_args = (block_expert_ids,)
        kernel = functools.partial(_bf16_kernel, n_k=n_k)
        nsp = 1
    e = w.shape[1] if stacked else w.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(cap // bm, n // bn, n_k),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((cap, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * n * k,
            bytes_accessed=cap * k * 2 + min(e, cap // bm) * n * k * 2 + cap * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(*scalar_args, x_sorted, w)


def _w4_kernel(
    expert_ids_ref,  # [n_blocks] scalar prefetch
    a_ref,  # [bm, bk]  (after the optional layer-id scalar ref)
    w_ref,  # [1, bk//2, bn] packed
    s_ref,  # [1, ngb, bn]
    z_ref,  # [1, ngb, bn] or None
    o_ref,  # [bm, bn]
    acc_ref,
    *,
    fmt,
    group_size,
    ngb,
    n_k,
):
    kk = pl.program_id(2)
    g0 = group_size

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wf = _decode_tile(w_ref.at[0], fmt)  # [bk, bn] bf16 codes
    a = a_ref[...]
    acc = acc_ref[...]
    for g in range(ngb):
        a_g = a[:, g * g0 : (g + 1) * g0]
        part = jax.lax.dot_general(
            a_g, wf[g * g0 : (g + 1) * g0, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * s_ref[0, g, :][None, :].astype(jnp.float32)
        if z_ref is not None:
            asum = jnp.sum(a_g.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc - asum * z_ref[0, g, :][None, :].astype(jnp.float32)
    acc_ref[...] = acc

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "fmt", "bm", "bn", "bk", "out_dtype", "per_channel"))
def w4a16_grouped_mm(
    x_sorted,
    w,
    scales,
    block_expert_ids,
    zeros=None,
    layer_id=None,
    *,
    group_size: int = 128,
    fmt: str = "int4",
    bm: int = 128,
    bn: int = 1024,
    bk: Optional[int] = None,
    out_dtype=None,
    per_channel: bool = False,
):
    """Block-aligned grouped W4A16 GEMM.

    x_sorted: [cap, K] activations in expert-sorted block-aligned order
      (cap multiple of bm — from moe_align_block_size(block_size=bm)).
    w: [E, K//2, N] packed uint8 (pack_w4_tpu layout per expert) — or the
      LAYER-STACKED [L, E, K//2, N] with a traced ``layer_id``: the layer
      is selected via scalar-prefetched BlockSpec indexing, so a
      scan-over-layers model never dynamic-slices the whole expert bank
      out of HBM per step (the same trap as the per-layer weight slices,
      models/llama._linear docstring / docs/PERF.md);
    scales [E, K//G, N]; zeros opt [E, K//G, N] (z*s pre-product).
    block_expert_ids: [cap // bm] expert id per row-block (scalar-prefetched).
    per_channel: scales/zeros are [E, 1, N] applied to every k-tile
      (group_size must equal bk; the per-tile partials telescope to
      per-channel scaling without materializing repeated scales).
    Returns [cap, N].
    """
    cap, k = x_sorted.shape
    stacked = layer_id is not None
    e = w.shape[1] if stacked else w.shape[0]
    n = w.shape[-1]
    assert cap % bm == 0
    assert w.shape[-2] == k // 2 and w.dtype == jnp.uint8, (w.shape, w.dtype)
    bn = min(bn, n)
    if n % bn:
        # N not a default-tile multiple (V2-Lite gate_up N = 2*1408):
        # largest lane-aligned divisor of n within the requested budget
        bn = next(
            (c for c in range(bn - bn % 128, 0, -128) if n % c == 0),
            next(c for c in range(min(bn, 128), 0, -1) if n % c == 0),
        )
    auto_bk = bk is None
    bk = bk or min(GROUPS_PER_KTILE * group_size, k)
    if k % bk or (auto_bk and (bk // group_size) % 8 and bk != k):
        # K a group multiple but not a Mosaic-legal-tile multiple (DeepSeek-
        # V2-Lite moe_intermediate 1408 = 11 groups; gpt-oss-ish 3584 = 28
        # groups): the per-tile scale block's sublane dim must be divisible
        # by 8 or equal to the full K/G — pick_ktile falls back to full-K
        from ..gemm.w4a16 import pick_ktile

        bk = pick_ktile(k, group_size)
    assert n % bn == 0 and k % bk == 0 and bk % group_size == 0
    out_dtype = out_dtype or x_sorted.dtype
    ngb = bk // group_size
    n_k = k // bk

    scales_f = scales  # stored dtype (bf16 canonical); upcast per-tile in-kernel
    if stacked:
        if per_channel:
            assert ngb == 1 and scales.shape[2] == 1
            s_spec = pl.BlockSpec((None, 1, ngb, bn), lambda i, j, kk, eids, lid: (lid[0], eids[i], 0, j))
        else:
            s_spec = pl.BlockSpec((None, 1, ngb, bn), lambda i, j, kk, eids, lid: (lid[0], eids[i], kk, j))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, lid: (i, kk)),
            pl.BlockSpec((None, 1, bk // 2, bn), lambda i, j, kk, eids, lid: (lid[0], eids[i], kk, j)),
            s_spec,
        ]
    else:
        if per_channel:
            assert ngb == 1 and scales.shape[1] == 1
            s_spec = pl.BlockSpec((1, ngb, bn), lambda i, j, kk, eids: (eids[i], 0, j))
        else:
            s_spec = pl.BlockSpec((1, ngb, bn), lambda i, j, kk, eids: (eids[i], kk, j))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids: (i, kk)),
            pl.BlockSpec((1, bk // 2, bn), lambda i, j, kk, eids: (eids[i], kk, j)),
            s_spec,
        ]
    inputs = [x_sorted, w, scales_f]
    if zeros is not None:
        in_specs.append(s_spec)
        inputs.append(zeros)

    kernel = functools.partial(
        _w4_kernel_entry,
        has_lid=stacked,
        has_zeros=zeros is not None,
        fmt=fmt,
        group_size=group_size,
        ngb=ngb,
        n_k=n_k,
    )
    if stacked:
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, lid: (i, j))
        scalar_args = (block_expert_ids, jnp.asarray(layer_id, jnp.int32).reshape(1))
        nsp = 2
    else:
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids: (i, j))
        scalar_args = (block_expert_ids,)
        nsp = 1
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(cap // bm, n // bn, n_k),
            in_specs=in_specs,
            out_specs=out_spec,
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
    )(*scalar_args, *inputs)


def _w4_kernel_entry(eids_ref, *refs, has_lid=False, has_zeros, fmt, group_size, ngb, n_k):
    if has_lid:
        refs = refs[1:]  # stacked: layer-id scalar ref consumed by BlockSpecs
    a_ref, w_ref, s_ref = refs[0], refs[1], refs[2]
    idx = 3
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    o_ref, acc_ref = refs[idx], refs[idx + 1]
    _w4_kernel(
        eids_ref, a_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
        fmt=fmt, group_size=group_size, ngb=ngb, n_k=n_k,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def w4a8_grouped_mm(
    x_q,
    x_scales,
    w,
    w_scales,
    block_expert_ids,
    w_szeros=None,
    x_sums=None,
    *,
    bm: int = 128,
    bn: int = 1024,
    bk: Optional[int] = None,
    out_dtype=jnp.bfloat16,
):
    """Block-aligned grouped QServe-style W4A8 GEMM for MoE.

    TPU-native coverage of the reference's declared-only
    ``cutlass_w4a8_moe_mm`` (tests/test_cutlass_w4a8_moe_mm.py;
    SURVEY.md §2.6): int8 activations against int4 per-expert weights
    with per-channel weight scales and per-token activation scales,
    optional asymmetric zeros via the rank-1 sum correction
    (ops/gemm/qserve.py math, grouped over experts).

    x_q [cap, K] int8 (expert-sorted, block-aligned); x_scales [cap] f32;
    w [E, K//2, N] packed int4 codes (pack_w4_tpu, unsigned-shifted);
    w_scales [E, N] f32 (s1 per channel); w_szeros opt [E, N] = zero*s1;
    x_sums opt [cap] = per-token sums of the integer activations
    (required with w_szeros). Returns [cap, N] out_dtype.
    """
    cap, k = x_q.shape
    # int8 codes fit bf16 exactly; reuse the W4A16 kernel with ONE scale
    # group spanning all of K (per-channel semantics == group_size = K)
    a_bf = x_q.astype(jnp.bfloat16)
    e = w.shape[0]
    n = w.shape[2]
    # per-channel scales as a single K-group: [E, 1, N]
    scales = w_scales.astype(jnp.float32).reshape(e, 1, n)
    zeros = None if w_szeros is None else w_szeros.astype(jnp.float32).reshape(e, 1, n)
    bk = bk or min(1024, k)
    # the kernel applies per-group scales; with group_size=bk each k-tile
    # contributes part * s -> sum_k (a w) * s == per-channel scaling, and
    # the rank-1 zero term telescopes over k-tiles the same way
    out = w4a16_grouped_mm(
        a_bf, w, scales, block_expert_ids, zeros=zeros,
        group_size=bk, bm=bm, bn=bn, bk=bk, out_dtype=jnp.float32,
        per_channel=True,
    )
    out = out * x_scales.astype(jnp.float32)[:, None]
    return out.astype(out_dtype)
