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
from ..gemm.w4a16 import GROUPS_PER_KTILE, _decode_tile, _kernel, _kernel_inner


def ragged_grouped_mm(x_sorted, weights, group_sizes):
    """BF16 grouped GEMM: x_sorted [M, K] (rows sorted by expert),
    weights [E, K, N], group_sizes [E] -> [M, N]."""
    return jax.lax.ragged_dot(x_sorted, weights, group_sizes.astype(jnp.int32))


def _bf16_kernel(expert_ids_ref, nv_ref, a_ref, w_ref, o_ref, acc_ref, *, n_k):
    kk = pl.program_id(2)
    i = pl.program_id(0)

    # trailing padding blocks skip fetch (index-clamped) AND compute
    @pl.when(i < nv_ref[0])
    def _valid():
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


def _bf16_kernel_stacked(expert_ids_ref, nv_ref, lid_ref, a_ref, w_ref, o_ref, acc_ref, *, n_k):
    # the layer-id / num-valid scalar refs are consumed by the index maps
    _bf16_kernel(expert_ids_ref, nv_ref, a_ref, w_ref, o_ref, acc_ref, n_k=n_k)


def pick_bf16_group_tiles(n: int, k: int, bm: int, budget: int = 12 * 2**20):
    """(bn, bk) for the bf16 grouped kernel: the VMEM-fitting tile pair
    with the FEWEST grid steps per expert (max bn*bk product; ties to the
    larger bn) so the per-grid-step pipeline cost (~0.5us, docs/PERF.md
    MLA page finding) amortizes over large DMA blocks — the kernel is
    weight-stream-bound at MoE decode batch sizes.

    bk is the LANE dim of the activation block, so candidates are
    128-multiples (or the full K) — a greedy biggest-bn-first walk once
    picked (bn=14336, bk=64) at Mixtral dims and Mosaic rejected the
    (bm, 64) A-block (round-5 regen)."""

    def vmem(bn, bk):
        return bk * bn * 2 * 2 + bm * bk * 2 * 2 + bm * bn * 2 * 2 + bm * bn * 4

    bns = [d for d in range(n - n % 128, 0, -128) if n % d == 0] or [n]
    bks = [d for d in range(min(k, 2048) - min(k, 2048) % 128, 0, -128)
           if k % d == 0] or [k]
    best = None
    for bn in bns:
        for bk in bks:
            if vmem(bn, bk) <= budget:
                score = (bn * bk, bn)
                if best is None or score > best[0]:
                    best = (score, bn, bk)
    if best is None:
        # no legal-AND-fitting pair (dims with no 128-multiple divisor,
        # e.g. gpt-oss 2880: both dims force full-extent blocks > VMEM).
        # Fall back to the r4 dividing tiles — legal in interpret mode;
        # real-TPU callers gate on bf16_group_tiles_fit (fused_experts
        # keeps ragged_dot for such dims).
        return dividing_tile(n, 1024, 128), dividing_tile(k, 1024, 8)
    return best[1], best[2]


def bf16_group_tiles_fit(n: int, k: int, bm: int, budget: int = 12 * 2**20) -> bool:
    """True when pick_bf16_group_tiles found a Mosaic-legal pair within the
    VMEM budget (i.e. the grouped kernel can run on real TPU)."""
    bn, bk = pick_bf16_group_tiles(n, k, bm, budget)
    legal = (bk % 128 == 0 or bk == k) and (bn % 128 == 0 or bn == n)
    fits = bk * bn * 4 + bm * bk * 4 + bm * bn * 8 <= budget
    return legal and fits


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype"))
def bf16_grouped_mm(
    x_sorted,
    w,
    block_expert_ids,
    layer_id=None,
    num_valid_blocks=None,
    *,
    bm: int = 128,
    bn: Optional[int] = None,
    bk: Optional[int] = None,
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
    if bn is None and bk is None:
        bn, bk = pick_bf16_group_tiles(n, k, bm)
    # non-power-of-two model dims (gpt-oss 2880/5760) need dividing tiles
    bn = dividing_tile(n, bn or 1024, 128)
    bk = dividing_tile(k, bk or 1024, 8)
    assert n % bn == 0 and k % bk == 0, (n, k, bn, bk)
    out_dtype = out_dtype or x_sorted.dtype
    n_k = k // bk

    nv = jnp.asarray(
        cap // bm if num_valid_blocks is None else num_valid_blocks,
        jnp.int32).reshape(1)
    # blocks at i >= nv clamp (kk, j) to 0 so the pinned trailing expert's
    # weights are fetched at most once (see w4a16_grouped_mm)
    if stacked:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, nv, lid: (i, kk * (i < nv[0]))),
            pl.BlockSpec((None, 1, bk, bn), lambda i, j, kk, eids, nv, lid: (lid[0], eids[i], kk * (i < nv[0]), j * (i < nv[0]))),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, nv, lid: (i, j))
        scalar_args = (block_expert_ids, nv, jnp.asarray(layer_id, jnp.int32).reshape(1))
        kernel = functools.partial(_bf16_kernel_stacked, n_k=n_k)
        nsp = 3
    else:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, nv: (i, kk * (i < nv[0]))),
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, eids, nv: (eids[i], kk * (i < nv[0]), j * (i < nv[0]))),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, nv: (i, j))
        scalar_args = (block_expert_ids, nv)
        kernel = functools.partial(_bf16_kernel, n_k=n_k)
        nsp = 2
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


# Per-(N, K) decode gmode overrides, measured on-chip
# (benchmark/sweep_grouped_moe.py, 2026-08-20): multi-accumulator
# epilogues beat plain "inner" on the deeper-K gate_up tiles (the dense
# kernel's down-proj mechanism — docs/PERF.md round 4) and on the wide
# down projections; every variant is oracle-parity-tested.
#   v2lite gate_up (2816, 2048): inner 706 -> inner4 805 GB/s of bank
#   dsv3  gate_up (4096, 7168): inner 695 -> inner4 712
#   gptoss gate_up (2560, 3584): inner 616 -> inner4 678
#   v2lite down (2048, 1408): inner 661 -> inner2 707
#   gptoss down (3584, 1280): inner 670 -> inner2 715
_GROUP_GMODE_TABLE = {
    (2816, 2048): "inner4",
    (4096, 7168): "inner4",
    (2560, 3584): "inner4",
    (2048, 1408): "inner2",
    (3584, 1280): "inner2",
}


def pick_group_tiles(n: int, k: int, group_size: int, bm: int, out_itemsize: int = 2, budget: int = 13 * 2**20, fixed_bk: Optional[int] = None):
    """(bn, bk) for the grouped W4A16 kernel, by the dense kernel's
    group-dot-count law (docs/PERF.md round 3): the decode residual scales
    with (N/bn) * (K/G) per expert, NOT with DMA bytes, so bn goes as big
    as VMEM allows (whole-N preferred) and bk rides big k-tiles so the
    pipeline has few, large DMA blocks.  The round-4 form clamped bn to a
    dividing tile <= 1024 (V2-Lite gate_up N=2816 -> bn=256, 176 dots) and
    decoded whole [bk, bn] tiles up front — the exact pathology the dense
    kernel fixed in round 3; it measured 235 GB/s of expert bank vs the
    dense kernel's 719-789 (VERDICT r4 #1/#2).
    Reference contract: src/sycl/kernels/moe/xe20/w4a16/gemm_xe2.hpp:54-70."""

    def vmem(bn, bk, ngb):
        return (
            bk // 2 * bn * 2        # packed weight block, double-buffered
            + bm * bk * 2 * 2       # activation block
            + ngb * bn * 2 * 4      # scales (+ possible zeros) blocks
            + bm * bn * out_itemsize * 2  # out block
            + bm * bn * 4           # f32 accumulator scratch
            + group_size * bn * 2   # inner-gmode per-group decode temp
        )

    if n % 128:
        bns = [n]  # no lane-aligned divisor: one whole-N block (Mosaic rule)
    else:
        bns = [d for d in range(n, 0, -128) if n % d == 0]
    if fixed_bk is not None:
        bks = [fixed_bk]
    else:
        # bk: group multiple with ngb % 8 == 0 (the per-tile scale block's
        # sublane rule, pick_ktile) or the full K; biggest first
        bks = sorted(
            {c * group_size for c in (16, 8) if k % (c * group_size) == 0} | {k},
            reverse=True,
        )
    for bn in bns:
        for bk in bks:
            if vmem(bn, bk, bk // group_size) <= budget:
                return bn, bk
    return bns[-1], bks[-1]


@functools.partial(jax.jit, static_argnames=("group_size", "fmt", "bm", "bn", "bk", "out_dtype", "per_channel", "gmode"))
def w4a16_grouped_mm(
    x_sorted,
    w,
    scales,
    block_expert_ids,
    zeros=None,
    layer_id=None,
    num_valid_blocks=None,
    *,
    group_size: int = 128,
    fmt: str = "int4",
    bm: int = 128,
    bn: Optional[int] = None,
    bk: Optional[int] = None,
    out_dtype=None,
    per_channel: bool = False,
    gmode: Optional[str] = None,
):
    """Block-aligned grouped W4A16 GEMM.

    num_valid_blocks: optional traced scalar — row blocks at i >= it are
    alignment padding; their weight fetches are clamped away and their
    output rows are UNDEFINED (the combine drops them via zero
    pair_weight). Default: all blocks valid.

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
    gmode: per-group decode strategy, same semantics as w4a16_gemm — the
      round-5 retune runs the dense kernel's BODY (``_kernel_inner`` /
      ``_kernel``) with expert selection living entirely in the BlockSpec
      index maps. Default: "inner" at decode-class bm (<= 64), "loop" for
      prefill blocks (MXU-bound, whole-tile decode amortizes over bm).
    Tiles default to pick_group_tiles (whole-N bn when VMEM allows + big
    bk — the group-dot-count law; docs/PERF.md round 3/5).
    Returns [cap, N].
    """
    cap, k = x_sorted.shape
    stacked = layer_id is not None
    e = w.shape[1] if stacked else w.shape[0]
    n = w.shape[-1]
    assert cap % bm == 0
    k_pad = w.shape[-2] * 2
    if k_pad != k:
        # quantize_w4 zero-padded a non-group-multiple K; pad the sorted
        # activations to match (padded tail multiplies zero codes) — the
        # same contract as the dense kernel (w4a16_gemm)
        from ...utils import round_up

        assert k < k_pad <= round_up(k, GROUPS_PER_KTILE * group_size), (
            k, k_pad, group_size)
        x_sorted = jnp.pad(x_sorted, ((0, 0), (0, k_pad - k)))
        k = k_pad
    assert w.shape[-2] == k // 2 and w.dtype == jnp.uint8, (w.shape, w.dtype)
    out_dtype = out_dtype or x_sorted.dtype
    if gmode is None:
        gmode = (_GROUP_GMODE_TABLE.get((n, k), "inner")
                 if bm <= 64 else "loop")
    assert gmode in ("loop", "batched") or (
        gmode.startswith("inner") and (gmode[5:] == "" or gmode[5:].isdigit())
    ), f"gmode must be 'loop', 'batched', or 'inner[N]', got {gmode!r}"
    out_isz = jnp.dtype(out_dtype).itemsize
    if bn is None:
        abn, abk = pick_group_tiles(
            n, k, group_size, bm, out_isz,
            fixed_bk=group_size if per_channel else bk,
        )
        bn = abn
        bk = bk or abk
    else:
        bn = min(bn, n)
        if n % bn:
            # explicit bn that doesn't divide: largest lane-aligned divisor
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
    ngb = bk // group_size
    n_k = k // bk

    scales_f = scales  # stored dtype (bf16 canonical); upcast per-tile in-kernel
    # expert (and layer) dims ride None-squeezed BlockSpecs so the kernel
    # body sees the same 2D [bk//2, bn] / [ngb, bn] tiles as the dense
    # kernel — the bodies are SHARED with ops/gemm/w4a16.py.
    # Blocks at i >= num_valid_blocks (the aligned cap is a STATIC worst
    # case; typical decode routing leaves 10-30% trailing pads) clamp their
    # (kk, j) weight indices to (0, 0): after the first trailing step the
    # block index never changes, so Pallas fetches nothing — the unclamped
    # form re-streamed the pinned expert's whole bank slice per trailing
    # block (~17% of V2-Lite e2e MoE bytes, ablate_moe_glue.py). Trailing
    # out rows are UNDEFINED; the combine drops them via zero pair_weight.
    if stacked:
        if per_channel:
            assert ngb == 1 and scales.shape[2] == 1
            s_spec = pl.BlockSpec((None, None, ngb, bn), lambda i, j, kk, eids, nv, lid: (lid[0], eids[i], 0, j * (i < nv[0])))
        else:
            s_spec = pl.BlockSpec((None, None, ngb, bn), lambda i, j, kk, eids, nv, lid: (lid[0], eids[i], kk * (i < nv[0]), j * (i < nv[0])))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, nv, lid: (i, kk * (i < nv[0]))),
            pl.BlockSpec((None, None, bk // 2, bn), lambda i, j, kk, eids, nv, lid: (lid[0], eids[i], kk * (i < nv[0]), j * (i < nv[0]))),
            s_spec,
        ]
    else:
        if per_channel:
            assert ngb == 1 and scales.shape[1] == 1
            s_spec = pl.BlockSpec((None, ngb, bn), lambda i, j, kk, eids, nv: (eids[i], 0, j * (i < nv[0])))
        else:
            s_spec = pl.BlockSpec((None, ngb, bn), lambda i, j, kk, eids, nv: (eids[i], kk * (i < nv[0]), j * (i < nv[0])))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, eids, nv: (i, kk * (i < nv[0]))),
            pl.BlockSpec((None, bk // 2, bn), lambda i, j, kk, eids, nv: (eids[i], kk * (i < nv[0]), j * (i < nv[0]))),
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
        gmode=gmode,
    )
    nv = jnp.asarray(
        cap // bm if num_valid_blocks is None else num_valid_blocks,
        jnp.int32).reshape(1)
    if stacked:
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, nv, lid: (i, j))
        scalar_args = (block_expert_ids, nv, jnp.asarray(layer_id, jnp.int32).reshape(1))
        nsp = 3
    else:
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, eids, nv: (i, j))
        scalar_args = (block_expert_ids, nv)
        nsp = 2
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


def _w4_kernel_entry(eids_ref, nv_ref, *refs, has_lid=False, has_zeros, fmt, group_size, ngb, n_k, gmode="inner"):
    if has_lid:
        refs = refs[1:]  # stacked: layer-id scalar ref consumed by BlockSpecs
    a_ref, w_ref, s_ref = refs[0], refs[1], refs[2]
    idx = 3
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    o_ref, acc_ref = refs[idx], refs[idx + 1]

    # trailing (padding) blocks skip the whole body: their fetches are
    # already index-clamped, but the dot sweep itself costs ~3us/step at
    # decode bm (probe_stacked_grouped.py: 15 trailing blocks = +20% on
    # the V2-Lite gate_up GEMM). Their out rows stay unwritten (undefined
    # by contract — the combine drops them). program_id is read OUTSIDE
    # the cond region (it cannot lower inside one) and threaded as k_idx.
    i = pl.program_id(0)
    kk = pl.program_id(2)

    @pl.when(i < nv_ref[0])
    def _valid():
        # shared bodies with the dense kernel (ops/gemm/w4a16.py): expert /
        # layer indexing lives entirely in the BlockSpec index maps above
        if gmode.startswith("inner"):
            _kernel_inner(
                a_ref, None, w_ref, s_ref, z_ref, None, None, o_ref, acc_ref,
                fmt=fmt, group_size=group_size, ngb=ngb, n_k=n_k,
                has_bias=False, prologue=None, nacc=int(gmode[5:] or 1),
                k_idx=kk,
            )
        else:
            _kernel(
                a_ref, None, w_ref, s_ref, z_ref, None, None, o_ref, acc_ref,
                fmt=fmt, group_size=group_size, ngb=ngb, n_k=n_k,
                has_bias=False, prologue=None, gmode=gmode, k_idx=kk,
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
    bn: Optional[int] = None,
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
