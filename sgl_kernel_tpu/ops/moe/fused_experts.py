"""fused_experts: the full MoE layer forward.

TPU-native re-design of the reference's orchestration (moe.py:403-867):

    route -> align/sort by expert -> grouped GEMM1 -> activation
          -> grouped GEMM2 -> weighted combine

BF16 weights run on jax.lax.ragged_dot (XLA grouped GEMM); quantized
int4/mxfp4 weights run on the Pallas block-aligned grouped kernel
(grouped_gemm.w4a16_grouped_mm). The activation between the GEMMs follows
the reference activation map (silu / gelu / silu_clamp / swiglu_gpt_oss).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...utils import round_up
from ..activation import ACTIVATIONS
from .align import (
    MoeAlignment,
    apply_shuffle_mul_sum,
    moe_align_block_size,
    pick_block_size,
    scatter_tokens_to_experts,
)
from .grouped_gemm import bf16_group_tiles_fit, bf16_grouped_mm, ragged_grouped_mm, w4a16_grouped_mm


def _decode_grouped_ok(w1, w2, bm):
    """Both grouped GEMMs must have Mosaic-legal VMEM-fitting tiles (dims
    with no 128-multiple divisor, e.g. gpt-oss 2880, force full-extent
    blocks beyond VMEM — those stay on ragged_dot)."""
    return (bf16_group_tiles_fit(w1.shape[-1], w1.shape[-2], bm)
            and bf16_group_tiles_fit(w2.shape[-1], w2.shape[-2], bm))


class MoeWeights(NamedTuple):
    """Expert weights for one MoE layer.

    w1: [E, H, 2I] (gate|up concatenated on the output dim) bf16, or the
        K-paired packed int4 layout [E, H//2, 2I] (pack_w4_tpu per expert).
    w2: [E, I, H] bf16, or packed int4 [E, I//2, H].
    Optional per-group quant metadata mirrors ops/gemm/w4a16.py.
    """

    w1: jax.Array
    w2: jax.Array
    w1_scales: Optional[jax.Array] = None
    w2_scales: Optional[jax.Array] = None
    w1_zeros: Optional[jax.Array] = None
    w2_zeros: Optional[jax.Array] = None
    # per-expert biases [E, 2I] / [E, H] (reference fused_experts b1/b2,
    # moe.py:409-410 — gpt-oss checkpoints carry them); [L, E, ...] when
    # layer-stacked (layer_id selects)
    b1: Optional[jax.Array] = None
    b2: Optional[jax.Array] = None
    group_size: int = 128
    fmt: str = "bf16"  # bf16 | int4 | mxfp4


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_size", "gemm1_alpha", "gemm1_limit", "fmt", "group_size"),
)
def _fused_experts_impl(
    hidden,
    w1,
    w2,
    topk_weights,
    topk_ids,
    w1_scales,
    w2_scales,
    w1_zeros,
    w2_zeros,
    b1,
    b2,
    layer_id=None,
    *,
    activation: str,
    block_size: int,
    gemm1_alpha: float,
    gemm1_limit: float,
    fmt: str,
    group_size: int,
):
    t, h = hidden.shape
    e = w1.shape[1] if layer_id is not None else w1.shape[0]
    act_fn = ACTIVATIONS[activation]

    align = moe_align_block_size(topk_ids, topk_weights, e, block_size)
    x = scatter_tokens_to_experts(hidden, align)  # [cap, H]

    # per-expert bias: every row of a block belongs to one expert, so the
    # bias is a [cap]-row gather over block_expert_ids (pad rows pick up a
    # bias too — the combine drops them via zero pair_weight). b1 applies
    # BEFORE the activation (reference epilogue order, moe.py:747-788).
    row_e = jnp.repeat(align.block_expert_ids, block_size)

    def _bias(y, b):
        if b is None:
            return y
        bl = b[layer_id] if (layer_id is not None and b.ndim == 3) else b
        return y + bl[row_e].astype(y.dtype)

    def _act(inter):
        inter = _bias(inter, b1)
        if activation in ("silu_clamp", "swiglu_gpt_oss"):
            return act_fn(inter, gemm1_limit) if activation == "silu_clamp" else act_fn(inter, gemm1_alpha, gemm1_limit)
        return act_fn(inter)

    if fmt == "bf16" and layer_id is not None:
        # layer-stacked bf16 banks: the Pallas grouped kernel fetches only
        # the routed experts' tiles via scalar prefetch (ragged_dot would
        # need w1[layer_id] materialized — a whole-bank HBM copy per step)
        inter = bf16_grouped_mm(x, w1, align.block_expert_ids, layer_id,
                                align.num_valid_blocks, bm=block_size)
        a = _act(inter)
        out_sorted = bf16_grouped_mm(a.astype(hidden.dtype), w2, align.block_expert_ids,
                                     layer_id, align.num_valid_blocks, bm=block_size)
    elif fmt == "bf16" and t <= 64 and _decode_grouped_ok(w1, w2, block_size):
        # decode-class batches: ragged_dot streams the FULL [E, K, N] bank
        # even though only ~topk*T experts are routed — at token=1 that is
        # 64 experts' weights for 8 experts' work (the reference's Arc B580
        # beat the v5e on this row, VERDICT r4 #3/#7). The grouped Pallas
        # kernel fetches ONLY the routed experts' tiles via scalar-
        # prefetched block_expert_ids: ~(topk*T/E) of the bank streamed.
        inter = bf16_grouped_mm(x, w1, align.block_expert_ids,
                                num_valid_blocks=align.num_valid_blocks, bm=block_size)
        a = _act(inter)
        out_sorted = bf16_grouped_mm(a.astype(hidden.dtype), w2, align.block_expert_ids,
                                     num_valid_blocks=align.num_valid_blocks, bm=block_size)
    elif fmt == "bf16":
        # ragged_dot wants true group sizes over *sorted* rows; our rows are
        # block-aligned with zero pads inside each expert segment, so use the
        # padded per-expert sizes (pads multiply real weights, produce rows
        # that the combine drops via zero pair_weight; rows past the padded
        # total belong to no group and come out zero).
        inter = ragged_grouped_mm(x, w1, align.padded_group_sizes)  # [cap, 2I]
        a = _act(inter)
        out_sorted = ragged_grouped_mm(a, w2, align.padded_group_sizes)  # [cap, H]
    else:
        # layer_id (layer-stacked expert banks) rides scalar prefetch
        # through the grouped kernel — slicing w1[layer_id] here would
        # materialize the whole expert bank per scan step
        inter = w4a16_grouped_mm(
            x, w1, w1_scales, align.block_expert_ids, w1_zeros, layer_id,
            align.num_valid_blocks, group_size=group_size, fmt=fmt, bm=block_size,
        )
        a = _act(inter)
        out_sorted = w4a16_grouped_mm(
            a, w2, w2_scales, align.block_expert_ids, w2_zeros, layer_id,
            align.num_valid_blocks, group_size=group_size, fmt=fmt, bm=block_size,
        )

    out_sorted = _bias(out_sorted, b2)
    return apply_shuffle_mul_sum(out_sorted, align, t)


def fused_experts(
    hidden,
    weights: MoeWeights,
    topk_weights,
    topk_ids,
    layer_id=None,
    *,
    activation: str = "silu",
    block_size: Optional[int] = None,
    gemm1_alpha: float = 1.702,
    gemm1_limit: float = 7.0,
):
    """MoE layer forward. hidden [T, H]; topk_weights/ids [T, K].

    layer_id: quantized path only — weights carry a leading layer dim
    ([L, E, ...]) and the grouped kernel selects the layer via scalar
    prefetch (no per-scan-step expert-bank slice); bf16 stacked banks run
    the Pallas bf16 grouped kernel, quantized banks the W4A16 one.

    block_size: alignment block size; None (default) picks by mean rows
    per expert (align.pick_block_size — the cap/glue vs MXU-width policy)."""
    if block_size is None:
        block_size = pick_block_size(
            hidden.shape[0], topk_ids.shape[1], weights.w1.shape[-3])
    return _fused_experts_impl(
        hidden,
        weights.w1,
        weights.w2,
        topk_weights,
        topk_ids,
        weights.w1_scales,
        weights.w2_scales,
        weights.w1_zeros,
        weights.w2_zeros,
        weights.b1,
        weights.b2,
        layer_id,
        activation=activation,
        block_size=block_size,
        gemm1_alpha=gemm1_alpha,
        gemm1_limit=gemm1_limit,
        fmt=weights.fmt,
        group_size=weights.group_size,
    )
