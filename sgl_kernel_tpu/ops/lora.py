"""LoRA segment GEMMs: per-request adapter matmuls over a ragged batch.

TPU-native equivalents of the reference's LoRA kernels
(src/sycl/SGEMMLoraAFwd.cpp, SGEMMLoraBFwd.cpp, EmbeddingLoraAFwd.cpp;
contracts include/sgl_kernel_ops.h:1086-1119): tokens are grouped into
segments (one adapter per segment, seg_indptr/weight_indices), shrink-A
projects to stacked ranks, expand-B scales and adds into the base output.

On TPU the ragged segment structure maps onto the same machinery as MoE:
``jax.lax.ragged_dot`` (XLA's grouped GEMM) over the contiguous token
segments, with the per-SEGMENT adapter weights gathered once — never a
per-token weight copy. Rank masking stays per token (adapters in one
batch may have different ranks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import cdiv, round_up


def _expand_segment_ids(seg_indptr, num_tokens: int):
    """[num_segments+1] ptr -> [num_tokens] segment id per token."""
    # seg of token t = number of segment starts <= t minus 1
    starts = seg_indptr[1:-1]  # interior boundaries
    return jnp.searchsorted(starts, jnp.arange(num_tokens), side="right").astype(jnp.int32)


class LoraAlignment(NamedTuple):
    """Block-aligned layout of ragged adapter segments (the LoRA analog of
    moe_align_block_size): dst [T] scatter row per token, block_adapter
    [cap // block_size] adapter id per row-block (scalar-prefetch input to
    the grouped kernel), cap static."""

    dst: jax.Array
    block_adapter: jax.Array
    cap: int


def lora_align_block_size(seg_indptr, weight_indices, num_tokens: int, block_size: int):
    """Pad each contiguous adapter segment to a block_size multiple so
    every row-block maps to exactly one adapter. Segments are already
    contiguous (one adapter per segment), so this is a per-segment shift —
    no sort, unlike the MoE aligner. Not jitted itself (``cap`` must stay
    a static int); call from inside a jitted caller."""
    s = weight_indices.shape[0]
    sizes = (seg_indptr[1:] - seg_indptr[:-1]).astype(jnp.int32)
    padded = cdiv(sizes, block_size) * block_size
    cap = round_up(num_tokens + s * (block_size - 1), block_size)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    seg_ids = _expand_segment_ids(seg_indptr, num_tokens)
    dst = starts[seg_ids] + (jnp.arange(num_tokens, dtype=jnp.int32) - seg_indptr[seg_ids].astype(jnp.int32))
    nb = cap // block_size
    block_end = (jnp.cumsum(padded) // block_size).astype(jnp.int32)  # exclusive per segment
    blk = jnp.arange(nb, dtype=jnp.int32)
    blockseg = jnp.clip(
        jnp.searchsorted(block_end, blk, side="right").astype(jnp.int32), 0, s - 1)
    block_adapter = weight_indices[blockseg].astype(jnp.int32)
    # pin trailing (unused) blocks to the last used adapter so the grouped
    # GEMM's weight fetch index stays constant there (no extra DMA)
    num_valid = block_end[-1]
    last_valid = jnp.max(jnp.where(blk < num_valid, block_adapter, 0))
    block_adapter = jnp.where(blk < num_valid, block_adapter, last_valid)
    return LoraAlignment(dst=dst, block_adapter=block_adapter, cap=cap)


def _grouped_segment_mm(x, weights_kn, seg_indptr, weight_indices, block_size: int):
    """x [T, K] through per-segment adapter GEMMs on the stacked-bank
    grouped kernel (ops/moe/grouped_gemm.bf16_grouped_mm): scatter rows to
    the block-aligned layout, one Pallas grouped GEMM with the adapter id
    scalar-prefetched per block (weights read straight from the stacked
    [num_loras, K, N] bank — no per-segment weight gather/copy), gather
    rows back. Returns [T, N] f32."""
    from .moe.grouped_gemm import bf16_grouped_mm

    t, k = x.shape
    align = lora_align_block_size(seg_indptr, weight_indices, t, block_size)
    xa = jnp.zeros((align.cap, k), x.dtype).at[align.dst].set(x)
    out = bf16_grouped_mm(
        xa, weights_kn, align.block_adapter, bm=block_size,
        out_dtype=jnp.float32,
    )
    return out[align.dst]


def _pick_impl(impl: Optional[str], t: int, s: int) -> str:
    if impl is not None:
        return impl
    # grouped wins when segments are prefill-scale: the ragged_dot path
    # materializes a per-SEGMENT copy of each adapter's weights (S x K x N
    # HBM write+read) while the grouped kernel streams weight tiles per
    # 128-row block — at decode scale (1-2 tokens/segment) the 128-row
    # padding wastes more than the gather costs
    return "grouped" if t >= 256 and t >= 64 * s else "ragged"


@functools.partial(jax.jit, static_argnames=("stack_num", "impl"))
def sgemm_lora_a_fwd(x, weights, seg_indptr, weight_indices, lora_ranks,
                     stack_num: int = 1, impl: Optional[str] = None):
    """Shrink: x [T, K] @ A_l^T per segment -> [T, stack*max_rank]
    (reference sgemm_lora_a_fwd, SGEMMLoraAFwd.cpp:1-175).

    weights: [num_loras, stack*max_rank, K]. Output columns beyond the
    adapter's lora_rank (per stack slot) are zeroed, matching the
    reference's zero-fill of unused rank columns.

    impl: "ragged" (XLA ragged_dot over per-segment gathered weights),
    "grouped" (block-aligned Pallas grouped GEMM over the stacked adapter
    bank — no weight gather; ops/moe/grouped_gemm.py), or None for the
    measured cutover (grouped at prefill-scale segments).
    """
    t = x.shape[0]
    num_loras, out_dim, k = weights.shape
    s = weight_indices.shape[0]
    if _pick_impl(impl, t, s) == "grouped":
        wt = jnp.swapaxes(weights, 1, 2).astype(x.dtype)  # [L, K, out] (tiny)
        out = _grouped_segment_mm(x, wt, seg_indptr, weight_indices, 128)
    else:
        sizes = (seg_indptr[1:] - seg_indptr[:-1]).astype(jnp.int32)  # [S]
        w_seg = jnp.swapaxes(weights[weight_indices], 1, 2)  # [S, K, out]
        out = jax.lax.ragged_dot(
            x, w_seg.astype(x.dtype), sizes, preferred_element_type=jnp.float32
        )
    max_rank = out_dim // stack_num
    seg_ids = _expand_segment_ids(seg_indptr, t)
    ranks = lora_ranks[weight_indices[seg_ids]]  # [T]
    col = jnp.arange(out_dim) % max_rank
    mask = col[None, :] < ranks[:, None]
    return jnp.where(mask, out, 0).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("impl",))
def sgemm_lora_b_fwd(x, weights, seg_indptr, weight_indices, lora_ranks,
                     scalings, base_output=None, impl: Optional[str] = None):
    """Expand: x [T, max_rank] @ B_l^T * scaling (+ base_output)
    (reference sgemm_lora_b_fwd, SGEMMLoraBFwd.cpp).

    weights: [num_loras, output_dim, max_rank]. impl as in
    ``sgemm_lora_a_fwd``.
    """
    t, max_rank = x.shape
    seg_ids = _expand_segment_ids(seg_indptr, t)
    adapter = weight_indices[seg_ids]
    ranks = lora_ranks[adapter]
    xm = jnp.where(jnp.arange(max_rank)[None, :] < ranks[:, None], x, 0)
    s = weight_indices.shape[0]
    if _pick_impl(impl, t, s) == "grouped":
        wt = jnp.swapaxes(weights, 1, 2).astype(xm.dtype)  # [L, rank, out]
        out = _grouped_segment_mm(xm, wt, seg_indptr, weight_indices, 128)
    else:
        sizes = (seg_indptr[1:] - seg_indptr[:-1]).astype(jnp.int32)
        w_seg = jnp.swapaxes(weights[weight_indices], 1, 2)  # [S, rank, out]
        out = jax.lax.ragged_dot(
            xm, w_seg.astype(xm.dtype), sizes, preferred_element_type=jnp.float32
        )
    out = out * scalings[adapter][:, None].astype(jnp.float32)
    if base_output is not None:
        out = out + base_output.astype(jnp.float32)
    return out.astype(x.dtype if base_output is None else base_output.dtype)


@jax.jit
def embedding_lora_a_fwd(input_ids, weights, seg_indptr, weight_indices, lora_ranks, extra_embeddings=None, vocab_size=None):
    """Embedding-A: rows of the adapter's [max_rank, vocab] table.

    input_ids [T]; weights [num_loras, max_rank, vocab_size]. Ids >= vocab
    index extra_embeddings [num_loras, num_extra, max_rank] when given.
    """
    t = input_ids.shape[0]
    num_loras, max_rank, table_vocab = weights.shape
    # the LOGICAL vocab boundary may be smaller than the (padded) weight
    # table: ids in [vocab_size, table_vocab) must route to
    # extra_embeddings, not gather padding columns
    vocab = table_vocab if vocab_size is None else vocab_size
    seg_ids = _expand_segment_ids(seg_indptr, t)
    adapter = weight_indices[seg_ids]
    in_vocab = input_ids < vocab
    safe_ids = jnp.where(in_vocab, input_ids, 0)
    out = weights[adapter, :, safe_ids]  # [T, max_rank]
    if extra_embeddings is not None:
        extra_idx = jnp.where(in_vocab, 0, input_ids - vocab)
        extra = extra_embeddings[adapter, extra_idx]  # [T, max_rank]
        out = jnp.where(in_vocab[:, None], out, extra)
    ranks = lora_ranks[adapter]
    return jnp.where(jnp.arange(max_rank)[None, :] < ranks[:, None], out, 0)
