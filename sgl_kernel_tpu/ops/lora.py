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

import jax
import jax.numpy as jnp


def _expand_segment_ids(seg_indptr, num_tokens: int):
    """[num_segments+1] ptr -> [num_tokens] segment id per token."""
    # seg of token t = number of segment starts <= t minus 1
    starts = seg_indptr[1:-1]  # interior boundaries
    return jnp.searchsorted(starts, jnp.arange(num_tokens), side="right").astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("stack_num",))
def sgemm_lora_a_fwd(x, weights, seg_indptr, weight_indices, lora_ranks, stack_num: int = 1):
    """Shrink: x [T, K] @ A_l^T per segment -> [T, stack*max_rank].

    weights: [num_loras, stack*max_rank, K]. Output columns beyond the
    adapter's lora_rank (per stack slot) are zeroed, matching the
    reference's zero-fill of unused rank columns.
    """
    t = x.shape[0]
    num_loras, out_dim, k = weights.shape
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


@jax.jit
def sgemm_lora_b_fwd(x, weights, seg_indptr, weight_indices, lora_ranks, scalings, base_output=None):
    """Expand: x [T, max_rank] @ B_l^T * scaling (+ base_output).

    weights: [num_loras, output_dim, max_rank].
    """
    t, max_rank = x.shape
    seg_ids = _expand_segment_ids(seg_indptr, t)
    adapter = weight_indices[seg_ids]
    ranks = lora_ranks[adapter]
    xm = jnp.where(jnp.arange(max_rank)[None, :] < ranks[:, None], x, 0)
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
