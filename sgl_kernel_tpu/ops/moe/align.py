"""MoE token routing data movement: sort-by-expert with block alignment.

TPU-native replacement for the reference's MoEAlign.cpp / MoEPrepareInputs.cpp
(moe_align_block_size, prepare_moe_input, scatter_tokens_to_experts,
apply_shuffle_mul_sum). On TPU all shapes must be static, so the layout is:

  - (token, k) pairs are stably sorted by expert id,
  - each expert's segment is padded up to a multiple of ``block_size`` so
    every block belongs to exactly one expert (what the reference's
    moe_align_block_size produces),
  - the per-block expert id array is scalar-prefetched by the grouped GEMM.

The padded capacity is the static worst case T*K + min(T*K, E)*(block-1),
rounded (at most min(T*K, E) experts can have a nonzero, padded segment —
using E here over-allocated 30x at decode batch sizes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import cdiv, round_up


def pick_block_size(num_tokens: int, topk: int, num_experts: int,
                    lo: int = 16, hi: int = 128) -> int:
    """Alignment block size from the MEAN ROWS PER EXPERT, t*topk/E — not t.

    The aligned row cap is ~min(t*topk, E) * block_size at sparse routing,
    and both the scatter/combine glue and the ragged/grouped GEMM row count
    scale with the cap. Sizing blocks by t alone over-pads sparse prefill
    geometries: (t=128, E=64, topk=8) has 16 rows/expert, and a bm=128
    block there is 87% padding — the round-5 regen measured the bf16 row
    at exactly 2x the bs=64 form (docs/PERF.md round 5). Dense geometries
    ((t=1024, E=64, topk=8): 128 rows/expert) still get bm=128 so the
    grouped kernel's dots run the MXU at full sublane width.

    Reference analog: moe_align_block_size's block_size argument is picked
    by the caller per geometry (MoEAlign.cpp); this is the TPU-side policy.
    """
    rows = max(1, (num_tokens * topk) // max(1, num_experts))
    bs = 1 << (rows - 1).bit_length()  # next pow2 >= mean rows/expert
    return max(lo, min(hi, bs))


class MoeAlignment(NamedTuple):
    sorted_pair_ids: jax.Array  # [cap] flat (token*K + k) pair index, sentinel = T*K
    block_expert_ids: jax.Array  # [cap // block] expert id per block (clamped)
    token_ids: jax.Array  # [cap] source token for each slot (sentinel -> T)
    pair_weight: jax.Array  # [cap] routing weight for each slot (0 for pads)
    num_valid_blocks: jax.Array  # [] int32
    group_sizes: jax.Array  # [E] unpadded per-expert counts
    padded_group_sizes: jax.Array  # [E] per-expert counts padded to block_size


@functools.partial(jax.jit, static_argnames=("num_experts", "block_size"))
def moe_align_block_size(topk_ids, topk_weights, num_experts: int, block_size: int) -> MoeAlignment:
    t, k = topk_ids.shape
    n = t * k
    cap = round_up(n + min(n, num_experts) * (block_size - 1), block_size)
    flat = topk_ids.reshape(-1).astype(jnp.int32)
    wflat = topk_weights.reshape(-1).astype(jnp.float32)

    order = jnp.argsort(flat, stable=True)  # pair ids sorted by expert
    sorted_experts = flat[order]
    counts = jnp.bincount(flat, length=num_experts)
    padded = cdiv(counts, block_size) * block_size
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    # rank of each sorted element within its expert run
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = pos - run_start[sorted_experts]
    dest = starts[sorted_experts] + rank

    sorted_pair_ids = jnp.full((cap,), n, jnp.int32).at[dest].set(order.astype(jnp.int32))
    token_ids = jnp.where(sorted_pair_ids < n, sorted_pair_ids // k, t)
    pair_weight = jnp.zeros((cap,), jnp.float32).at[dest].set(wflat[order])

    nb = cap // block_size
    block_starts = jnp.cumsum(padded) // block_size  # end block (exclusive) per expert
    blk = jnp.arange(nb, dtype=jnp.int32)
    block_expert = jnp.clip(jnp.searchsorted(block_starts, blk, side="right").astype(jnp.int32), 0, num_experts - 1)
    num_valid = (jnp.sum(padded) // block_size).astype(jnp.int32)
    # pin trailing (unused) blocks to the last used expert so the grouped
    # GEMM's weight fetch index stays constant there (no extra DMA)
    last_valid_expert = jnp.max(jnp.where(blk < num_valid, block_expert, 0))
    block_expert = jnp.where(blk < num_valid, block_expert, last_valid_expert)
    return MoeAlignment(
        sorted_pair_ids, block_expert, token_ids, pair_weight, num_valid,
        counts.astype(jnp.int32), padded.astype(jnp.int32),
    )


@jax.jit
def scatter_tokens_to_experts(hidden, alignment: MoeAlignment):
    """Gather tokens into expert-sorted (block-aligned) order: [cap, H].

    Pad slots read row ``T`` of an extra zero row (reference
    scatter_tokens_to_experts semantics: pads produce zeros).
    """
    h = jnp.concatenate([hidden, jnp.zeros((1, hidden.shape[1]), hidden.dtype)], axis=0)
    return h[alignment.token_ids]


@functools.partial(jax.jit, static_argnames=("num_tokens",))
def apply_shuffle_mul_sum(expert_out, alignment: MoeAlignment, num_tokens: int):
    """Combine: out[t] = sum over this token's (expert, k) slots of
    weight * expert_out[slot]  (MoEPrepareInputs.cpp apply_shuffle_mul_sum)."""
    w = alignment.pair_weight[:, None].astype(jnp.float32)
    contrib = expert_out.astype(jnp.float32) * w
    out = jnp.zeros((num_tokens + 1, expert_out.shape[1]), jnp.float32)
    out = out.at[alignment.token_ids].add(contrib)
    return out[:num_tokens].astype(expert_out.dtype)
