"""Expert parallelism for fused_experts.

TPU-native realization of the reference's declared-but-unimplemented EP
surface (ep_moe_pre_reorder / ep_moe_post_reorder with start/end_expert_id
ranges — include/sgl_kernel_ops.h:726-753, never registered on XPU): each
shard owns a contiguous expert range; tokens are evaluated against the
local experts with out-of-range (expert, k) slots weight-zeroed, and the
partial outputs psum over the expert axis. (The all-to-all dispatch variant
is the planned optimization; this formulation is collective-minimal for the
decode-sized batches the serving loop produces and is numerically exact.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.moe import MoeWeights, fused_experts


def ep_fused_experts(
    hidden,
    local_weights: MoeWeights,
    topk_weights,
    topk_ids,
    *,
    axis_name: str = "ep",
    num_experts_global: int,
    activation: str = "silu",
    block_size: int = 32,
):
    """Run fused_experts with expert-sharded weights inside shard_map.

    local_weights holds this shard's E_local = E / ep experts (contiguous
    range [rank * E_local, (rank+1) * E_local)). topk_ids are global ids.
    """
    ep = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    e_local = num_experts_global // ep
    e0 = rank * e_local

    local = topk_ids - e0
    in_range = (local >= 0) & (local < e_local)
    local_ids = jnp.where(in_range, local, 0)
    local_w = jnp.where(in_range, topk_weights, 0.0)

    partial_out = fused_experts(
        hidden, local_weights, local_w, local_ids,
        activation=activation, block_size=block_size,
    )
    return jax.lax.psum(partial_out, axis_name)
