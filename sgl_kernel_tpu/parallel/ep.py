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


def ep_fused_experts_a2a(
    hidden,
    local_weights: MoeWeights,
    topk_weights,
    topk_ids,
    *,
    axis_name: str = "ep",
    num_experts_global: int,
    capacity: int = 0,
    activation: str = "silu",
    block_size: int = 32,
):
    """All-to-all expert dispatch (the reference's declared ep_moe_pre/post
    reorder pipeline, done the TPU way): each shard packs its (token, k)
    pairs into per-destination-shard buffers, ``jax.lax.all_to_all`` ships
    them over ICI, every shard runs fused_experts on its local expert range,
    and a second all_to_all returns the expert outputs for the weighted
    combine on the origin shard.

    hidden [T, H] (per-shard tokens); local_weights = this shard's
    E/ep experts; capacity = per-destination slot count (0 -> T*K, lossless).
    """
    ep = jax.lax.psum(1, axis_name)
    t, h = hidden.shape
    k = topk_ids.shape[1]
    e_local = num_experts_global // ep
    cap = capacity or t * k

    flat_dest = (topk_ids // e_local).reshape(-1)  # [T*K]
    flat_local_eid = (topk_ids % e_local).reshape(-1)
    flat_tok = jnp.arange(t * k) // k

    # slot of each pair within its destination buffer (rank among same-dest)
    order = jnp.argsort(flat_dest, stable=True)
    counts = jnp.bincount(flat_dest, length=ep)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank_sorted = jnp.arange(t * k) - starts[flat_dest[order]]
    rank = jnp.zeros(t * k, jnp.int32).at[order].set(rank_sorted)
    valid = rank < cap  # overflow drops (lossless when cap == T*K)

    send_x = jnp.zeros((ep, cap, h), hidden.dtype)
    send_x = send_x.at[flat_dest, rank].set(
        jnp.where(valid[:, None], hidden[flat_tok], 0), mode="drop"
    )
    send_eid = jnp.full((ep, cap), -1, jnp.int32)
    send_eid = send_eid.at[flat_dest, rank].set(jnp.where(valid, flat_local_eid, -1), mode="drop")

    recv_x = jax.lax.all_to_all(send_x, axis_name, 0, 0, tiled=False)
    recv_eid = jax.lax.all_to_all(send_eid, axis_name, 0, 0, tiled=False)

    xr = recv_x.reshape(ep * cap, h)
    eidr = recv_eid.reshape(ep * cap)
    ones = jnp.where(eidr >= 0, 1.0, 0.0)
    expert_out = fused_experts(
        xr, local_weights, ones[:, None], jnp.maximum(eidr, 0)[:, None],
        activation=activation, block_size=block_size,
    ).reshape(ep, cap, h)

    back = jax.lax.all_to_all(expert_out, axis_name, 0, 0, tiled=False)  # [ep, cap, h]
    # gather each pair's result and apply routing weights at the origin
    pair_out = back[flat_dest, jnp.minimum(rank, cap - 1)]
    w = jnp.where(valid, topk_weights.reshape(-1), 0.0)
    out = jnp.zeros((t, h), jnp.float32).at[flat_tok].add(pair_out.astype(jnp.float32) * w[:, None])
    return out.astype(hidden.dtype)
