"""Ring attention: sequence/context parallelism over ICI.

The reference has no SP/CP (SURVEY §2.4) but ships the combine primitive
(merge_state). Here the full ring algorithm: Q and KV are sequence-sharded
over the ring axis; KV blocks rotate with jax.lax.ppermute while each step
computes a partial flash attention, merged with the merge_state math. The
compute uses this framework's flash kernel; the causal cross-block masking
rides the kernel's global-position arguments (q_start / kv_start): each
step passes the block's true global offsets so the kernel's own causal
mask yields exactly full / diagonal / empty attention, with fully-masked
blocks skipped inside the kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention, merge_state


def ring_attention(
    q,
    k,
    v,
    *,
    axis_name: str,
    causal: bool = True,
    sm_scale: Optional[float] = None,
):
    """q/k/v: [B, S_local, H, D] — the local sequence shard of each device
    on the ring. Returns [B, S_local, H, D] as if attention ran over the
    full gathered sequence (causal in *global* position order).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, s, hq, d = q.shape


    def step_fn(carry, step):
        k_blk, v_blk, o_acc, lse_acc = carry
        src = (idx - step) % n
        # global positions: q rows start at idx*s; this KV block's rows start
        # at src*s — except blocks from the "future" ring positions, which
        # must contribute nothing under causal masking (their kv_start is
        # larger than every local q position, so the kernel masks them out
        # and skips their tiles).
        delta = idx - src
        kv0 = jnp.where(delta >= 0, src * s, (idx + 1) * s) if causal else src * s
        o_p, lse_p = flash_attention(
            q, k_blk, v_blk,
            q_start=jnp.full((b,), idx * s, jnp.int32),
            kv_start=jnp.broadcast_to(kv0, (b,)).astype(jnp.int32),
            causal=causal, sm_scale=sm_scale, return_lse=True,
        )
        # merge (lse: [B, H, S] -> [B, S, H] for merge_state's [T, H] layout)
        lse_p_t = jnp.swapaxes(lse_p, 1, 2)
        o_new, lse_new = merge_state(
            o_acc.reshape(b * s, hq, d), lse_acc.reshape(b * s, hq),
            o_p.reshape(b * s, hq, d), lse_p_t.reshape(b * s, hq),
        )
        # rotate KV to the next device
        pairs = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm=pairs)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm=pairs)
        return (k_blk, v_blk, o_new.reshape(b, s, hq, d), lse_new.reshape(b, s, hq)), None

    # f32 accumulator: merge_state returns v_a.dtype, so a q-dtype carry
    # would re-round the normalized partial at every ring step (error
    # growing with ring size); cast once at the end instead
    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full((b, s, hq), -jnp.inf, jnp.float32)
    (k, v, o, lse), _ = jax.lax.scan(step_fn, (k, v, o0, lse0), jnp.arange(n))
    return o.astype(q.dtype)
