"""Attention-state merge: the associative combine for split-KV / chunked /
ring attention.

TPU-native equivalent of the reference's merge_state / merge_state_v2
(src/sycl/merge_states.cpp; flashinfer cascade semantics, oracle
tests/test_merge_state.py:43-58): inputs are *normalized* partial attention
outputs ``v`` plus their log-sum-exp ``s`` in **base 2**:

    m = max(s_a, s_b)
    d = 2^(s_a - m) + 2^(s_b - m)
    v = (v_a 2^(s_a - m) + v_b 2^(s_b - m)) / d
    s = m + log2(d)

This op is the numerics contract every split/distributed attention in this
framework builds on (paged decode split-KV, ring attention over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def merge_state(v_a, s_a, v_b, s_b):
    """v_[ab]: [T, H, D]; s_[ab]: [T, H] base-2 LSE. Returns (v, s)."""
    sa = s_a.astype(jnp.float32)
    sb = s_b.astype(jnp.float32)
    m = jnp.maximum(sa, sb)
    wa = jnp.exp2(sa - m)
    wb = jnp.exp2(sb - m)
    d = wa + wb
    v = (v_a.astype(jnp.float32) * wa[..., None] + v_b.astype(jnp.float32) * wb[..., None]) / d[..., None]
    return v.astype(v_a.dtype), m + jnp.log2(d)


# v2 in the reference relaxes dtypes/in-place aliasing; functionally identical.
merge_state_v2 = merge_state


@jax.jit
def merge_states(v_stack, s_stack):
    """Merge N partial states at once: v [N, T, H, D], s [N, T, H].

    Used by split-KV reductions (the XeReduceSplitK analogue) — a single
    fused max/sum over the split axis instead of a pairwise tree.
    """
    s = s_stack.astype(jnp.float32)
    m = jnp.max(s, axis=0)
    w = jnp.exp2(s - m)  # [N, T, H]
    d = jnp.sum(w, axis=0)
    v = jnp.sum(v_stack.astype(jnp.float32) * w[..., None], axis=0) / d[..., None]
    return v.astype(v_stack.dtype), m + jnp.log2(d)


_LOG2E = 1.4426950408889634


@jax.jit
def apply_sinks(v, s, sinks):
    """Post-hoc attention-sink renormalization of a (merged) normalized
    attention state (reference sink semantics: flash_attention.cpp adds
    exp(sink) to the softmax denominator ONCE per attention).

    v [T, H, D] normalized output; s [T, H] base-2 LSE; sinks [H]
    natural-log sink logits. Returns v * sum/(sum + exp(sink)) — exactly
    the single-kernel sink result, so chunked/split/ring paths can run
    their partial kernels sink-FREE, merge, then apply the sink once.
    """
    w = 1.0 / (1.0 + jnp.exp2(sinks[None, :].astype(jnp.float32) * _LOG2E - s.astype(jnp.float32)))
    return (v.astype(jnp.float32) * w[..., None]).astype(v.dtype)
