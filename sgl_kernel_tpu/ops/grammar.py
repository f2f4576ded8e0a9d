"""Grammar-constrained decoding: token bitmask application.

TPU-native equivalent of XGrammar's ApplyTokenBitmaskInplace (declared at
include/sgl_kernel_ops.h:1058; SURVEY §2.6 roadmap): mask logits of tokens
disallowed by the grammar automaton. The bitmask packs 32 tokens per int32
(bit set = token allowed). Functional (returns masked logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def apply_token_bitmask(logits, bitmask, indices=None):
    """logits [T, V]; bitmask [T, ceil(V/32)] int32; optional indices [N]
    selecting which logit rows the masks apply to (reference semantics).
    Disallowed tokens become -inf."""
    t, v = logits.shape
    bits = bitmask.astype(jnp.uint32)
    word = jnp.arange(v) // 32
    bit = jnp.arange(v) % 32
    allowed = (bits[:, word] >> bit.astype(jnp.uint32)) & 1  # [rows, V]
    masked_rows = jnp.where(allowed == 1, 0.0, -jnp.inf)
    if indices is None:
        return logits + masked_rows
    add = jnp.zeros_like(logits).at[indices].add(masked_rows)
    return logits + add
