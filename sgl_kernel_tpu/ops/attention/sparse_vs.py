"""MInference-style vertical + slash sparse attention.

TPU-native equivalent of the reference's sparse attention fallback
(python/sgl_kernel/sparse_flash_attn.py — itself a pure-torch fallback for
the declared-only mha_fwd_sparse surface, SURVEY §2.6): attention restricted
to a per-head set of *vertical* columns (always-attended tokens) and
*slash* diagonals (fixed offsets behind each query).

This implementation materializes the sparse mask per (head, q-tile) and
runs masked attention — the same contract the reference fallback provides;
a tile-skipping Pallas variant is the round-2 optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sm_scale", "causal"))
def sparse_attention_vertical_slash(
    q,
    k,
    v,
    vertical_idx,
    slash_idx,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = True,
):
    """q/k/v [B, S, H, D]; vertical_idx [H, NV] column ids (-1 pads);
    slash_idx [H, NS] diagonal offsets (0 = self, 1 = previous token, ...;
    -1 pads). Position (i, j) is attended iff j is a vertical column or
    i - j is a slash offset (and j <= i when causal)."""
    b, s, h, d = q.shape
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]

    # [H, S, S] masks built from index sets (-1 entries are padding)
    v_valid = (vertical_idx >= 0)[:, :, None, None]
    s_valid = (slash_idx >= 0)[:, :, None, None]
    vert = ((cols[None] == vertical_idx[:, :, None, None]) & v_valid).any(axis=1)
    vert = jnp.broadcast_to(vert, (h, s, s))
    diag = (((rows - cols)[None] == slash_idx[:, :, None, None]) & s_valid).any(axis=1)
    mask = vert | diag
    if causal:
        mask = mask & (cols <= rows)[None]

    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32)  # [B, H, S, D]
    kf = jnp.swapaxes(k, 1, 2).astype(jnp.float32)
    vf = jnp.swapaxes(v, 1, 2).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    scores = jnp.where(mask[None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vf) / jnp.maximum(l, 1e-38)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("num_vertical", "num_slash", "last_q"))
def build_vertical_slash_indexes(
    q,
    k,
    num_vertical: int,
    num_slash: int,
    last_q: int = 64,
    *,
    sm_scale: Optional[float] = None,
):
    """Estimate the vertical/slash index sets from the last ``last_q``
    queries' attention pattern (reference convert_vertical_slash_indexes
    role): sum scores per column -> top vertical columns; sum per diagonal
    -> top slash offsets. q/k [B, S, H, D] (uses batch 0)."""
    b, s, h, d = q.shape
    sm = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    qt = jnp.swapaxes(q[0, -last_q:], 0, 1).astype(jnp.float32)  # [H, lq, D]
    kt = jnp.swapaxes(k[0], 0, 1).astype(jnp.float32)  # [H, S, D]
    scores = jnp.einsum("hqd,hkd->hqk", qt, kt) * sm
    rows = s - last_q + jnp.arange(last_q)[:, None]
    cols = jnp.arange(s)[None, :]
    scores = jnp.where(cols <= rows, jax.nn.softmax(scores, axis=-1), 0.0)
    col_mass = scores.sum(axis=1)  # [H, S]
    _, v_idx = jax.lax.top_k(col_mass, num_vertical)
    # diagonal mass: offset o = row - col in [0, S)
    offs = rows - cols  # [lq, S]
    diag_mass = jnp.zeros((h, s))
    diag_mass = diag_mass.at[:, jnp.clip(offs, 0, s - 1).reshape(-1)].add(
        scores.reshape(h, -1), mode="drop"
    )
    _, s_idx = jax.lax.top_k(diag_mass, num_slash)
    return v_idx.astype(jnp.int32), s_idx.astype(jnp.int32)
