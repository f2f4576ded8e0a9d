"""Ulysses-style sequence parallelism (all-to-all head/sequence transpose).

The reference has no SP (SURVEY.md §2.4 lists Ulysses as a TPU-native
equivalent to build). Complement to ring attention (ring_attention.py):
instead of circulating KV blocks, Ulysses redistributes the tensors once
— each device starts with the full heads of a sequence *shard*, and an
all-to-all turns that into all tokens of a *head* shard, runs plain
(flash) attention locally, then transposes back. Two all-to-alls per
attention instead of (n-1) ppermutes; better when heads >= devices and
the sequence is long.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention


def ulysses_attention(q, k, v, *, axis_name: str, causal: bool = True, sm_scale=None):
    """q [B, Sl, Hq, D] (sequence-sharded over ``axis_name``; Hq is the
    GLOBAL head count), k/v likewise. Returns [B, Sl, Hq, D] with the same
    sharding. Requires Hq % axis_size == 0."""
    n = jax.lax.psum(1, axis_name)
    b, sl, hq, d = q.shape

    def to_heads(x):
        h = x.shape[2]
        assert h % n == 0, (h, n)
        # [B, Sl, H, D] -> concat_seq([B, Sl, H/n, D]) : split heads, gather seq
        xs = x.reshape(b, sl, n, h // n, d)
        # all_to_all: split axis 2 (head groups) across devices, concat axis 1 (seq)
        return jax.lax.all_to_all(xs, axis_name, split_axis=2, concat_axis=1, tiled=False).reshape(
            b, sl * n, h // n, d
        )

    def to_seq(x):
        # inverse: [B, S, H/n, D] -> [B, Sl, H, D].  all_to_all's concat
        # stacks received chunks local-major on the concat axis ((hloc, n)
        # order), so restore source-major (n, hloc) = global head order
        # with an explicit transpose.
        hloc = x.shape[2]
        xs = x.reshape(b, n, sl, hloc, d)
        out = jax.lax.all_to_all(xs, axis_name, split_axis=1, concat_axis=3, tiled=False)
        out = out.reshape(b, sl, hloc, n, d)
        return jnp.swapaxes(out, 2, 3).reshape(b, sl, hloc * n, d)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    s_total = sl * n
    lens = jnp.full((b,), s_total, jnp.int32)
    out = flash_attention(qh, kh, vh, lens, lens, causal=causal, sm_scale=sm_scale)
    return to_seq(out.astype(q.dtype))
