"""DSv4 KV compression ("flash compress") — core math.

TPU-native implementation of the reference's compression reduce
(src/sycl/FlashCompress4.cpp / FlashCompress128.cpp; pure-torch oracle
python/sgl_kernel/flash_compress_4.py:96-148): a window of W KV rows is
pooled into one compressed token by a per-channel softmax over learned
score channels plus an additive positional embedding:

    w   = softmax(scores[window] + ape, axis=window)
    out = sum(kv[window] * w, axis=window)

c4 uses overlapping windows (W = 8 = 2*ratio, stride 4); c128 uses plain
windows (W = ratio = 128). The reference's device-built ring-buffer plans
(CompressPlan.cpp) are serving-pool plumbing around this reduce; here the
windowed form operates on explicit sequences — the ring-buffer pool
orchestration is round-2 surface (tracked in README).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def compress_window(kv, scores, ape):
    """kv/scores [..., W, D]; ape [W, D]. Returns [..., D]."""
    s = scores.astype(jnp.float32) + ape.astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-2)
    return jnp.sum(kv.astype(jnp.float32) * w, axis=-2)


@functools.partial(jax.jit, static_argnames=("compress_ratio",))
def compress_sequence(kv, scores, ape, compress_ratio: int = 4):
    """Compress a full sequence: kv/scores [T, D] -> [T // ratio, D].

    ratio 4: overlapping windows of 8 (events at positions 4k+3 pool tokens
    [4k-4, 4k+4), the first window zero-padded with -inf scores — matching
    the c4 overlap semantics). ratio 128 (or any other): plain windows.
    """
    t, d = kv.shape
    r = compress_ratio
    n = t // r
    if r == 4:
        pad_kv = jnp.concatenate([jnp.zeros((r, d), kv.dtype), kv[: n * r]], axis=0)
        pad_sc = jnp.concatenate(
            [jnp.full((r, d), -jnp.inf, jnp.float32), scores[: n * r].astype(jnp.float32)], axis=0
        )
        win_kv = jnp.stack([pad_kv[i * r : i * r + 2 * r] for i in range(n)])  # [n, 8, D]
        win_sc = jnp.stack([pad_sc[i * r : i * r + 2 * r] for i in range(n)])
        assert ape.shape[0] == 2 * r
    else:
        win_kv = kv[: n * r].reshape(n, r, d)
        win_sc = scores[: n * r].reshape(n, r, d)
        assert ape.shape[0] == r
    return compress_window(win_kv, win_sc, ape).astype(kv.dtype)
