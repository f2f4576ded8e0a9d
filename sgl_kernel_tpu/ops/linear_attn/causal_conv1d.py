"""Mamba-style causal depthwise conv1d (prefill + single-step update).

TPU-native equivalent of the reference's causal_conv1d kernels
(src/sycl/causal_conv1d.cpp; python mamba.py wrappers): short depthwise
convolution (width 2-4) along the sequence with per-sequence initial state
carry, the SSM front-end shared by Mamba and GDN layers.

The reference takes a varlen flat batch (query_start_loc); TPU wants
static shapes, so the API is a padded batch [B, S, D] + seq_lens — the
bucketing layer the SURVEY's hard-parts list calls for. Width is tiny, so
the conv is a sum of W shifted slices that XLA fuses into one pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _act(x, activation):
    if activation is None or activation == "none":
        return x
    if activation == "silu" or activation == "swish":
        return x * jax.nn.sigmoid(x)
    raise ValueError(activation)


@functools.partial(jax.jit, static_argnames=("activation",))
def causal_conv1d_fwd(
    x,
    weight,
    bias=None,
    seq_lens=None,
    initial_states=None,
    *,
    activation: Optional[str] = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """x [B, S, D]; weight [D, W]; bias [D]; seq_lens [B];
    initial_states [B, W-1, D] (last W-1 inputs of the previous chunk).

    Returns (y [B, S, D], final_states [B, W-1, D]).
    """
    b, s, d = x.shape
    w = weight.shape[1]
    if seq_lens is None:
        seq_lens = jnp.full((b,), s, jnp.int32)
    xf = x.astype(jnp.float32)
    # zero out padding so it can't leak into states
    tmask = (jnp.arange(s)[None, :] < seq_lens[:, None])[..., None]
    xf = jnp.where(tmask, xf, 0.0)
    if initial_states is None:
        pad = jnp.zeros((b, w - 1, d), jnp.float32)
    else:
        pad = initial_states.astype(jnp.float32)
    xpad = jnp.concatenate([pad, xf], axis=1)  # [B, S+W-1, D]

    y = jnp.zeros((b, s, d), jnp.float32)
    for j in range(w):
        y = y + xpad[:, j : j + s, :] * weight[:, j].astype(jnp.float32)[None, None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, None, :]
    y = jnp.where(tmask, _act(y, activation), 0.0)

    # final state = last W-1 *valid* inputs per sequence (from xpad rows
    # [len, len+W-1) in padded coordinates)
    idx = seq_lens[:, None] + jnp.arange(w - 1)[None, :]  # [B, W-1]
    final = jnp.take_along_axis(xpad, idx[..., None], axis=1)
    return y.astype(x.dtype), final.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("activation",))
def causal_conv1d_update(
    x,
    conv_state,
    weight,
    bias=None,
    *,
    activation: Optional[str] = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """Single decode step: x [B, D]; conv_state [B, W-1, D].

    Returns (y [B, D], new_conv_state [B, W-1, D]).
    """
    b, d = x.shape
    w = weight.shape[1]
    window = jnp.concatenate([conv_state.astype(jnp.float32), x.astype(jnp.float32)[:, None, :]], axis=1)  # [B, W, D]
    y = jnp.einsum("bwd,dw->bd", window, weight.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = _act(y, activation)
    return y.astype(x.dtype), window[:, 1:].astype(conv_state.dtype)
