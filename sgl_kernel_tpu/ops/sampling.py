"""Sampling ops: top-k / top-p / min-p filtering and sampling.

TPU-native equivalents of the reference's sampling kernels
(src/sycl/MinPSamplingFromProbs.cpp, TopKRenormProbs.cpp; flashinfer-style
wrappers python/sgl_kernel/sampling.py) plus the declared-only top-p
surface (SURVEY §2.6 roadmap): top_k_renorm_probs, top_p_renorm_probs,
joint top_k_top_p, min_p and plain sampling-from-probs.

The reference uses Philox-based rejection sampling to avoid a full vocab
sort per token; on TPU a [T, V] sort is a single fused XLA pass over VMEM
tiles and is already bandwidth-bound, so sort-based filtering is the
speed-of-light implementation and is deterministic by construction (the
reference's ``deterministic`` flag is therefore always honoured).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _renorm(filtered):
    return filtered / jnp.maximum(filtered.sum(-1, keepdims=True), 1e-38)


@jax.jit
def top_k_renorm_probs(probs, top_k):
    """Keep the top_k largest probs per row, renormalize to sum 1.

    top_k: scalar or [T] int; k <= 0 is the standard "disabled" sentinel
    (no filtering). Reference: top_k_renorm_probs (TopKRenormProbs.cpp)."""
    t, v = probs.shape
    k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (t,))
    sorted_p = jnp.sort(probs, axis=-1)[:, ::-1]
    # threshold = k-th largest value; k <= 0 disables (threshold 0)
    thresh = jnp.take_along_axis(sorted_p, jnp.clip(k[:, None] - 1, 0, v - 1), axis=-1)
    thresh = jnp.where(k[:, None] <= 0, 0.0, thresh)
    keep = probs >= thresh
    filtered = jnp.where(keep, probs, 0.0)
    return _renorm(filtered)


@jax.jit
def top_p_renorm_probs(probs, top_p):
    """Nucleus filtering: keep the smallest prefix of sorted probs with
    cumulative mass >= top_p, renormalize. top_p: scalar or [T]."""
    t, v = probs.shape
    p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (t,))[:, None]
    sorted_p = jnp.sort(probs, axis=-1)[:, ::-1]
    csum = jnp.cumsum(sorted_p, axis=-1)
    # keep tokens while cumulative mass *before* them is < top_p; the
    # top-1 token always survives (top_p == 0 must not produce an empty
    # nucleus — reference at-least-one guarantee)
    keep_sorted = (csum - sorted_p) < p
    keep_sorted = keep_sorted.at[:, 0].set(True)
    # threshold = smallest kept prob
    thresh = jnp.min(jnp.where(keep_sorted, sorted_p, jnp.inf), axis=-1, keepdims=True)
    keep = probs >= thresh
    filtered = jnp.where(keep, probs, 0.0)
    return _renorm(filtered)


@jax.jit
def min_p_filter_probs(probs, min_p):
    """Zero out probs below min_p * max_prob per row (MinPSampling
    semantics), renormalize."""
    t, v = probs.shape
    mp = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (t,))[:, None]
    thresh = mp * jnp.max(probs, axis=-1, keepdims=True)
    filtered = jnp.where(probs >= thresh, probs, 0.0)
    return _renorm(filtered)


@functools.partial(jax.jit, static_argnames=())
def sampling_from_probs(probs, key):
    """Categorical sample per row via inverse-CDF (deterministic given key)."""
    t, v = probs.shape
    norm = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-38)
    csum = jnp.cumsum(norm, axis=-1)
    # scale u by the realized total mass: float32 cumsum can undershoot
    # 1.0, and u in (csum[-1], 1) would otherwise select index v-1 — a
    # token the filters may have explicitly zeroed
    u = jax.random.uniform(key, (t, 1)) * csum[:, -1:]
    return jnp.sum((csum < u).astype(jnp.int32), axis=-1).clip(0, v - 1)


@jax.jit
def min_p_sampling_from_probs(probs, key, min_p):
    """min-p filter then sample (MinPSamplingFromProbs.cpp)."""
    return sampling_from_probs(min_p_filter_probs(probs, min_p), key)


@jax.jit
def top_p_sampling_from_probs(probs, key, top_p):
    return sampling_from_probs(top_p_renorm_probs(probs, top_p), key)


@jax.jit
def top_k_top_p_sampling_from_probs(probs, key, top_k, top_p):
    """Joint filter, "top_k_first" composition (sampling.py:279-288)."""
    return sampling_from_probs(top_p_renorm_probs(top_k_renorm_probs(probs, top_k), top_p), key)


@jax.jit
def top_k_sampling_from_probs(probs, key, top_k):
    return sampling_from_probs(top_k_renorm_probs(probs, top_k), key)


@functools.partial(jax.jit, static_argnames=("temperature_is_zero",))
def sample_tokens(
    logits,
    key,
    temperature=1.0,
    top_k: Optional[jax.Array] = None,
    top_p: Optional[jax.Array] = None,
    min_p: Optional[jax.Array] = None,
    *,
    temperature_is_zero: bool = False,
):
    """Full sampling pipeline from logits (the serving loop's entry):
    temperature -> softmax -> top-k -> top-p -> min-p -> sample.
    temperature_is_zero selects greedy argmax."""
    if temperature_is_zero:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32)
    if temp.ndim == 1:
        temp = temp[:, None]  # per-token [T] temperatures
    probs = jax.nn.softmax(logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6), axis=-1)
    if top_k is not None:
        probs = top_k_renorm_probs(probs, top_k)
    if top_p is not None:
        probs = top_p_renorm_probs(probs, top_p)
    if min_p is not None:
        probs = min_p_filter_probs(probs, min_p)
    return sampling_from_probs(probs, key)
