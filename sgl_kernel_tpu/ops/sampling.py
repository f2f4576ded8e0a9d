"""Sampling ops: top-k / top-p / min-p filtering and sampling.

TPU-native equivalents of the reference's sampling kernels
(src/sycl/MinPSamplingFromProbs.cpp, TopKRenormProbs.cpp; flashinfer-style
wrappers python/sgl_kernel/sampling.py) plus the declared-only top-p
surface (SURVEY §2.6 roadmap): top_k_renorm_probs, top_p_renorm_probs,
joint top_k_top_p, min_p and plain sampling-from-probs.

The reference uses Philox-based rejection sampling to avoid a full vocab
sort per token. On TPU, XLA's [T, V] sort is a BITONIC network —
O(log^2 V) ~ 289 passes at V=128k, measured 22.5 ms for top_k_top_p at
B=64 on the baseline regen — so filtering here finds the exact per-row
threshold by 31-step bisection on the f32 BIT pattern instead
(probs >= 0, so the int32 order matches the float order): ~31
bandwidth-bound passes, no sort, deterministic by construction (the
reference's ``deterministic`` flag is always honoured), and bit-identical
keep sets to the sort formulation (both keep ``probs >= kth value``
including ties).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _renorm(filtered):
    return filtered / jnp.maximum(filtered.sum(-1, keepdims=True), 1e-38)


def _bisect_threshold(probs, feasible):
    """Largest f32 threshold t (by bit pattern) with feasible(mask(t)) True
    per row, where mask(t) = probs >= t. feasible takes [T, V] bool and
    returns [T] bool, and must be monotone (shrinking the set can only
    turn True -> False). Exact: the result is an actual row value's bit
    pattern (or 0.0 when even the full set is the answer)."""
    t = probs.shape[0]

    def body(i, tbits):
        cand = tbits | (jnp.int32(1) << (30 - i))
        ok = feasible(probs >= jax.lax.bitcast_convert_type(cand, jnp.float32)[:, None])
        return jnp.where(ok, cand, tbits)

    tbits = jax.lax.fori_loop(0, 31, body, jnp.zeros((t,), jnp.int32))
    return jax.lax.bitcast_convert_type(tbits, jnp.float32)[:, None]


@jax.jit
def top_k_renorm_probs(probs, top_k):
    """Keep the top_k largest probs per row, renormalize to sum 1.

    top_k: scalar or [T] int; k <= 0 is the standard "disabled" sentinel
    (no filtering). Reference: top_k_renorm_probs (TopKRenormProbs.cpp).
    Threshold = exact k-th largest value (bit bisection; ties kept)."""
    t, v = probs.shape
    k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (t,))
    kc = jnp.where(k <= 0, v, k)  # disabled -> keep everything
    thresh = _bisect_threshold(
        probs.astype(jnp.float32),
        lambda mask: jnp.sum(mask, axis=-1) >= kc,
    )
    keep = probs >= thresh
    filtered = jnp.where(keep, probs, 0.0)
    return _renorm(filtered)


@jax.jit
def top_p_renorm_probs(probs, top_p):
    """Nucleus filtering: keep the smallest high-prob set with cumulative
    mass >= top_p, renormalize. top_p: scalar or [T].

    Threshold = largest value t with sum(probs[probs >= t]) >= top_p (bit
    bisection) — for distinct values this is exactly the sorted-prefix
    rule; ties at the boundary are all kept. top_p == 0 keeps the top-1
    (mass >= 0 is always feasible, so t climbs to the max value) — the
    reference's at-least-one guarantee."""
    t, v = probs.shape
    p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (t,))
    pf = probs.astype(jnp.float32)
    # the non-empty condition carries the at-least-one guarantee: with
    # p == 0 the empty set has mass 0 >= 0, so feasibility alone would
    # push the threshold past the max value
    thresh = _bisect_threshold(
        pf, lambda mask: (jnp.sum(jnp.where(mask, pf, 0.0), axis=-1) >= p)
        & jnp.any(mask, axis=-1),
    )
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
