"""MoE routing: top-k gating kernels.

TPU-native equivalents of the reference's routing family
(src/sycl/TopKSoftMax.cpp, TopKSigMoid.cpp, BiasedTopK.cpp,
MoE_fused_gate.cpp, HashTopK.cpp): plain softmax/sigmoid top-k, DSv3-style
biased top-k (sigmoid / sqrtsoftplus scoring with score-correction bias),
the hierarchical two-level grouped gate (group score = sum of top-2 expert
scores in the group; select topk_group groups then top-k experts), and
hash-based routing.

``topk`` is INCLUSIVE of fused shared experts in every kernel, matching the
reference (TopKSigMoid.cpp:105 ``routed_topk = top_k -
num_fused_shared_experts``, BiasedTopK.cpp:115, MoE_fused_gate.cpp:112):
``topk - num_fused_shared_experts`` routed experts are selected and the
shared slots fill the remaining lanes with ids ``num_experts + i``.

The shared-expert / scaling epilogues differ per kernel and are reproduced
exactly; see each function's docstring.

Top-k over <=512 experts is a small VPU sort — XLA's jax.lax.top_k is
optimal; no Pallas needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _score(x, scoring_func: str):
    xf = x.astype(jnp.float32)
    if scoring_func == "softmax":
        return jax.nn.softmax(xf, axis=-1)
    if scoring_func == "sigmoid":
        return jax.nn.sigmoid(xf)
    if scoring_func == "sqrtsoftplus":
        return jnp.sqrt(jax.nn.softplus(xf))
    raise ValueError(f"unknown scoring_func {scoring_func}")


def _shared_cols(t, num_fused, num_experts, ids_dtype):
    ids = jnp.broadcast_to(num_experts + jnp.arange(num_fused, dtype=ids_dtype), (t, num_fused))
    return ids


@functools.partial(jax.jit, static_argnames=("topk", "renormalize"))
def topk_softmax(gating_output, topk: int, renormalize: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Softmax over experts then top-k. Returns (weights [T,k] f32, ids [T,k] i32)."""
    scores = _score(gating_output, "softmax")
    w, ids = jax.lax.top_k(scores, topk)
    if renormalize:
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
    return w, ids.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("topk", "renormalize", "routed_scaling_factor", "apply_routed_scaling_factor_on_output", "num_fused_shared_experts"),
)
def topk_sigmoid(
    gating_output,
    topk: int,
    renormalize: bool = True,
    routed_scaling_factor: float = 0.0,
    apply_routed_scaling_factor_on_output: bool = False,
    num_fused_shared_experts: int = 0,
    correction_bias: Optional[jax.Array] = None,
):
    """Sigmoid scoring top-k (TopKSigMoid.cpp semantics).

    ``topk`` includes the fused shared experts (TopKSigMoid.cpp:105);
    ``topk - num_fused_shared_experts`` routed experts are selected by
    sigmoid score (+ optional ``correction_bias`` for ranking only,
    TopKSigMoid.cpp:118/150: the bias is subtracted back out of the output
    weights). Epilogue (TopKSigMoid.cpp:164-180): the scaling factor is
    FOLDED INTO the renormalization (scale = rsf / row_sum, applied to the
    routed lanes only) and the fused shared expert weighs 1.0 when
    renormalizing, row_sum / rsf otherwise. The
    ``apply_routed_scaling_factor_on_output`` extension defers the rsf
    multiply out of the renorm (same product when renormalizing; with
    renormalize=False it scales the raw weights by rsf).
    """
    t, e = gating_output.shape
    kr = topk - num_fused_shared_experts
    assert kr > 0, "topk must exceed num_fused_shared_experts (topk is inclusive)"
    rs = routed_scaling_factor if routed_scaling_factor else 1.0
    scores = _score(gating_output, "sigmoid")
    if correction_bias is not None:
        _, ids = jax.lax.top_k(scores + correction_bias.astype(jnp.float32)[None, :], kr)
        w = jnp.take_along_axis(scores, ids, axis=-1)
    else:
        w, ids = jax.lax.top_k(scores, kr)
    ids = ids.astype(jnp.int32)
    row_sum = jnp.sum(w, axis=-1, keepdims=True)
    if renormalize:
        w = w * ((1.0 if apply_routed_scaling_factor_on_output else rs) / (row_sum + 1e-20))
    if apply_routed_scaling_factor_on_output and routed_scaling_factor not in (0, 1.0):
        w = w * routed_scaling_factor
    if num_fused_shared_experts:
        shared_ids = _shared_cols(t, num_fused_shared_experts, e, ids.dtype)
        if renormalize:
            shared_w = jnp.ones((t, num_fused_shared_experts), w.dtype)
        else:
            shared_w = jnp.broadcast_to(row_sum / rs, (t, num_fused_shared_experts)).astype(w.dtype)
        w = jnp.concatenate([w, shared_w], axis=-1)
        ids = jnp.concatenate([ids, shared_ids], axis=-1)
    return w, ids


@functools.partial(
    jax.jit,
    static_argnames=("topk", "scoring_func", "renormalize", "routed_scaling_factor", "apply_routed_scaling_factor_on_output", "num_fused_shared_experts"),
)
def biased_topk(
    gating_output,
    bias,
    topk: int,
    scoring_func: str = "sigmoid",
    renormalize: bool = False,
    routed_scaling_factor: float = 1.0,
    apply_routed_scaling_factor_on_output: bool = False,
    num_fused_shared_experts: int = 0,
):
    """DSv3-style biased top-k (BiasedTopK.cpp): select by score+bias, weigh
    by the *unbiased* score.

    ``topk`` includes fused shared experts (BiasedTopK.cpp:115). Epilogue
    (BiasedTopK.cpp:158-172) applies to EVERY lane including the shared
    slots: ``out = (weight / norm) * scale`` with pre-norm shared weight
    ``routed_sum / rsf``, ``norm = routed_sum`` when renormalizing (1
    otherwise / when the sum is non-positive), and ``scale = rsf`` when
    ``apply_routed_scaling_factor_on_output`` (1 otherwise — NOT nested
    under renormalize, unlike MoE_fused_gate).
    """
    t, e = gating_output.shape
    kr = topk - num_fused_shared_experts
    assert kr > 0, "topk must exceed num_fused_shared_experts (topk is inclusive)"
    rs = routed_scaling_factor if routed_scaling_factor else 1.0
    scores = _score(gating_output, scoring_func)
    choice = scores + bias.astype(jnp.float32)[None, :]
    _, ids = jax.lax.top_k(choice, kr)
    w = jnp.take_along_axis(scores, ids, axis=-1)
    ids = ids.astype(jnp.int32)

    row_sum = jnp.sum(w, axis=-1, keepdims=True)
    if num_fused_shared_experts:
        shared_ids = _shared_cols(t, num_fused_shared_experts, e, ids.dtype)
        shared_w = jnp.broadcast_to(row_sum / rs, (t, num_fused_shared_experts)).astype(w.dtype)
        w = jnp.concatenate([w, shared_w], axis=-1)
        ids = jnp.concatenate([ids, shared_ids], axis=-1)
    if renormalize:
        w = w / jnp.where(row_sum > 0.0, row_sum, 1.0)
    if apply_routed_scaling_factor_on_output and routed_scaling_factor not in (0, 1.0):
        w = w * routed_scaling_factor
    return w, ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_expert_group",
        "topk_group",
        "topk",
        "renormalize",
        "scoring_func",
        "num_fused_shared_experts",
        "routed_scaling_factor",
        "apply_routed_scaling_factor_on_output",
    ),
)
def moe_fused_gate(
    gating_output,
    bias: Optional[jax.Array],
    num_expert_group: int,
    topk_group: int,
    topk: int,
    renormalize: bool = True,
    scoring_func: str = "sigmoid",
    num_fused_shared_experts: int = 0,
    routed_scaling_factor: float = 0.0,
    apply_routed_scaling_factor_on_output: bool = False,
):
    """Hierarchical two-level grouped gate (MoE_fused_gate.cpp semantics;
    python contract moe.py:159-200): per-group score = sum of that group's
    top-2 (biased) scores; keep topk_group groups; top-k experts within.

    ``topk`` includes fused shared experts (MoE_fused_gate.cpp:112).
    Epilogue (MoE_fused_gate.cpp:290-326): shared slots weigh
    ``routed_sum / rsf``; when renormalizing, ALL ``topk`` slots (shared
    included) multiply by ``1/routed_sum`` (0 if the sum is non-positive)
    and, nested inside the renormalize branch only, by rsf when
    ``apply_routed_scaling_factor_on_output``.
    """
    t, e = gating_output.shape
    assert e % num_expert_group == 0
    kr = topk - num_fused_shared_experts
    assert kr > 0, "topk must exceed num_fused_shared_experts (topk is inclusive)"
    rs = routed_scaling_factor if routed_scaling_factor else 1.0
    scores = _score(gating_output, scoring_func)
    choice = scores + (bias.astype(jnp.float32)[None, :] if bias is not None else 0.0)

    grouped = choice.reshape(t, num_expert_group, e // num_expert_group)
    top2, _ = jax.lax.top_k(grouped, min(2, grouped.shape[-1]))
    group_scores = jnp.sum(top2, axis=-1)  # [T, G]
    _, top_groups = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.zeros((t, num_expert_group), jnp.bool_)
    group_mask = group_mask.at[jnp.arange(t)[:, None], top_groups].set(True)
    expert_mask = jnp.repeat(group_mask, e // num_expert_group, axis=-1)
    masked_choice = jnp.where(expert_mask, choice, -jnp.inf)

    _, ids = jax.lax.top_k(masked_choice, kr)
    w = jnp.take_along_axis(scores, ids, axis=-1)
    ids = ids.astype(jnp.int32)

    row_sum = jnp.sum(w, axis=-1, keepdims=True)
    if num_fused_shared_experts:
        shared_ids = _shared_cols(t, num_fused_shared_experts, e, ids.dtype)
        shared_w = jnp.broadcast_to(row_sum / rs, (t, num_fused_shared_experts)).astype(w.dtype)
        w = jnp.concatenate([w, shared_w], axis=-1)
        ids = jnp.concatenate([ids, shared_ids], axis=-1)
    if renormalize:
        w = w * jnp.where(row_sum > 0.0, 1.0 / row_sum, 0.0)
        if apply_routed_scaling_factor_on_output and routed_scaling_factor not in (0, 1.0):
            w = w * routed_scaling_factor
    return w, ids


@functools.partial(jax.jit, static_argnames=("topk", "routed_scaling_factor", "num_fused_shared_experts"))
def hash_topk(
    router_logits,
    input_ids,
    tid2eid,
    topk: Optional[int] = None,
    routed_scaling_factor: float = 1.0,
    num_fused_shared_experts: int = 0,
):
    """Hash-based routing (HashTopK.cpp): expert ids come from a token-id
    hash table ``tid2eid [vocab, topk_routed]``; weights are
    sqrtsoftplus-scored logits at those experts, renormalized by their row
    sum (HashTopK.cpp:79-92; 0 when the sum is non-positive). Invalid slots
    — negative input_ids, input_ids beyond the table, or mapped expert ids
    outside ``[0, E)`` — produce expert 0 with weight 0.0
    (HashTopK.cpp:64-76). ``routed_scaling_factor`` never scales the routed
    weights; it only forms the fused-shared weight ``1/rsf``
    (HashTopK.cpp:87).
    """
    e = router_logits.shape[1]
    rows, kr = tid2eid.shape
    if topk is not None:
        assert topk == kr + num_fused_shared_experts, (
            f"topk={topk} must equal tid2eid width {kr} + num_fused_shared_experts {num_fused_shared_experts}"
        )
    scores = _score(router_logits, "sqrtsoftplus")
    tid = input_ids.astype(jnp.int32)
    tok_ok = (tid >= 0) & (tid < rows)
    ids = tid2eid[jnp.clip(tid, 0, rows - 1)].astype(jnp.int32)  # [T, kr]
    valid = tok_ok[:, None] & (ids >= 0) & (ids < e)
    ids = jnp.where(valid, ids, 0)
    w = jnp.where(valid, jnp.take_along_axis(scores, ids, axis=-1), 0.0)
    row_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = w * jnp.where(row_sum > 0.0, 1.0 / row_sum, 0.0)
    if num_fused_shared_experts:
        t = ids.shape[0]
        shared_ids = _shared_cols(t, num_fused_shared_experts, e, ids.dtype)
        rs = routed_scaling_factor if routed_scaling_factor else 1.0
        shared_w = jnp.full((t, num_fused_shared_experts), 1.0 / rs, w.dtype)
        w = jnp.concatenate([w, shared_w], axis=-1)
        ids = jnp.concatenate([ids, shared_ids], axis=-1)
    return w.astype(jnp.float32), ids
