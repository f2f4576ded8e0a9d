"""MoE routing: top-k gating kernels.

TPU-native equivalents of the reference's routing family
(src/sycl/TopKSoftMax.cpp, TopKSigMoid.cpp, BiasedTopK.cpp,
MoE_fused_gate.cpp): plain softmax/sigmoid top-k, DSv3-style biased top-k
(sigmoid / sqrtsoftplus scoring with score-correction bias), and the
hierarchical two-level grouped gate (group score = sum of top-2 expert
scores in the group; select topk_group groups then topk experts).

Shared-expert fusion and routed scaling follow the reference contract
(python/sgl_kernel/moe.py:159-200): fused shared experts are appended with
weight 1/routed_scaling_factor so later routed+shared scaling cancels.

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


def _finalize(weights, ids, *, renormalize, routed_scaling_factor, apply_on_output,
              num_fused_shared_experts, num_experts, rsf_in_renorm=False,
              shared_unit_when_renorm=False):
    """Shared top-k epilogue. Two reference conventions exist:

    - TopKSigMoid.cpp:167-177: the scaling factor is FOLDED INTO the
      renormalization (scale = rsf / row_sum) and the fused shared expert
      weighs 1.0 when renormalizing, row_sum / rsf otherwise
      (``rsf_in_renorm=shared_unit_when_renorm=True``).
    - BiasedTopK.cpp:161-165 / MoE_fused_gate.cpp:297-323: the routed
      weights renormalize by 1/row_sum, then multiply by rsf only when
      ``apply_routed_scaling_factor_on_output``; the shared expert always
      weighs row_sum / rsf.
    """
    rs = routed_scaling_factor if routed_scaling_factor else 1.0
    row_sum = jnp.sum(weights, axis=-1, keepdims=True)
    if num_fused_shared_experts:
        t = weights.shape[0]
        shared_ids = jnp.broadcast_to(
            num_experts + jnp.arange(num_fused_shared_experts, dtype=ids.dtype), (t, num_fused_shared_experts)
        )
        if shared_unit_when_renorm and renormalize:
            shared_w = jnp.ones((t, num_fused_shared_experts), weights.dtype)
        else:
            shared_w = jnp.broadcast_to(row_sum / rs, (t, num_fused_shared_experts)).astype(weights.dtype)
    if renormalize:
        scale = (rs if rsf_in_renorm else 1.0) / (row_sum + 1e-20)
        weights = weights * scale
    if apply_on_output and routed_scaling_factor not in (0, 1.0):
        weights = weights * routed_scaling_factor
    if num_fused_shared_experts:
        weights = jnp.concatenate([weights, shared_w], axis=-1)
        ids = jnp.concatenate([ids, shared_ids], axis=-1)
    return weights, ids


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
):
    """Sigmoid scoring top-k (TopKSigMoid.cpp semantics: the scaling factor
    rides inside the renormalization, TopKSigMoid.cpp:167-177)."""
    scores = _score(gating_output, "sigmoid")
    w, ids = jax.lax.top_k(scores, topk)
    w, ids = _finalize(
        w,
        ids.astype(jnp.int32),
        renormalize=renormalize,
        routed_scaling_factor=routed_scaling_factor,
        apply_on_output=apply_routed_scaling_factor_on_output,
        num_fused_shared_experts=num_fused_shared_experts,
        num_experts=gating_output.shape[-1],
        rsf_in_renorm=not apply_routed_scaling_factor_on_output,
        shared_unit_when_renorm=True,
    )
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
    """DSv3-style biased top-k (BiasedTopK.cpp): select by score+bias, weight
    by the *unbiased* score."""
    scores = _score(gating_output, scoring_func)
    choice = scores + bias.astype(jnp.float32)[None, :]
    _, ids = jax.lax.top_k(choice, topk)
    w = jnp.take_along_axis(scores, ids, axis=-1)
    return _finalize(
        w,
        ids.astype(jnp.int32),
        renormalize=renormalize,
        routed_scaling_factor=routed_scaling_factor,
        apply_on_output=apply_routed_scaling_factor_on_output,
        num_fused_shared_experts=num_fused_shared_experts,
        num_experts=gating_output.shape[-1],
    )


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
    top-2 (biased) scores; keep topk_group groups; top-k experts within."""
    t, e = gating_output.shape
    assert e % num_expert_group == 0
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

    _, ids = jax.lax.top_k(masked_choice, topk)
    w = jnp.take_along_axis(scores, ids, axis=-1)
    return _finalize(
        w,
        ids.astype(jnp.int32),
        renormalize=renormalize,
        routed_scaling_factor=routed_scaling_factor,
        apply_on_output=apply_routed_scaling_factor_on_output,
        num_fused_shared_experts=num_fused_shared_experts,
        num_experts=e,
    )


@functools.partial(jax.jit, static_argnames=("topk", "routed_scaling_factor"))
def hash_topk(router_logits, input_ids, tid2eid, topk: int, routed_scaling_factor: float = 1.0):
    """Hash-based routing (HashTopK.cpp): expert ids come from a token-id
    hash table; weights from sqrtsoftplus-scored logits at those experts."""
    t = router_logits.shape[0]
    scores = _score(router_logits, "sqrtsoftplus")
    ids = tid2eid[input_ids]  # [T, topk]
    w = jnp.take_along_axis(scores, ids, axis=-1)
    if routed_scaling_factor != 1.0:
        w = w * routed_scaling_factor
    return w.astype(jnp.float32), ids.astype(jnp.int32)
