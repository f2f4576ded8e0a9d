"""Speculative decoding helpers: tree verification + sampling.

TPU-native implementations of the reference's declared speculative surface
(include/sgl_kernel_ops.h:834-875, golden semantics pinned by
tests/speculative/test_eagle_utils.py and test_speculative_sampling.py):

  - verify_tree_greedy: walk the draft tree accepting children whose
    candidate token equals the target model's prediction at the parent.
  - tree_speculative_sampling_target_only: threshold / rejection-sampling
    acceptance over the tree (deterministic thresholds: accept a child when
    p_target(token) >= threshold_single or the accumulated sibling mass
    >= threshold_acc; thresholds = 1 reduce to greedy for near-one-hot
    target probs, thresholds = 0 accept the first child).
  - segment_packbits: ragged boolean mask -> packed bits per segment.

The tree is encoded exactly as the reference does: per batch,
``retrive_next_token[node]`` = first child, ``retrive_next_sibling[node]``
= next sibling, ``candidates[node]`` = draft token, ``retrive_index[node]``
= row in the flat predicts buffer. All walks are jittable lax loops (trees
are tiny: <= draft_token_num nodes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_spec_step",))
def verify_tree_greedy(
    candidates,
    retrive_index,
    retrive_next_token,
    retrive_next_sibling,
    target_predict,
    num_spec_step: int,
):
    """Greedy tree verification.

    candidates / retrive_* : [B, num_draft]; target_predict [B, num_draft].
    Returns (predicts [B*num_draft] int32 flat via retrive_index,
    accept_index [B, num_spec_step], accept_token_num [B]).
    """
    b, nd = candidates.shape
    total = b * nd

    def walk(cand, ridx, nxt, sib, tpred):
        def find_child(parent, token):
            # scan the child linked list for a candidate matching token
            def cond(state):
                node, found = state
                return (node >= 0) & (~found)

            def body(state):
                node, _ = state
                match = cand[node] == token
                nxt_node = jnp.where(match, node, sib[node])
                return nxt_node, match

            node, found = jax.lax.while_loop(cond, body, (nxt[parent], False))
            return jnp.where(found, node, -1)

        preds = jnp.full((nd,), -1, jnp.int32)
        accept = jnp.full((num_spec_step,), -1, jnp.int32)

        def step(i, state):
            cur, count, preds, accept = state

            def live(args):
                cur, count, preds, accept = args
                accept = accept.at[i].set(ridx[cur].astype(jnp.int32))
                tok = tpred[cur]
                preds = preds.at[cur].set(tok.astype(jnp.int32))
                child = find_child(cur, tok)
                # a child found on the FINAL step has no accept slot left —
                # do not count it (consumers read accept[:count+1])
                last = i + 1 >= num_spec_step
                new_count = jnp.where((child >= 0) & (~last), count + 1, count)
                return jnp.where(last, -1, child), new_count, preds, accept

            return jax.lax.cond(cur >= 0, live, lambda a: a, (cur, count, preds, accept))

        cur, count, preds, accept = jax.lax.fori_loop(0, num_spec_step, step, (0, 0, preds, accept))
        return preds, accept, count

    preds_b, accept_b, count_b = jax.vmap(walk)(
        candidates, retrive_index, retrive_next_token, retrive_next_sibling, target_predict
    )
    # scatter per-batch preds into the flat buffer via retrive_index
    flat = jnp.full((total,), -1, jnp.int32)
    flat = flat.at[retrive_index.reshape(-1)].set(preds_b.reshape(-1), mode="drop")
    return flat, accept_b.astype(jnp.int32), count_b.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_spec_step", "threshold_single", "threshold_acc", "deterministic"))
def tree_speculative_sampling_target_only(
    candidates,
    retrive_index,
    retrive_next_token,
    retrive_next_sibling,
    uniform_samples,
    target_probs,
    draft_probs,
    num_spec_step: int,
    threshold_single: float = 1.0,
    threshold_acc: float = 1.0,
    deterministic: bool = True,
):
    """Tree rejection sampling against the target distribution.

    target_probs/draft_probs: [B, num_draft, V]; uniform_samples [B, num_draft].
    Returns (predicts flat [B*num_draft], accept_index [B, S], accept_num [B]).
    """
    b, nd, v = target_probs.shape

    def walk(cand, ridx, nxt, sib, coins, tp, dp):
        preds = jnp.full((nd,), -1, jnp.int32)
        accept = jnp.full((num_spec_step,), -1, jnp.int32)

        def try_children(parent):
            """Walk the sibling list; return (accepted child or -1, residual
            target distribution after the rejections).

            Non-deterministic path = recursive rejection sampling
            (SpecInfer/flashinfer): accept child tok with prob
            min(1, p(tok)/q(tok)); on rejection the target residualizes
            p <- norm(relu(p - q)) so the final fallback sample preserves
            the target distribution exactly."""

            q_d = dp[parent]

            def cond(state):
                node, acc_p, accepted, res = state
                return (node >= 0) & (accepted < 0)

            def body(state):
                node, acc_p, _, res = state
                tok = cand[node]
                p_t = res[tok]
                p_d = q_d[tok]
                acc_p = acc_p + p_t
                det_ok = (p_t >= threshold_single) | (acc_p >= threshold_acc)
                if deterministic:
                    ok = det_ok
                else:
                    ratio = jnp.where(p_d > 0, p_t / jnp.maximum(p_d, 1e-20), jnp.where(p_t > 0, 1.0, 0.0))
                    ok = det_ok | (coins[node] < ratio)
                    new_res = jnp.maximum(res - q_d, 0.0)
                    new_res = new_res / jnp.maximum(new_res.sum(), 1e-20)
                    res = jnp.where(ok, res, new_res)
                accepted = jnp.where(ok, node, -1)
                return jnp.where(ok, node, sib[node]), acc_p, accepted, res

            _, _, accepted, res = jax.lax.while_loop(
                cond, body, (nxt[parent], jnp.float32(0), -1, tp[parent].astype(jnp.float32)))
            return accepted, res

        def step(i, state):
            cur, count, preds, accept = state

            def live(args):
                cur, count, preds, accept = args
                accept = accept.at[i].set(ridx[cur].astype(jnp.int32))
                child, res = try_children(cur)
                # prediction at this node: the accepted child's token, else
                # a sample from the RESIDUAL target distribution — argmax
                # when deterministic, inverse-CDF with the node's own coin
                # otherwise (rejection-sampling correctness)
                if deterministic:
                    final_tok = jnp.argmax(tp[cur]).astype(jnp.int32)
                else:
                    csum = jnp.cumsum(res)
                    u = coins[cur] * jnp.maximum(csum[-1], 1e-20)
                    final_tok = jnp.clip(jnp.sum((csum < u).astype(jnp.int32)), 0, res.shape[0] - 1).astype(jnp.int32)
                tok = jnp.where(child >= 0, cand[jnp.maximum(child, 0)].astype(jnp.int32), final_tok)
                preds = preds.at[cur].set(tok)
                last = i + 1 >= num_spec_step
                count = jnp.where((child >= 0) & (~last), count + 1, count)
                return jnp.where(last, -1, child), count, preds, accept

            return jax.lax.cond(cur >= 0, live, lambda a: a, (cur, count, preds, accept))

        cur, count, preds, accept = jax.lax.fori_loop(0, num_spec_step, step, (0, 0, preds, accept))
        return preds, accept, count

    preds_b, accept_b, count_b = jax.vmap(walk)(
        candidates, retrive_index, retrive_next_token, retrive_next_sibling,
        uniform_samples, target_probs, draft_probs,
    )
    flat = jnp.full((b * nd,), -1, jnp.int32)
    flat = flat.at[retrive_index.reshape(-1)].set(preds_b.reshape(-1), mode="drop")
    return flat, accept_b.astype(jnp.int32), count_b.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_size",))
def segment_packbits(x, input_indptr, output_indptr, out_size: int):
    """Pack ragged boolean segments into bitfields (uint8), little-endian
    within each byte, each segment starting at its output_indptr byte.
    Reference: segment_packbits (sgl_kernel_ops.h:874)."""
    n = x.shape[0]
    num_seg = input_indptr.shape[0] - 1
    seg_id = jnp.searchsorted(input_indptr[1:-1], jnp.arange(n), side="right")
    offset_in_seg = jnp.arange(n) - input_indptr[seg_id]
    byte_idx = output_indptr[seg_id] + offset_in_seg // 8
    bit_idx = offset_in_seg % 8
    out = jnp.zeros((out_size,), jnp.uint8)
    contrib = (x.astype(jnp.uint8) << bit_idx.astype(jnp.uint8)).astype(jnp.uint8)
    return out.at[byte_idx].add(contrib, mode="drop")


@functools.partial(jax.jit, static_argnames=("depth", "draft_token_num"))
def build_tree_kernel_efficient(
    parent_list,
    selected_index,
    verified_seq_len,
    *,
    depth: int,
    draft_token_num: int,
):
    """Build the EAGLE draft-tree metadata (functional form of the
    reference's declared-only build_tree_kernel_efficient,
    sgl_kernel_ops.h:861-874 — no XPU impl or test exists, SURVEY.md §2.6;
    contract defined here to interoperate with this module's
    verify_tree_greedy linked-list layout).

    Inputs (per batch row):
      parent_list [B, C]: for candidate c, the candidate index of its
        parent (-1 => child of the root / verified token).
      selected_index [B, draft_token_num-1]: candidate indices chosen for
        the tree, in score order; a node's parent always precedes it.
      verified_seq_len [B]: current sequence length (root position).

    Returns:
      tree_mask [B, dt, dt] bool: mask[i, j] = node j is an ancestor-or-
        self of node i (the draft-token attention mask block; node 0 is
        the root).
      positions [B, dt] int32: verified_seq_len + node depth.
      retrive_index [B, dt] int32: flat row indices (b * dt + i).
      retrive_next_token / retrive_next_sibling [B, dt] int32: the
        first-child / next-sibling linked lists verify_tree_greedy walks.
    """
    b, _ = parent_list.shape
    dt = draft_token_num

    def one(pl, sel, seq_len):
        # parent node id for nodes 1..dt-1 (node 0 = root)
        pc = pl[sel]  # parent candidate id per selected node
        # match parent candidate to its node index (parents precede children)
        eq = sel[None, :] == pc[:, None]  # [dt-1, dt-1]
        pnode = jnp.where(pc < 0, 0, 1 + jnp.argmax(eq, axis=1))
        parent = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pnode.astype(jnp.int32)])

        # ancestor closure + depth by walking up (depth <= `depth` levels)
        mask0 = jnp.eye(dt, dtype=bool)
        def up(_, st):
            m, node = st
            nxt = jnp.where(node >= 0, parent[jnp.maximum(node, 0)], -1)
            m = m | (jax.nn.one_hot(jnp.maximum(node, 0), dt, dtype=jnp.float32) * (node >= 0)[:, None]).astype(bool)
            return m, nxt
        mask, _ = jax.lax.fori_loop(0, depth + 1, up, (mask0, parent))
        depths = jnp.sum(mask, axis=1).astype(jnp.int32) - 1

        nodes = jnp.arange(dt, dtype=jnp.int32)
        # first child: smallest j with parent[j] == i
        child_of = parent[None, :] == nodes[:, None]  # [i, j]
        has_child = jnp.any(child_of, axis=1)
        first_child = jnp.where(has_child, jnp.argmax(child_of, axis=1), -1).astype(jnp.int32)
        # next sibling: smallest j > i with same parent
        same_parent = (parent[None, :] == parent[:, None]) & (nodes[None, :] > nodes[:, None])
        has_sib = jnp.any(same_parent, axis=1)
        next_sib = jnp.where(has_sib, jnp.argmax(same_parent, axis=1), -1).astype(jnp.int32)

        return mask, seq_len + depths, first_child, next_sib

    mask, positions, nxt, sib = jax.vmap(one)(
        parent_list.astype(jnp.int32), selected_index.astype(jnp.int32),
        verified_seq_len.astype(jnp.int32),
    )
    retrive_index = (jnp.arange(b)[:, None] * dt + jnp.arange(dt)[None, :]).astype(jnp.int32)
    return mask, positions, retrive_index, nxt, sib
