"""Chain speculative decoding (draft-model propose, target verify).

The reference ships the speculative *kernels* (verify_tree_greedy,
tree_speculative_sampling_target_only, sgl_kernel_ops.h:834-875) and
delegates the loop to SGLang; this module supplies the TPU-native loop:
one jitted round = γ greedy draft decode steps (lax.scan) + ONE
multi-token target forward (the chunked-extend prefill with
``num_logits=γ+1``) + greedy chain verification. Greedy chain
speculation is lossless: the emitted stream equals plain greedy decode
of the target model.

Cache bookkeeping uses rollback-by-overwrite: rejected draft/target KV
rows sit beyond the accepted length and are rewritten at the same
(position-derived) slots in a later round, so no explicit rollback pass
is needed (invariant: at round start both caches hold KV for tokens
[0, L-1); the round restores it for the new L').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import llama


def _slots(page_tables, positions, page_size):
    return jnp.take_along_axis(page_tables, positions // page_size, axis=1) * page_size + positions % page_size


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "gamma", "prefix_max", "target"),
    donate_argnums=(2, 3, 4),
)
def spec_decode_round(
    params_t,
    params_d,
    caches_t, kcd, vcd,
    last_tok,
    lengths,
    page_tables,
    rope_t,
    rope_d,
    valid=None,
    *,
    cfg_t: llama.LlamaConfig,
    cfg_d: llama.LlamaConfig,
    target=None,  # target model module (llama-compatible signatures); default llama
    gamma: int,
    prefix_max: int,
):
    """One speculative round for a decode batch.

    last_tok [B]: the newest token of each sequence (not yet processed);
    lengths [B]: L = total tokens incl. last_tok; page_tables [B, maxp];
    valid [B] bool: padded batch rows get their KV writes dropped.
    caches_t: the TARGET family's caches tuple — (k, v) for llama-style
    families, (latent,) for DeepSeek MLA — splatted into
    ``target.prefill_extend(params, cfg, *caches_t, ...)`` which must
    return ``(logits, *caches)``.
    Returns (new_tokens [B, gamma+1], n_new [B], caches_t, kcd, vcd):
    sequence i appends new_tokens[i, :n_new[i]] (draft-accepted prefix
    then the bonus token).
    """
    b = last_tok.shape[0]
    page = kcd.shape[-2]
    if valid is None:
        valid = jnp.ones((b,), bool)

    # --- draft proposes gamma tokens greedily ---
    def dstep(carry, i):
        tok, kcd, vcd = carry
        pos = lengths - 1 + i
        sl = jnp.where(valid, _slots(page_tables, pos[:, None], page)[:, 0], -1)
        logits, kcd, vcd = llama.decode_step(
            params_d, cfg_d, kcd, vcd, tok, pos, page_tables, pos + 1, sl, rope_d
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, kcd, vcd), nxt

    (_, kcd, vcd), drafts = jax.lax.scan(dstep, (last_tok, kcd, vcd), jnp.arange(gamma))
    drafts = drafts.T  # [B, gamma]

    # --- target verifies the whole chain in one extend forward ---
    q_tokens = jnp.concatenate([last_tok[:, None], drafts], axis=1)  # [B, g+1]
    positions = lengths[:, None] - 1 + jnp.arange(gamma + 1)[None, :]
    slot_loc = jnp.where(valid[:, None], _slots(page_tables, positions, page), -1)
    tmod = target if target is not None else llama
    out = tmod.prefill_extend(
        params_t, cfg_t, *caches_t, q_tokens, positions,
        q_lens=jnp.full((b,), gamma + 1, jnp.int32),
        kv_lens=lengths + gamma,
        page_tables=page_tables, slot_loc=slot_loc, rope_cache=rope_t,
        prefix_max=prefix_max, num_logits=gamma + 1,
    )
    logits_all, caches_t = out[0], tuple(out[1:])
    greedy = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)  # [B, g+1]

    # --- greedy chain acceptance ---
    match = drafts == greedy[:, :gamma]  # [B, g]
    n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # leading run
    bonus = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)[:, 0]
    new_tokens = jnp.where(
        jnp.arange(gamma + 1)[None, :] < n_acc[:, None],
        jnp.pad(drafts, ((0, 0), (0, 1))),
        bonus[:, None],
    )
    return new_tokens, n_acc + 1, caches_t, kcd, vcd


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "gamma", "topk", "prefix_max"),
    donate_argnums=(2, 3, 4, 5),
)
def spec_tree_round(
    params_t,
    params_d,
    kct, vct, kcd, vcd,
    last_tok,
    lengths,
    page_tables,
    rope_t,
    rope_d,
    valid=None,
    *,
    cfg_t: llama.LlamaConfig,
    cfg_d: llama.LlamaConfig,
    gamma: int,
    topk: int,
    prefix_max: int,
):
    """One TREE speculative round (reference tree-op semantics:
    tests/speculative/test_speculative_sampling.py:9-25; ops exercised:
    build_tree_kernel_efficient + verify_tree_greedy, ops/speculative.py).

    Tree shape: the draft rolls ONE greedy chain of length gamma (same
    compute as chain spec) and each step's top-``topk`` tokens become
    sibling nodes — a spine with (topk-1) hedge leaves per level,
    dt = 1 + gamma*topk nodes. When the target rejects the spine token at
    level i but its true greedy token is among the draft's top-k, the
    sibling is accepted and the walk continues from it — strictly >= chain
    acceptance per round.

    Cache discipline: the tree verify forward writes target KV at
    per-NODE slots (positions L-1 .. L-1+dt-1 — siblings share a semantic
    position but need distinct rows); after verification the accepted
    nodes' rows move to their true position slots
    (move_cache_rows_stacked). The draft cache is restored by ONE
    gamma+1-token extend over the accepted tokens (a diverged acceptance
    invalidates the spine KV the rollout wrote).

    Returns (new_tokens [B, gamma+1], n_new [B], kct, vct, kcd, vcd).
    """
    from ..ops.kvcache import move_cache_rows_stacked
    from ..ops.speculative import build_tree_kernel_efficient, verify_tree_greedy

    b = last_tok.shape[0]
    page = kcd.shape[-2]
    dt = 1 + gamma * topk
    if valid is None:
        valid = jnp.ones((b,), bool)

    # --- draft chain rollout, capturing each step's top-k ---
    def dstep(carry, i):
        tok, kcd, vcd = carry
        pos = lengths - 1 + i
        sl = jnp.where(valid, _slots(page_tables, pos[:, None], page)[:, 0], -1)
        logits, kcd, vcd = llama.decode_step(
            params_d, cfg_d, kcd, vcd, tok, pos, page_tables, pos + 1, sl, rope_d
        )
        _, top_i = jax.lax.top_k(logits, topk)
        return (top_i[:, 0].astype(jnp.int32), kcd, vcd), top_i.astype(jnp.int32)

    (_, kcd, vcd), tops = jax.lax.scan(dstep, (last_tok, kcd, vcd), jnp.arange(gamma))
    tops = jnp.moveaxis(tops, 0, 1)  # [B, gamma, topk] (spine = [..., 0])

    # --- tree metadata: level i's topk nodes are children of level i-1's
    # spine node (candidate id (i-1)*topk); level 0 hangs off the root ---
    candidates = jnp.concatenate([last_tok[:, None], tops.reshape(b, gamma * topk)], axis=1)
    lvl = jnp.repeat(jnp.arange(gamma), topk)
    parent_c = jnp.where(lvl == 0, -1, (lvl - 1) * topk)
    parent_list = jnp.broadcast_to(parent_c[None], (b, gamma * topk))
    selected_index = jnp.broadcast_to(jnp.arange(gamma * topk)[None], (b, gamma * topk))
    tree_mask, positions, ridx, nxt, sib = build_tree_kernel_efficient(
        parent_list, selected_index, lengths - 1, depth=gamma, draft_token_num=dt
    )

    # --- ONE tree-masked target forward; KV written at per-node slots ---
    node_pos = lengths[:, None] - 1 + jnp.arange(dt)[None, :]
    slot_nodes = jnp.where(valid[:, None], _slots(page_tables, node_pos, page), -1)
    logits_all, kct, vct = llama.prefill_tree(
        params_t, cfg_t, kct, vct, candidates, positions, tree_mask,
        lengths - 1, page_tables, slot_nodes, rope_t, prefix_max=prefix_max,
    )
    target_predict = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)  # [B, dt]

    preds_flat, accept_index, accept_num = verify_tree_greedy(
        candidates, ridx, nxt, sib, target_predict, num_spec_step=gamma + 1
    )
    n_new = accept_num + 1
    # emitted tokens: the target's prediction at each accepted node
    acc_ok = accept_index >= 0  # [B, gamma+1]
    new_tokens = preds_flat[jnp.maximum(accept_index, 0).reshape(-1)].reshape(b, gamma + 1)
    last_new = jnp.take_along_axis(new_tokens, (n_new - 1)[:, None], axis=1)[:, 0]
    new_tokens = jnp.where(acc_ok, new_tokens, last_new[:, None])

    # --- target KV fix-up: accepted node j's row -> position slot L-1+j ---
    acc_node = jnp.maximum(accept_index, 0) - jnp.arange(b)[:, None] * dt  # node ids
    src_pos = lengths[:, None] - 1 + acc_node
    dst_pos = lengths[:, None] - 1 + jnp.arange(gamma + 1)[None, :]
    src_sl = _slots(page_tables, src_pos, page)
    dst_sl = jnp.where(acc_ok & valid[:, None] & (acc_node != jnp.arange(gamma + 1)[None, :]),
                       _slots(page_tables, dst_pos, page), -1)
    kct, vct = move_cache_rows_stacked(kct, vct, src_sl.reshape(-1), dst_sl.reshape(-1))

    # --- draft KV fix-up: one extend over the accepted-path tokens
    # restores the invariant (rollout wrote SPINE rows; acceptance may
    # have diverged). Emitted token j sits at position L+j, so the rows
    # at positions L-1..L+gamma-1 are [root, emitted[:-1]] ---
    fix_tokens = jnp.concatenate([last_tok[:, None], new_tokens[:, :gamma]], axis=1)
    dslots = jnp.where(valid[:, None], _slots(page_tables, dst_pos, page), -1)
    _, kcd, vcd = llama.prefill_extend(
        params_d, cfg_d, kcd, vcd, fix_tokens, dst_pos,
        q_lens=jnp.full((b,), gamma + 1, jnp.int32),
        kv_lens=lengths + gamma,
        page_tables=page_tables, slot_loc=dslots, rope_cache=rope_d,
        prefix_max=prefix_max,
    )
    return new_tokens, n_new, kct, vct, kcd, vcd
