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
