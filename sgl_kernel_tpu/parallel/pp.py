"""Pipeline parallelism for decode (microbatch-pipelined, shard_map + ppermute).

The reference has no PP (SURVEY.md §2.4: "DP / PP / SP / CP — absent");
this is the TPU-native design the survey calls for: the layer stack is
sharded over a ``pp`` mesh axis (each stage holds ``L/S`` contiguous
layers plus the matching slab of the paged KV pools), and decode
microbatches flow through the stages with ``jax.lax.ppermute`` carrying
activations over ICI.

Schedule: classic GPipe-style fill/steady/drain over
``T = n_micro + S - 1`` ticks.  At tick ``t`` stage ``s`` processes
microbatch ``t - s`` (garbage outside ``[0, n_micro)``; those ticks are
neutralized by passing ``slot_loc = -1`` so the KV scatter drops the
write — ops/kvcache.py:75-79 — and by OOB-dropped output stores).  All
stages execute identical SPMD code, so the whole step is one jit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import llama
from ..ops.norm import rmsnorm


def stage_config(cfg: llama.LlamaConfig, pp: int) -> llama.LlamaConfig:
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    import dataclasses

    return dataclasses.replace(cfg, num_layers=cfg.num_layers // pp)


def _layer_specs(layers):
    # every stacked layer array shards its leading (layer) dim over pp
    return jax.tree_util.tree_map(lambda v: P(*(("pp",) + (None,) * (v.ndim - 1))), layers)


def make_pp_decode_step(cfg: llama.LlamaConfig, mesh: Mesh, params, n_micro: int):
    """Build the pipelined decode step.

    Data args are microbatched on the leading axis: tokens/positions/
    lengths/slot_loc ``[n_micro, Bm]``, page_tables ``[n_micro, Bm, maxp]``
    (replicated — every stage reads the metadata of whichever microbatch
    it currently owns). Returns ``(logits [n_micro, Bm, V], k_cache,
    v_cache)``.
    """
    pp = mesh.shape["pp"]
    cfg_s = stage_config(cfg, pp)
    vocab = cfg.vocab_size

    def step(params, k_cache, v_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
        s = jax.lax.axis_index("pp")
        lw = params["layers"]  # stage-local stack [L/S, ...]
        bm = tokens.shape[1]
        ticks = n_micro + pp - 1

        def tick(t, carry):
            x_buf, kc, vc, houts = carry
            mb = t - s
            valid = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            # stage 0 embeds its microbatch; others take the ppermuted
            # activation produced by the previous stage last tick
            embedded = params["embed"][tokens[mb_c]].astype(cfg.dtype)
            h_in = jnp.where(s == 0, embedded, x_buf)
            loc = jnp.where(valid, slot_loc[mb_c], -1)
            h_out, kc, vc = llama.decode_layers(
                lw, cfg_s, kc, vc, h_in, positions[mb_c], page_tables[mb_c],
                lengths[mb_c], loc, rope_cache,
            )
            # last stage: bank the final hidden state (OOB-dropped during
            # drain); the full-vocab head runs ONCE after the loop instead
            # of ticks x stages times (it dominates per-tick cost at real
            # vocab sizes)
            out_idx = jnp.where(valid & (s == pp - 1), mb_c, n_micro)
            houts = houts.at[out_idx].set(h_out, mode="drop")
            x_buf = jax.lax.ppermute(h_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_buf, kc, vc, houts)

        x0 = jnp.zeros((bm, cfg.hidden_size), cfg.dtype)
        h0 = jnp.zeros((n_micro, bm, cfg.hidden_size), cfg.dtype)
        _, k_cache, v_cache, houts = jax.lax.fori_loop(
            0, ticks, tick, (x0, k_cache, v_cache, h0)
        )
        hn = rmsnorm(houts.reshape(n_micro * bm, -1), params["final_norm"], cfg.rms_eps)
        logits = llama._linear(hn, params["lm_head"], cfg).astype(jnp.float32)[:, :vocab]
        outputs = logits.reshape(n_micro, bm, vocab)
        # only the last stage holds real logits; psum broadcasts them
        outputs = jax.lax.psum(jnp.where(s == pp - 1, outputs, 0.0), "pp")
        return outputs, k_cache, v_cache

    cache_spec = P("pp")  # layer dim
    pspecs = _param_specs(params)
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(
            pspecs, cache_spec, cache_spec,
            P(None, None), P(None, None), P(None, None, None),
            P(None, None), P(None, None), P(None, None),
        ),
        out_specs=(P(None, None, None), cache_spec, cache_spec),
        check_vma=False,
    )


def _param_specs(params):
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": (
            {"packed": P(None, None), "scales": P(None, None)}
            if isinstance(params["lm_head"], dict)
            else P(None, None)
        ),
        "layers": _layer_specs(params["layers"]),
    }


def make_pp_prefill_step(cfg: llama.LlamaConfig, mesh: Mesh, params, n_micro: int):
    """Pipelined PREFILL: prompt microbatches flow through the layer-stage
    pipeline with the same GPipe fill/steady/drain schedule as decode — so
    PP serves real prompt traffic, not just the decode loop.

    Data args are microbatched on the leading axis: tokens/positions/
    slot_loc ``[n_micro, Bm, S]``, q_lens ``[n_micro, Bm]``. Each stage
    writes its own KV slab (layer dim sharded over ``pp``); drain/fill
    ticks pass slot_loc = -1 so their stores drop (ops/kvcache.py drop
    rule). Returns ``(last-token logits [n_micro, Bm, V], k_cache,
    v_cache)``.
    """
    pp = mesh.shape["pp"]
    cfg_s = stage_config(cfg, pp)
    vocab = cfg.vocab_size

    def step(params, k_cache, v_cache, tokens, positions, q_lens, slot_loc, rope_cache):
        s = jax.lax.axis_index("pp")
        lw = params["layers"]
        _, bm, sl = tokens.shape
        ticks = n_micro + pp - 1

        def tick(t, carry):
            x_buf, kc, vc, houts = carry
            mb = t - s
            valid = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            embedded = params["embed"][tokens[mb_c].reshape(-1)].astype(cfg.dtype)
            h_in = jnp.where(s == 0, embedded, x_buf)
            loc = jnp.where(valid, slot_loc[mb_c], -1)
            h_out, kc, vc = llama.prefill_layers(
                lw, cfg_s, kc, vc, h_in, positions[mb_c], q_lens[mb_c], loc,
                rope_cache,
            )
            out_idx = jnp.where(valid & (s == pp - 1), mb_c, n_micro)
            houts = houts.at[out_idx].set(h_out.reshape(bm, sl, -1), mode="drop")
            x_buf = jax.lax.ppermute(h_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_buf, kc, vc, houts)

        x0 = jnp.zeros((bm * sl, cfg.hidden_size), cfg.dtype)
        h0 = jnp.zeros((n_micro, bm, sl, cfg.hidden_size), cfg.dtype)
        _, k_cache, v_cache, houts = jax.lax.fori_loop(
            0, ticks, tick, (x0, k_cache, v_cache, h0)
        )
        # last token per sequence -> ONE full-vocab head after the loop
        last = jnp.clip(q_lens - 1, 0, sl - 1)  # [n_micro, Bm]
        h_last = jnp.take_along_axis(houts, last[:, :, None, None], axis=2)[:, :, 0]
        hn = rmsnorm(h_last.reshape(n_micro * bm, -1), params["final_norm"], cfg.rms_eps)
        logits = llama._linear(hn, params["lm_head"], cfg).astype(jnp.float32)[:, :vocab]
        outputs = logits.reshape(n_micro, bm, vocab)
        outputs = jax.lax.psum(jnp.where(s == pp - 1, outputs, 0.0), "pp")
        return outputs, k_cache, v_cache

    cache_spec = P("pp")
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(
            _param_specs(params), cache_spec, cache_spec,
            P(None, None, None), P(None, None, None),
            P(None, None), P(None, None, None), P(None, None),
        ),
        out_specs=(P(None, None, None), cache_spec, cache_spec),
        check_vma=False,
    )
