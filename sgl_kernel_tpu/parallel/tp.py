"""Tensor/data-parallel model execution via shard_map.

Replaces the reference's implicit-TP contract (kernels take pre-sharded
head counts, sharding done by the host framework) with an explicit TPU
design: shard_map over a ("dp", "tp") mesh; each shard runs the *local*
llama step (local heads / local intermediate, per-shard KV pages) and the
row-parallel projections psum over "tp" inside the step, letting XLA
schedule the collectives on ICI against the Pallas kernels.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import llama


def local_config(cfg: llama.LlamaConfig, tp: int) -> llama.LlamaConfig:
    assert not cfg.fused, "fused qkv/gate_up rows are not TP-shardable; build with fused=False"
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0 and cfg.intermediate_size % tp == 0
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )


def _cache_spec():
    # page-major [L, P, Hkv, page, D]: pages on dp, heads on tp
    return P(None, "dp", "tp", None, None)


def _param_specs(params):
    def linear(name, v):
        row = name in ("o", "down")
        if isinstance(v, dict):
            # K-paired packed layout [L, K/2, N] + scales [L, K/G, N]:
            # column-parallel shards N (dim 2), row-parallel shards K (dim 1)
            if row:
                return {"packed": P(None, "tp", None), "scales": P(None, "tp", None)}
            return {"packed": P(None, None, "tp"), "scales": P(None, None, "tp")}
        # bf16 [L, N, K]: column-parallel shards N (dim 1), row K (dim 2)
        return P(None, None, "tp") if row else P(None, "tp", None)

    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": (
            {"packed": P(None, None), "scales": P(None, None)}
            if isinstance(params["lm_head"], dict)
            else P(None, None)
        ),
        "layers": {
            name: (
                linear(name, v)
                if name in ("q", "k", "v", "o", "gate", "up", "down")
                else (P(None, "tp") if name in ("q_bias", "k_bias", "v_bias") else P(None, None))
            )
            for name, v in params["layers"].items()
        },
    }


def make_parallel_decode_step(cfg: llama.LlamaConfig, mesh: Mesh, params):
    """Build a mesh-parallel decode step: dp shards the batch and the page
    pool; tp shards heads + intermediate. Data args are per-shard
    concatenated along batch (standard NamedSharding on axis 0)."""
    tp = mesh.shape["tp"]
    cfg_local = local_config(cfg, tp)
    pspecs = _param_specs(params)

    def step(params, k_cache, v_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
        return llama.decode_step(
            params, cfg_local, k_cache, v_cache, tokens, positions,
            page_tables, lengths, slot_loc, rope_cache, tp_axis="tp",
        )

    return shard_map(
        step,
        mesh=mesh,
        in_specs=(
            pspecs,
            _cache_spec(),
            _cache_spec(),
            P("dp"),
            P("dp"),
            P("dp", None),
            P("dp"),
            P("dp"),
            P(None, None),
        ),
        out_specs=(P("dp", None), _cache_spec(), _cache_spec()),
        check_vma=False,
    )


def make_parallel_prefill(cfg: llama.LlamaConfig, mesh: Mesh, params):
    tp = mesh.shape["tp"]
    cfg_local = local_config(cfg, tp)

    def run(params, k_cache, v_cache, tokens, positions, q_lens, slot_loc, rope_cache):
        return llama.prefill(
            params, cfg_local, k_cache, v_cache, tokens, positions, q_lens,
            slot_loc, rope_cache, tp_axis="tp",
        )

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(
            _param_specs(params),
            _cache_spec(),
            _cache_spec(),
            P("dp", None),
            P("dp", None),
            P("dp"),
            P("dp", None),
            P(None, None),
        ),
        out_specs=(P("dp", None), _cache_spec(), _cache_spec()),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# DeepSeek MLA tensor parallelism
# ---------------------------------------------------------------------------


def deepseek_local_config(cfg, tp: int):
    """Heads shard over tp; the latent pool is replicated per shard (MLA
    has ONE shared latent head — the standard MLA-TP tradeoff; DeepSeek
    deployments scale attention with DP for this reason). Experts shard
    over the same axis (cfg.num_experts stays GLOBAL — the EP formulation
    derives the local range from the axis size)."""
    assert cfg.num_heads % tp == 0
    assert cfg.num_experts % tp == 0
    assert cfg.moe_intermediate % tp == 0 and cfg.dense_intermediate % tp == 0
    return dataclasses.replace(cfg, num_heads=cfg.num_heads // tp)


def _ds_param_specs(params):
    def lin(row):
        # quantized K-paired [L, K/2, N] / bf16 [L, N, K]
        def spec(v):
            if isinstance(v, dict):
                if row:
                    return {"packed": P(None, "tp", None), "scales": P(None, "tp", None)}
                return {"packed": P(None, None, "tp"), "scales": P(None, None, "tp")}
            return P(None, None, "tp") if row else P(None, "tp", None)
        return spec

    col, row = lin(False), lin(True)

    def expert_bank(v):
        if isinstance(v, dict):
            return {"packed": P(None, "tp", None, None), "scales": P(None, "tp", None, None)}
        return P(None, "tp", None, None)

    lw = params["layers"]
    specs = {
        "input_norm": P(None, None), "post_norm": P(None, None),
        "kv_norm": P(None, None),
        "wkv_a": P(None, None, None) if not isinstance(lw["wkv_a"], dict)
                 else {"packed": P(None, None, None), "scales": P(None, None, None)},
        "w_uk": P(None, "tp", None, None),         # [L, nh, dn, 512]
        "w_uv": P(None, "tp", None, None),         # [L, nh, 512, dv]
        "wo": row(lw["wo"]),                       # input rows = heads
        # dense MLP + shared expert shard the intermediate (combined psum)
        "gate": col(lw["gate"]), "up": col(lw["up"]), "down": row(lw["down"]),
        "shared_gate": col(lw["shared_gate"]), "shared_up": col(lw["shared_up"]),
        "shared_down": row(lw["shared_down"]),
        "router": P(None, None, None),             # global expert logits
        "router_bias": P(None, None),
        "moe_w1": expert_bank(lw["moe_w1"]),
        "moe_w2": expert_bank(lw["moe_w2"]),
    }
    if "wq_b" in lw:
        # q-LoRA: the shared down-projection + its norm replicate; the
        # per-head up-projection rows shard like wq would
        specs["wq_a"] = ({"packed": P(None, None, None), "scales": P(None, None, None)}
                         if isinstance(lw["wq_a"], dict) else P(None, None, None))
        specs["q_a_norm"] = P(None, None)
        specs["wq_b"] = col(lw["wq_b"])            # heads (output rows)
    else:
        specs["wq"] = col(lw["wq"])                # heads (output rows)
    for extra in ("wq_idx", "wk_idx", "idx_norm", "w_idx_gate", "comp_ape"):
        if extra in lw:
            specs[extra] = P(*([None] * jnp.ndim(lw[extra])))
    if "comp_score" in lw:  # replicated (dict when quantized)
        cs = lw["comp_score"]
        specs["comp_score"] = (
            {k: P(*([None] * jnp.ndim(v))) for k, v in cs.items()}
            if isinstance(cs, dict) else P(*([None] * jnp.ndim(cs))))
    lm = params["lm_head"]
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": ({"packed": P(None, None), "scales": P(None, None)}
                    if isinstance(lm, dict) else P(None, None)),
        "layers": specs,
    }


def make_parallel_deepseek_decode_step(cfg, mesh: Mesh, params):
    """dp shards batch + latent pages; tp shards heads + experts +
    MLP intermediates (latent pool replicated over tp)."""
    from ..models import deepseek

    tpn = mesh.shape["tp"]
    cfg_local = deepseek_local_config(cfg, tpn)
    pspecs = _ds_param_specs(params)

    def step(params, kv_cache, tokens, positions, page_tables, lengths, slot_loc, rope_cache):
        return deepseek.decode_step(
            params, cfg_local, kv_cache, tokens, positions, page_tables,
            lengths, slot_loc, rope_cache, tp_axis="tp",
        )

    cache_spec = P(None, "dp", None, None)
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(pspecs, cache_spec, P("dp"), P("dp"), P("dp", None),
                  P("dp"), P("dp"), P(None, None)),
        out_specs=(P("dp", None), cache_spec),
        check_vma=False,
    )


def make_parallel_deepseek_prefill(cfg, mesh: Mesh, params):
    from ..models import deepseek

    tpn = mesh.shape["tp"]
    cfg_local = deepseek_local_config(cfg, tpn)
    cache_spec = P(None, "dp", None, None)

    def run(params, kv_cache, tokens, positions, q_lens, slot_loc, rope_cache):
        return deepseek.prefill(
            params, cfg_local, kv_cache, tokens, positions, q_lens, slot_loc,
            rope_cache, tp_axis="tp",
        )

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(_ds_param_specs(params), cache_spec, P("dp", None),
                  P("dp", None), P("dp"), P("dp", None), P(None, None)),
        out_specs=(P("dp", None), cache_spec),
        check_vma=False,
    )


def make_parallel_deepseek_nsa_steps(cfg, mesh: Mesh, params, idx_rope_cache):
    """NSA decode/prefill under TP: heads/experts/intermediates shard as in
    the dense MLA step; the fp8 indexer (weights, pools, scoring, topk) is
    REPLICATED per shard — it is MQA-style and cheap relative to sparse
    MLA, and replicating keeps the selected token set bit-identical across
    shards. Latent + indexer pools replicate over tp (dp=1 pools)."""
    from ..models import deepseek

    tpn = mesh.shape["tp"]
    cfg_local = deepseek_local_config(cfg, tpn)
    # indexer projections act on replicated hidden states with GLOBAL idx
    # heads — keep the global count in the local config
    cfg_local = dataclasses.replace(cfg_local, idx_heads=cfg.idx_heads)
    pspecs = _ds_param_specs(params)
    cache_spec = P(None, "dp", None, None)
    flat = P(None)  # idx pools [L*P*page(, D)] replicated (dp = 1)
    idx_k_spec = P(None, None)

    def dstep(params, kv, idx_k, idx_s, *a):
        return deepseek.decode_step_nsa(
            params, cfg_local, kv, idx_k, idx_s, *a, tp_axis="tp")

    def pstep(params, kv, idx_k, idx_s, *a):
        return deepseek.prefill_nsa(
            params, cfg_local, kv, idx_k, idx_s, *a, tp_axis="tp")

    decode_sm = shard_map(
        dstep, mesh=mesh,
        in_specs=(pspecs, cache_spec, idx_k_spec, flat, P("dp"), P("dp"),
                  P("dp", None), P("dp"), P("dp"), P(None, None), P(None, None)),
        out_specs=(P("dp", None), cache_spec, idx_k_spec, flat),
        check_vma=False,
    )
    prefill_sm = shard_map(
        pstep, mesh=mesh,
        in_specs=(pspecs, cache_spec, idx_k_spec, flat, P("dp", None),
                  P("dp", None), P("dp"), P("dp", None), P(None, None), P(None, None)),
        out_specs=(P("dp", None), cache_spec, idx_k_spec, flat),
        check_vma=False,
    )
    return decode_sm, prefill_sm


def make_parallel_deepseek_compress_steps(cfg, mesh: Mesh, params):
    """TP builders for the compressed-KV DeepSeek family (decode_step_c /
    prefill_c): heads/experts/intermediates shard over tp, the latent,
    score, and compressed-ring pools are replicated per shard (the MLA-TP
    tradeoff — one shared latent head), batch shards over dp. The compress
    event math is replicated and bit-identical across shards."""
    from ..models import deepseek

    tpn = mesh.shape["tp"]
    cfg_local = deepseek_local_config(cfg, tpn)
    pspecs = _ds_param_specs(params)
    cache_spec = P(None, "dp", None, None)  # [L, P, page, 576] pools
    comp_spec = P(None, None, None, None)  # [L, S, ring, 576] ring pool

    def dstep(params, kv, sc, comp, tokens, positions, page_tables, lengths,
              slot_loc, state_slots, rope_cache):
        return deepseek.decode_step_c(
            params, cfg_local, kv, sc, comp, tokens, positions, page_tables,
            lengths, slot_loc, state_slots, rope_cache, tp_axis="tp",
        )

    decode = shard_map(
        dstep,
        mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, comp_spec, P("dp"), P("dp"),
                  P("dp", None), P("dp"), P("dp"), P("dp"), P(None, None)),
        out_specs=(P("dp", None), cache_spec, cache_spec, comp_spec),
        check_vma=False,
    )

    def pstep(params, kv, sc, comp, tokens, positions, q_lens, slot_loc,
              state_slots, rope_cache):
        return deepseek.prefill_c(
            params, cfg_local, kv, sc, comp, tokens, positions, q_lens,
            slot_loc, state_slots, rope_cache, tp_axis="tp",
        )

    prefill = shard_map(
        pstep,
        mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, comp_spec, P("dp", None),
                  P("dp", None), P("dp"), P("dp", None), P("dp"), P(None, None)),
        out_specs=(P("dp", None), cache_spec, cache_spec, comp_spec),
        check_vma=False,
    )
    return decode, prefill
