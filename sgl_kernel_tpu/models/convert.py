"""Checkpoint conversion: HF-style Llama state dict -> framework params.

Maps the standard Hugging Face Llama parameter names onto this framework's
layer-stacked pytree (models/llama.py), with optional on-the-fly W4A16
quantization (ops/gemm/w4a16.quantize_w4) and AWQ checkpoint ingestion
(awq_to_tpu_layout). Operates on a {name: numpy array} dict so any loader
(safetensors, torch, npz) can feed it.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gemm.w4a16 import quantize_w4
from .llama import LlamaConfig


_HF_LAYER_MAP = {
    "q": "self_attn.q_proj.weight",
    "k": "self_attn.k_proj.weight",
    "v": "self_attn.v_proj.weight",
    "o": "self_attn.o_proj.weight",
    "gate": "mlp.gate_proj.weight",
    "up": "mlp.up_proj.weight",
    "down": "mlp.down_proj.weight",
    "input_norm": "input_layernorm.weight",
    "post_norm": "post_attention_layernorm.weight",
}


def convert_hf_llama(state: Mapping[str, np.ndarray], cfg: LlamaConfig) -> Dict[str, Any]:
    """Convert a HF Llama state dict (numpy values) into framework params.

    Handles fused/unfused layouts and cfg.quant == "w4a16" quantization.
    """
    l = cfg.num_layers

    def get(name):
        return np.asarray(state[name])

    def stack(suffix):
        return np.stack([get(f"model.layers.{i}.{suffix}") for i in range(l)])

    layers: Dict[str, Any] = {
        "input_norm": jnp.asarray(stack(_HF_LAYER_MAP["input_norm"]), cfg.dtype),
        "post_norm": jnp.asarray(stack(_HF_LAYER_MAP["post_norm"]), cfg.dtype),
    }
    # Qwen-family extras (models/llama.py qk_norm / qkv_bias options)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.asarray(stack("self_attn.q_norm.weight"), cfg.dtype)
        layers["k_norm"] = jnp.asarray(stack("self_attn.k_norm.weight"), cfg.dtype)
    if cfg.qkv_bias:
        for nm, suf in (("q_bias", "q_proj.bias"), ("k_bias", "k_proj.bias"), ("v_bias", "v_proj.bias")):
            layers[nm] = jnp.asarray(stack(f"self_attn.{suf}"), cfg.dtype)

    def proj(name):
        return stack(_HF_LAYER_MAP[name])  # [L, out, in]

    raw = {n: proj(n) for n in ("q", "k", "v", "o", "gate", "up", "down")}
    if cfg.fused:
        raw["qkv"] = np.concatenate([raw.pop("q"), raw.pop("k"), raw.pop("v")], axis=1)
        raw["gate_up"] = np.concatenate([raw.pop("gate"), raw.pop("up")], axis=1)

    for name, wm in raw.items():
        if cfg.quant == "w4a16":
            packed, scales = jax.vmap(lambda x: quantize_w4(x, group_size=cfg.group_size)[:2])(
                jnp.asarray(wm, jnp.float32)
            )
            layers[name] = {"packed": packed, "scales": scales}
        else:
            layers[name] = jnp.asarray(wm, cfg.dtype)

    embed = jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype)
    lm_head_name = "lm_head.weight" if "lm_head.weight" in state else "model.embed_tokens.weight"
    lm = np.asarray(state[lm_head_name])
    if cfg.quant == "w4a16":
        from .llama import _quantize_matrix

        lm_head = _quantize_matrix(jnp.asarray(lm, jnp.float32), cfg)
    else:
        lm_head = jnp.asarray(lm, cfg.dtype)

    return {
        "embed": embed,
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
        "lm_head": lm_head,
        "layers": layers,
    }


def load_safetensors(paths) -> Dict[str, np.ndarray]:
    """Load one or more .safetensors files into a numpy dict (no torch)."""
    import json
    import struct

    out: Dict[str, np.ndarray] = {}
    import ml_dtypes

    dtype_map = {
        "F32": np.float32, "F16": np.float16, "F64": np.float64,
        "I64": np.int64, "I32": np.int32, "U8": np.uint8, "I8": np.int8,
        # DeepSeek-V3 checkpoints ship fp8 weights
        "F8_E4M3": ml_dtypes.float8_e4m3fn, "F8_E5M2": ml_dtypes.float8_e5m2,
    }
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    for path in paths:
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
            base = 8 + hlen
            for name, meta in header.items():
                if name == "__metadata__":
                    continue
                s, e = meta["data_offsets"]
                f.seek(base + s)
                buf = f.read(e - s)
                if meta["dtype"] == "BF16":
                    u16 = np.frombuffer(buf, np.uint16)
                    arr = (u16.astype(np.uint32) << 16).view(np.float32)
                elif meta["dtype"] in dtype_map:
                    arr = np.frombuffer(buf, dtype_map[meta["dtype"]])
                else:
                    raise ValueError(
                        f"unsupported safetensors dtype {meta['dtype']} in "
                        f"tensor {name!r} ({path})")
                out[name] = arr.reshape(meta["shape"]).copy()
    return out


def convert_hf_mixtral(state: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Convert an HF Mixtral state dict (block_sparse_moe layout) into the
    framework's layer-stacked params (models/mixtral.py), with optional
    cfg.quant == "w4a16" packing of attention + per-expert MoE matrices."""
    from .mixtral import MixtralConfig  # noqa: F401 (type of cfg)

    assert not cfg.fused, "Mixtral paths emit separate q/k/v (fused=True unsupported)"
    l, e = cfg.num_layers, cfg.num_experts

    def get(name):
        return np.asarray(state[name])

    def stack(suffix):
        return np.stack([get(f"model.layers.{i}.{suffix}") for i in range(l)])

    layers: Dict[str, Any] = {
        "input_norm": jnp.asarray(stack("input_layernorm.weight"), cfg.dtype),
        "post_norm": jnp.asarray(stack("post_attention_layernorm.weight"), cfg.dtype),
        "router": jnp.asarray(stack("block_sparse_moe.gate.weight"), cfg.dtype),
    }
    attn = {n: stack(f"self_attn.{n}_proj.weight") for n in ("q", "k", "v", "o")}
    # experts: HF w1 = gate [I, H], w3 = up [I, H], w2 = down [H, I];
    # framework moe_w1 [E, H, 2I] (x @ w1), moe_w2 [E, I, H]
    def experts(wname):
        return np.stack([
            np.stack([get(f"model.layers.{i}.block_sparse_moe.experts.{j}.{wname}.weight") for j in range(e)])
            for i in range(l)
        ])  # [L, E, out, in]

    w1 = experts("w1")  # [L, E, I, H]
    w3 = experts("w3")  # [L, E, I, H]
    w2 = experts("w2")  # [L, E, H, I]
    moe_w1 = np.concatenate([w1, w3], axis=2).transpose(0, 1, 3, 2)  # [L, E, H, 2I]
    moe_w2 = w2.transpose(0, 1, 3, 2)  # [L, E, I, H]

    if cfg.quant == "w4a16":
        def qz(wm):
            pk, sc = jax.vmap(lambda m: quantize_w4(m, group_size=cfg.group_size)[:2])(
                jnp.asarray(wm, jnp.float32))
            return {"packed": pk, "scales": sc}

        for n, wm in attn.items():
            layers[n] = qz(wm)

        def qexp(w_le):  # [L, E, K, N] logical x@W: quantize W.T per expert
            q = jax.vmap(jax.vmap(lambda m: quantize_w4(m.T, group_size=cfg.group_size)[:2]))
            pk, sc = q(jnp.asarray(w_le, jnp.float32))
            return {"packed": pk, "scales": sc}

        layers["moe_w1"] = qexp(moe_w1)
        layers["moe_w2"] = qexp(moe_w2)
    else:
        for n, wm in attn.items():
            layers[n] = jnp.asarray(wm, cfg.dtype)
        layers["moe_w1"] = jnp.asarray(moe_w1, cfg.dtype)
        layers["moe_w2"] = jnp.asarray(moe_w2, cfg.dtype)

    lm = np.asarray(state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    if cfg.quant == "w4a16":
        from .llama import _quantize_matrix

        lm_head = _quantize_matrix(jnp.asarray(lm, jnp.float32), cfg)
    else:
        lm_head = jnp.asarray(lm, cfg.dtype)
    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
        "lm_head": lm_head,
        "layers": layers,
    }


def dequantize_fp8_blockwise_state(state: Mapping[str, np.ndarray], block: int = 128) -> Dict[str, np.ndarray]:
    """Dequantize DeepSeek-V3 fp8 shards: every ``X.weight`` (fp8 e4m3)
    with a sibling ``X.weight_scale_inv`` [ceil(N/128), ceil(K/128)] f32
    becomes f32 (blockwise 128x128 dequant — the fp8_blockwise scale
    contract, reference python/sgl_kernel/gemm.py fp8_blockwise path).
    Tensors without a scale pass through unchanged."""
    out: Dict[str, np.ndarray] = {}
    for name, arr in state.items():
        if name.endswith(".weight_scale_inv"):
            continue
        sname = name + "_scale_inv"
        if sname in state:
            w = np.asarray(arr).astype(np.float32)
            s = np.asarray(state[sname], np.float32)
            n, k = w.shape
            se = np.repeat(np.repeat(s, block, axis=0)[:n], block, axis=1)[:, :k]
            out[name] = w * se
        else:
            out[name] = arr
    return out


def convert_hf_deepseek(state: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Convert an HF DeepSeek-V2/V3-style MLA state dict into the
    framework's ABSORBED params (models/deepseek.py): kv_b_proj is split
    per head into W_UK (q_nope -> latent) and W_UV (latent -> value).

    Supports both q layouts: direct q_proj (DeepSeek-V2-Lite) and the
    q-LoRA path real V3/R1 checkpoints use (q_a_proj -> q_a_layernorm ->
    q_b_proj; requires cfg.q_lora_rank). NSA indexer tensors
    (self_attn.indexer.{wq_b,wk,k_norm,weights_proj}) are ingested when
    cfg.nsa. fp8 shards (weight + weight_scale_inv) are dequantized
    automatically; cfg.quant == "w4a16" re-quantizes into the framework's
    K-paired int4 layout (matching init_weights). Reference contracts:
    MLA shapes python/sgl_kernel/attention.py:54-132, indexer ingest
    fused_norm_rope_v2_torch.py:474-557.
    """
    from ..ops.attention.mla import D_LATENT, D_ROPE

    if any(k.endswith(".weight_scale_inv") for k in state):
        state = dequantize_fp8_blockwise_state(state)

    q_lora_ckpt = "model.layers.0.self_attn.q_a_proj.weight" in state
    if q_lora_ckpt != bool(getattr(cfg, "q_lora_rank", None)):
        if q_lora_ckpt:
            rank = state["model.layers.0.self_attn.q_a_proj.weight"].shape[0]
            raise ValueError(
                f"checkpoint uses the q-LoRA layout (q_a_proj/q_b_proj) but "
                f"cfg.q_lora_rank is None — set q_lora_rank={rank}")
        raise ValueError(
            f"cfg.q_lora_rank={cfg.q_lora_rank} but the checkpoint has a "
            "direct q_proj (V2-Lite layout) — set q_lora_rank=None")

    l, e = cfg.num_layers, cfg.num_experts
    nh, dn, dv = cfg.num_heads, cfg.qk_nope_dim, cfg.v_head_dim

    def get(name):
        return np.asarray(state[name])

    def stack(suffix):
        return np.stack([get(f"model.layers.{i}.{suffix}") for i in range(l)])

    def deinterleave_rope_rows(w_rows):
        """HF DeepSeek stores rope dims INTERLEAVED (pairs (2i, 2i+1));
        this model applies neox-style rotary (half-split pairs (i, i+d/2),
        ops/rope.py is_neox=True). Reorder the D_ROPE output rows once at
        load so the runtime rope matches HF numerics (the vLLM/SGLang
        equivalent is is_neox_style=False at runtime)."""
        half = D_ROPE // 2
        idx = np.concatenate([np.arange(half) * 2, np.arange(half) * 2 + 1])
        return w_rows[..., idx, :]

    # kv_b_proj [nh*(dn+dv), D_LATENT] -> per-head W_UK [nh, dn, 512] and
    # W_UV [nh, 512, dv]
    kv_b = stack("self_attn.kv_b_proj.weight").reshape(l, nh, dn + dv, D_LATENT)
    w_uk = kv_b[:, :, :dn, :]                      # [L, nh, dn, 512]
    w_uv = kv_b[:, :, dn:, :].transpose(0, 1, 3, 2)  # [L, nh, 512, dv]

    layers: Dict[str, Any] = {
        "input_norm": jnp.asarray(stack("input_layernorm.weight"), cfg.dtype),
        "post_norm": jnp.asarray(stack("post_attention_layernorm.weight"), cfg.dtype),
        "kv_norm": jnp.asarray(stack("self_attn.kv_a_layernorm.weight"), cfg.dtype),
        "w_uk": jnp.asarray(w_uk, cfg.dtype),
        "w_uv": jnp.asarray(w_uv, cfg.dtype),
        "wo": jnp.asarray(stack("self_attn.o_proj.weight"), cfg.dtype),
        "router": jnp.asarray(
            np.stack([get(f"model.layers.{i}.mlp.gate.weight")
                      if f"model.layers.{i}.mlp.gate.weight" in state
                      else np.zeros((e, cfg.hidden_size), np.float32)
                      for i in range(l)]), cfg.dtype),
    }
    if q_lora_ckpt:
        # low-rank q: wq_a [L, r, h]; q_b rope rows de-interleaved like wq
        wq_b = stack("self_attn.q_b_proj.weight").astype(np.float32)
        r = wq_b.shape[-1]
        if r != cfg.q_lora_rank:
            raise ValueError(f"q_b_proj rank {r} != cfg.q_lora_rank {cfg.q_lora_rank}")
        wq_b = wq_b.reshape(l, nh, dn + D_ROPE, r)
        wq_b[:, :, dn:, :] = deinterleave_rope_rows(wq_b[:, :, dn:, :])
        layers["wq_a"] = jnp.asarray(stack("self_attn.q_a_proj.weight"), cfg.dtype)
        layers["q_a_norm"] = jnp.asarray(stack("self_attn.q_a_layernorm.weight"), cfg.dtype)
        layers["wq_b"] = jnp.asarray(wq_b.reshape(l, nh * (dn + D_ROPE), r), cfg.dtype)
    else:
        wq = stack("self_attn.q_proj.weight").astype(np.float32)
        wq = wq.reshape(l, nh, dn + D_ROPE, -1)
        wq[:, :, dn:, :] = deinterleave_rope_rows(wq[:, :, dn:, :])
        layers["wq"] = jnp.asarray(wq.reshape(l, nh * (dn + D_ROPE), -1), cfg.dtype)
    wkv_a = stack("self_attn.kv_a_proj_with_mqa.weight").astype(np.float32)
    wkv_a[:, D_LATENT:, :] = deinterleave_rope_rows(wkv_a[:, D_LATENT:, :])
    layers["wkv_a"] = jnp.asarray(wkv_a, cfg.dtype)

    if getattr(cfg, "nsa", False):
        # DSv3.2 indexer tensors (HF naming: self_attn.indexer.*); wq_b
        # projects from c_q under q-LoRA, from the hidden state otherwise
        hi, di = cfg.idx_heads, cfg.idx_dim
        wq_idx = stack("self_attn.indexer.wq_b.weight")
        want_in = cfg.q_lora_rank or cfg.hidden_size
        if wq_idx.shape[1:] != (hi * di, want_in):
            raise ValueError(
                f"indexer.wq_b shape {wq_idx.shape[1:]} != ({hi * di}, {want_in}) "
                f"(idx_heads={hi}, idx_dim={di}, q_lora_rank={cfg.q_lora_rank})")
        layers["wq_idx"] = jnp.asarray(wq_idx, cfg.dtype)
        layers["wk_idx"] = jnp.asarray(stack("self_attn.indexer.wk.weight"), cfg.dtype)
        layers["idx_norm"] = jnp.asarray(stack("self_attn.indexer.k_norm.weight"), cfg.dtype)
        layers["w_idx_gate"] = jnp.asarray(stack("self_attn.indexer.weights_proj.weight"), cfg.dtype)

    layers["router_bias"] = jnp.asarray(
        np.stack([get(f"model.layers.{i}.mlp.gate.e_score_correction_bias")
                  if f"model.layers.{i}.mlp.gate.e_score_correction_bias" in state
                  else np.zeros((e,), np.float32) for i in range(l)]), jnp.float32)

    # dense layers (< num_dense_layers) use mlp.{gate,up,down}_proj; MoE
    # layers use mlp.experts.J + mlp.shared_experts. Missing tensors (a
    # dense layer has no experts and vice versa) are zero-filled — the
    # model's lax.cond only reads the matching branch per layer.
    for i in range(l):
        is_dense_ckpt = f"model.layers.{i}.mlp.gate_proj.weight" in state
        is_dense_cfg = i < cfg.num_dense_layers
        if is_dense_ckpt != is_dense_cfg:
            raise ValueError(
                f"layer {i}: checkpoint is {'dense' if is_dense_ckpt else 'MoE'} "
                f"but cfg.num_dense_layers={cfg.num_dense_layers} makes it "
                f"{'dense' if is_dense_cfg else 'MoE'} — a silent zero-filled "
                f"MLP would result")

    def maybe(name, shape):
        return get(name) if name in state else np.zeros(shape, np.float32)

    h, di, mi = cfg.hidden_size, cfg.dense_intermediate, cfg.moe_intermediate
    layers["gate"] = jnp.asarray(np.stack(
        [maybe(f"model.layers.{i}.mlp.gate_proj.weight", (di, h)) for i in range(l)]), cfg.dtype)
    layers["up"] = jnp.asarray(np.stack(
        [maybe(f"model.layers.{i}.mlp.up_proj.weight", (di, h)) for i in range(l)]), cfg.dtype)
    layers["down"] = jnp.asarray(np.stack(
        [maybe(f"model.layers.{i}.mlp.down_proj.weight", (h, di)) for i in range(l)]), cfg.dtype)

    def expert_cat(i):
        if f"model.layers.{i}.mlp.experts.0.gate_proj.weight" not in state:
            return (np.zeros((e, h, 2 * mi), np.float32), np.zeros((e, mi, h), np.float32))
        g = np.stack([get(f"model.layers.{i}.mlp.experts.{j}.gate_proj.weight") for j in range(e)])
        u = np.stack([get(f"model.layers.{i}.mlp.experts.{j}.up_proj.weight") for j in range(e)])
        d = np.stack([get(f"model.layers.{i}.mlp.experts.{j}.down_proj.weight") for j in range(e)])
        return (np.concatenate([g, u], axis=1).transpose(0, 2, 1), d.transpose(0, 2, 1))

    pairs = [expert_cat(i) for i in range(l)]
    layers["moe_w1"] = jnp.asarray(np.stack([p[0] for p in pairs]), cfg.dtype)
    layers["moe_w2"] = jnp.asarray(np.stack([p[1] for p in pairs]), cfg.dtype)
    for nm, suf, shape in (("shared_gate", "gate_proj", (mi, h)),
                           ("shared_up", "up_proj", (mi, h)),
                           ("shared_down", "down_proj", (h, mi))):
        layers[nm] = jnp.asarray(np.stack(
            [maybe(f"model.layers.{i}.mlp.shared_experts.{suf}.weight", shape)
             for i in range(l)]), cfg.dtype)

    lm = np.asarray(state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    if cfg.quant == "w4a16":
        # re-quantize into the K-paired int4 layout, matching init_weights
        def qz(wm):  # [L, N, K] stacked linear
            pk, sc = jax.vmap(lambda m: quantize_w4(m.astype(jnp.float32), group_size=cfg.group_size)[:2])(wm)
            return {"packed": pk, "scales": sc}

        def qexp(w_le):  # [L, E, K, N] expert banks (x @ W convention)
            q = jax.vmap(jax.vmap(lambda m: quantize_w4(m.T.astype(jnp.float32), group_size=cfg.group_size)[:2]))
            pk, sc = q(w_le)
            return {"packed": pk, "scales": sc}

        qnames = ["wkv_a", "wo", "gate", "up", "down",
                  "shared_gate", "shared_up", "shared_down"]
        qnames += ["wq_a", "wq_b"] if q_lora_ckpt else ["wq"]
        for name in qnames:
            layers[name] = qz(layers[name])
        layers["moe_w1"] = qexp(layers["moe_w1"])
        layers["moe_w2"] = qexp(layers["moe_w2"])
        from .llama import _quantize_matrix

        lm_head = _quantize_matrix(jnp.asarray(lm, jnp.float32), cfg)
    else:
        lm_head = jnp.asarray(lm, cfg.dtype)
    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
        "lm_head": lm_head,
        "layers": layers,
    }


def convert_hf_gptoss(state: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Convert an HF gpt-oss state dict into the framework's layer-stacked
    params (models/gptoss.py).

    The gpt-oss release ships the MoE expert banks pre-quantized to MXFP4:
    ``mlp.experts.{gate_up,down}_proj_blocks`` [E, N, K/32, 16] uint8 (two
    E2M1 codes per byte, low nibble first) with ``.._scales`` [E, N, K/32]
    uint8 raw UE8M0 exponents — exactly the byte layout
    ops.quant.per_token_group_quant_fp4 emits, so ingestion is a reshape +
    mxfp4_to_tpu_layout, no requantization. The gate_up output channels
    interleave (gate, up) pairs (the official implementation splits
    ``x[..., ::2], x[..., 1::2]``); the framework wants [gate | up] halves,
    so rows de-interleave here once at load time. Router/expert/attention
    biases and per-head attention sinks map onto router_bias / moe_b1/b2 /
    qkv+o biases / sinks. Reference contracts: the unified mxfp4 grouped
    GEMM (GroupGemmW4A16Xe20.cpp) and swiglu_alpha_limit
    (SwigluAlphaLimit.cpp)."""
    from ..ops.gemm.w4a16 import mxfp4_to_tpu_layout

    l, e = cfg.num_layers, cfg.num_experts
    assert cfg.quant == "mxfp4", "gpt-oss checkpoints are mxfp4 (set quant='mxfp4')"

    def get(name):
        return np.asarray(state[name])

    def stack(suffix):
        return np.stack([get(f"model.layers.{i}.{suffix}") for i in range(l)])

    def deinterleave(a, axis):
        """(gate, up) interleaved channels -> [gate | up] halves."""
        g = np.take(a, np.arange(0, a.shape[axis], 2), axis=axis)
        u = np.take(a, np.arange(1, a.shape[axis], 2), axis=axis)
        return np.concatenate([g, u], axis=axis)

    layers: Dict[str, Any] = {
        "input_norm": jnp.asarray(stack("input_layernorm.weight"), cfg.dtype),
        "post_norm": jnp.asarray(stack("post_attention_layernorm.weight"), cfg.dtype),
        "router": jnp.asarray(stack("mlp.router.weight"), cfg.dtype),
        "router_bias": jnp.asarray(stack("mlp.router.bias"), jnp.float32),
        "sinks": jnp.asarray(stack("self_attn.sinks"), cfg.dtype),
    }
    for n in ("q", "k", "v", "o"):
        layers[n] = jnp.asarray(stack(f"self_attn.{n}_proj.weight"), cfg.dtype)
    for n in ("q", "k", "v"):
        layers[f"{n}_bias"] = jnp.asarray(stack(f"self_attn.{n}_proj.bias"), cfg.dtype)
    layers["o_bias"] = jnp.asarray(stack("self_attn.o_proj.bias"), cfg.dtype)

    def experts_mxfp4(prefix, gate_up):
        blocks = stack(f"mlp.experts.{prefix}_blocks")   # [L, E, N, K/32, 16]
        scales = stack(f"mlp.experts.{prefix}_scales")   # [L, E, N, K/32]
        if gate_up:
            blocks = deinterleave(blocks, axis=2)
            scales = deinterleave(scales, axis=2)
        q_packed = blocks.reshape(*blocks.shape[:3], -1)  # [L, E, N, K/2]
        pk, sc = jax.vmap(jax.vmap(lambda q, s: mxfp4_to_tpu_layout(q, s)))(
            jnp.asarray(q_packed), jnp.asarray(scales))
        return {"packed": pk, "scales": sc}

    layers["moe_w1"] = experts_mxfp4("gate_up_proj", gate_up=True)
    layers["moe_w2"] = experts_mxfp4("down_proj", gate_up=False)
    b1 = stack("mlp.experts.gate_up_proj_bias")  # [L, E, 2I] interleaved
    layers["moe_b1"] = jnp.asarray(deinterleave(b1, axis=2), jnp.float32)
    layers["moe_b2"] = jnp.asarray(stack("mlp.experts.down_proj_bias"), jnp.float32)

    lm = np.asarray(state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
        "lm_head": jnp.asarray(lm, cfg.dtype),
        "layers": layers,
    }
