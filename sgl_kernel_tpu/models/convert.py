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
        n_pad = ((lm.shape[0] + 2047) // 2048) * 2048
        if n_pad != lm.shape[0]:
            lm = np.concatenate([lm, np.zeros((n_pad - lm.shape[0], lm.shape[1]), lm.dtype)])
        packed, scales, _ = quantize_w4(jnp.asarray(lm, jnp.float32), group_size=cfg.group_size)
        lm_head = {"packed": packed, "scales": scales}
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
    dtype_map = {
        "F32": np.float32, "F16": np.float16, "BF16": None, "I64": np.int64,
        "I32": np.int32, "U8": np.uint8, "I8": np.int8,
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
                else:
                    arr = np.frombuffer(buf, dtype_map[meta["dtype"]])
                out[name] = arr.reshape(meta["shape"]).copy()
    return out
