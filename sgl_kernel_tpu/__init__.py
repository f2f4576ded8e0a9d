"""sgl-kernel-tpu: TPU-native LLM inference kernel framework (JAX/XLA/Pallas).

A from-scratch re-design of sgl-project/sgl-kernel-xpu's capability surface
for TPU: quantization formats and dequant-fused GEMMs, paged flash attention
and MLA (dense + sparse), fused MoE, norm/RoPE/activation fusions, sampling,
speculative decoding, LoRA, linear attention (GDN/Mamba/lightning), KV-cache
management, hyper-connections — plus a mesh-sharded parallel layer and a
continuous-batching serving loop.

The flat export list mirrors the reference's python/sgl_kernel/__init__.py
(`:13-169`) so a user of the reference finds the same entry points here.
"""

from . import models, ops, parallel, serving, utils  # noqa: F401
from .ops.activation import (  # noqa: F401
    gelu_and_mul,
    gelu_quick,
    gelu_tanh_and_mul,
    silu_and_mul,
    silu_and_mul_clamp,
    swiglu_alpha_limit,
)
from .ops.attention import (  # noqa: F401
    build_packed_metadata,
    flash_attention,
    flash_attention_packed,
    make_seq_meta,
    merge_state,
    merge_state_v2,
    merge_states,
    paged_attention_decode,
)
from .ops.attention.api import flash_attn_varlen_func, flash_attn_with_kvcache  # noqa: F401
from .ops.attention.mla import mla_decode, mla_prefill  # noqa: F401
from .ops.attention.sparse_vs import (  # noqa: F401
    build_vertical_slash_indexes,
    convert_vertical_slash_indexes,
    convert_vertical_slash_indexes_mergehead,
    sparse_attention_vertical_slash,
    sparse_attn_func,
    sparse_attn_varlen_func,
)
from .ops.attention.nsa import (  # noqa: F401
    fast_topk,
    fast_topk_transform_fused,
    fast_topk_transform_ragged_fused,
    fp8_mqa_logits,
    fp8_paged_mqa_logits,
    sparse_mla_decode,
    sparse_mla_prefill,
)
from .ops.quant.marlin import (  # noqa: F401
    gptq_marlin_to_tpu_layout,
    marlin_unpack,
    marlin_w8a16_gemm,
)
from .ops.gemm import (  # noqa: F401
    awq_to_tpu_layout,
    bmm_fp8,
    fp4_group_mm,
    fp4_scaled_mm,
    fp8_blockwise_scaled_grouped_mm,
    fp8_blockwise_scaled_mm,
    prepare_blockwise_scales,
    gptq_to_tpu_layout,
    scaled_fp4_experts_quant,
    scaled_fp4_quant,
    fp8_scaled_mm,
    int8_scaled_mm,
    qserve_w4a8_per_chn_gemm,
    qserve_w4a8_per_group_gemm,
    quantize_w4,
    w4a16_gemm,
)
from .ops.grammar import apply_token_bitmask  # noqa: F401
from .ops.hadamard import hadamard_transform  # noqa: F401
from .ops.hc import (  # noqa: F401
    hc_post,
    hc_pre_big_fuse,
    hc_pre_gemm_sqr_sum,
    hc_split_sinkhorn,
    mhc_pre,
)
from .ops.kvcache import (  # noqa: F401
    store_cache,
    store_cache_head_major,
    store_cache_mla,
    transfer_kv_all_layer,
    transfer_kv_all_layer_lf_pf,
    transfer_kv_all_layer_lf_ph,
    transfer_kv_all_layer_mla,
    transfer_kv_per_layer,
    transfer_kv_per_layer_mla,
    transfer_kv_per_layer_pf_lf,
    transfer_kv_per_layer_ph_lf,
)
from .ops.linear_attn import (  # noqa: F401
    causal_conv1d_fwd,
    causal_conv1d_update,
    chunk_gated_delta_rule,
    gated_delta_rule_scan,
    gated_delta_rule_update,
    gdn_attention_decode,
    gdn_attention_prefill,
    lightning_attention_decode,
)
from .ops.lora import (  # noqa: F401
    embedding_lora_a_fwd,
    sgemm_lora_a_fwd,
    sgemm_lora_b_fwd,
)
from .ops.misc import moe_sum, moe_sum_reduce, timestep_embedding, weak_ref_tensor  # noqa: F401
from .ops.moe import (  # noqa: F401
    MoeWeights,
    apply_shuffle_mul_sum,
    bf16_grouped_mm,
    biased_topk,
    fused_experts,
    hash_topk,
    moe_align_block_size,
    moe_fused_gate,
    scatter_tokens_to_experts,
    topk_sigmoid,
    topk_softmax,
    w4a16_grouped_mm,
)
from .ops.norm import fused_add_rmsnorm, gemma_fused_add_rmsnorm, gemma_rmsnorm, l2norm, rmsnorm  # noqa: F401
from .ops.quant import (  # noqa: F401
    awq_dequantize,
    mxfp4_dequantize,
    per_tensor_quant_fp8,
    per_token_group_quant_8bit,
    per_token_group_quant_fp4,
    per_token_group_quant_fp8,
    per_token_quant_fp8,
)
from .ops.rope import (  # noqa: F401
    fused_k_norm_rope_mla,
    fused_qk_norm_rope,
    mrope_rotary_embedding,
    rotary_embedding,
)
from .ops.sampling import (  # noqa: F401
    min_p_sampling_from_probs,
    sampling_from_probs,
    top_k_renorm_probs,
    top_k_sampling_from_probs,
    top_k_top_p_sampling_from_probs,
    top_p_renorm_probs,
    top_p_sampling_from_probs,
)
from .ops.speculative import (  # noqa: F401
    build_tree_kernel_efficient,
    segment_packbits,
    tree_speculative_sampling_target_only,
    verify_tree_greedy,
)
from .utils import query_device  # noqa: F401

__version__ = "0.1.0"
