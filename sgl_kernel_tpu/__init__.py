"""sgl-kernel-tpu: TPU-native LLM inference kernel framework (JAX/XLA/Pallas).

A from-scratch re-design of sgl-project/sgl-kernel-xpu's capability surface
for TPU: quantization formats and dequant-fused GEMMs, paged flash attention
and MLA, fused MoE, norm/RoPE/activation fusions, sampling, KV-cache
management, plus a mesh-sharded parallel layer and a minimal serving loop.

The flat export list mirrors the reference's python/sgl_kernel/__init__.py
so a user of the reference finds the same entry points here.
"""

from . import ops, parallel, utils  # noqa: F401
from .ops.activation import (  # noqa: F401
    gelu_and_mul,
    gelu_quick,
    gelu_tanh_and_mul,
    silu_and_mul,
    silu_and_mul_clamp,
    swiglu_alpha_limit,
)
from .ops.gemm import (  # noqa: F401
    awq_to_tpu_layout,
    bmm_fp8,
    fp8_blockwise_scaled_mm,
    fp8_scaled_mm,
    int8_scaled_mm,
    qserve_w4a8_per_chn_gemm,
    qserve_w4a8_per_group_gemm,
    quantize_w4,
    w4a16_gemm,
)
from .ops.quant import (  # noqa: F401
    awq_dequantize,
    mxfp4_dequantize,
    per_tensor_quant_fp8,
    per_token_group_quant_8bit,
    per_token_group_quant_fp4,
    per_token_group_quant_fp8,
    per_token_quant_fp8,
)

__version__ = "0.1.0"
