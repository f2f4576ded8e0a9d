"""MoE stack: routing, alignment, grouped GEMMs, fused_experts."""

from .align import (  # noqa: F401
    MoeAlignment,
    apply_shuffle_mul_sum,
    moe_align_block_size,
    pick_block_size,
    scatter_tokens_to_experts,
)
from .fused_experts import MoeWeights, fused_experts  # noqa: F401
from .grouped_gemm import bf16_grouped_mm, ragged_grouped_mm, w4a16_grouped_mm, w4a8_grouped_mm  # noqa: F401
from .routing import (  # noqa: F401
    biased_topk,
    hash_topk,
    moe_fused_gate,
    topk_sigmoid,
    topk_softmax,
)
