"""Dequant-fused GEMM family: W4A16 (int4/MXFP4), INT8/FP8 scaled MM,
FP8 blockwise, QServe W4A8."""

from .blockwise_fp8 import (  # noqa: F401
    fp8_blockwise_scaled_grouped_mm,
    fp8_blockwise_scaled_mm,
    prepare_blockwise_scales,
)
from .fp4 import (  # noqa: F401
    fp4_group_mm,
    fp4_scaled_mm,
    scaled_fp4_experts_quant,
    scaled_fp4_quant,
)
from .qserve import qserve_w4a8_per_chn_gemm, qserve_w4a8_per_group_gemm  # noqa: F401
from .scaled_mm import (  # noqa: F401
    bmm_fp8,
    dsv3_fused_a_gemm,
    dsv3_router_gemm,
    fp8_scaled_mm,
    int8_scaled_mm,
)
from .w4a16 import (  # noqa: F401
    awq_to_tpu_layout,
    dequant_w4,
    gptq_to_tpu_layout,
    mxfp4_to_tpu_layout,
    quantize_w4,
    w4a16_gemm,
)
