"""Kernel families (quant, gemm, attention, moe, norm, rope, ...)."""

from . import (  # noqa: F401
    activation,
    attention,
    compression,
    inkling,
    gemm,
    grammar,
    hadamard,
    hc,
    kvcache,
    linear_attn,
    lora,
    misc,
    moe,
    norm,
    quant,
    rope,
    sampling,
    speculative,
)
