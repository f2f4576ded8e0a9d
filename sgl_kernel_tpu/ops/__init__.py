"""Kernel families (quant, gemm, attention, moe, norm, rope, activation, ...)."""

from . import activation, attention, gemm, norm, quant, rope  # noqa: F401
