"""Kernel families (quant, gemm, attention, moe, norm, rope, activation, ...)."""

from . import activation, gemm, quant  # noqa: F401
