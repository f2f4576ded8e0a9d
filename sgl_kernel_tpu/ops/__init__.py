"""Kernel families (quant, gemm, attention, moe, norm, rope, activation, ...)."""

from . import activation, quant  # noqa: F401
