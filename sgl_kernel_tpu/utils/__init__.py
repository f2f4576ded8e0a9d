"""Shared helpers for sgl-kernel-tpu.

TPU-native replacement for the reference's src/sycl/Utils.h +
python/sgl_kernel/utils.py: alignment helpers, interpret-mode gating for
Pallas kernels (tests run on CPU in interpret mode; TPU compiles Mosaic),
and device queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def dividing_tile(dim: int, pref: int, mult: int) -> int:
    """Largest tile <= ``pref`` that divides ``dim`` and is a multiple of
    ``mult`` (Mosaic block-shape rule: the last two dims of a BlockSpec
    block must be multiples of (8, 128) or equal the full array dims).
    Falls back to the full dim when no such tile exists (always legal)."""
    for cand in range(min(pref, dim) // mult * mult, 0, -mult):
        if dim % cand == 0:
            return cand
    return dim


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def pallas_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    On CPU (tests, multi-device simulation) Mosaic is unavailable, so every
    pallas_call in this package routes through ``interpret=pallas_interpret()``.
    """
    return not on_tpu()


def query_device(device_index: int = 0):
    """Return a (major, minor)-style capability tuple for the target device.

    TPU analogue of the reference's ``query_device`` (src/sycl/Device.cpp:1-30):
    reports the TPU generation as *major* and core count as *minor* so callers
    can gate kernels on hardware capability the way ``is_xe2_arch`` did.
    """
    devs = jax.devices()
    d = devs[device_index] if device_index >= 0 else devs[0]
    kind = getattr(d, "device_kind", "cpu")
    gen = 0
    for tok in str(kind).replace("TPU", " ").replace("v", " ").split():
        if tok and tok[0].isdigit():
            digits = "".join(c for c in tok if c.isdigit())
            if digits:
                gen = int(digits)
                break
    return gen, getattr(d, "core_count", 1)


def dtype_max(dtype) -> float:
    """Finite max of a (possibly low-precision float) dtype."""
    return float(jnp.finfo(dtype).max) if jnp.issubdtype(dtype, jnp.floating) else float(jnp.iinfo(dtype).max)


def dtype_min(dtype) -> float:
    return float(jnp.finfo(dtype).min) if jnp.issubdtype(dtype, jnp.floating) else float(jnp.iinfo(dtype).min)
