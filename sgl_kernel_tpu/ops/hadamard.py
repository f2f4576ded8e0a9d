"""Fast Walsh-Hadamard transform.

TPU-native equivalent of the reference's hadamard_transform
(python/sgl_kernel/hadamard.py:4-21 pure-torch FWHT; used by the DSv4
q-indexer rotation, fused_q_indexer_rope_hadamard_quant). Implemented as
log2(n) butterfly passes over the last dim — XLA fuses the whole ladder
into one VMEM-resident chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("scale",))
def hadamard_transform(x, scale: float = 1.0):
    """FWHT along the last dim (power of two), times ``scale``."""
    n = x.shape[-1]
    assert n & (n - 1) == 0, f"hadamard dim must be a power of 2, got {n}"
    orig_shape = x.shape
    h = 1
    xf = x.astype(jnp.float32).reshape(-1, n)
    while h < n:
        xf = xf.reshape(-1, n // (2 * h), 2, h)
        a = xf[:, :, 0, :]
        b = xf[:, :, 1, :]
        xf = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    return (xf.reshape(orig_shape) * scale).astype(x.dtype)
