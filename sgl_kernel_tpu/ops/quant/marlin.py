"""Marlin checkpoint ingestion.

The reference ships GPU Marlin repack entry points (`gptq_marlin_repack` /
`awq_marlin_repack`, exercised by tests/test_marlin_repack.py — the kernels
repack GPTQ/AWQ layouts INTO Marlin's ldmatrix-tiled layout for Ampere
tensor cores). On TPU the Marlin tile layout has no meaning; the parity
surface is the inverse direction: ingest an existing Marlin-format
checkpoint into this package's packed W4 layout (K-paired nibbles,
ops/gemm/w4a16.pack_w4_tpu) so Marlin-serialized models run on the TPU
kernels.

Format definition (vLLM marlin_utils, the format Marlin checkpoints use):
- weights are 16x16-tiled: [K, N] -> [K/16, N*16], then each row chunk of
  1024 values is permuted by the thread-interleave table below, then 8
  consecutive 4-bit codes pack little-endian into one int32 ->
  qweight [K/16, N*16/8].
- grouped scales [K/G, N] are permuted along N in chunks of 64
  (channelwise: chunks of 32 with a different table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gemm.w4a16 import pack_w4_tpu

MARLIN_TILE = 16


@functools.lru_cache(maxsize=None)
def _weight_perm(num_bits: int = 4) -> np.ndarray:
    """The Marlin thread-interleave permutation over 1024-value chunks
    (vLLM marlin_utils_test.get_weight_perm)."""
    perm_list = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (
                2 * (i % 4),
                2 * (i % 4) + 1,
                2 * (i % 4 + 4),
                2 * (i % 4 + 4) + 1,
            ):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm_list.extend(p + 256 * j for p in perm1)
    perm = np.array(perm_list, np.int64)
    if num_bits == 4:
        interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    elif num_bits == 8:
        interleave = np.array([0, 2, 1, 3])
    else:
        raise ValueError(f"num_bits must be 4 or 8, got {num_bits}")
    return perm.reshape((-1, len(interleave)))[:, interleave].ravel()


@functools.lru_cache(maxsize=None)
def _scale_perms():
    scale_perm = []
    for i in range(8):
        scale_perm.extend(i + 8 * j for j in range(8))
    scale_perm_single = []
    for i in range(4):
        scale_perm_single.extend(2 * i + j for j in (0, 1, 8, 9, 16, 17, 24, 25))
    return np.array(scale_perm), np.array(scale_perm_single)


def _inv(perm: np.ndarray) -> np.ndarray:
    return np.argsort(perm)


@functools.partial(jax.jit, static_argnames=("size_k", "size_n", "num_bits"))
def marlin_unpack(qweight, *, size_k: int, size_n: int, num_bits: int = 4):
    """Marlin qweight int32 [K/16, N*16/pack] -> logical codes uint8 [K, N]
    (0..2^bits-1, zero-point NOT removed)."""
    pack = 32 // num_bits
    assert qweight.shape == (size_k // MARLIN_TILE, size_n * MARLIN_TILE // pack), qweight.shape
    q = qweight.astype(jnp.uint32)
    shifts = jnp.arange(pack, dtype=jnp.uint32) * num_bits
    codes = (q[..., None] >> shifts) & ((1 << num_bits) - 1)  # [K/16, N*16/p, p]
    codes = codes.reshape(size_k // MARLIN_TILE, size_n * MARLIN_TILE)
    inv = jnp.asarray(_inv(_weight_perm(num_bits)))
    codes = codes.reshape(-1, inv.shape[0])[:, inv].reshape(
        size_k // MARLIN_TILE, size_n * MARLIN_TILE
    )
    # untile: [K/16, N/16, 16, 16] -> [K, N]
    codes = codes.reshape(size_k // MARLIN_TILE, size_n // MARLIN_TILE, MARLIN_TILE, MARLIN_TILE)
    codes = jnp.transpose(codes, (0, 2, 1, 3)).reshape(size_k, size_n)
    return codes.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size_k", "size_n", "group_size"))
def marlin_unpermute_scales(scales, *, size_k: int, size_n: int, group_size: int):
    """Invert marlin_permute_scales: marlin scale tensor -> [K/G, N]."""
    sp, sps = _scale_perms()
    perm = sp if (group_size < size_k and group_size != -1) else sps
    s = scales.reshape(-1, perm.shape[0])[:, jnp.asarray(_inv(perm))]
    return s.reshape(-1, size_n)


@functools.partial(jax.jit, static_argnames=("group_size", "num_bits"))
def gptq_marlin_to_tpu_layout(qweight, scales, g_idx=None, *, group_size: int = 128, num_bits: int = 4):
    """Convert a GPTQ-Marlin checkpoint (qweight int32 [K/16, N*2] for
    4-bit, scales [K/G * N / 64-chunked marlin order]) into the kernel
    layout (packed uint8 [K//2, N], scales f32 [K//G, N], zeros None).

    GPTQ-Marlin is symmetric with implicit zero-point 8, which maps exactly
    onto the kernel's signed-nibble decode (reference parity surface:
    gptq_marlin_repack, tests/test_marlin_repack.py:84-140 — inverted for
    TPU ingestion, see module docstring).

    desc_act (act-order) checkpoints: Marlin repack pre-sorts the K rows
    by g_idx, so the unpacked codes here are already group-contiguous —
    pass the checkpoint's ``g_idx`` to ALSO receive the activation
    permutation ``perm = argsort(g_idx)`` that callers must apply to the
    activation channels (``a[:, perm]``), the gptq_to_tpu_layout
    contract. Omitting g_idx for an act-order checkpoint silently
    mis-orders K against the activations — returns a 4-tuple whenever
    g_idx is given.

    num_bits=8 (reference tests/test_marlin_gemm.py covers both widths):
    the TPU W4 packing has no 8-bit form, so the weight lands as plain
    int8 [K, N] (codes - 128, symmetric) with the same [K/G, N] scales —
    run it through ``marlin_w8a16_gemm`` (channelwise scales also feed
    ``int8_scaled_mm`` directly)."""
    if num_bits == 8:
        size_k = qweight.shape[0] * MARLIN_TILE
        size_n = qweight.shape[1] * (32 // num_bits) // MARLIN_TILE
        codes = marlin_unpack(qweight, size_k=size_k, size_n=size_n, num_bits=8)
        w_i8 = (codes.astype(jnp.int32) - 128).astype(jnp.int8)  # [K, N]
        g = size_k if group_size == -1 else group_size
        s = marlin_unpermute_scales(
            scales.astype(jnp.float32), size_k=size_k, size_n=size_n, group_size=group_size
        )
        assert s.shape == (size_k // g, size_n), s.shape
        if g_idx is not None:
            perm = jnp.argsort(g_idx.astype(jnp.int32), stable=True)
            return w_i8, s, None, perm
        return w_i8, s, None
    pack = 32 // num_bits
    size_k = qweight.shape[0] * MARLIN_TILE
    size_n = qweight.shape[1] * pack // MARLIN_TILE
    codes = marlin_unpack(qweight, size_k=size_k, size_n=size_n, num_bits=num_bits)
    codes_signed = ((codes.astype(jnp.int32) - 8) & 0xF).astype(jnp.uint8)
    packed = pack_w4_tpu(codes_signed)  # [K//2, N]
    g = size_k if group_size == -1 else group_size
    s = marlin_unpermute_scales(
        scales.astype(jnp.float32), size_k=size_k, size_n=size_n, group_size=group_size
    )
    assert s.shape == (size_k // g, size_n), s.shape
    if g_idx is not None:
        perm = jnp.argsort(g_idx.astype(jnp.int32), stable=True)
        return packed, s.astype(jnp.bfloat16), None, perm
    return packed, s.astype(jnp.bfloat16), None


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def marlin_w8a16_gemm(a, w_i8, scales, out_dtype=None):
    """Weight-only int8 GEMM for 8-bit Marlin checkpoints: a [M, K] float,
    w_i8 [K, N] int8 (symmetric codes), scales [K/G, N] f32. Per-group
    partial dots with output-side scaling (the w4a16 kernel's scheme, in
    XLA — ingestion parity path, not a tuned hot kernel)."""
    m, k = a.shape
    ng, n = scales.shape
    g = k // ng
    af = a.astype(jnp.float32).reshape(m, ng, g)
    wf = w_i8.astype(jnp.float32).reshape(ng, g, n)
    parts = jnp.einsum("mck,ckn->mcn", af, wf,
                       preferred_element_type=jnp.float32)
    out = jnp.sum(parts * scales.astype(jnp.float32)[None], axis=1)
    return out.astype(out_dtype or a.dtype)
