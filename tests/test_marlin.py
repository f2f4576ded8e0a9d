"""Marlin checkpoint ingestion (reference tests/test_marlin_repack.py,
inverted: Marlin format -> TPU packed-W4 layout). The test-side packer
reimplements the vLLM Marlin format (marlin_permute_weights + pack,
marlin_permute_scales) independently of the library's inverse."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.gemm.w4a16 import pack_w4_tpu, w4a16_gemm
from sgl_kernel_tpu.ops.quant.marlin import (
    _scale_perms,
    _weight_perm,
    gptq_marlin_to_tpu_layout,
    marlin_unpack,
)

TILE = 16


def marlin_pack_ref(q_w: np.ndarray, num_bits: int = 4) -> np.ndarray:
    """vLLM marlin_weights, in numpy: [K, N] codes -> int32 [K/16, N*16/8]."""
    size_k, size_n = q_w.shape
    w = q_w.reshape(size_k // TILE, TILE, size_n // TILE, TILE)
    w = w.transpose(0, 2, 1, 3).reshape(size_k // TILE, size_n * TILE)
    perm = np.asarray(_weight_perm(num_bits))
    w = w.reshape(-1, perm.size)[:, perm].reshape(w.shape)
    pack = 32 // num_bits
    out = np.zeros((w.shape[0], w.shape[1] // pack), np.uint32)
    for i in range(pack):
        out |= w[:, i::pack].astype(np.uint32) << (num_bits * i)
    return out.astype(np.int32)


def marlin_permute_scales_ref(s: np.ndarray, size_k: int, group_size: int) -> np.ndarray:
    sp, sps = _scale_perms()
    perm = sp if (group_size < size_k and group_size != -1) else sps
    size_n = s.shape[1]
    return s.reshape(-1, perm.size)[:, perm].reshape(-1, size_n)


@pytest.mark.parametrize("size_k,size_n", [(128, 64), (256, 256), (128, 2048)])
def test_unpack_roundtrip(rng, size_k, size_n):
    codes = rng.integers(0, 16, (size_k, size_n)).astype(np.uint8)
    packed = marlin_pack_ref(codes)
    got = np.asarray(marlin_unpack(jnp.asarray(packed), size_k=size_k, size_n=size_n))
    np.testing.assert_array_equal(got, codes)


@pytest.mark.parametrize("group_size", [64, 128])
def test_gptq_marlin_to_tpu_layout_matches_direct_pack(rng, group_size):
    size_k, size_n = 256, 128
    codes = rng.integers(0, 16, (size_k, size_n)).astype(np.uint8)
    s = (rng.random((size_k // group_size, size_n)) * 0.1).astype(np.float32)
    qw = marlin_pack_ref(codes)
    sm = marlin_permute_scales_ref(s, size_k, group_size)
    packed, s_out, zeros = gptq_marlin_to_tpu_layout(
        jnp.asarray(qw), jnp.asarray(sm), group_size=group_size
    )
    assert zeros is None
    # scales are stored bf16 (canonical layout, w4a16.py module docstring)
    np.testing.assert_allclose(np.asarray(s_out, np.float32), s, rtol=4e-3)
    direct = pack_w4_tpu(jnp.asarray(((codes.astype(np.int32) - 8) & 0xF).astype(np.uint8)))
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(direct))


def test_gemm_on_marlin_checkpoint(rng):
    """End-to-end numerics: a float weight quantized to GPTQ-sym codes,
    serialized Marlin-style, ingested, and run through w4a16_gemm must
    match the fp64 dequant oracle."""
    size_k, size_n, g = 256, 256, 128
    w = rng.standard_normal((size_k, size_n)).astype(np.float32) * 0.05
    wg = w.reshape(size_k // g, g, size_n)
    scale = np.abs(wg).max(axis=1) / 7.0 + 1e-9  # [K/G, N]
    codes = np.clip(np.rint(wg / scale[:, None]), -8, 7)
    codes_u = (codes + 8).astype(np.uint8).reshape(size_k, size_n)  # zp=8 storage
    wdq = ((codes) * scale[:, None]).reshape(size_k, size_n)

    qw = marlin_pack_ref(codes_u)
    sm = marlin_permute_scales_ref(scale.astype(np.float32), size_k, g)
    packed, s_out, _ = gptq_marlin_to_tpu_layout(jnp.asarray(qw), jnp.asarray(sm), group_size=g)

    a = rng.standard_normal((16, size_k)).astype(np.float32)
    out = w4a16_gemm(jnp.asarray(a, jnp.bfloat16), packed, s_out, group_size=g)
    ref = a.astype(np.float64) @ wdq.astype(np.float64)
    rel = np.abs(np.asarray(out, np.float64) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel
