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


class TestMarlin8Bit:
    def test_unpack_roundtrip_8bit(self, rng):
        size_k, size_n = 128, 128
        codes = rng.integers(0, 256, (size_k, size_n)).astype(np.uint8)
        packed = marlin_pack_ref(codes, num_bits=8)
        got = np.asarray(marlin_unpack(jnp.asarray(packed), size_k=size_k,
                                       size_n=size_n, num_bits=8))
        np.testing.assert_array_equal(got, codes)

    @pytest.mark.parametrize("group_size", [64, -1])
    def test_gemm_8bit_matches_fp64_oracle(self, rng, group_size):
        """8-bit Marlin checkpoint -> int8 [K, N] + scales, run through
        marlin_w8a16_gemm vs the fp64 dequant oracle (reference
        tests/test_marlin_gemm.py covers 8-bit)."""
        from sgl_kernel_tpu.ops.quant.marlin import marlin_w8a16_gemm

        size_k, size_n = 128, 128
        g = size_k if group_size == -1 else group_size
        w = rng.standard_normal((size_k, size_n)).astype(np.float32) * 0.05
        wg = w.reshape(size_k // g, g, size_n)
        scale = np.abs(wg).max(axis=1) / 127.0 + 1e-9
        codes = np.clip(np.rint(wg / scale[:, None]), -128, 127)
        codes_u = (codes + 128).astype(np.uint8).reshape(size_k, size_n)
        wdq = (codes * scale[:, None]).reshape(size_k, size_n).astype(np.float64)

        qw = marlin_pack_ref(codes_u, num_bits=8)
        sm = marlin_permute_scales_ref(scale.astype(np.float32), size_k, group_size)
        w_i8, s_out, zeros = gptq_marlin_to_tpu_layout(
            jnp.asarray(qw), jnp.asarray(sm), group_size=group_size, num_bits=8)
        assert zeros is None and w_i8.dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(w_i8, np.int32), codes.reshape(size_k, size_n).astype(np.int32))
        np.testing.assert_allclose(np.asarray(s_out), scale, rtol=1e-6)

        a = rng.standard_normal((8, size_k)).astype(np.float32) * 0.1
        ref = a.astype(np.float64) @ wdq
        got = np.asarray(marlin_w8a16_gemm(jnp.asarray(a, jnp.bfloat16), w_i8, s_out),
                         np.float32)
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)

    def test_gemm_8bit_act_order(self, rng):
        """g_idx path: the returned activation perm restores numerics."""
        from sgl_kernel_tpu.ops.quant.marlin import marlin_w8a16_gemm

        size_k, size_n, g = 128, 64, 32
        w = rng.standard_normal((size_k, size_n)).astype(np.float32) * 0.05
        g_idx_sorted = np.repeat(np.arange(size_k // g), g).astype(np.int32)
        # marlin rows are sorted by stable argsort(g_idx): within a group
        # the original indices appear ascending — build kperm accordingly
        kperm = np.sort(rng.permutation(size_k).reshape(size_k // g, g), axis=1).reshape(-1)
        g_idx = np.empty(size_k, np.int32)
        g_idx[kperm] = g_idx_sorted  # g_idx in ORIGINAL activation order
        w_sorted = w[kperm]  # marlin stores rows pre-sorted by group
        wg = w_sorted.reshape(size_k // g, g, size_n)
        scale = np.abs(wg).max(axis=1) / 127.0 + 1e-9
        codes = np.clip(np.rint(wg / scale[:, None]), -128, 127)
        codes_u = (codes + 128).astype(np.uint8).reshape(size_k, size_n)
        wdq_sorted = (codes * scale[:, None]).reshape(size_k, size_n).astype(np.float64)

        qw = marlin_pack_ref(codes_u, num_bits=8)
        sm = marlin_permute_scales_ref(scale.astype(np.float32), size_k, g)
        w_i8, s_out, _, perm = gptq_marlin_to_tpu_layout(
            jnp.asarray(qw), jnp.asarray(sm), jnp.asarray(g_idx),
            group_size=g, num_bits=8)
        a = rng.standard_normal((4, size_k)).astype(np.float32) * 0.1
        ref = a.astype(np.float64)[:, kperm] @ wdq_sorted
        got = np.asarray(marlin_w8a16_gemm(
            jnp.asarray(a, jnp.bfloat16)[:, perm], w_i8, s_out), np.float32)
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-3)
