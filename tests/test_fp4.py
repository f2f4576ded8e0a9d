"""NVFP4 quant + GEMM tests (oracle: explicit e2m1 dequant in numpy —
the reference pattern from test_fp4_quantize.py / test_cutlass_fp4_gemm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.gemm.blockwise_fp8 import fp8_blockwise_scaled_grouped_mm
from sgl_kernel_tpu.ops.gemm.fp4 import (
    FP4_GROUP,
    fp4_group_mm,
    fp4_scaled_mm,
    scaled_fp4_experts_quant,
    scaled_fp4_quant,
)

E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)


def np_dequant_fp4(packed, scales, global_scale):
    packed = np.asarray(packed)
    lo, hi = packed & 0xF, packed >> 4
    codes = np.stack([lo, hi], -1).reshape(*packed.shape[:-1], -1)
    vals = E2M1[codes & 7] * np.where(codes >> 3, -1.0, 1.0)
    sf = np.asarray(scales, np.float32) / global_scale
    g = vals.reshape(*vals.shape[:-1], -1, FP4_GROUP) * sf[..., None]
    return g.reshape(vals.shape)


class TestFp4Quant:
    def test_roundtrip_error_bounded(self, rng):
        x = rng.standard_normal((8, 64)).astype(np.float32)
        gs = np.float32(1.0)
        packed, scales = scaled_fp4_quant(jnp.asarray(x), jnp.float32(gs))
        assert packed.shape == (8, 32) and packed.dtype == jnp.uint8
        assert scales.shape == (8, 4) and scales.dtype == jnp.float8_e4m3fn
        deq = np_dequant_fp4(packed, scales, gs)
        # worst half-step between e2m1 codes (4 -> 6) is 1.0 * scale; the
        # fp8-e4m3 scale itself rounds up by at most ~7%
        err = np.abs(deq - x)
        groups = x.reshape(8, 4, FP4_GROUP)
        amax = np.abs(groups).max(-1, keepdims=True)
        tol = np.broadcast_to(amax / 6.0 * 1.15, groups.shape).reshape(8, 64)
        assert np.all(err <= tol + 1e-6)

    def test_experts_quant_uses_per_expert_scale(self, rng):
        x = rng.standard_normal((6, 32)).astype(np.float32)
        gscales = jnp.asarray([1.0, 4.0], jnp.float32)
        offs = jnp.asarray([0, 4, 6], jnp.int32)
        packed, scales = scaled_fp4_experts_quant(jnp.asarray(x), gscales, offs)
        d0 = np_dequant_fp4(packed[:4], scales[:4], 1.0)
        d1 = np_dequant_fp4(packed[4:], scales[4:], 4.0)
        np.testing.assert_allclose(d0, x[:4], atol=np.abs(x[:4]).max() * 0.35)
        np.testing.assert_allclose(d1, x[4:], atol=np.abs(x[4:]).max() * 0.35)


class TestFp4Gemm:
    def test_scaled_mm_matches_dequant_oracle(self, rng):
        m, n, k = 16, 32, 64
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((n, k)).astype(np.float32)
        ga, gb = np.float32(1.0), np.float32(1.0)
        ap, sa = scaled_fp4_quant(jnp.asarray(a), jnp.float32(ga))
        bp, sb = scaled_fp4_quant(jnp.asarray(b), jnp.float32(gb))
        out = fp4_scaled_mm(ap, bp, sa, sb, jnp.float32(1.0 / (ga * gb)), out_dtype=jnp.float32)
        ref = np_dequant_fp4(ap, sa, ga) @ np_dequant_fp4(bp, sb, gb).T / (ga * gb)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=0.03, atol=0.05 * np.abs(ref).max())

    def test_group_mm(self, rng):
        e, m, n, k = 2, 8, 16, 32
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((e, n, k)).astype(np.float32)
        gsizes = jnp.asarray([5, 3], jnp.int32)
        ap, sa = scaled_fp4_quant(jnp.asarray(a), jnp.float32(1.0))
        bp, sb = scaled_fp4_quant(jnp.asarray(b), jnp.float32(1.0))
        alphas = jnp.asarray([1.0, 1.0], jnp.float32)
        out = fp4_group_mm(ap, bp, sa, sb, alphas, gsizes, out_dtype=jnp.float32)
        ad = np_dequant_fp4(ap, sa, 1.0)
        bd = np_dequant_fp4(bp, sb, 1.0)
        ref = np.concatenate([ad[:5] @ bd[0].T, ad[5:] @ bd[1].T])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=0.02, atol=0.05 * np.abs(ref).max())


class TestBlockwiseGroupedFp8:
    def test_matches_dense_per_expert(self, rng):
        e, k, n, bm = 3, 256, 256, 8
        m = 4 * bm  # blocks: experts 0,0,1,2
        eids = jnp.asarray([0, 0, 1, 2], jnp.int32)
        a = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
        b = (rng.standard_normal((e, k, n)) * 0.5).astype(np.float32)
        a8 = jnp.asarray(a, jnp.float8_e4m3fn)
        b8 = jnp.asarray(b, jnp.float8_e4m3fn)
        sa = jnp.asarray(rng.random((m, k // 128)) + 0.5, jnp.float32)
        sb = jnp.asarray(rng.random((e, k // 128, n // 128)) + 0.5, jnp.float32)
        out = fp8_blockwise_scaled_grouped_mm(a8, b8, sa, sb, eids, out_dtype=jnp.float32, bm=bm)
        af = np.asarray(a8, np.float32)
        bf = np.asarray(b8, np.float32)
        ref = np.zeros((m, n), np.float32)
        for blk, eid in enumerate(np.asarray(eids)):
            rows = slice(blk * bm, (blk + 1) * bm)
            for kk in range(k // 128):
                part = af[rows, kk * 128 : (kk + 1) * 128] @ bf[eid, kk * 128 : (kk + 1) * 128]
                for j in range(n // 128):
                    ref[rows, j * 128 : (j + 1) * 128] += (
                        part[:, j * 128 : (j + 1) * 128]
                        * np.asarray(sa)[rows, kk : kk + 1]
                        * np.asarray(sb)[eid, kk, j]
                    )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())
