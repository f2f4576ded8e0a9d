"""Quantization op tests.

Oracle pattern follows the reference test strategy (SURVEY.md §4): pure
numpy/jnp fp32 references built inline, per-op tolerances matching the
reference tests (test_per_token_group_quant_8bit.py: scales exact-or-1e-3
with dequant round-trip; test_awq_dequant.py: rtol=1e-3/atol=1e-5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import quant
from sgl_kernel_tpu.ops.quant import formats


def ref_silu(x):
    return x / (1.0 + np.exp(-x))


class TestFormats:
    def test_e2m1_roundtrip_exact_values(self):
        vals = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.5, -6.0], np.float32)
        codes = quant.e2m1_encode(jnp.asarray(vals))
        out = quant.e2m1_decode(codes)
        np.testing.assert_array_equal(np.asarray(out), vals)

    def test_e2m1_round_ties_to_even(self):
        # Midpoint table from the reference kernel (per_token_group_quant_fp4.cpp:70-79)
        mids = np.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0], np.float32)
        want = np.array([0.0, 1.0, 1.0, 2.0, 2.0, 4.0, 4.0], np.float32)
        out = quant.e2m1_decode(quant.e2m1_encode(jnp.asarray(mids)))
        np.testing.assert_array_equal(np.asarray(out), want)
        out_neg = quant.e2m1_decode(quant.e2m1_encode(jnp.asarray(-mids)))
        np.testing.assert_array_equal(np.asarray(out_neg), -want)

    def test_int4_pack_roundtrip(self, rng):
        codes = rng.integers(0, 16, size=(4, 64)).astype(np.uint8)
        packed = quant.pack_int4(jnp.asarray(codes))
        assert packed.shape == (4, 32)
        out = quant.unpack_int4(packed)
        np.testing.assert_array_equal(np.asarray(out), codes)

    def test_awq_pack_roundtrip(self, rng):
        codes = rng.integers(0, 16, size=(8, 64)).astype(np.uint8)
        packed = formats.awq_pack_int32(jnp.asarray(codes))
        assert packed.shape == (8, 8) and packed.dtype == jnp.int32
        out = formats.awq_unpack_int32(packed)
        np.testing.assert_array_equal(np.asarray(out), codes)

    def test_awq_unpack_matches_reference_order(self):
        # One word packing nibbles 0..7 in storage order; logical order must be
        # the AWQ interleave [0,4,1,5,2,6,3,7].
        word = np.uint32(0)
        for i, v in enumerate(range(8)):
            word |= np.uint32(v) << np.uint32(4 * i)
        out = formats.awq_unpack_int32(jnp.asarray([[word.astype(np.int32)]]))
        np.testing.assert_array_equal(np.asarray(out)[0], np.array([0, 4, 1, 5, 2, 6, 3, 7], np.uint8))

    def test_ue8m0(self):
        sbyte, sval = formats.ue8m0_encode_from_amax(jnp.asarray([6.0, 1.0, 0.124]))
        # floor(log2(amax)) - 2: 6.0 -> 2^0, 1.0 -> 2^-2, 0.124 -> 2^-6
        np.testing.assert_array_equal(np.asarray(sval), [1.0, 2.0**-2, 2.0**-6])
        np.testing.assert_array_equal(np.asarray(formats.ue8m0_decode(sbyte)), np.asarray(sval))


class TestPerTensorPerToken:
    @pytest.mark.parametrize("dtype", [quant.FP8_E4M3, quant.FP8_E5M2])
    def test_per_tensor_dynamic(self, rng, dtype):
        x = rng.standard_normal((64, 256)).astype(np.float32) * 3
        q, s = quant.per_tensor_quant_fp8(jnp.asarray(x), dtype=dtype)
        fmax = float(jnp.finfo(dtype).max)
        assert abs(float(s[0]) - np.abs(x).max() / fmax) < 1e-6
        deq = np.asarray(q, np.float32) * float(s[0])
        # fp8 e4m3 has ~2 mantissa bits -> relative error <= 2^-3 per element
        np.testing.assert_allclose(deq, x, rtol=0.14 if dtype == quant.FP8_E4M3 else 0.3, atol=float(s[0]))

    def test_per_tensor_static(self, rng):
        x = rng.standard_normal((8, 32)).astype(np.float32)
        q, s = quant.per_tensor_quant_fp8(jnp.asarray(x), scale=0.25)
        assert float(s[0]) == 0.25
        deq = np.asarray(q, np.float32) * 0.25
        np.testing.assert_allclose(deq, np.clip(x, -448 * 0.25, 448 * 0.25), rtol=0.14, atol=0.3 * 0.25)

    def test_per_token(self, rng):
        x = rng.standard_normal((16, 128)).astype(np.float32) * 5
        q, s = quant.per_token_quant_fp8(jnp.asarray(x))
        assert s.shape == (16, 1)
        want = np.abs(x).max(axis=-1, keepdims=True) / 448.0
        np.testing.assert_allclose(np.asarray(s), want, rtol=1e-6)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        np.testing.assert_allclose(deq, x, rtol=0.14, atol=np.abs(x).max() / 448)


class TestPerTokenGroup8bit:
    @pytest.mark.parametrize("group_size", [32, 64, 128])
    @pytest.mark.parametrize("scale_ue8m0", [False, True])
    def test_fp8_scales_and_roundtrip(self, rng, group_size, scale_ue8m0):
        m, k = 32, 512
        x = (rng.standard_normal((m, k)) * 4).astype(np.float32)
        q, s = quant.per_token_group_quant_8bit(
            jnp.asarray(x), group_size=group_size, scale_ue8m0=scale_ue8m0
        )
        assert q.shape == (m, k) and s.shape == (m, k // group_size)
        g = x.reshape(m, k // group_size, group_size)
        ref_scale = np.maximum(np.abs(g).max(-1), 1e-10) / 448.0
        if scale_ue8m0:
            assert s.dtype == jnp.uint8
            e = np.ceil(np.log2(np.maximum(ref_scale, 1e-10)))
            np.testing.assert_array_equal(np.asarray(s, np.int32), e.astype(np.int32) + 127)
            sval = np.exp2(e)
        else:
            np.testing.assert_allclose(np.asarray(s), ref_scale, rtol=1e-3)
            sval = np.asarray(s)
        deq = np.asarray(q, np.float32).reshape(g.shape) * sval[..., None]
        assert np.all(np.abs(deq - g) <= 0.14 * np.abs(g) + sval[..., None] * 1.0)

    def test_int8(self, rng):
        m, k, gs = 8, 256, 64
        x = (rng.standard_normal((m, k)) * 2).astype(np.float32)
        q, s = quant.per_token_group_quant_8bit(jnp.asarray(x), group_size=gs, dtype=jnp.int8)
        assert q.dtype == jnp.int8
        g = x.reshape(m, k // gs, gs)
        ref_scale = np.maximum(np.abs(g).max(-1), 1e-10) / 127.0
        np.testing.assert_allclose(np.asarray(s), ref_scale, rtol=1e-3)
        deq = np.asarray(q, np.float32).reshape(g.shape) * ref_scale[..., None]
        np.testing.assert_allclose(deq, g, atol=ref_scale.max() * 0.51)

    def test_fused_silu_and_mul(self, rng):
        m, k, gs = 8, 128, 32
        x = rng.standard_normal((m, 2 * k)).astype(np.float32)
        q, s = quant.per_token_group_quant_8bit(jnp.asarray(x), group_size=gs, fuse_silu_and_mul=True)
        ref = ref_silu(x[:, :k]) * x[:, k:]
        deq = np.asarray(q, np.float32) * np.repeat(np.asarray(s), gs, axis=-1)
        np.testing.assert_allclose(deq, ref, rtol=0.14, atol=np.abs(ref).max() / 448 + 1e-6)

    def test_masked_m(self, rng):
        e, m, k, gs = 4, 16, 128, 32
        x = rng.standard_normal((e, m, k)).astype(np.float32)
        masked_m = jnp.asarray([16, 3, 0, 9], jnp.int32)
        q, s = quant.per_token_group_quant_8bit(jnp.asarray(x), group_size=gs, masked_m=masked_m)
        qn = np.asarray(q, np.float32)
        sn = np.asarray(s)
        for ei, mm in enumerate([16, 3, 0, 9]):
            assert np.all(qn[ei, mm:] == 0)
            assert np.all(sn[ei, mm:] == 0)
            if mm:
                assert np.any(qn[ei, :mm] != 0)


class TestMxfp4:
    def test_roundtrip(self, rng):
        m, k = 16, 256
        x = (rng.standard_normal((m, k)) * 3).astype(np.float32)
        q, s = quant.per_token_group_quant_fp4(jnp.asarray(x))
        assert q.shape == (m, k // 2) and q.dtype == jnp.uint8
        assert s.shape == (m, k // 32) and s.dtype == jnp.uint8
        deq = np.asarray(quant.mxfp4_dequantize(q, s))
        # e2m1 max rel error is 1/3 (between 4 and 6); amax-scaled values stay
        # within half a binade -> atol bounded by group amax / 4.
        g = x.reshape(m, k // 32, 32)
        atol = np.abs(g).max(-1, keepdims=True) / 4 + 1e-6
        assert np.all(np.abs(deq.reshape(g.shape) - g) <= atol)

    def test_scale_exponents(self):
        x = np.zeros((1, 32), np.float32)
        x[0, 0] = 6.0
        _, s = quant.per_token_group_quant_fp4(jnp.asarray(x))
        # floor(log2(6)) - 2 = 0 -> byte 127
        assert int(np.asarray(s)[0, 0]) == 127

    def test_fused_silu_mul_secondary(self, rng):
        m, k = 4, 64
        x = rng.standard_normal((m, k)).astype(np.float32)
        y = rng.standard_normal((m, k)).astype(np.float32)
        q, s = quant.per_token_group_quant_fp4(jnp.asarray(x), jnp.asarray(y))
        ref = ref_silu(x) * y
        deq = np.asarray(quant.mxfp4_dequantize(q, s))
        atol = np.abs(ref.reshape(m, -1, 32)).max(-1, keepdims=True) / 4 + 1e-6
        assert np.all(np.abs(deq.reshape(m, -1, 32) - ref.reshape(m, -1, 32)) <= atol)


class TestAwqDequant:
    @pytest.mark.parametrize("k,n,group_size", [(128, 64, 64), (256, 128, 128), (512, 32, 64)])
    def test_matches_oracle(self, rng, k, n, group_size):
        qweight = rng.integers(-(2**31), 2**31 - 1, size=(k, n // 8), dtype=np.int64).astype(np.int32)
        qzeros = rng.integers(-(2**31), 2**31 - 1, size=(k // group_size, n // 8), dtype=np.int64).astype(np.int32)
        scales = (rng.standard_normal((k // group_size, n)) * 0.1).astype(np.float32)

        out = quant.awq_dequantize(jnp.asarray(qweight), jnp.asarray(scales), jnp.asarray(qzeros), out_dtype=jnp.float32)

        # numpy oracle mirroring tests/test_awq_dequant.py:32-62
        def unpack(t):
            shifts = np.arange(0, 32, 4)
            iw = (t.astype(np.int64)[:, :, None] >> shifts[None, None, :]).astype(np.int8) & 0xF
            iw = iw.reshape(t.shape[0], -1)
            order = np.arange(iw.shape[-1]).reshape(-1, 8)[:, [0, 4, 1, 5, 2, 6, 3, 7]].reshape(-1)
            return iw[:, order]

        w = unpack(qweight).astype(np.float32)
        z = unpack(qzeros).astype(np.float32)
        ref = (w - np.repeat(z, group_size, axis=0)) * np.repeat(scales, group_size, axis=0)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-5)


class TestActivation:
    def test_silu_and_mul(self, rng):
        from sgl_kernel_tpu.ops import activation

        x = rng.standard_normal((8, 256)).astype(np.float32)
        out = activation.silu_and_mul(jnp.asarray(x))
        ref = ref_silu(x[:, :128]) * x[:, 128:]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_swiglu_alpha_limit(self, rng):
        from sgl_kernel_tpu.ops import activation

        x = (rng.standard_normal((4, 64)) * 10).astype(np.float32)
        out = activation.swiglu_alpha_limit(jnp.asarray(x), alpha=1.702, limit=7.0)
        gate = np.minimum(x[:, 0::2], 7.0)
        up = np.clip(x[:, 1::2], -7.0, 7.0)
        ref = gate / (1 + np.exp(-1.702 * gate)) * (up + 1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_silu_and_mul_clamp(self, rng):
        from sgl_kernel_tpu.ops import activation

        x = (rng.standard_normal((4, 64)) * 10).astype(np.float32)
        out = activation.silu_and_mul_clamp(jnp.asarray(x), limit=7.0)
        gate = np.clip(x[:, :32], -7.0, 7.0)
        up = np.clip(x[:, 32:], -7.0, 7.0)
        ref = ref_silu(gate) * up
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
