"""Scaled / dequant-fused GEMM tests.

Oracles are inline fp32 numpy implementations with the reference tests'
tolerances (test_int8_gemm.py, test_fp8_blockwise_gemm.py,
test_qserve_w4a8_*.py, test_moe_gemm.py bf16 1e-1/2e-2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import gemm, quant


class TestInt8ScaledMM:
    @pytest.mark.parametrize("mnk", [(32, 128, 256), (7, 512, 384), (1, 256, 128)])
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_accuracy(self, rng, mnk, with_bias):
        m, n, k = mnk
        a = rng.integers(-128, 127, (m, k)).astype(np.int8)
        b = rng.integers(-128, 127, (k, n)).astype(np.int8)
        sa = (rng.random(m) * 0.01 + 0.001).astype(np.float32)
        sb = (rng.random(n) * 0.01 + 0.001).astype(np.float32)
        bias = rng.standard_normal(n).astype(np.float32) if with_bias else None
        out = gemm.int8_scaled_mm(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(sa), jnp.asarray(sb),
            out_dtype=jnp.float32, bias=None if bias is None else jnp.asarray(bias),
        )
        ref = (a.astype(np.float32) @ b.astype(np.float32)) * sa[:, None] * sb[None, :]
        if bias is not None:
            ref = ref + bias
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


class TestFp8ScaledMM:
    def test_accuracy(self, rng):
        m, n, k = 16, 256, 512
        af = rng.standard_normal((m, k)).astype(np.float32)
        bf = rng.standard_normal((k, n)).astype(np.float32)
        aq, sa = quant.per_token_quant_fp8(jnp.asarray(af))
        bqT, sb = quant.per_token_quant_fp8(jnp.asarray(bf.T))  # per-channel of B
        out = gemm.fp8_scaled_mm(aq, bqT.T, sa[:, 0], sb[:, 0], out_dtype=jnp.float32)
        ref = af @ bf
        # fp8 e4m3 quant error ~6% relative per element
        rel = np.abs(np.asarray(out) - ref) / np.maximum(np.abs(ref), 1e-2)
        assert np.median(rel) < 0.05 and rel.mean() < 0.2

    def test_bmm_fp8(self, rng):
        b, m, n, k = 3, 8, 64, 128
        a = rng.standard_normal((b, m, k)).astype(np.float32)
        w = rng.standard_normal((b, k, n)).astype(np.float32)
        aq, sa = quant.per_tensor_quant_fp8(jnp.asarray(a))
        wq, sw = quant.per_tensor_quant_fp8(jnp.asarray(w))
        out = gemm.bmm_fp8(aq, wq, sa[0], sw[0], out_dtype=jnp.float32)
        ref = np.einsum("bmk,bkn->bmn", a, w)
        rel = np.abs(np.asarray(out) - ref) / np.maximum(np.abs(ref), 1e-1)
        assert np.median(rel) < 0.06


class TestFp8Blockwise:
    @pytest.mark.parametrize("mnk", [(16, 256, 256), (100, 128, 512), (1, 128, 128)])
    def test_accuracy(self, rng, mnk):
        m, n, k = mnk
        a = (rng.standard_normal((m, k)) * 0.1).astype(np.float32)
        b = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
        aq = np.asarray(jnp.asarray(a).astype(jnp.float8_e4m3fn))
        bq = np.asarray(jnp.asarray(b).astype(jnp.float8_e4m3fn))
        sa = (rng.random((m, k // 128)) * 0.001 + 1e-4).astype(np.float32)
        sb = (rng.random((k // 128, n // 128)) * 0.001 + 1e-4).astype(np.float32)
        out = gemm.fp8_blockwise_scaled_mm(
            jnp.asarray(aq, jnp.float8_e4m3fn), jnp.asarray(bq, jnp.float8_e4m3fn),
            jnp.asarray(sa), jnp.asarray(sb), out_dtype=jnp.float32,
        )
        # fp32 oracle mirroring tests/test_fp8_blockwise_gemm.py:23-61
        sa_full = np.repeat(sa, 128, axis=1)
        sb_full = np.repeat(np.repeat(sb, 128, axis=0), 128, axis=1)
        ref = (aq.astype(np.float32) * sa_full) @ (bq.astype(np.float32) * sb_full)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-4)

    @pytest.mark.parametrize("decode", ["pair", "v32"])
    def test_decode_policy_all_256_bytes(self, decode):
        """Pins the module's documented deviation policy for BOTH decode
        modes (blockwise_fp8.py module docstring): every normal e4m3 byte
        decodes EXACTLY (after the 2^120 rebias the scale rows carry),
        subnormals (|x| < 2^-6) are exact-or-zero, and the NaN bytes
        0x7f/0xff decode to +-480 (finite)."""
        from jax.experimental import pallas as pl
        from sgl_kernel_tpu.ops.gemm import blockwise_fp8 as bw

        dec = bw._DECODERS[decode]

        def k(x_ref, o_ref):
            o_ref[...] = dec(x_ref[...]).astype(jnp.float32) * (2.0 ** 120)

        raw = jnp.arange(256, dtype=jnp.uint8).reshape(2, 128)
        x = jax.lax.bitcast_convert_type(raw, jnp.float8_e4m3fn)
        got = np.asarray(pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            interpret=True)(x))
        want = np.asarray(x.astype(jnp.float32))
        nan = np.isnan(want)
        assert np.isfinite(got[nan]).all()
        assert (np.abs(got[nan]) == 480.0).all()
        denorm = (np.abs(want) > 0) & (np.abs(want) < 2.0 ** -6)
        ok = ~nan & ~denorm
        np.testing.assert_array_equal(got[ok], want[ok])
        d, w = got[denorm], want[denorm]
        assert ((d == w) | (d == 0)).all()

    def test_production_scaled_accuracy(self, rng):
        """Per-128-block amax-quantized data (the production layout, no
        subnormal-heavy inputs): kernel matches the exact-fp8 oracle to
        bf16-dot tolerance."""
        m, n, k = 64, 256, 512
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        # 1x128 activation scales, 128x128 weight scales (amax -> 448)
        sa = np.abs(a).reshape(m, k // 128, 128).max(-1) / 448.0
        aq = np.asarray(jnp.asarray(a / np.repeat(sa, 128, 1)).astype(jnp.float8_e4m3fn))
        sb = b.reshape(k // 128, 128, n // 128, 128)
        sb = np.abs(sb).max(axis=(1, 3)) / 448.0
        sb_full = np.repeat(np.repeat(sb, 128, axis=0), 128, axis=1)
        bq = np.asarray(jnp.asarray(b / sb_full).astype(jnp.float8_e4m3fn))
        out = gemm.fp8_blockwise_scaled_mm(
            jnp.asarray(aq, jnp.float8_e4m3fn), jnp.asarray(bq, jnp.float8_e4m3fn),
            jnp.asarray(sa.astype(np.float32)), jnp.asarray(sb.astype(np.float32)),
            out_dtype=jnp.float32,
        )
        ref = (aq.astype(np.float32) * np.repeat(sa, 128, 1)) @ (
            bq.astype(np.float32) * sb_full)
        # the kernel folds sa into bf16 activations before the dot:
        # 2^-9-relative rounding on top of the f32 oracle
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-2, atol=3e-2 * np.abs(ref).std())

    @pytest.mark.parametrize("gmode", ["inner", "inner2", "inner4", "prescale"])
    def test_gmode_variants_vs_oracle(self, rng, gmode):
        """Every gmode matches the exact-fp8 oracle on PRODUCTION-scaled
        data (per-128-block amax quantization). The amax layout matters
        for the inner modes: their MXU products carry the 2^-120 weight
        bias, so weight codes must spread toward +-448 to keep products
        f32-normal (see blockwise_fp8.py numerics note) — amax scaling
        guarantees that; prescale dots at true scale and has no such
        constraint (but rounds w*sb to bf16 BEFORE the dot)."""
        m, n, k = 32, 256, 512
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        sa = np.abs(a).reshape(m, k // 128, 128).max(-1) / 448.0
        aq = np.asarray(jnp.asarray(a / np.repeat(sa, 128, 1)).astype(jnp.float8_e4m3fn))
        sbb = b.reshape(k // 128, 128, n // 128, 128)
        sb = np.abs(sbb).max(axis=(1, 3)) / 448.0
        sb_full = np.repeat(np.repeat(sb, 128, axis=0), 128, axis=1)
        bq = np.asarray(jnp.asarray(b / sb_full).astype(jnp.float8_e4m3fn))
        got = np.asarray(gemm.fp8_blockwise_scaled_mm(
            jnp.asarray(aq, jnp.float8_e4m3fn), jnp.asarray(bq, jnp.float8_e4m3fn),
            jnp.asarray(sa.astype(np.float32)), jnp.asarray(sb.astype(np.float32)),
            out_dtype=jnp.float32, gmode=gmode))
        ref = (aq.astype(np.float32) * np.repeat(sa, 128, 1)) @ (
            bq.astype(np.float32) * sb_full)
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=3e-2 * np.abs(ref).std())

    def test_prepared_scales_match_compact(self, rng):
        from sgl_kernel_tpu.ops.gemm.blockwise_fp8 import prepare_blockwise_scales

        m, n, k = 8, 256, 256
        aq = jnp.asarray(rng.standard_normal((m, k)), jnp.float32).astype(jnp.float8_e4m3fn)
        bq = jnp.asarray(rng.standard_normal((k, n)), jnp.float32).astype(jnp.float8_e4m3fn)
        sa = jnp.asarray(rng.random((m, k // 128)).astype(np.float32))
        sb = jnp.asarray(rng.random((k // 128, n // 128)).astype(np.float32))
        o1 = gemm.fp8_blockwise_scaled_mm(aq, bq, sa, sb, out_dtype=jnp.float32)
        o2 = gemm.fp8_blockwise_scaled_mm(
            aq, bq, sa, prepare_blockwise_scales(sb), out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestW4A16:
    @pytest.mark.parametrize("mnk", [(16, 256, 512), (1, 512, 1024), (200, 256, 512)])
    @pytest.mark.parametrize("group_size", [64, 128])
    def test_int4_symmetric(self, rng, mnk, group_size):
        m, n, k = mnk
        a = rng.standard_normal((m, k)).astype(np.float32)
        wf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        codes, scales, _ = gemm.quantize_w4(jnp.asarray(wf), group_size=group_size)
        wd = np.asarray(gemm.dequant_w4(codes, scales, group_size=group_size, dtype=jnp.float32))
        out = gemm.w4a16_gemm(
            jnp.asarray(a, jnp.bfloat16), codes, scales, group_size=group_size, out_dtype=jnp.float32
        )
        ref = a @ wd.T
        # bf16 activations + f32 accum: reference MoE bf16 tolerance 1e-1/2e-2
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1 * np.abs(ref).std() + 1e-2)

    def test_int4_asymmetric_zeros(self, rng):
        m, n, k, g = 8, 256, 512, 128
        a = rng.standard_normal((m, k)).astype(np.float32)
        wf = (rng.standard_normal((n, k)) * 0.05 + 0.02).astype(np.float32)
        codes, scales, zeros = gemm.quantize_w4(jnp.asarray(wf), group_size=g, symmetric=False)
        wd = np.asarray(gemm.dequant_w4(codes, scales, zeros, group_size=g, dtype=jnp.float32))
        out = gemm.w4a16_gemm(
            jnp.asarray(a, jnp.bfloat16), codes, scales, zeros, group_size=g, out_dtype=jnp.float32
        )
        ref = a @ wd.T
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1 * np.abs(ref).std() + 1e-2)
        # quantization itself must be faithful
        np.testing.assert_allclose(wd, wf, atol=np.abs(wf).max() / 14)

    def test_mxfp4(self, rng):
        m, n, k = 8, 256, 512
        a = rng.standard_normal((m, k)).astype(np.float32)
        wf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        q, s = quant.per_token_group_quant_fp4(jnp.asarray(wf))
        codes, sbytes = gemm.mxfp4_to_tpu_layout(q, s)
        wd = np.asarray(gemm.dequant_w4(codes, sbytes, fmt="mxfp4", group_size=32, dtype=jnp.float32))
        np.testing.assert_allclose(wd, np.asarray(quant.mxfp4_dequantize(q, s)), atol=1e-6)
        out = gemm.w4a16_gemm(
            jnp.asarray(a, jnp.bfloat16), codes, sbytes, group_size=32, fmt="mxfp4", out_dtype=jnp.float32
        )
        ref = a @ wd.T
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1 * np.abs(ref).std() + 1e-2)

    def test_bias(self, rng):
        m, n, k, g = 4, 256, 256, 128
        a = rng.standard_normal((m, k)).astype(np.float32)
        wf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        bias = rng.standard_normal(n).astype(np.float32)
        codes, scales, _ = gemm.quantize_w4(jnp.asarray(wf), group_size=g)
        wd = np.asarray(gemm.dequant_w4(codes, scales, group_size=g, dtype=jnp.float32))
        out = gemm.w4a16_gemm(
            jnp.asarray(a, jnp.bfloat16), codes, scales, bias=jnp.asarray(bias),
            group_size=g, out_dtype=jnp.float32,
        )
        ref = a @ wd.T + bias
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1 * np.abs(ref).std() + 1e-2)

    def test_awq_layout_roundtrip(self, rng):
        k, n, g = 256, 128, 128
        from sgl_kernel_tpu.ops.quant import formats

        codes_kn = rng.integers(0, 16, (k, n)).astype(np.uint8)
        zeros_gn = rng.integers(0, 16, (k // g, n)).astype(np.uint8)
        scales = (rng.random((k // g, n)) * 0.1).astype(np.float32)
        qweight = formats.awq_pack_int32(jnp.asarray(codes_kn))
        qzeros = formats.awq_pack_int32(jnp.asarray(zeros_gn))
        w, s, z = gemm.awq_to_tpu_layout(qweight, jnp.asarray(scales), qzeros)
        ref = np.asarray(quant.awq_dequantize(qweight, jnp.asarray(scales), qzeros, out_dtype=jnp.float32))
        wd = np.asarray(gemm.dequant_w4(w, s, z, group_size=g, dtype=jnp.float32))
        # scales/zeros are stored bf16 (canonical layout): c*s and z*s can
        # nearly cancel, so bound ABSOLUTELY by the bf16 rounding of the
        # terms (2^-8 * max|term|), not relatively
        atol = float(np.abs(ref).max()) * 2 ** -8
        np.testing.assert_allclose(wd, ref.T, rtol=9e-3, atol=atol)


class TestQServe:
    def _quant_act(self, a):
        s = np.abs(a).max(-1, keepdims=True) / 127.0
        q = np.clip(np.round(a / s), -128, 127).astype(np.int8)
        return q, s.astype(np.float32)

    def test_per_chn(self, rng):
        m, n, k = 16, 256, 512
        a = (rng.standard_normal((m, k)) * 0.01).astype(np.float32)
        b = (rng.standard_normal((n, k)) * 0.01).astype(np.float32)
        aq, sa = self._quant_act(a)
        bmin, bmax = b.min(-1, keepdims=True), b.max(-1, keepdims=True)
        sw = ((bmax - bmin) / 15).astype(np.float32)
        zw = -np.round(bmin / sw)
        bq = np.clip(np.round(b / sw) + zw, 0, 15).astype(np.uint8)
        out = gemm.qserve_w4a8_per_chn_gemm(
            jnp.asarray(aq), jnp.asarray(bq).astype(jnp.uint4),
            jnp.asarray(sw[:, 0]), jnp.asarray(sa[:, 0]),
            jnp.asarray((zw * sw)[:, 0]), jnp.asarray(a.sum(-1)),
            out_dtype=jnp.float32,
        )
        ref = (aq.astype(np.float32) @ (bq.astype(np.float32) - zw).T) * sa * sw[:, 0][None, :]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-2)

    def test_per_group(self, rng):
        m, n, k, g = 16, 256, 512, 128
        a = (rng.standard_normal((m, k)) * 0.01).astype(np.float32)
        b = (rng.standard_normal((n, k)) * 0.01).astype(np.float32)
        aq, sa = self._quant_act(a)
        # progressive group quant (test_qserve_w4a8_per_group_gemm.py:96-126)
        chn_scale = np.abs(b).max(-1, keepdims=True) / 119
        b_i8 = np.clip(np.round(b / chn_scale), -119, 119)
        bg = b_i8.reshape(-1, g)
        s2 = np.round((bg.max(-1, keepdims=True) - bg.min(-1, keepdims=True)) / 15)
        s2 = np.maximum(s2, 1.0)
        z2 = -np.round(bg.min(-1, keepdims=True) / s2)
        bq = np.clip(np.round(bg / s2) + z2, 0, 15).reshape(n, k).astype(np.uint8)
        s2 = s2.reshape(n, k // g).astype(np.int8)
        z2 = z2.reshape(n, k // g).astype(np.float32)
        out = gemm.qserve_w4a8_per_group_gemm(
            jnp.asarray(aq), jnp.asarray(bq).astype(jnp.uint4),
            jnp.asarray(z2 * s2), jnp.asarray(s2),
            jnp.asarray(chn_scale[:, 0].astype(np.float32)), jnp.asarray(sa[:, 0]),
            group_size=g, out_dtype=jnp.float32,
        )
        b_dq = (bq.reshape(-1, g).astype(np.float32) - z2.reshape(-1, 1)) * s2.reshape(-1, 1).astype(np.float32)
        b_dq = b_dq.reshape(n, k) * chn_scale
        ref = (aq.astype(np.float32) @ b_dq.T) * sa
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-2)


class TestGptqConvert:
    def test_gptq_layout_matches_dequant(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16 import dequant_w4, gptq_to_tpu_layout, w4a16_gemm

        k, n, g = 64, 32, 16
        codes = rng.integers(0, 16, (k, n)).astype(np.uint32)
        zeros = rng.integers(1, 15, (k // g, n)).astype(np.uint32)
        scales = (rng.random((k // g, n)) * 0.1 + 0.05).astype(np.float32)
        # ref dequant: (code - zero) * scale, group = k // g
        gid = np.arange(k) // g
        ref_w = (codes.astype(np.float32) - zeros[gid]) * scales[gid]  # [K, N]

        qweight = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qweight |= codes[i::8] << (4 * i)
        qzeros = np.zeros((k // g, n // 8), np.uint32)
        for i in range(8):
            qzeros |= (zeros[:, i::8] - 1) << (4 * i)

        packed, s, zxs, perm = gptq_to_tpu_layout(
            jnp.asarray(qweight.astype(np.int32)), jnp.asarray(qzeros.astype(np.int32)),
            jnp.asarray(scales), group_size=g,
        )
        assert perm is None
        deq = dequant_w4(packed, jnp.asarray(s), jnp.asarray(zxs), group_size=g, dtype=jnp.float32)
        # bf16-stored scales/zeros: c*s and z*s can nearly cancel — bound
        # absolutely by the bf16 rounding of the terms
        atol = float(np.abs(ref_w).max()) * 2 ** -8
        np.testing.assert_allclose(np.asarray(deq), ref_w.T, rtol=9e-3, atol=atol)

    def test_desc_act_perm_roundtrip(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16 import dequant_w4, gptq_to_tpu_layout

        k, n, g = 32, 16, 8
        codes = rng.integers(0, 16, (k, n)).astype(np.uint32)
        zeros = np.full((k // g, n), 8, np.uint32)
        scales = np.ones((k // g, n), np.float32)
        g_idx = rng.permutation(np.arange(k) // g)  # shuffled group assignment
        ref_w = codes.astype(np.float32) - zeros[g_idx]  # [K, N] in original channel order

        qweight = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qweight |= codes[i::8] << (4 * i)
        qzeros = np.zeros((k // g, n // 8), np.uint32)
        for i in range(8):
            qzeros |= (zeros[:, i::8] - 1) << (4 * i)

        packed, s, zxs, perm = gptq_to_tpu_layout(
            jnp.asarray(qweight.astype(np.int32)), jnp.asarray(qzeros.astype(np.int32)),
            jnp.asarray(scales), jnp.asarray(g_idx.astype(np.int32)), group_size=g,
        )
        deq = np.asarray(dequant_w4(packed, jnp.asarray(s), jnp.asarray(zxs), group_size=g, dtype=jnp.float32))
        # deq is in permuted channel order; a @ deq with a[:, perm] == a @ ref
        a = rng.standard_normal((4, k)).astype(np.float32)
        out = a[:, np.asarray(perm)] @ deq.T
        np.testing.assert_allclose(out, a @ ref_w, rtol=1e-4, atol=1e-4)


class TestW4A16Stacked:
    def test_layer_stacked_matches_sliced(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4, w4a16_gemm

        l, m, n, k, g = 3, 8, 256, 256, 128
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        packed, scales = [], []
        for i in range(l):
            wf = jnp.asarray(rng.standard_normal((n, k)) * 0.1, jnp.float32)
            p_, s_, _ = quantize_w4(wf, group_size=g)
            packed.append(p_)
            scales.append(s_)
        pk = jnp.stack(packed)
        sc = jnp.stack(scales)
        for lid in range(l):
            ref = w4a16_gemm(a, packed[lid], scales[lid], group_size=g)
            got = w4a16_gemm(a, pk, sc, layer_id=jnp.int32(lid), group_size=g)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_stacked_with_prologue_residual(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4, w4a16_gemm

        l, m, n, k, g = 2, 4, 128, 256, 128
        gate = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        up = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        res = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
        pk, sc = [], []
        for i in range(l):
            wf = jnp.asarray(rng.standard_normal((n, k)) * 0.1, jnp.float32)
            p_, s_, _ = quantize_w4(wf, group_size=g)
            pk.append(p_); sc.append(s_)
        ref = w4a16_gemm(gate, pk[1], sc[1], a2=up, residual=res, prologue="silu_mul", group_size=g)
        got = w4a16_gemm(gate, jnp.stack(pk), jnp.stack(sc), a2=up, residual=res,
                         layer_id=jnp.int32(1), prologue="silu_mul", group_size=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestDsv3Gemms:
    def test_router_gemm(self, rng):
        from sgl_kernel_tpu.ops.gemm import dsv3_router_gemm

        a = jnp.asarray(rng.standard_normal((5, 256)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        out = dsv3_router_gemm(a, b, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(a) @ np.asarray(b).T, rtol=1e-4, atol=1e-4)

    def test_fused_a_gemm(self, rng):
        from sgl_kernel_tpu.ops.gemm import dsv3_fused_a_gemm

        a = jnp.asarray(rng.standard_normal((3, 128)), jnp.float32)
        bt = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
        out = dsv3_fused_a_gemm(a, bt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(a) @ np.asarray(bt), rtol=1e-4, atol=1e-4)


class TestGemmRegressions:
    def test_qserve_per_group_nonmultiple_bk(self, rng):
        """K = 1376 (a group multiple but NOT a multiple of 8*G) must pick
        a dividing k-tile instead of failing the divisibility assert."""
        from sgl_kernel_tpu.ops.gemm.qserve import qserve_w4a8_per_group_gemm

        m, n, k, g = 8, 128, 1376, 32
        a = rng.integers(-100, 100, (m, k)).astype(np.int8)
        wq = rng.integers(0, 16, (n, k)).astype(np.uint8)
        s2 = rng.integers(1, 5, (n, k // g)).astype(np.int8)
        zx = np.zeros((n, k // g), np.float32)  # zeros_x_s2 (zero point 0)
        ws = (rng.random(n) * 0.01).astype(np.float32)
        asx = (rng.random(m) * 0.01).astype(np.float32)
        out = qserve_w4a8_per_group_gemm(
            jnp.asarray(a), jnp.asarray(wq).astype(jnp.uint4),
            jnp.asarray(zx), jnp.asarray(s2),
            jnp.asarray(ws), jnp.asarray(asx), group_size=g,
            out_dtype=jnp.float32)
        wf = (wq.astype(np.float64)) * np.repeat(s2.astype(np.float64), g, axis=1)
        ref = (a.astype(np.float64) @ wf.T) * asx.astype(np.float64)[:, None] * ws.astype(np.float64)[None, :]
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 2e-2, rel

    def test_nvfp4_tiny_values_zero_codes(self, rng):
        """Near-zero groups must quantize to zero CODES (regression: the
        1e-12 scale clip made scale_f8 == 0 with garbage +-6 codes)."""
        from sgl_kernel_tpu.ops.gemm.fp4 import scaled_fp4_quant

        x = jnp.full((8, 64), 1e-6, jnp.float32)
        packed, scales = scaled_fp4_quant(x, jnp.float32(1.0))
        codes = np.asarray(packed)
        assert ((codes & 0x77) == 0).all(), "expected zero-magnitude codes"


def test_w4a16_fused_gate_up_exact(rng):
    """silu prologue fed from the UNSPLIT [M, 2K] gate_up output (two
    BlockSpecs over one array) is bit-identical to the a2 form."""
    from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm

    m, k, n, g, l = 16, 512, 256, 128, 2
    gate = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    up = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    gu = jnp.concatenate([gate, up], axis=1)
    pk = jnp.asarray(rng.integers(0, 255, (l, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((l, k // g, n)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
    for lid, pk_, sc_ in ((1, pk, sc), (None, pk[0], sc[0])):
        kw = dict(layer_id=lid) if lid is not None else {}
        o1 = w4a16_gemm(gate, pk_, sc_, a2=up, residual=res, prologue="silu_mul",
                        bm=16, bn=128, bk=256, **kw)
        o2 = w4a16_gemm(gu, pk_, sc_, residual=res, prologue="silu_mul",
                        bm=16, bn=128, bk=256, fused_gate_up=True, **kw)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
