"""Dense parameter sweeps on the money paths (VERDICT round-1 #9).

Models the reference's grid style (tests/test_flash_attention.py dense
parameterizations, test_per_token_group_quant_8bit.py round-trip grids)
with tiny shapes so CPU interpret-mode stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from ref_attention import ref_attention
from test_attention import make_paged

from sgl_kernel_tpu.ops import attention, quant
from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
    _upcast,
    paged_attention_decode_dma,
)


class TestFp8UpcastExact:
    """The decode kernel's integer-bitcast fp8 upcast must be EXACT for
    every representable fp8 byte (normals, denormals, zero, negatives) —
    this pins the fp8-KV descale numerics (VERDICT #2)."""

    @pytest.mark.parametrize("fp8", [jnp.float8_e4m3fn, jnp.float8_e5m2])
    @pytest.mark.parametrize("out", [jnp.bfloat16, jnp.float32])
    def test_all_256_bytes(self, fp8, out):
        raw = jnp.arange(256, dtype=jnp.uint8).reshape(2, 128)
        x = jax.lax.bitcast_convert_type(raw, fp8)
        got = np.asarray(_upcast(x, out), np.float32)
        want = np.asarray(x.astype(jnp.float32))
        if out == jnp.bfloat16:
            want = np.asarray(jnp.asarray(want).astype(jnp.bfloat16), np.float32)
        nan = np.isnan(want)
        # Deviation policy (ops/attention/paged_decode_dma.py:47-56, both
        # encodings use the same rebias scheme): NaN/inf bytes decode to
        # LARGE FINITE values (a poisoned page contributes a big finite
        # logit instead of propagating NaN — quantized KV pages never hold
        # NaN by construction), subnormals may flush to zero in the rebias
        # multiply (exact-or-zero; error far below the format's own
        # quantization error), every normal byte decodes EXACTLY.
        inf = np.isinf(want)
        special = nan | inf
        assert np.isfinite(got[special]).all()
        # e4m3fn NaN (0x7f/0xff) -> +-480 = 1.875*2^8; e5m2 inf/nan
        # (exp field 31) -> >= 2^16 after the 2^112 rebias.
        floor = 2.0 ** 16 if fp8 == jnp.float8_e5m2 else 448.0
        assert (np.abs(got[special]) >= floor).all()
        if fp8 == jnp.float8_e4m3fn:
            denorm = (np.abs(want) > 0) & (np.abs(want) < 2.0 ** -6)
        else:
            denorm = (np.abs(want) > 0) & (np.abs(want) < 2.0 ** -14)
        ok = ~special & ~denorm
        np.testing.assert_array_equal(got[ok], want[ok])
        d = got[denorm]
        w = want[denorm]
        assert ((d == w) | (d == 0)).all()


class TestDecodeDmaSweep:
    @pytest.mark.parametrize("page", [16, 32])
    @pytest.mark.parametrize("hq,hkv", [(4, 1), (8, 2), (8, 8)])
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_grid(self, rng, page, hq, hkv, dtype):
        b, d = 3, 64
        lengths = [page - 1, 2 * page + 3, 4 * page]  # sub-page, ragged, exact
        k_pages, v_pages, table, ks, vs = make_paged(
            rng, b, hkv, d, page, lengths, n_pages=16
        )
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
        out = paged_attention_decode_dma(
            jnp.asarray(q, dtype),
            jnp.asarray(np.moveaxis(k_pages, 0, 1), dtype),
            jnp.asarray(np.moveaxis(v_pages, 0, 1), dtype),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            layout="page", chunk_pages=2,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(
                np.asarray(out, np.float32)[bb], ref[0], rtol=tol, atol=tol
            )

    @pytest.mark.parametrize("num_splits", [1, 2, 3])
    @pytest.mark.parametrize("window", [None, 24])
    @pytest.mark.parametrize("soft_cap", [None, 20.0])
    def test_feature_product(self, rng, num_splits, window, soft_cap):
        b, hq, hkv, d, page = 2, 4, 2, 64, 16
        lengths = [70, 35]
        k_pages, v_pages, table, ks, vs = make_paged(
            rng, b, hkv, d, page, lengths, n_pages=16
        )
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(np.moveaxis(k_pages, 0, 1)),
            jnp.asarray(np.moveaxis(v_pages, 0, 1)),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            layout="page", chunk_pages=2, num_splits=num_splits,
            sliding_window=window, logit_soft_cap=soft_cap,
        )
        for bb in range(b):
            ref, _ = ref_attention(
                q[bb][None], ks[bb], vs[bb], causal=False, window=window,
                soft_cap=soft_cap, q_len=1, kv_len=lengths[bb],
            )
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("fp8", [jnp.float8_e4m3fn, jnp.float8_e5m2])
    @pytest.mark.parametrize("layout", ["page", "head"])
    def test_fp8_layout_product(self, rng, fp8, layout):
        b, hq, hkv, d, page = 2, 8, 4, 64, 16
        lengths = [60, 33]
        k_pages, v_pages, table, ks, vs = make_paged(
            rng, b, hkv, d, page, lengths, n_pages=16
        )
        k_scale, v_scale = 0.06, 0.04
        mv = lambda a: np.moveaxis(a, 0, 1) if layout == "page" else a
        kq = jnp.asarray(mv(k_pages) / k_scale).astype(fp8)
        vq = jnp.asarray(mv(v_pages) / v_scale).astype(fp8)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q, jnp.bfloat16), kq, vq,
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            k_scale=k_scale, v_scale=v_scale, layout=layout, chunk_pages=2,
        )
        tol = 0.12 if fp8 == jnp.float8_e4m3fn else 0.3
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(
                np.asarray(out, np.float32)[bb], ref[0], rtol=tol, atol=tol
            )

    @pytest.mark.parametrize("hist", [0, 1, 15, 16])
    def test_fresh_kv_boundary_lengths(self, rng, hist):
        """Pool holds `hist` tokens (incl. 0 and exact-page); current token
        rides fresh."""
        b, hq, hkv, d, page = 1, 4, 2, 64, 16
        k_pages, v_pages, table, ks, vs = make_paged(
            rng, b, hkv, d, page, [max(hist, 1)], n_pages=4
        )
        if hist == 0:
            table = np.zeros((1, 0), np.int32)
            ks = [np.zeros((0, hkv, d), np.float32)]
            vs = [np.zeros((0, hkv, d), np.float32)]
        fk = rng.standard_normal((b, hkv, d)).astype(np.float32)
        fv = rng.standard_normal((b, hkv, d)).astype(np.float32)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(np.moveaxis(k_pages, 0, 1)),
            jnp.asarray(np.moveaxis(v_pages, 0, 1)),
            jnp.asarray([hist + 1], jnp.int32), jnp.asarray(table),
            fresh_k=jnp.asarray(fk), fresh_v=jnp.asarray(fv),
            layout="page", chunk_pages=2,
        )
        kk = np.concatenate([ks[0][:hist], fk[0][None]], 0)
        vv = np.concatenate([vs[0][:hist], fv[0][None]], 0)
        ref, _ = ref_attention(q[0][None], kk, vv, causal=False)
        np.testing.assert_allclose(np.asarray(out)[0], ref[0], rtol=2e-3, atol=2e-3)


class TestFlashPrefillSweep:
    @pytest.mark.parametrize("s", [64, 96, 130, 257])
    @pytest.mark.parametrize("hq,hkv", [(2, 2), (4, 1)])
    def test_irregular_lengths(self, rng, s, hq, hkv):
        b, d = 1, 64
        q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
        k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
        v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
        out = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True
        )
        ref, _ = ref_attention(q[0], k[0], v[0], causal=True)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("window", [16, 64])
    @pytest.mark.parametrize("soft_cap", [None, 30.0])
    @pytest.mark.parametrize("causal", [True, False])
    def test_feature_product(self, rng, window, soft_cap, causal):
        b, s, h, d = 1, 128, 2, 64
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        out = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal,
            sliding_window=window if causal else None, logit_soft_cap=soft_cap,
        )
        ref, _ = ref_attention(
            q[0], k[0], v[0], causal=causal,
            window=window if causal else None, soft_cap=soft_cap,
        )
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    @pytest.mark.parametrize("d", [64, 128])
    def test_dtype_headdim(self, rng, dtype, d):
        b, s, h = 1, 128, 2
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        out = attention.flash_attention(
            jnp.asarray(q, dtype), jnp.asarray(k, dtype), jnp.asarray(v, dtype),
            causal=True,
        )
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-3
        ref, _ = ref_attention(q[0], k[0], v[0], causal=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[0], ref, rtol=tol, atol=tol
        )


class TestQuantRoundtripSweep:
    @pytest.mark.parametrize("group", [32, 64, 128])
    @pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.int8])
    @pytest.mark.parametrize("ue8m0", [False, True])
    @pytest.mark.parametrize("col_major", [False, True])
    def test_group_quant_grid(self, rng, group, dtype, ue8m0, col_major):
        x = rng.standard_normal((8, 256)).astype(np.float32) * 3.0
        q, s = quant.per_token_group_quant_8bit(
            jnp.asarray(x), group_size=group, dtype=dtype,
            scale_ue8m0=ue8m0, column_major_scales=col_major,
        )
        s = np.asarray(s, np.float32)
        if col_major:
            s = s.T
        if ue8m0:
            # ue8m0 returns uint8 exponent bytes (bias 127)
            s = 2.0 ** (s - 127.0)
        back = np.asarray(q, np.float32).reshape(8, -1, group) * s[..., None]
        err = np.abs(back - x.reshape(8, -1, group))
        # per-group error bound: int8 rounds to steps of `scale` (0.5 ulp);
        # e4m3 carries 3 mantissa bits (2^-4 relative at the group amax)
        amax = np.abs(x.reshape(8, -1, group)).max(-1)
        bound = 0.51 * s if dtype == jnp.int8 else amax / 15.9
        assert (err <= bound[..., None] + 1e-6).all()

    @pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.float8_e5m2])
    def test_per_token_roundtrip(self, rng, dtype):
        x = rng.standard_normal((16, 128)).astype(np.float32)
        q, s = quant.per_token_quant_fp8(jnp.asarray(x), dtype=dtype)
        back = np.asarray(q, np.float32) * np.asarray(s, np.float32)
        rel = 2 ** -3 if dtype == jnp.float8_e4m3fn else 2 ** -2
        np.testing.assert_allclose(back, x, rtol=rel, atol=rel * np.abs(x).max())


class TestKvCacheIoSweep:
    @pytest.mark.parametrize("page", [8, 16, 64])
    @pytest.mark.parametrize("h", [1, 4])
    def test_store_gather_roundtrip(self, rng, page, h):
        from sgl_kernel_tpu.ops.kvcache import store_cache

        p, d, t = 6, 32, 11
        k_pool = jnp.zeros((p, h, page, d))
        v_pool = jnp.zeros((p, h, page, d))
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
        loc = jnp.asarray(rng.permutation(p * page)[:t], jnp.int32)
        k_pool, v_pool = store_cache(k, v, k_pool, v_pool, loc)
        pid, off = np.asarray(loc) // page, np.asarray(loc) % page
        got = np.asarray(k_pool)[pid, :, off]
        np.testing.assert_array_equal(got, np.asarray(k))
        got_v = np.asarray(v_pool)[pid, :, off]
        np.testing.assert_array_equal(got_v, np.asarray(v))

    @pytest.mark.parametrize("neg", [0, 3])
    def test_store_skips_negative_locs(self, rng, neg):
        from sgl_kernel_tpu.ops.kvcache import store_cache

        p, h, page, d, t = 4, 2, 8, 16, 6
        k_pool = jnp.full((p, h, page, d), 7.0)
        v_pool = jnp.full((p, h, page, d), 7.0)
        k = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
        loc = np.arange(t, dtype=np.int32)
        loc[:neg] = -1
        k_pool, v_pool = store_cache(k, k, k_pool, v_pool, jnp.asarray(loc))
        flat = np.asarray(k_pool).transpose(0, 2, 1, 3).reshape(p * page, h, d)
        for i in range(neg):
            np.testing.assert_array_equal(flat[i], 7.0)
        for i in range(neg, t):
            np.testing.assert_array_equal(flat[i], np.asarray(k)[i])

    @pytest.mark.parametrize("layers", [1, 3])
    def test_all_layers_store(self, rng, layers):
        from sgl_kernel_tpu.ops.kvcache import store_cache_all_layers

        p, h, page, d, t = 4, 2, 8, 16, 5
        k_pool = jnp.zeros((layers, p, h, page, d))
        v_pool = jnp.zeros_like(k_pool)
        k_all = jnp.asarray(rng.standard_normal((layers, t, h, d)), jnp.float32)
        v_all = jnp.asarray(rng.standard_normal((layers, t, h, d)), jnp.float32)
        loc = jnp.asarray(rng.permutation(p * page)[:t], jnp.int32)
        k_pool, v_pool = store_cache_all_layers(k_all, v_all, k_pool, v_pool, loc)
        pid, off = np.asarray(loc) // page, np.asarray(loc) % page
        for l in range(layers):
            got = np.asarray(k_pool)[l, pid, :, off]
            np.testing.assert_array_equal(got, np.asarray(k_all)[l])
