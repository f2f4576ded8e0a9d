"""Correctness tests for the manual-DMA paged decode kernel
(`paged_attention_decode_dma`) against the dense fp64 oracle and the
BlockSpec-pipelined kernel. Covers both pool layouts, split-KV, fresh-KV
fusion, sinks+window, lse, and fp8 descale."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import attention
from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
    choose_num_splits,
    paged_attention_decode_dma,
)

from ref_attention import ref_attention
from test_attention import make_paged


def to_layout(k_pages, layout):
    """make_paged emits head-major [Hkv, P, page, D]; 'page' layout wants
    [P, Hkv, page, D]."""
    if layout == "page":
        return np.moveaxis(k_pages, 0, 1)
    return k_pages


class TestDecodeDma:
    @pytest.mark.parametrize("layout", ["head", "page"])
    @pytest.mark.parametrize("hq,hkv", [(8, 8), (32, 8), (4, 1)])
    def test_basic(self, rng, hq, hkv, layout):
        b, d, page = 3, 64, 64
        lengths = [170, 64, 33]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=16)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(to_layout(k_pages, layout)),
            jnp.asarray(to_layout(v_pages, layout)),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            layout=layout, chunk_pages=2,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("layout", ["head", "page"])
    @pytest.mark.parametrize("num_splits", [2, 4])
    def test_split_kv(self, rng, layout, num_splits):
        b, hq, hkv, d, page = 2, 8, 2, 64, 16
        lengths = [370, 129]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=40)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(to_layout(k_pages, layout)),
            jnp.asarray(to_layout(v_pages, layout)),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            layout=layout, chunk_pages=2, num_splits=num_splits,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)

    def test_layer_stacked_pool(self, rng):
        b, hq, hkv, d, page = 2, 4, 2, 64, 16
        lengths = [37, 61]
        k0, v0, table, ks0, vs0 = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        k1, v1, _, ks1, vs1 = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        kp = jnp.asarray(np.stack([k0, k1]))  # [L, Hkv, P, page, D]
        vp = jnp.asarray(np.stack([v0, v1]))
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        for lid, (ks, vs) in enumerate([(ks0, vs0), (ks1, vs1)]):
            out = paged_attention_decode_dma(
                jnp.asarray(q), kp, vp, jnp.asarray(lengths, jnp.int32),
                jnp.asarray(table), layer_id=lid, layout="head", chunk_pages=2,
            )
            for bb in range(b):
                ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
                np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("num_splits", [1, 3])
    def test_fresh_kv(self, rng, num_splits):
        """lengths include the current token whose KV rides in fresh_k/v and
        is not yet in the pool."""
        b, hq, hkv, d, page = 2, 8, 2, 64, 16
        lengths = [49, 97]
        hist = [n - 1 for n in lengths]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, hist, n_pages=16)
        fk = rng.standard_normal((b, hkv, d)).astype(np.float32)
        fv = rng.standard_normal((b, hkv, d)).astype(np.float32)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            fresh_k=jnp.asarray(fk), fresh_v=jnp.asarray(fv),
            layout="head", chunk_pages=2, num_splits=num_splits,
        )
        for bb in range(b):
            kk = np.concatenate([ks[bb], fk[bb][None]], 0)
            vv = np.concatenate([vs[bb], fv[bb][None]], 0)
            ref, _ = ref_attention(q[bb][None], kk, vv, causal=False)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("num_splits", [1, 2])
    def test_sliding_window_and_sinks(self, rng, num_splits):
        b, hq, hkv, d, page = 1, 4, 2, 64, 64
        lengths = [200]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        sinks = rng.standard_normal(hq).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            sinks=jnp.asarray(sinks), sliding_window=64,
            layout="head", chunk_pages=1, num_splits=num_splits,
        )
        ref, _ = ref_attention(
            q[0][None], ks[0], vs[0], causal=False, window=64, sinks=sinks,
            q_len=1, kv_len=lengths[0],
        )
        np.testing.assert_allclose(np.asarray(out)[0], ref[0], rtol=2e-2, atol=2e-2)

    def test_lse_and_soft_cap(self, rng):
        b, hq, hkv, d, page = 1, 2, 2, 64, 64
        lengths = [90]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=4)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out, lse = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            return_lse=True, layout="head", chunk_pages=2,
        )
        ref, ref_lse = ref_attention(q[0][None], ks[0], vs[0], causal=False)
        np.testing.assert_allclose(np.asarray(lse)[0], ref_lse[:, 0], rtol=1e-3, atol=1e-3)
        out_c = paged_attention_decode_dma(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            logit_soft_cap=30.0, layout="head", chunk_pages=2,
        )
        ref_c = attention.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table), logit_soft_cap=30.0,
        )
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), rtol=2e-3, atol=2e-3)

    def test_fp8_kv_with_descale(self, rng):
        b, hq, hkv, d, page = 2, 8, 4, 64, 64
        lengths = [100, 60]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        k_scale, v_scale = 0.06, 0.04
        kq = jnp.asarray(k_pages / k_scale).astype(jnp.float8_e4m3fn)
        vq = jnp.asarray(v_pages / v_scale).astype(jnp.float8_e4m3fn)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = paged_attention_decode_dma(
            jnp.asarray(q, jnp.bfloat16), kq, vq,
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            k_scale=k_scale, v_scale=v_scale, layout="head", chunk_pages=2,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out, np.float32)[bb], ref[0], rtol=0.12, atol=0.12)


class TestSplitHeuristic:
    def test_single_core_never_splits(self):
        # measured: the folded-batch loop saturates one core unsplit
        assert choose_num_splits(1, 16384, 64, 8) == 1
        assert choose_num_splits(16, 8192, 64, 8) == 1

    def test_no_split_short_context(self):
        assert choose_num_splits(1, 512, 64, 8, num_cores=2) == 1

    def test_split_small_batch_long_context_multicore(self):
        assert choose_num_splits(1, 16384, 64, 8, num_cores=2) > 1
        assert choose_num_splits(1, 16384, 64, 8, num_cores=4) >= 2


class TestFp8FreshCombination:
    @pytest.mark.parametrize("impl", ["dma", "blockspec"])
    def test_fp8_scales_with_fresh_kv(self, rng, impl):
        """fp8 pool descales must NOT scale the unquantized fresh-token
        contribution (regression: k_scale folded into q understated the
        current token's logit ~1/k_scale x)."""
        from sgl_kernel_tpu.ops.attention import paged_attention_decode
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import paged_attention_decode_dma

        b, hkv, group, d, page, nb = 2, 2, 2, 64, 8, 2
        hq = hkv * group
        n_pages = b * nb + 1
        ctx = page * nb - 3
        k_scale, v_scale = 0.06, 0.04
        kf = rng.standard_normal((n_pages, hkv, page, d)).astype(np.float32) * 0.3
        vf = rng.standard_normal((n_pages, hkv, page, d)).astype(np.float32) * 0.3
        q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
        fk = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32) * 0.3
        fv = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32) * 0.3
        lengths = jnp.full((b,), ctx + 1, jnp.int32)  # incl. the fresh token
        table = jnp.asarray(np.arange(1, n_pages).reshape(b, nb), jnp.int32)

        # oracle: bf16-equivalent dense attention over [dequantized pool | fresh]
        kq = (jnp.asarray(kf, jnp.float32) / k_scale).astype(jnp.float8_e4m3fn)
        vq = (jnp.asarray(vf, jnp.float32) / v_scale).astype(jnp.float8_e4m3fn)
        k_deq = np.asarray(kq.astype(jnp.float32)) * k_scale
        v_deq = np.asarray(vq.astype(jnp.float32)) * v_scale
        out_ref = np.zeros((b, hq, d), np.float32)
        for bi in range(b):
            for h in range(hq):
                kvh = h // group
                rows = [k_deq[table[bi, j], kvh, o] for j in range(nb) for o in range(page)][:ctx]
                vrows = [v_deq[table[bi, j], kvh, o] for j in range(nb) for o in range(page)][:ctx]
                rows.append(np.asarray(fk[bi, kvh]))
                vrows.append(np.asarray(fv[bi, kvh]))
                kk = np.stack(rows); vv = np.stack(vrows)
                sc = (np.asarray(q[bi, h]) @ kk.T) / np.sqrt(d)
                w = np.exp(sc - sc.max()); w /= w.sum()
                out_ref[bi, h] = w @ vv
        if impl == "dma":
            # pools are [P, Hkv, page, D] here == the DMA "page" layout
            out = paged_attention_decode_dma(
                q, kq, vq, lengths, table, fresh_k=fk, fresh_v=fv,
                k_scale=jnp.float32(k_scale), v_scale=jnp.float32(v_scale),
                layout="page",
            )
        else:
            # BlockSpec kernel wants head-major [Hkv, P, page, D]
            out = paged_attention_decode(
                q, jnp.transpose(kq, (1, 0, 2, 3)), jnp.transpose(vq, (1, 0, 2, 3)),
                lengths, table, fresh_k=fk, fresh_v=fv,
                k_scale=jnp.float32(k_scale), v_scale=jnp.float32(v_scale),
            )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=4e-2, atol=4e-2)


class TestGatherFallback:
    """head_dim % 128 != 0 on REAL TPU routes through the gather+flash
    fallback (manual DMA can't slice sub-128-lane rows); parity vs the
    interpret-mode DMA kernel here."""

    def test_matches_dma_kernel(self):
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
            _decode_gather_fallback, paged_attention_decode_dma)

        rng = np.random.default_rng(21)
        b, hq, hkv, d, page, blocks = 3, 8, 2, 64, 16, 3
        n_pages = b * blocks + 1
        kp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, hq, d)) / 8, jnp.bfloat16)
        lens = jnp.asarray([30, 7, 44], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        fk = jnp.asarray(rng.standard_normal((b, hkv, d)) / 8, jnp.bfloat16)
        fv = jnp.asarray(rng.standard_normal((b, hkv, d)) / 8, jnp.bfloat16)

        ref = paged_attention_decode_dma(q, kp, vp, lens, pt, fresh_k=fk, fresh_v=fv)
        got = _decode_gather_fallback(
            q, kp, vp, lens, pt, None, None, None, None, fk, fv,
            sm_scale=None, sliding_window=None, logit_soft_cap=None,
            return_lse=False)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)

    def test_fallback_scales_and_window(self):
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
            _decode_gather_fallback, paged_attention_decode_dma)

        rng = np.random.default_rng(22)
        b, hq, hkv, d, page, blocks = 2, 4, 2, 64, 16, 4
        n_pages = b * blocks + 1
        kf = rng.standard_normal((n_pages, hkv, page, d)) / 8
        kp = jnp.asarray(kf * 16, jnp.float32).astype(jnp.int8)
        vp = jnp.asarray(kf * 16, jnp.float32).astype(jnp.int8)
        q = jnp.asarray(rng.standard_normal((b, hq, d)) / 8, jnp.bfloat16)
        lens = jnp.asarray([50, 33], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        fk = jnp.asarray(rng.standard_normal((b, hkv, d)) / 8, jnp.bfloat16)

        ref = paged_attention_decode_dma(
            q, kp, vp, lens, pt, fresh_k=fk, fresh_v=fk,
            k_scale=1 / 16, v_scale=1 / 16, sliding_window=24)
        got = _decode_gather_fallback(
            q, kp, vp, lens, pt, None, 1 / 16, 1 / 16, None, fk, fk,
            sm_scale=None, sliding_window=24, logit_soft_cap=None,
            return_lse=False)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)

    def test_fallback_head_layout(self):
        """layout='head' pools must be transposed before the gather — the
        round-4 form read the head axis as pages (advisor medium finding)."""
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
            _decode_gather_fallback, paged_attention_decode_dma)

        rng = np.random.default_rng(23)
        b, hq, hkv, d, page, blocks = 2, 4, 2, 16, 8, 3
        n_pages = b * blocks + 1
        kp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        kh = jnp.swapaxes(kp, 0, 1)  # head-major [Hkv, P, page, D]
        vh = jnp.swapaxes(vp, 0, 1)
        q = jnp.asarray(rng.standard_normal((b, hq, d)) / 8, jnp.bfloat16)
        lens = jnp.asarray([20, 13], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)

        ref = _decode_gather_fallback(
            q, kp, vp, lens, pt, None, None, None, None, None, None,
            sm_scale=None, sliding_window=None, logit_soft_cap=None,
            return_lse=False, layout="page")
        got = _decode_gather_fallback(
            q, kh, vh, lens, pt, None, None, None, None, None, None,
            sm_scale=None, sliding_window=None, logit_soft_cap=None,
            return_lse=False, layout="head")
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=1e-5, rtol=1e-5)

    def test_fallback_folded_lse_and_sinks_unfolded(self):
        """Folded (group-in-sq) path: return_lse reshapes [B*hkv, 1, group]
        back to [B, Hq] exactly like the unfolded form; sinks force the
        unfolded path and still match the DMA kernel."""
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
            _decode_gather_fallback, paged_attention_decode_dma)

        rng = np.random.default_rng(24)
        b, hq, hkv, d, page, blocks = 2, 8, 2, 64, 16, 3
        n_pages = b * blocks + 1
        kp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) / 8, jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, hq, d)) / 8, jnp.bfloat16)
        lens = jnp.asarray([40, 17], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)

        ref, ref_lse = paged_attention_decode_dma(
            q, kp, vp, lens, pt, return_lse=True)
        got, got_lse = _decode_gather_fallback(
            q, kp, vp, lens, pt, None, None, None, None, None, None,
            sm_scale=None, sliding_window=None, logit_soft_cap=None,
            return_lse=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(got_lse, np.float32),
                                   np.asarray(ref_lse, np.float32), atol=2e-2, rtol=2e-2)

        sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
        refs = paged_attention_decode_dma(q, kp, vp, lens, pt, sinks=sinks)
        gots = _decode_gather_fallback(
            q, kp, vp, lens, pt, sinks, None, None, None, None, None,
            sm_scale=None, sliding_window=None, logit_soft_cap=None,
            return_lse=False)
        np.testing.assert_allclose(np.asarray(gots, np.float32),
                                   np.asarray(refs, np.float32), atol=2e-2, rtol=2e-2)
