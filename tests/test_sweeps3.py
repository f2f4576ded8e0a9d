"""Round-2 sweep grids over the K-paired W4A16 layout, packed prefill, and
the MLA extend path — parameterized density on the paths the round
changed (VERDICT: every money-path kernel >= 20 parameterized cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.gemm import w4a16 as gemm


def _oracle_gemm(a, packed, scales, zeros, group, fmt="int4"):
    wd = gemm.dequant_w4(packed, scales, zeros, group_size=group, fmt=fmt,
                         dtype=jnp.float64)
    return np.asarray(a, np.float64) @ np.asarray(wd).T


class TestW4A16KpairSweep:
    @pytest.mark.parametrize("group", [32, 64, 128])
    @pytest.mark.parametrize("symmetric", [True, False])
    @pytest.mark.parametrize("m", [1, 16, 33])
    def test_quantize_gemm_oracle(self, rng, group, symmetric, m):
        n, k = 128, 256
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
        packed, scales, zeros = gemm.quantize_w4(w, group_size=group,
                                                 symmetric=symmetric)
        assert packed.shape == (k // 2, n)
        assert scales.dtype == jnp.bfloat16
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        out = gemm.w4a16_gemm(a, packed, scales, zeros, group_size=group)
        ref = _oracle_gemm(a, packed, scales, zeros, group)
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 2e-2, rel

    @pytest.mark.parametrize("fmt", ["int4", "mxfp4"])
    @pytest.mark.parametrize("bn,bk", [(64, 128), (128, 256)])
    def test_tile_shapes(self, rng, fmt, bn, bk):
        n, k, g, m = 128, 256, 128, 8
        codes = rng.integers(0, 16, (k, n)).astype(np.uint8)
        packed = gemm.pack_w4_tpu(jnp.asarray(codes))
        scales = jnp.asarray(rng.random((k // g, n)) * 0.1, jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        out = gemm.w4a16_gemm(a, packed, scales, group_size=g, fmt=fmt,
                              bn=bn, bk=bk)
        ref = _oracle_gemm(a, packed, scales, None, g, fmt)
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 2e-2, rel

    @pytest.mark.parametrize("k", [128, 256, 512])
    def test_pack_unpack_roundtrip(self, rng, k):
        n = 128
        codes = rng.integers(0, 16, (k, n)).astype(np.uint8)
        packed = gemm.pack_w4_tpu(jnp.asarray(codes))
        back = gemm.unpack_w4_tpu(packed)
        np.testing.assert_array_equal(np.asarray(back), codes)

    @pytest.mark.parametrize("m", [4, 16])
    def test_stacked_layer_indexing(self, rng, m):
        """Scalar-prefetched layer_id must select exactly layer l."""
        l, n, k, g = 3, 128, 256, 128
        codes = rng.integers(0, 16, (l, k, n)).astype(np.uint8)
        packed = jnp.stack([gemm.pack_w4_tpu(jnp.asarray(c)) for c in codes])
        scales = jnp.asarray(rng.random((l, k // g, n)) * 0.1, jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        for lid in range(l):
            out = gemm.w4a16_gemm(a, packed, scales, layer_id=lid, group_size=g)
            ref = _oracle_gemm(a, packed[lid], scales[lid], None, g)
            rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
            assert rel < 2e-2, (lid, rel)

    @pytest.mark.parametrize("prologue", [None, "silu_mul"])
    def test_prologue_and_residual(self, rng, prologue):
        n, k, g, m = 128, 256, 128, 8
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
        packed, scales, _ = gemm.quantize_w4(w, group_size=g)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        a2 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16) if prologue else None
        res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
        out = gemm.w4a16_gemm(a, packed, scales, a2=a2, residual=res,
                              group_size=g, prologue=prologue)
        af = np.asarray(a, np.float64)
        if prologue:
            g_ = af
            af = g_ * (1 / (1 + np.exp(-g_))) * np.asarray(a2, np.float64)
        ref = af @ np.asarray(gemm.dequant_w4(packed, scales, group_size=g,
                                              dtype=jnp.float64)).T
        ref = ref + np.asarray(res, np.float64)
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 3e-2, rel


class TestGroupedKpairSweep:
    @pytest.mark.parametrize("e,bn", [(2, 128), (4, 64)])
    @pytest.mark.parametrize("with_zeros", [False, True])
    def test_grouped_mm_oracle(self, rng, e, bn, with_zeros):
        from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

        n, k, g, bm = 128, 256, 128, 8
        cap = 4 * bm
        eids = jnp.asarray(rng.integers(0, e, cap // bm), jnp.int32)
        codes = rng.integers(0, 16, (e, k, n)).astype(np.uint8)
        packed = jnp.stack([gemm.pack_w4_tpu(jnp.asarray(c)) for c in codes])
        scales = jnp.asarray(rng.random((e, k // g, n)) * 0.1, jnp.bfloat16)
        zeros = (jnp.asarray(rng.random((e, k // g, n)) * 0.02, jnp.bfloat16)
                 if with_zeros else None)
        x = jnp.asarray(rng.standard_normal((cap, k)), jnp.bfloat16)
        out = w4a16_grouped_mm(x, packed, scales, eids, zeros=zeros,
                               group_size=g, bm=bm, bn=bn)
        for blk in range(cap // bm):
            eid = int(eids[blk])
            rows = slice(blk * bm, (blk + 1) * bm)
            z = zeros[eid] if with_zeros else None
            ref = _oracle_gemm(x[rows], packed[eid], scales[eid], z, g)
            got = np.asarray(out[rows], np.float64)
            rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
            assert rel < 2e-2, (blk, rel)


class TestMlaExtendSweep:
    @pytest.mark.parametrize("pre,sfx", [(5, 3), (16, 16), (1, 20)])
    def test_extend_matches_full(self, rng, pre, sfx):
        from sgl_kernel_tpu.models import deepseek

        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(1))
        page = 16
        total = pre + sfx
        toks = rng.integers(0, cfg.vocab_size, total).astype(np.int32)
        rope = deepseek.build_rope_cache(cfg)
        pad = max(16, 1 << (total - 1).bit_length())
        pages = [2, 5, 1]

        def slot(p):
            return pages[p // page] * page + p % page

        cache = deepseek.make_cache(cfg, 8, page)
        tok = np.zeros((1, pad), np.int32); tok[0, :total] = toks
        pos = np.zeros((1, pad), np.int32); pos[0, :total] = np.arange(total)
        sl = np.full((1, pad), -1, np.int32); sl[0, :total] = [slot(p) for p in range(total)]
        ref, _ = deepseek.prefill(params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
                                  jnp.asarray([total], jnp.int32), jnp.asarray(sl), rope)

        cache = deepseek.make_cache(cfg, 8, page)
        t1 = np.zeros((1, pad), np.int32); t1[0, :pre] = toks[:pre]
        p1 = np.zeros((1, pad), np.int32); p1[0, :pre] = np.arange(pre)
        s1 = np.full((1, pad), -1, np.int32); s1[0, :pre] = [slot(p) for p in range(pre)]
        _, cache = deepseek.prefill(params, cfg, cache, jnp.asarray(t1), jnp.asarray(p1),
                                    jnp.asarray([pre], jnp.int32), jnp.asarray(s1), rope)
        t2 = np.zeros((1, pad), np.int32); t2[0, :sfx] = toks[pre:]
        p2 = np.zeros((1, pad), np.int32); p2[0, :sfx] = np.arange(pre, total)
        s2 = np.full((1, pad), -1, np.int32); s2[0, :sfx] = [slot(p) for p in range(pre, total)]
        table = np.zeros((1, 4), np.int32); table[0, :3] = pages
        prefix_max = ((pre + page - 1) // page) * page
        got, _ = deepseek.prefill_extend(
            params, cfg, cache, jnp.asarray(t2), jnp.asarray(p2),
            jnp.asarray([sfx], jnp.int32), jnp.asarray([total], jnp.int32),
            jnp.asarray(table), jnp.asarray(s2), rope, prefix_max=max(prefix_max, page),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)


class TestW4A16Dma:
    """Manual-DMA decode GEMM == the BlockSpec kernel (itself fp64-oracle
    tested) across feature flags."""

    @pytest.mark.parametrize("m", [1, 16])
    @pytest.mark.parametrize("stacked", [False, True])
    def test_matches_pipeline_kernel(self, rng, m, stacked):
        from sgl_kernel_tpu.ops.gemm.w4a16_dma import w4a16_gemm_dma

        n, k, g, l = 128, 512, 128, 2
        codes = rng.integers(0, 16, (l, k, n)).astype(np.uint8)
        packed = jnp.stack([gemm.pack_w4_tpu(jnp.asarray(c)) for c in codes])
        scales = jnp.asarray(rng.random((l, k // g, n)) * 0.1, jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        if stacked:
            ref = gemm.w4a16_gemm(a, packed, scales, layer_id=1, group_size=g)
            got = w4a16_gemm_dma(a, packed, scales, layer_id=1, group_size=g,
                                 bn=128, bk=256)
        else:
            ref = gemm.w4a16_gemm(a, packed[0], scales[0], group_size=g)
            got = w4a16_gemm_dma(a, packed[0], scales[0], group_size=g,
                                 bn=128, bk=256)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("feature", ["zeros", "bias", "residual", "silu_mul"])
    def test_feature_flags(self, rng, feature):
        from sgl_kernel_tpu.ops.gemm.w4a16_dma import w4a16_gemm_dma

        n, k, g, m = 128, 512, 128, 8
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
        packed, scales, zeros = gemm.quantize_w4(w, group_size=g,
                                                 symmetric=(feature != "zeros"))
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        kw = dict(zeros=zeros) if feature == "zeros" else {}
        ref_kw = dict(kw)
        if feature == "bias":
            b = jnp.asarray(rng.standard_normal(n), jnp.float32)
            kw["bias"] = b; ref_kw["bias"] = b
        if feature == "residual":
            r = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
            kw["residual"] = r; ref_kw["residual"] = r
        if feature == "silu_mul":
            a2 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            kw.update(a2=a2, prologue="silu_mul")
            ref_kw.update(a2=a2, prologue="silu_mul")
        ref = gemm.w4a16_gemm(a, packed, scales, group_size=g, **ref_kw)
        got = w4a16_gemm_dma(a, packed, scales, group_size=g, bn=128, bk=256, **kw)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)

    def test_mxfp4(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16_dma import w4a16_gemm_dma

        n, k, m = 128, 256, 8
        codes = rng.integers(0, 16, (k, n)).astype(np.uint8)
        packed = gemm.pack_w4_tpu(jnp.asarray(codes))
        scales = jnp.asarray(np.exp2(rng.integers(-3, 3, (k // 32, n))), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        ref = gemm.w4a16_gemm(a, packed, scales, group_size=32, fmt="mxfp4")
        got = w4a16_gemm_dma(a, packed, scales, group_size=32, fmt="mxfp4",
                             bn=128, bk=128)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)

    def test_llama_decode_gemm_impl_dma(self, rng):
        """LlamaConfig(gemm_impl='dma'): decode tokens match the pipeline
        kernel's exactly (same math, different weight streaming)."""
        from sgl_kernel_tpu.models import llama
        from sgl_kernel_tpu.serving import Engine

        prompt = rng.integers(0, 256, 9).astype(np.int32).tolist()

        def run(impl):
            cfg = llama.LlamaConfig.tiny(quant="w4a16", gemm_impl=impl)
            params = llama.init_weights(cfg, jax.random.PRNGKey(0))
            eng = Engine(cfg, params, num_pages=32, page_size=16,
                         prefill_bucket=16, enable_prefix_cache=False)
            rid = eng.add_request(prompt, max_new_tokens=6)
            eng.run_until_done()
            return eng.finished[rid].output

        assert run("dma") == run("pipeline")


class TestNormPrologue:
    """Round-4 fused decode rmsnorm (w4a16_gemm norm_weight)."""

    # local aliases (this file imports the module as `gemm`)

    @pytest.mark.parametrize("gmode", ["loop", "inner", "inner2"])
    def test_matches_separate_norm(self, gmode):
        from sgl_kernel_tpu.ops.norm import rmsnorm

        rng = np.random.default_rng(11)
        m, n, k, g = 16, 256, 512, 128
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
        nw = jnp.asarray(rng.random(k) + 0.5, jnp.bfloat16)
        packed, scales, _ = gemm.quantize_w4(wf, group_size=g)
        fused = gemm.w4a16_gemm(a, packed, scales, norm_weight=nw, norm_eps=1e-5,
                           group_size=g, gmode=gmode)
        ref = gemm.w4a16_gemm(rmsnorm(a, nw, 1e-5), packed, scales, group_size=g,
                         gmode=gmode)
        np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                      np.asarray(ref, np.float32))

    def test_stacked_with_residual(self):
        from sgl_kernel_tpu.ops.norm import rmsnorm

        rng = np.random.default_rng(12)
        m, n, k, g, L = 16, 256, 512, 128, 3
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
        pks, scs, nws = [], [], []
        for _ in range(L):
            wf = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
            pk, sc, _ = gemm.quantize_w4(wf, group_size=g)
            pks.append(pk); scs.append(sc)
            nws.append(jnp.asarray(rng.random(k) + 0.5, jnp.bfloat16))
        pk, sc, nw = jnp.stack(pks), jnp.stack(scs), jnp.stack(nws)
        for lid in (0, 2):
            fused = gemm.w4a16_gemm(a, pk, sc, residual=res, layer_id=jnp.int32(lid),
                               norm_weight=nw, group_size=g)
            ref = gemm.w4a16_gemm(rmsnorm(a, nw[lid], 1e-5), pk, sc, residual=res,
                             layer_id=jnp.int32(lid), group_size=g)
            np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                          np.asarray(ref, np.float32))

    def test_bucket1_shapes(self):
        """B=64 decode lands in m-bucket 1 (bm=128): the full-row a block
        is (128, K) — the norm prologue must hold there too."""
        from sgl_kernel_tpu.ops.norm import rmsnorm

        rng = np.random.default_rng(13)
        m, n, k, g = 64, 256, 512, 128
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
        nw = jnp.asarray(rng.random(k) + 0.5, jnp.bfloat16)
        packed, scales, _ = gemm.quantize_w4(wf, group_size=g)
        fused = gemm.w4a16_gemm(a, packed, scales, norm_weight=nw, group_size=g)
        ref = gemm.w4a16_gemm(rmsnorm(a, nw, 1e-5), packed, scales, group_size=g)
        np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                      np.asarray(ref, np.float32))
