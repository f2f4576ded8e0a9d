"""HC sinkhorn + misc op tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import hc, misc
from sgl_kernel_tpu.ops.hadamard import hadamard_transform
from sgl_kernel_tpu.ops.grammar import apply_token_bitmask
from sgl_kernel_tpu.ops import lora


class TestHc:
    def test_sinkhorn_doubly_stochastic(self, rng):
        t, h = 8, 4
        mixes = rng.standard_normal((t, (2 + h) * h)).astype(np.float32)
        scale = np.asarray([1.0, 1.0, 1.0], np.float32)
        base = np.zeros(((2 + h) * h,), np.float32)
        pre, post, comb = hc.hc_split_sinkhorn(jnp.asarray(mixes), jnp.asarray(scale), jnp.asarray(base))
        c = np.asarray(comb)
        # rows and columns ~sum to 1 after 20 sinkhorn iterations
        np.testing.assert_allclose(c.sum(-1), np.ones((t, h)), atol=2e-2)
        np.testing.assert_allclose(c.sum(-2), np.ones((t, h)), atol=2e-2)
        p = np.asarray(pre)
        assert np.all(p > 0) and np.all(p < 1 + 1e-3)
        assert np.all(np.asarray(post) >= 0) and np.all(np.asarray(post) <= 2)

    def test_pre_post_shapes_and_mix(self, rng):
        t, h, d = 4, 4, 32
        residual = rng.standard_normal((t, h, d)).astype(np.float32)
        fn = (rng.standard_normal(((2 + h) * h, h * d)) * 0.05).astype(np.float32)
        scale = np.ones(3, np.float32)
        base = np.zeros(((2 + h) * h,), np.float32)
        post, comb, layer_input = hc.mhc_pre(
            jnp.asarray(residual), jnp.asarray(fn), jnp.asarray(scale), jnp.asarray(base)
        )
        assert post.shape == (t, h) and comb.shape == (t, h, h) and layer_input.shape == (t, d)
        x = rng.standard_normal((t, d)).astype(np.float32)
        out = hc.hc_post(jnp.asarray(x), jnp.asarray(residual), post, comb)
        assert out.shape == residual.shape
        # oracle for one element
        o = np.asarray(out, np.float32)
        ref = np.asarray(post)[0, 1] * x[0] + sum(
            np.asarray(comb)[0, 1, j] * residual[0, j] for j in range(h)
        )
        np.testing.assert_allclose(o[0, 1], ref, rtol=2e-2, atol=2e-2)


class TestHcSplitOps:
    def test_gemm_sqr_sum_partials_reduce(self, rng):
        """The n_splits>1 partials sum to the full GEMM / square-sum
        (reference hc_pre_gemm_sqr_sum writes per-split partials that
        hc_pre_big_fuse reduces, HCPreGemmSqrSum.cpp)."""
        t, h, d = 6, 4, 32
        a = rng.standard_normal((t, h * d)).astype(np.float32)
        fn = (rng.standard_normal(((2 + h) * h, h * d)) * 0.05).astype(np.float32)
        for s in (1, 4):
            mul, sqr = hc.hc_pre_gemm_sqr_sum(jnp.asarray(a), jnp.asarray(fn), n_splits=s)
            assert mul.shape == (s, t, (2 + h) * h) and sqr.shape == (s, t)
            np.testing.assert_allclose(
                np.asarray(mul).sum(0), a @ fn.T, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(sqr).sum(0), (a ** 2).sum(-1), rtol=1e-5)

    def test_split_pipeline_matches_mhc_pre(self, rng):
        """gemm_sqr_sum -> big_fuse == mhc_pre for any split count (the
        reference composition, mhc.py:176-252)."""
        t, h, d = 5, 4, 32
        residual = rng.standard_normal((t, h, d)).astype(np.float32)
        fn = (rng.standard_normal(((2 + h) * h, h * d)) * 0.05).astype(np.float32)
        scale = np.ones(3, np.float32)
        base = np.zeros(((2 + h) * h,), np.float32)
        nw = (rng.random(d) + 0.5).astype(np.float32)
        want = hc.mhc_pre(
            jnp.asarray(residual), jnp.asarray(fn), jnp.asarray(scale),
            jnp.asarray(base), jnp.asarray(nw))
        mul, sqr = hc.hc_pre_gemm_sqr_sum(
            jnp.asarray(residual.reshape(t, h * d)), jnp.asarray(fn), n_splits=8)
        got = hc.hc_pre_big_fuse(
            mul, sqr, jnp.asarray(scale), jnp.asarray(base),
            jnp.asarray(residual), rms_eps=1e-6, norm_weight=jnp.asarray(nw))
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w, np.float32),
                rtol=2e-3, atol=2e-3)

    def test_post_mult_value(self, rng):
        t, h, d = 3, 4, 16
        residual = rng.standard_normal((t, h, d)).astype(np.float32)
        fn = (rng.standard_normal(((2 + h) * h, h * d)) * 0.05).astype(np.float32)
        scale = np.ones(3, np.float32)
        base = np.zeros(((2 + h) * h,), np.float32)
        mul, sqr = hc.hc_pre_gemm_sqr_sum(
            jnp.asarray(residual.reshape(t, h * d)), jnp.asarray(fn))
        p2, _, _ = hc.hc_pre_big_fuse(
            mul, sqr, jnp.asarray(scale), jnp.asarray(base), jnp.asarray(residual))
        p3, _, _ = hc.hc_pre_big_fuse(
            mul, sqr, jnp.asarray(scale), jnp.asarray(base), jnp.asarray(residual),
            hc_post_mult_value=3.0)
        np.testing.assert_allclose(
            np.asarray(p3), np.asarray(p2) * 1.5, rtol=1e-6)


class TestLegacyCompressPlans:
    def test_decode_legacy_c4(self):
        """Oracle: compress_plan.py:237-246 — c4 double-buffers two 4-slot
        pages per request (page = rid*2 + ((pos//4)&1))."""
        from sgl_kernel_tpu.ops import compression

        rid = jnp.asarray([0, 3], jnp.int32)
        seq = jnp.asarray([9, 4], jnp.int32)
        out = np.asarray(compression.plan_compress_decode_legacy(rid, seq, 4))
        # req 0: pos1=8 -> page 0*2+((8//4)&1)=0, loc 0*4+0=0; pos0=4 -> page 1
        np.testing.assert_array_equal(out[0], [9, 0, 1, 0])
        # req 1: pos1=3 -> page 3*2+0=6, loc 27; pos0=max(-1,0)=0 -> page 6
        np.testing.assert_array_equal(out[1], [4, 27, 6, 6])

    def test_decode_legacy_c128(self):
        from sgl_kernel_tpu.ops import compression

        out = np.asarray(compression.plan_compress_decode_legacy(
            jnp.asarray([2], jnp.int32), jnp.asarray([300], jnp.int32), 128))
        # pos1=299: page=rid=2, loc=2*128 + 299%128 = 256+43
        np.testing.assert_array_equal(out[0], [300, 299, 2, 2])

    def test_prefill_legacy_rows(self):
        """One request, prefix 2, extend 6 (seq 8), ratio 4: compress
        events at positions 3 and 7; window region starts at
        first_w_pos = 8 - 4 = 4 (c4 overlap)."""
        from sgl_kernel_tpu.ops import compression

        plan_c, plan_w = compression.plan_compress_prefill_legacy(
            jnp.asarray([1], jnp.int32), jnp.asarray([8], jnp.int32),
            jnp.asarray([6], jnp.int32), num_q_tokens=6, compress_ratio=4)
        c = np.asarray(plan_c)
        assert c.shape == (2, 4)
        # event at pos 3 (j=1): buffer_len = 8 - 2 = 6, ragged_id 1
        assert c[0, 0] == 4 and c[0, 1] == ((6 << 16) | 1)
        # pages: pos0 = 0 -> page 1*2+0=2; pos1 = 3 -> page 2
        assert c[0, 2] == 2 and c[0, 3] == 2
        # event at pos 7 (j=5): buffer_len = 8 - 6 = 2, ragged_id 5
        assert c[1, 0] == 8 and c[1, 1] == ((2 << 16) | 5)
        # pos0 = 3 -> page 2; pos1 = 7 -> page 3
        assert c[1, 2] == 2 and c[1, 3] == 3
        w = np.asarray(plan_w)
        # window tokens: positions 4..7 (ragged ids 2..5), legacy locs
        assert w.shape == (4, 2)
        np.testing.assert_array_equal(w[:, 0], [2, 3, 4, 5])
        np.testing.assert_array_equal(w[:, 1], [12, 13, 14, 15])


class TestMisc:
    def test_timestep_embedding(self):
        emb = misc.timestep_embedding(jnp.asarray([0.0, 10.0]), 64)
        assert emb.shape == (2, 64)
        np.testing.assert_allclose(np.asarray(emb)[0, :32], np.ones(32), atol=1e-6)  # cos(0)
        np.testing.assert_allclose(np.asarray(emb)[0, 32:], np.zeros(32), atol=1e-6)  # sin(0)

    def test_moe_sum(self, rng):
        x = rng.standard_normal((4, 3, 16)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(misc.moe_sum(jnp.asarray(x))), x.sum(1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(misc.moe_sum_reduce(jnp.asarray(x), routed_scaling_factor=2.0)), x.sum(1) * 2, rtol=1e-6
        )

    def test_hadamard_involution(self, rng):
        x = rng.standard_normal((4, 128)).astype(np.float32)
        h = hadamard_transform(jnp.asarray(x))
        back = hadamard_transform(h, scale=1.0 / 128)
        np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-4)

    def test_hadamard_matches_matrix(self, rng):
        n = 8
        x = rng.standard_normal((1, n)).astype(np.float32)
        H = np.array([[1.0]])
        while H.shape[0] < n:
            H = np.block([[H, H], [H, -H]])
        np.testing.assert_allclose(np.asarray(hadamard_transform(jnp.asarray(x)))[0], (x @ H.T)[0], rtol=1e-5)

    def test_token_bitmask(self, rng):
        t, v = 2, 70
        logits = rng.standard_normal((t, v)).astype(np.float32)
        allowed = rng.integers(0, 2, (t, v)).astype(bool)
        words = np.zeros((t, (v + 31) // 32), np.uint32)
        for tt in range(t):
            for vv in range(v):
                if allowed[tt, vv]:
                    words[tt, vv // 32] |= np.uint32(1) << np.uint32(vv % 32)
        out = np.asarray(apply_token_bitmask(jnp.asarray(logits), jnp.asarray(words.astype(np.int32))))
        assert np.all(np.isinf(out[~allowed]) & (out[~allowed] < 0))
        np.testing.assert_allclose(out[allowed], logits[allowed])


class TestLora:
    def test_shrink_expand_roundtrip(self, rng):
        t, k, rank, out_dim, n_loras = 10, 32, 8, 24, 3
        x = rng.standard_normal((t, k)).astype(np.float32)
        wa = (rng.standard_normal((n_loras, rank, k)) * 0.1).astype(np.float32)
        wb = (rng.standard_normal((n_loras, out_dim, rank)) * 0.1).astype(np.float32)
        seg_indptr = jnp.asarray([0, 4, 10], jnp.int32)  # two segments
        weight_indices = jnp.asarray([2, 0], jnp.int32)
        ranks = jnp.asarray([8, 4, 8], jnp.int32)
        scalings = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
        shr = lora.sgemm_lora_a_fwd(jnp.asarray(x), jnp.asarray(wa), seg_indptr, weight_indices, ranks)
        out = lora.sgemm_lora_b_fwd(shr, jnp.asarray(wb), seg_indptr, weight_indices, ranks, scalings)
        # oracle token 0 (segment 0 -> adapter 2, rank 8, scaling 0.5)
        ref0 = (x[0] @ wa[2].T) @ wb[2].T * 0.5
        np.testing.assert_allclose(np.asarray(out)[0], ref0, rtol=1e-4, atol=1e-4)
        # oracle token 5 (segment 1 -> adapter 0, rank 8, scaling 1.0)
        ref5 = (x[5] @ wa[0].T) @ wb[0].T * 1.0
        np.testing.assert_allclose(np.asarray(out)[5], ref5, rtol=1e-4, atol=1e-4)

    def test_rank_masking(self, rng):
        t, k, rank = 4, 16, 8
        x = rng.standard_normal((t, k)).astype(np.float32)
        wa = (rng.standard_normal((1, rank, k)) * 0.1).astype(np.float32)
        seg_indptr = jnp.asarray([0, 4], jnp.int32)
        out = lora.sgemm_lora_a_fwd(jnp.asarray(x), jnp.asarray(wa), seg_indptr, jnp.asarray([0], jnp.int32), jnp.asarray([3], jnp.int32))
        assert np.all(np.asarray(out)[:, 3:] == 0)
        assert np.any(np.asarray(out)[:, :3] != 0)

    def test_embedding_lora(self, rng):
        vocab, rank, n_loras, t = 50, 4, 2, 5
        w = (rng.standard_normal((n_loras, rank, vocab))).astype(np.float32)
        ids = jnp.asarray([1, 5, 49, 0, 2], jnp.int32)
        seg_indptr = jnp.asarray([0, 5], jnp.int32)
        out = lora.embedding_lora_a_fwd(ids, jnp.asarray(w), seg_indptr, jnp.asarray([1], jnp.int32), jnp.asarray([4, 4], jnp.int32))
        np.testing.assert_allclose(np.asarray(out)[0], w[1, :, 1], rtol=1e-6)


class TestCompression:
    def test_window_softmax_pooling(self, rng):
        from sgl_kernel_tpu.ops import compression

        w, d = 8, 16
        kv = rng.standard_normal((w, d)).astype(np.float32)
        sc = rng.standard_normal((w, d)).astype(np.float32)
        ape = rng.standard_normal((w, d)).astype(np.float32)
        out = compression.compress_window(jnp.asarray(kv), jnp.asarray(sc), jnp.asarray(ape))
        s = sc + ape
        weights = np.exp(s - s.max(0)) / np.exp(s - s.max(0)).sum(0)
        np.testing.assert_allclose(np.asarray(out), (kv * weights).sum(0), rtol=1e-5, atol=1e-5)

    def test_sequence_c128_plain_windows(self, rng):
        from sgl_kernel_tpu.ops import compression

        t, d, r = 256, 8, 128
        kv = rng.standard_normal((t, d)).astype(np.float32)
        sc = rng.standard_normal((t, d)).astype(np.float32)
        ape = rng.standard_normal((r, d)).astype(np.float32)
        out = compression.compress_sequence(jnp.asarray(kv), jnp.asarray(sc), jnp.asarray(ape), compress_ratio=r)
        assert out.shape == (2, d)
        ref0 = np.asarray(
            compression.compress_window(jnp.asarray(kv[:r]), jnp.asarray(sc[:r]), jnp.asarray(ape))
        )
        np.testing.assert_allclose(np.asarray(out)[0], ref0, rtol=1e-5)

    def test_sequence_c4_overlap(self, rng):
        from sgl_kernel_tpu.ops import compression

        t, d = 16, 8
        kv = rng.standard_normal((t, d)).astype(np.float32)
        sc = rng.standard_normal((t, d)).astype(np.float32)
        ape = rng.standard_normal((8, d)).astype(np.float32)
        out = compression.compress_sequence(jnp.asarray(kv), jnp.asarray(sc), jnp.asarray(ape), compress_ratio=4)
        assert out.shape == (4, d)
        # second window pools tokens 0..7 (overlap 0..3 + fresh 4..7)
        s = sc[:8] + ape
        weights = np.exp(s - s.max(0)) / np.exp(s - s.max(0)).sum(0)
        np.testing.assert_allclose(np.asarray(out)[1], (kv[:8] * weights).sum(0), rtol=1e-4, atol=1e-5)


class TestCompressPlan:
    def test_decode_plan_and_apply_matches_sequence(self, rng):
        """Drive decode-time ring compression token by token; the ring
        content must equal compress_sequence over the full history."""
        from sgl_kernel_tpu.ops import compression

        r, ring, page, d = 4, 8, 8, 16
        t = 24
        kv = rng.standard_normal((t, d)).astype(np.float32)
        sc = rng.standard_normal((t, d)).astype(np.float32)
        ape = rng.standard_normal((2 * r, d)).astype(np.float32)

        # paged pools: one sequence, identity page table
        pool_kv = jnp.zeros((4 * page, d))
        pool_sc = jnp.zeros((4 * page, d))
        tables = jnp.arange(4, dtype=jnp.int32)[None, :]
        comp = jnp.zeros((1, ring, d))
        for tok in range(t):
            pool_kv = pool_kv.at[tok].set(kv[tok])
            pool_sc = pool_sc.at[tok].set(sc[tok])
            lengths = jnp.asarray([tok + 1], jnp.int32)
            src, dst, n_comp = compression.plan_compress_decode(
                lengths, compress_ratio=r, ring_size=ring
            )
            comp = compression.flash_compress_decode(
                pool_kv, pool_sc, jnp.asarray(ape), comp, src, dst, tables, page_size=page
            )
        ref = np.asarray(
            compression.compress_sequence(jnp.asarray(kv), jnp.asarray(sc), jnp.asarray(ape), compress_ratio=r)
        )
        got = np.asarray(comp)[0]
        assert int(n_comp[0]) == min(t // r, ring)
        for i in range(t // r):
            np.testing.assert_allclose(got[i % ring], ref[i], rtol=1e-4, atol=1e-4)

    def test_no_event_leaves_ring_untouched(self):
        from sgl_kernel_tpu.ops import compression

        src, dst, _ = compression.plan_compress_decode(
            jnp.asarray([5], jnp.int32), compress_ratio=4, ring_size=4
        )
        assert int(dst[0]) == -1
        comp = jnp.ones((1, 4, 8))
        out = compression.flash_compress_decode(
            jnp.zeros((16, 8)), jnp.zeros((16, 8)), jnp.zeros((8, 8)), comp,
            src, dst, jnp.zeros((1, 2), jnp.int32), page_size=8,
        )
        np.testing.assert_allclose(np.asarray(out), 1.0)


class TestCompressPrefillPlan:
    def test_prefill_plan_matches_decode_accumulation(self, rng):
        from sgl_kernel_tpu.ops import compression

        r, ring = 4, 8
        lengths = jnp.asarray([13, 40], jnp.int32)  # 3 windows; 10 windows (wraps)
        src, dst, n = compression.plan_compress_prefill(lengths, compress_ratio=r, ring_size=ring)
        assert n.tolist() == [3, 8]
        # seq 0: events 0,1,2 -> slots 0,1,2; windows cover [end-8, end)
        assert dst[0, :4].tolist() == [0, 1, 2, -1]
        np.testing.assert_array_equal(np.asarray(src)[0, 1], np.arange(0, 8))
        # seq 1: events 2..9 live -> slots 2..7,0,1
        assert dst[1].tolist() == [2, 3, 4, 5, 6, 7, 0, 1]


class TestCompatLayer:
    def test_aliases_resolve_and_run(self, rng):
        from sgl_kernel_tpu import compat
        from sgl_kernel_tpu.ops import rope

        # rope alias behaves like rotary_embedding
        t, h, d = 3, 2, 32
        q = jnp.asarray(rng.standard_normal((t, h, d)), jnp.float32)
        cache = rope.compute_cos_sin_cache(d, 8)
        pos = jnp.asarray([0, 1, 2], jnp.int32)
        a, _ = compat.apply_rope_with_cos_sin_cache_inplace(pos, q, None, d, cache)
        b, _ = rope.rotary_embedding(pos, q, None, d, cache)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # fp8 helpers
        assert compat.cvt_float_to_fp8_e4m3(2.0).dtype == jnp.float8_e4m3fn
        assert int(compat.pack_fp8x2_e4m3(1.0, 2.0)) == 0x4038
        assert compat.flash_mla_get_workspace_size() == 0
        assert compat.ceil_div(7, 2) == 4 and compat.ceil_align(7, 8) == 8

    def test_named_ratio_entry_points(self, rng):
        """flash_compress4_decode / flash_compress128_decode are fused
        plan+apply per ratio (previously cosmetic aliases): the c4 entry
        fires on length%4==0 with an 8-window, the c128 entry on
        length%128==0 with a 128-window."""
        from sgl_kernel_tpu.ops import compression

        page, d, ring = 64, 16, 4
        pool_kv = jnp.asarray(rng.standard_normal((4 * page, d)), jnp.float32)
        pool_sc = jnp.asarray(rng.standard_normal((4 * page, d)), jnp.float32)
        tables = jnp.arange(4, dtype=jnp.int32)[None, :]
        ape4 = jnp.asarray(rng.standard_normal((8, d)), jnp.float32)
        ape128 = jnp.asarray(rng.standard_normal((128, d)), jnp.float32)
        comp = jnp.zeros((1, ring, d))

        # length 8: c4 fires (window [0,8)), c128 does not
        out4, n4 = compression.flash_compress4_decode(
            pool_kv, pool_sc, ape4, comp, jnp.asarray([8], jnp.int32),
            tables, page_size=page, ring_size=ring)
        assert int(n4[0]) == 2
        ref = compression.compress_window(pool_kv[:8], pool_sc[:8], ape4)
        np.testing.assert_allclose(np.asarray(out4)[0, 1], np.asarray(ref), rtol=1e-5)

        out128, n128 = compression.flash_compress128_decode(
            pool_kv, pool_sc, ape128, comp, jnp.asarray([8], jnp.int32),
            tables, page_size=page, ring_size=ring)
        np.testing.assert_allclose(np.asarray(out128), np.asarray(comp))
        assert int(n128[0]) == 0

        # length 128: c128 fires with the plain 128-window
        out128b, n128b = compression.flash_compress128_decode(
            pool_kv, pool_sc, ape128, comp, jnp.asarray([128], jnp.int32),
            tables, page_size=page, ring_size=ring)
        assert int(n128b[0]) == 1
        ref128 = compression.compress_window(pool_kv[:128], pool_sc[:128], ape128)
        np.testing.assert_allclose(
            np.asarray(out128b)[0, 0], np.asarray(ref128), rtol=1e-4, atol=1e-5)


def test_embedding_lora_padded_vocab_routes_to_extra(rng):
    """vocab_size < padded table width: ids in the padding band must route
    to extra_embeddings, not gather padding columns (regression)."""
    from sgl_kernel_tpu.ops import lora
    import jax.numpy as jnp

    real_vocab, padded, rank = 10, 16, 4
    w = rng.standard_normal((2, rank, padded)).astype(np.float32)
    extra = rng.standard_normal((2, 4, rank)).astype(np.float32)
    ids = jnp.asarray([3, 11], jnp.int32)  # 11 >= real_vocab -> extra[.., 1]
    out = lora.embedding_lora_a_fwd(
        ids, jnp.asarray(w), jnp.asarray([0, 2], jnp.int32),
        jnp.asarray([1], jnp.int32), jnp.asarray([rank, rank], jnp.int32),
        extra_embeddings=jnp.asarray(extra), vocab_size=real_vocab,
    )
    np.testing.assert_allclose(np.asarray(out[0]), w[1, :, 3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), extra[1, 1], rtol=1e-6)


def test_compat_causal_conv1d_channel_first(rng):
    """compat.causal_conv1d_fn_xpu takes the reference's CHANNEL-FIRST
    layouts (mamba.py:6-60): batched [B, D, S], packed [D, total] +
    query_start_loc, conv_states [N, D, W-1] — adapter parity vs the
    native time-major op (regression: the old bare alias treated channels
    as time)."""
    import jax.numpy as jnp
    from sgl_kernel_tpu import compat
    from sgl_kernel_tpu.ops.linear_attn import causal_conv1d_fwd, causal_conv1d_update

    b, d, s, w = 2, 6, 10, 4
    x = rng.standard_normal((b, d, s)).astype(np.float32)
    weight = rng.standard_normal((d, w)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)

    y, fin = compat.causal_conv1d_fn_xpu(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias))
    ref_y, ref_fin = causal_conv1d_fwd(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(weight), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y).transpose(0, 2, 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(ref_fin).transpose(0, 2, 1), rtol=1e-6)

    # packed varlen: two sequences of lengths 3 and 7
    starts = np.array([0, 3, 10], np.int32)
    packed = rng.standard_normal((d, 10)).astype(np.float32)
    conv_states = rng.standard_normal((2, d, w - 1)).astype(np.float32)
    has_init = np.array([True, False])
    y2, fin2 = compat.causal_conv1d_fn_xpu(
        jnp.asarray(packed), jnp.asarray(weight), jnp.asarray(bias),
        conv_states=jnp.asarray(conv_states), query_start_loc=starts,
        has_initial_state=jnp.asarray(has_init),
    )
    assert y2.shape == (d, 10) and fin2.shape == (2, d, w - 1)
    # second sequence starts from zero state: compare against native directly
    ref2, reff2 = causal_conv1d_fwd(
        jnp.asarray(packed[:, 3:].T)[None], jnp.asarray(weight), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(y2)[:, 3:], np.asarray(ref2)[0].T, rtol=1e-5, atol=1e-6)
    # first sequence consumed its initial state
    ref1, _ = causal_conv1d_fwd(
        jnp.asarray(packed[:, :3].T)[None], jnp.asarray(weight), jnp.asarray(bias),
        initial_states=jnp.asarray(conv_states[0].T)[None])
    np.testing.assert_allclose(np.asarray(y2)[:, :3], np.asarray(ref1)[0].T, rtol=1e-5, atol=1e-6)

    # decode update: [B, D] and [B, D, 1] forms, channel-first state
    xd = rng.standard_normal((b, d)).astype(np.float32)
    st = rng.standard_normal((b, d, w - 1)).astype(np.float32)
    yd, std = compat.causal_conv1d_update_xpu(jnp.asarray(xd), jnp.asarray(st), jnp.asarray(weight), jnp.asarray(bias), activation="silu")
    ry, rst = causal_conv1d_update(jnp.asarray(xd), jnp.asarray(st.transpose(0, 2, 1)), jnp.asarray(weight), jnp.asarray(bias), activation="silu")
    np.testing.assert_allclose(np.asarray(yd), np.asarray(ry), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(std), np.asarray(rst).transpose(0, 2, 1), rtol=1e-6)
