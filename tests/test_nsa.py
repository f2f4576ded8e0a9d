"""NSA indexer + sparse MLA tests (oracle: dense attention restricted to
the selected index set, per the reference sparse tests' semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.attention import nsa


class TestIndexer:
    def test_fp8_mqa_logits(self, rng):
        b, h, d, page, npages = 2, 4, 64, 16, 6
        q = rng.standard_normal((b, h, d)).astype(np.float32)
        kv = rng.standard_normal((npages, page, d)).astype(np.float32)
        w = rng.standard_normal(h).astype(np.float32)
        table = np.asarray([[1, 2, 3], [4, 5, 0]], np.int32)
        lengths = np.asarray([40, 20], np.int32)
        out = nsa.fp8_paged_mqa_logits(
            jnp.asarray(q), jnp.asarray(kv), jnp.asarray(w),
            jnp.asarray(lengths), jnp.asarray(table),
        )
        assert out.shape == (b, 48)
        # oracle for b=0, t=5 (page 1, row 5)
        kvec = kv[1, 5]
        ref = sum(w[hh] * max(0.0, float(q[0, hh] @ kvec)) for hh in range(h))
        np.testing.assert_allclose(float(out[0, 5]), ref, rtol=1e-4)
        assert np.isinf(np.asarray(out)[1, 25]) and np.asarray(out)[1, 25] < 0

    def test_fp8_mqa_logits_full_oracle(self, rng):
        """Whole-array oracle over ragged lengths and multiple DMA chunks."""
        b, h, d, page, npages = 3, 4, 64, 16, 24
        q = rng.standard_normal((b, h, d)).astype(np.float32)
        kv = rng.standard_normal((npages, page, d)).astype(np.float32)
        w = rng.standard_normal((b, h)).astype(np.float32)
        nb = 7
        table = rng.permutation(np.arange(1, npages))[: b * nb].reshape(b, nb).astype(np.int32)
        lengths = np.asarray([nb * page, 3 * page + 5, 1], np.int32)
        out = np.asarray(nsa.fp8_paged_mqa_logits(
            jnp.asarray(q), jnp.asarray(kv), jnp.asarray(w),
            jnp.asarray(lengths), jnp.asarray(table), chunk_pages=2,
        ))
        assert out.shape == (b, nb * page)
        gathered = kv[table].reshape(b, nb * page, d)
        ref = np.einsum(
            "bh,bht->bt", w, np.maximum(np.einsum("bhd,btd->bht", q, gathered), 0.0)
        )
        pos = np.arange(nb * page)[None, :]
        ref = np.where(pos < lengths[:, None], ref, -np.inf)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_fp8_mqa_logits_fp8_with_scales(self, rng):
        """fp8 q + fp8 kv pages + per-token f32 descale (the reference's
        132-byte packed row contract, nsa.py:159)."""
        b, h, d, page, npages = 2, 4, 64, 16, 8
        q = (rng.standard_normal((b, h, d)) * 0.5).astype(np.float32)
        kv = (rng.standard_normal((npages, page, d)) * 0.5).astype(np.float32)
        ksc = (0.5 + rng.random((npages, page))).astype(np.float32)
        w = rng.standard_normal((b, h)).astype(np.float32)
        table = np.asarray([[1, 2, 3], [4, 5, 6]], np.int32)
        lengths = np.asarray([48, 20], np.int32)
        q8 = jnp.asarray(q).astype(jnp.float8_e4m3fn)
        kv8 = jnp.asarray(kv).astype(jnp.float8_e4m3fn)
        out = np.asarray(nsa.fp8_paged_mqa_logits(
            q8, kv8, jnp.asarray(w), jnp.asarray(lengths), jnp.asarray(table),
            jnp.asarray(ksc), chunk_pages=2,
        ))
        qd = np.asarray(q8.astype(jnp.float32))
        kd = np.asarray(kv8.astype(jnp.float32))
        gathered = kd[table].reshape(b, 48, d)
        sct = ksc[table].reshape(b, 48)
        ref = np.einsum(
            "bh,bht->bt", w, np.maximum(np.einsum("bhd,btd->bht", qd, gathered), 0.0)
        ) * sct
        pos = np.arange(48)[None, :]
        ref = np.where(pos < lengths[:, None], ref, -np.inf)
        finite = np.isfinite(ref)
        np.testing.assert_allclose(out[finite], ref[finite], rtol=2e-2, atol=2e-2)
        assert (out[~finite] == -np.inf).all()

    def test_fast_topk(self, rng):
        b, t = 2, 256
        logits = rng.standard_normal((b, t)).astype(np.float32)
        lengths = np.asarray([256, 10], np.int32)
        idx = nsa.fast_topk(jnp.asarray(logits), jnp.asarray(lengths), topk=32)
        assert idx.shape == (b, 32)
        ref = np.argsort(-logits[0])[:32]
        np.testing.assert_array_equal(np.sort(np.asarray(idx)[0]), np.sort(ref))
        # short row: only 10 valid, rest -1
        assert np.sum(np.asarray(idx)[1] >= 0) == 10

    def test_topk_transform_maps_pages(self, rng):
        b, t, page = 1, 64, 16
        logits = rng.standard_normal((b, t)).astype(np.float32)
        table = np.asarray([[7, 3, 9, 5]], np.int32)
        slots = nsa.fast_topk_transform_fused(
            jnp.asarray(logits), jnp.asarray([64], jnp.int32), jnp.asarray(table), page, topk=8
        )
        idx = np.argsort(-logits[0])[:8]
        ref = table[0][idx // page] * page + idx % page
        np.testing.assert_array_equal(np.sort(np.asarray(slots)[0]), np.sort(ref))


class TestSparseMla:
    def test_matches_dense_on_selected(self, rng):
        b, h, kk, nslots = 2, 4, 16, 128
        pool = (rng.standard_normal((nslots, 576)) * 0.3).astype(np.float32)
        q_nope = (rng.standard_normal((b, h, 512)) * 0.3).astype(np.float32)
        q_pe = (rng.standard_normal((b, h, 64)) * 0.3).astype(np.float32)
        slots = np.stack([rng.choice(nslots, kk, replace=False) for _ in range(b)]).astype(np.int32)
        slots[1, -4:] = -1  # some invalid
        out = nsa.sparse_mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(pool), jnp.asarray(slots)
        )
        sm = 1.0 / np.sqrt(576)
        for bb in range(b):
            sel = slots[bb][slots[bb] >= 0]
            kv = pool[sel]
            for hh in range(h):
                q = np.concatenate([q_nope[bb, hh], q_pe[bb, hh]])
                s = kv @ q * sm
                p = np.exp(s - s.max())
                ref = (p @ kv[:, :512]) / p.sum()
                np.testing.assert_allclose(np.asarray(out)[bb, hh], ref, rtol=2e-2, atol=2e-2)

    def _oracle(self, q_nope, q_pe, pools_sels, sm, sink=None):
        """fp64 oracle over an arbitrary union of (pool, selected rows)."""
        kv = np.concatenate([p[s] for p, s in pools_sels], axis=0).astype(np.float64)
        q = np.concatenate([q_nope, q_pe]).astype(np.float64)
        s = kv @ q * sm
        m = s.max() if s.size else 0.0
        denom = np.exp(s - m).sum()
        num = np.exp(s - m) @ kv[:, :512]
        if sink is not None:
            denom = denom + np.exp(sink - m)
        return num / denom

    def test_dual_pool_sinks_lse_fp8(self, rng):
        """Reference-parity surface (sgl_flash_kernel_ops.h:96-139): dual
        KV pools combined via merge, per-head attn_sink, topk_length,
        fp8 latent pools, lse output."""
        import ml_dtypes

        b, h, kk, kk2, nslots = 2, 4, 32, 16, 128
        pool = (rng.standard_normal((nslots, 576)) * 0.3).astype(np.float32)
        extra = (rng.standard_normal((64, 576)) * 0.3).astype(np.float32)
        q_nope = (rng.standard_normal((b, h, 512)) * 0.3).astype(np.float32)
        q_pe = (rng.standard_normal((b, h, 64)) * 0.3).astype(np.float32)
        slots = np.stack([rng.choice(nslots, kk, replace=False) for _ in range(b)]).astype(np.int32)
        eslots = np.stack([rng.choice(64, kk2, replace=False) for _ in range(b)]).astype(np.int32)
        tl = np.asarray([kk, kk - 5], np.int32)
        etl = np.asarray([kk2 - 3, 0], np.int32)  # row 1: extra pool EMPTY
        slots[1, tl[1]:] = -1
        eslots[0, etl[0]:] = -1
        eslots[1, :] = -1
        sink = (rng.standard_normal(h) * 0.5).astype(np.float32)
        sm = 1.0 / np.sqrt(576)
        out, lse = nsa.sparse_mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(pool),
            jnp.asarray(slots), topk_length=jnp.asarray(tl),
            extra_pool_flat=jnp.asarray(extra), extra_indices=jnp.asarray(eslots),
            extra_topk_length=jnp.asarray(etl), attn_sink=jnp.asarray(sink),
            return_lse=True, page=16)
        assert lse.shape == (b, h)
        for bb in range(b):
            sels = [(pool, slots[bb][: tl[bb]])]
            if etl[bb]:
                sels.append((extra, eslots[bb][: etl[bb]]))
            for hh in range(h):
                ref = self._oracle(q_nope[bb, hh], q_pe[bb, hh], sels, sm, sink[hh])
                np.testing.assert_allclose(np.asarray(out)[bb, hh], ref, rtol=2e-2, atol=2e-2)
        # fp8 pools run through the same path (looser tolerance)
        pool8 = pool.astype(ml_dtypes.float8_e4m3fn)
        out8 = nsa.sparse_mla_decode(
            jnp.asarray(q_nope, jnp.bfloat16), jnp.asarray(q_pe, jnp.bfloat16),
            jnp.asarray(pool8), jnp.asarray(slots), topk_length=jnp.asarray(tl),
            page=16)
        for bb in range(b):
            kv8 = pool[slots[bb][: tl[bb]]].astype(ml_dtypes.float8_e4m3fn).astype(np.float64)
            for hh in range(h):
                q = np.concatenate([q_nope[bb, hh], q_pe[bb, hh]]).astype(np.float64)
                s = kv8 @ q * sm
                p = np.exp(s - s.max())
                ref = (p @ kv8[:, :512]) / p.sum()
                np.testing.assert_allclose(
                    np.asarray(out8, np.float32)[bb, hh], ref, rtol=8e-2, atol=8e-2)


class TestVerticalSlash:
    def test_matches_masked_dense(self, rng):
        from sgl_kernel_tpu.ops.attention.sparse_vs import sparse_attention_vertical_slash

        b, s, h, d = 1, 32, 2, 16
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v_idx = np.asarray([[0, 5, -1], [3, 7, 10]], np.int32)
        s_idx = np.asarray([[0, 1, -1], [0, 2, 4]], np.int32)
        out = sparse_attention_vertical_slash(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(v_idx), jnp.asarray(s_idx)
        )
        # numpy oracle
        for hh in range(h):
            mask = np.zeros((s, s), bool)
            for c in v_idx[hh]:
                if c >= 0:
                    mask[:, c] = True
            for off in s_idx[hh]:
                if off >= 0:
                    for i in range(s):
                        if i - off >= 0:
                            mask[i, i - off] = True
            mask &= np.tril(np.ones((s, s), bool))
            sc = q[0, :, hh] @ k[0, :, hh].T / np.sqrt(d)
            sc = np.where(mask, sc, -np.inf)
            m = np.maximum(sc.max(-1, keepdims=True), -1e30)
            p = np.exp(sc - m)
            ref = (p @ v[0, :, hh]) / np.maximum(p.sum(-1, keepdims=True), 1e-38)
            np.testing.assert_allclose(np.asarray(out)[0, :, hh], ref, rtol=1e-4, atol=1e-4)

    def test_index_builder_shapes(self, rng):
        from sgl_kernel_tpu.ops.attention.sparse_vs import build_vertical_slash_indexes

        b, s, h, d = 1, 64, 2, 16
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        vi, si = build_vertical_slash_indexes(q, k, 8, 4, last_q=16)
        assert vi.shape == (h, 8) and si.shape == (h, 4)
        # offset 0 (self) should be the strongest diagonal for random data
        assert 0 in np.asarray(si)[0]


class TestQIndexer:
    def test_fused_rope_hadamard_quant(self, rng):
        from sgl_kernel_tpu.ops.attention.nsa import fused_q_indexer_rope_hadamard_quant
        from sgl_kernel_tpu.ops.rope import compute_cos_sin_cache

        t, h, d = 4, 2, 128
        q = rng.standard_normal((t, h, d)).astype(np.float32)
        cache = compute_cos_sin_cache(d, 32)
        pos = np.arange(t, dtype=np.int32)
        qq, s = fused_q_indexer_rope_hadamard_quant(jnp.asarray(q), jnp.asarray(pos), cache)
        assert qq.dtype == jnp.float8_e4m3fn and s.shape == (t, h, 1)
        # dequant roundtrip stays close to the rope+hadamard reference
        from sgl_kernel_tpu.ops.hadamard import hadamard_transform
        from sgl_kernel_tpu.ops.rope import rotary_embedding
        qr, _ = rotary_embedding(jnp.asarray(pos), jnp.asarray(q), None, d, cache)
        ref = np.asarray(hadamard_transform(qr, scale=1.0 / np.sqrt(d)))
        deq = np.asarray(qq, np.float32) * np.asarray(s)
        np.testing.assert_allclose(deq, ref, rtol=0.15, atol=np.abs(ref).max() / 200)


class TestRaggedIndexer:
    def test_fp8_mqa_logits_matches_oracle(self, rng):
        from sgl_kernel_tpu.ops.attention.nsa import fp8_mqa_logits

        nq, nk, h, d = 4, 16, 2, 32
        q = jnp.asarray(rng.standard_normal((nq, h, d)) * 0.3, jnp.float8_e4m3fn)
        k = jnp.asarray(rng.standard_normal((nk, d)) * 0.3, jnp.float8_e4m3fn)
        ksc = jnp.asarray(rng.random(nk) + 0.5, jnp.float32)
        w = jnp.asarray(rng.random((nq, h)), jnp.float32)
        ks = jnp.asarray([0, 2, 0, 5], jnp.int32)
        ke = jnp.asarray([16, 10, 8, 16], jnp.int32)
        out = fp8_mqa_logits(q, (k, ksc), w, ks, ke)
        qf = np.asarray(q, np.float32); kf = np.asarray(k, np.float32)
        dots = np.einsum("qhd,nd->qhn", qf, kf)
        ref = (np.maximum(dots, 0) * np.asarray(w)[..., None]).sum(1) * np.asarray(ksc)[None]
        j = np.arange(nk)[None]
        ref = ref * ((j >= np.asarray(ks)[:, None]) & (j < np.asarray(ke)[:, None]))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)

    def test_ragged_topk_transform(self, rng):
        from sgl_kernel_tpu.ops.attention.nsa import fast_topk_transform_ragged_fused

        nq, nk, page = 2, 32, 8
        logits = jnp.asarray(rng.standard_normal((nq, nk)), jnp.float32)
        ks = jnp.asarray([0, 8], jnp.int32)
        ke = jnp.asarray([20, 32], jnp.int32)
        table = jnp.asarray(np.tile(np.arange(nk // page, dtype=np.int32) + 3, (nq, 1)))
        out = np.asarray(fast_topk_transform_ragged_fused(logits, ks, ke, table, page, topk=8))
        for i in range(nq):
            window = np.arange(int(ks[i]), int(ke[i]))
            best = window[np.argsort(-np.asarray(logits)[i, window])[:8]]
            got = out[i][out[i] >= 0]
            exp_slots = (np.asarray(table)[i, best // page] * page + best % page)
            assert set(got.tolist()) == set(exp_slots.tolist())


class TestKIndexerIngest:
    def test_store_and_score_consistency(self, rng):
        """The stored fp8 rows must reproduce norm+rope+hadamard+quant of
        the inputs, and slot -1 must drop."""
        from sgl_kernel_tpu.ops.attention.nsa import (
            fused_k_indexer_norm_rope_quant_store, fused_q_indexer_rope_hadamard_quant,
        )
        from sgl_kernel_tpu.ops import rope as rope_mod

        t, d, slots = 3, 128, 8
        k = rng.standard_normal((t, d)).astype(np.float32)
        w = (rng.random(d) + 0.5).astype(np.float32)
        pos = jnp.asarray([0, 2, 5], jnp.int32)
        cache = rope_mod.compute_cos_sin_cache(d, 16)
        idx = jnp.zeros((slots, d), jnp.float8_e4m3fn)
        sc = jnp.zeros((slots,), jnp.float32)
        loc = jnp.asarray([1, -1, 4], jnp.int32)
        idx2, sc2 = fused_k_indexer_norm_rope_quant_store(
            jnp.asarray(k), pos, cache, jnp.asarray(w), idx, sc, loc
        )
        # reference via the q-side pipeline on pre-normed input
        kn = np.asarray(k) / np.sqrt((k**2).mean(-1, keepdims=True) + 1e-6) * w
        q8, qs = fused_q_indexer_rope_hadamard_quant(
            jnp.asarray(kn)[:, None, :], pos, cache
        )
        got = np.asarray(idx2, np.float32)
        np.testing.assert_allclose(got[1], np.asarray(q8, np.float32)[0, 0], rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(got[4], np.asarray(q8, np.float32)[2, 0], rtol=2e-2, atol=2e-2)
        assert np.all(got[2] == 0)  # dropped row untouched
        np.testing.assert_allclose(np.asarray(sc2)[1], np.asarray(qs).reshape(-1)[0], rtol=1e-4)


class TestNsaRegressions:
    def test_ragged_topk_short_kv(self, rng):
        """KV width < topk must clamp + pad with -1, not crash (trace-time
        ValueError before the fix)."""
        from sgl_kernel_tpu.ops.attention.nsa import fast_topk_transform_ragged_fused

        nq, nk, page = 4, 64, 16
        logits = jnp.asarray(rng.standard_normal((nq, nk)), jnp.float32)
        ks = jnp.zeros(nq, jnp.int32)
        ke = jnp.asarray([10, 64, 1, 30], jnp.int32)
        table = jnp.asarray(rng.integers(0, 8, (nq, nk // page)), jnp.int32)
        out = fast_topk_transform_ragged_fused(logits, ks, ke, table, page)
        assert out.shape == (nq, 2048)
        n_valid = (np.asarray(out) >= 0).sum(axis=1)
        np.testing.assert_array_equal(n_valid, [10, 64, 1, 30])

    def test_mqa_logits_clean_masks_inf(self, rng):
        """clean_logits=True: out-of-window positions are -inf (a direct
        top_k can never select them even when in-window scores are
        negative — reference ref_fp8_mqa_logits contract)."""
        from sgl_kernel_tpu.ops.attention.nsa import fp8_mqa_logits

        nq, h, d, t = 2, 2, 32, 16
        q = jnp.asarray(rng.standard_normal((nq, h, d)), jnp.float8_e4m3fn)
        kv = jnp.asarray(rng.standard_normal((t, d)), jnp.float8_e4m3fn)
        sc = jnp.ones(t, jnp.float32)
        w = jnp.asarray(-np.abs(rng.standard_normal((nq, h))), jnp.float32)
        ks = jnp.asarray([2, 0], jnp.int32)
        ke = jnp.asarray([10, 5], jnp.int32)
        out = fp8_mqa_logits(q, (kv, sc), w, ks, ke, clean_logits=True)
        o = np.asarray(out)
        assert np.isneginf(o[0, :2]).all() and np.isneginf(o[0, 10:]).all()
        assert np.isneginf(o[1, 5:]).all() and np.isfinite(o[1, :5]).all()


def test_sparse_mla_dual_pool_both_empty_is_zero():
    """Both pools empty for a row: merge_state of two -inf lses would be
    NaN — the contract is zeros (code-review finding, round 3)."""
    import numpy as np

    from sgl_kernel_tpu.ops.attention.nsa import sparse_mla_decode

    rng = np.random.default_rng(0)
    b, h, nslots, kk = 3, 4, 256, 8
    pool = jnp.asarray(rng.standard_normal((nslots, 576)) * 0.1, jnp.bfloat16)
    extra = jnp.asarray(rng.standard_normal((nslots, 576)) * 0.1, jnp.bfloat16)
    qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, nslots, (b, kk)), jnp.int32)
    eidx = jnp.asarray(rng.integers(0, nslots, (b, kk)), jnp.int32)
    tl = jnp.asarray([kk, 0, kk], jnp.int32)
    etl = jnp.asarray([kk, 0, 0], jnp.int32)  # row 1: BOTH empty
    o = sparse_mla_decode(qn, qp, pool, idx, topk_length=tl,
                          extra_pool_flat=extra, extra_indices=eidx,
                          extra_topk_length=etl)
    o = np.asarray(o, np.float64)
    assert np.isfinite(o).all()
    np.testing.assert_array_equal(o[1], np.zeros_like(o[1]))
    assert np.abs(o[0]).max() > 0 and np.abs(o[2]).max() > 0
    # default (counted) lengths path: all -1 rows in both pools
    idx2 = idx.at[1].set(-1)
    eidx2 = eidx.at[1].set(-1)
    o2 = sparse_mla_decode(qn, qp, pool, idx2, extra_pool_flat=extra,
                           extra_indices=eidx2)
    assert np.isfinite(np.asarray(o2, np.float64)).all()
