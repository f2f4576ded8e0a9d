"""Flash attention (prefill + paged decode) and merge_state tests.

Tolerances follow the reference FA-style dynamic tolerance idea
(test_flash_attention.py:1844-1881) simplified: fp32 inputs on CPU
interpret-mode vs a numpy fp64 oracle at rtol/atol 2e-2 (bf16-grade) or
2e-3 (f32-grade).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from ref_attention import ref_attention

from sgl_kernel_tpu.ops import attention


class TestMergeState:
    def test_matches_direct_softmax(self, rng):
        # split a full softmax attention into two halves and merge
        t, h, d, s = 8, 4, 64, 256
        q = rng.standard_normal((t, h, d)).astype(np.float32)
        k = rng.standard_normal((s, h, d)).astype(np.float32)
        v = rng.standard_normal((s, h, d)).astype(np.float32)

        def part(ks, vs):
            o = np.zeros((t, h, d))
            lse = np.zeros((t, h))
            for hh in range(h):
                sc = q[:, hh] @ ks[:, hh].T / np.sqrt(d)
                m = sc.max(-1, keepdims=True)
                p = np.exp(sc - m)
                l = p.sum(-1, keepdims=True)
                o[:, hh] = p @ vs[:, hh] / l
                lse[:, hh] = ((m + np.log(l)) * np.log2(np.e))[:, 0]
            return o, lse

        oa, sa = part(k[: s // 2], v[: s // 2])
        ob, sb = part(k[s // 2 :], v[s // 2 :])
        om, sm = attention.merge_state(
            jnp.asarray(oa, jnp.float32), jnp.asarray(sa, jnp.float32),
            jnp.asarray(ob, jnp.float32), jnp.asarray(sb, jnp.float32),
        )
        ofull, sfull = part(k, v)
        np.testing.assert_allclose(np.asarray(om), ofull, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sm), sfull, rtol=1e-4, atol=1e-4)

    def test_merge_states_stack(self, rng):
        n, t, h, d = 4, 8, 2, 32
        v = rng.standard_normal((n, t, h, d)).astype(np.float32)
        s = rng.standard_normal((n, t, h)).astype(np.float32)
        vm, sm = attention.merge_states(jnp.asarray(v), jnp.asarray(s))
        # fold pairwise as oracle
        va, sa = v[0], s[0]
        for i in range(1, n):
            va, sa = attention.merge_state(jnp.asarray(va), jnp.asarray(sa), jnp.asarray(v[i]), jnp.asarray(s[i]))
            va, sa = np.asarray(va), np.asarray(sa)
        np.testing.assert_allclose(np.asarray(vm), va, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sm), sa, rtol=1e-4, atol=1e-4)


class TestFlashPrefill:
    @pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
    @pytest.mark.parametrize("causal", [True, False])
    def test_basic(self, rng, hq, hkv, causal):
        b, s, d = 2, 256, 64
        q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
        k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
        v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
        out = attention.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
        for bb in range(b):
            ref, _ = ref_attention(q[bb], k[bb], v[bb], causal=causal)
            np.testing.assert_allclose(np.asarray(out)[bb], ref, rtol=2e-3, atol=2e-3)

    def test_varlen_and_extend_offset(self, rng):
        # chunked prefill: q is the last q_len tokens of a kv_len-long context
        b, sq, skv, h, d = 2, 128, 384, 2, 64
        q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
        k = rng.standard_normal((b, skv, h, d)).astype(np.float32)
        v = rng.standard_normal((b, skv, h, d)).astype(np.float32)
        q_lens = np.array([128, 70], np.int32)
        kv_lens = np.array([384, 200], np.int32)
        out = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(q_lens), jnp.asarray(kv_lens), causal=True,
        )
        for bb in range(b):
            ref, _ = ref_attention(
                q[bb, : q_lens[bb]], k[bb], v[bb], causal=True,
                q_len=int(q_lens[bb]), kv_len=int(kv_lens[bb]),
            )
            np.testing.assert_allclose(np.asarray(out)[bb, : q_lens[bb]], ref, rtol=2e-3, atol=2e-3)

    def test_sliding_window(self, rng):
        b, s, h, d = 1, 256, 2, 64
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        out = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, sliding_window=64
        )
        ref, _ = ref_attention(q[0], k[0], v[0], causal=True, window=64)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-3, atol=2e-3)

    def test_softcap_and_sinks(self, rng):
        b, s, h, d = 1, 128, 4, 64
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        sinks = rng.standard_normal(h).astype(np.float32)
        out = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), sinks=jnp.asarray(sinks),
            causal=True, logit_soft_cap=30.0,
        )
        ref, _ = ref_attention(q[0], k[0], v[0], causal=True, soft_cap=30.0, sinks=sinks)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-3, atol=2e-3)

    def test_lse_output(self, rng):
        b, s, h, d = 1, 128, 2, 64
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s, h, d)).astype(np.float32)
        out, lse = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True, return_lse=True
        )
        ref, ref_lse = ref_attention(q[0], k[0], v[0], causal=True)
        np.testing.assert_allclose(np.asarray(lse)[0], ref_lse, rtol=1e-3, atol=1e-3)

    def test_merge_of_chunks_equals_full(self, rng):
        # the split-KV contract: attend to two KV chunks separately (non-causal)
        # and merge with merge_state == full attention
        b, s, h, d = 1, 128, 2, 64
        q = rng.standard_normal((b, s, h, d)).astype(np.float32)
        k = rng.standard_normal((b, 2 * s, h, d)).astype(np.float32)
        v = rng.standard_normal((b, 2 * s, h, d)).astype(np.float32)
        o1, s1 = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k[:, :s]), jnp.asarray(v[:, :s]), causal=False, return_lse=True
        )
        o2, s2 = attention.flash_attention(
            jnp.asarray(q), jnp.asarray(k[:, s:]), jnp.asarray(v[:, s:]), causal=False, return_lse=True
        )
        om, _ = attention.merge_state(
            o1[0], jnp.swapaxes(s1[0], 0, 1), o2[0], jnp.swapaxes(s2[0], 0, 1)
        )
        ref, _ = ref_attention(q[0], k[0], v[0], causal=False)
        np.testing.assert_allclose(np.asarray(om), ref, rtol=2e-3, atol=2e-3)


def make_paged(rng, b, hkv, d, page, lengths, n_pages):
    """Scatter per-seq KV into a paged pool; returns pool + page table + flat kv."""
    max_blocks = (max(lengths) + page - 1) // page
    k_pages = np.zeros((hkv, n_pages, page, d), np.float32)
    v_pages = np.zeros((hkv, n_pages, page, d), np.float32)
    table = np.zeros((b, max_blocks), np.int32)
    ks, vs = [], []
    next_page = 1  # page 0 kept as the pad page
    for bb in range(b):
        kk = rng.standard_normal((lengths[bb], hkv, d)).astype(np.float32)
        vv = rng.standard_normal((lengths[bb], hkv, d)).astype(np.float32)
        ks.append(kk)
        vs.append(vv)
        nb = (lengths[bb] + page - 1) // page
        for i in range(nb):
            pid = next_page
            next_page += 1
            table[bb, i] = pid
            chunk = kk[i * page : (i + 1) * page]
            k_pages[:, pid, : len(chunk)] = chunk.transpose(1, 0, 2)
            v_pages[:, pid, : len(chunk)] = vv[i * page : (i + 1) * page].transpose(1, 0, 2)
    return k_pages, v_pages, table, ks, vs


class TestPagedDecode:
    @pytest.mark.parametrize("hq,hkv", [(8, 8), (32, 8), (4, 1)])
    def test_basic(self, rng, hq, hkv):
        b, d, page = 3, 64, 64
        lengths = [170, 64, 33]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=16)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = attention.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)

    def test_fp8_kv_with_descale(self, rng):
        b, hq, hkv, d, page = 2, 8, 4, 64, 64
        lengths = [100, 60]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        k_scale, v_scale = 0.06, 0.04
        kq = jnp.asarray(k_pages / k_scale).astype(jnp.float8_e4m3fn)
        vq = jnp.asarray(v_pages / v_scale).astype(jnp.float8_e4m3fn)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = attention.paged_attention_decode(
            jnp.asarray(q, jnp.bfloat16), kq, vq,
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            k_scale=k_scale, v_scale=v_scale,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out, np.float32)[bb], ref[0], rtol=0.12, atol=0.12)

    def test_sliding_window_and_sinks(self, rng):
        b, hq, hkv, d, page = 1, 4, 2, 64, 64
        lengths = [200]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=8)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        sinks = rng.standard_normal(hq).astype(np.float32)
        out = attention.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            sinks=jnp.asarray(sinks), sliding_window=64,
        )
        ref, _ = ref_attention(
            q[0][None], ks[0], vs[0], causal=False, window=64, sinks=sinks,
            q_len=1, kv_len=lengths[0],
        )
        np.testing.assert_allclose(np.asarray(out)[0], ref[0], rtol=2e-2, atol=2e-2)

    def test_lse(self, rng):
        b, hq, hkv, d, page = 1, 2, 2, 64, 64
        lengths = [90]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=4)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out, lse = attention.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table), return_lse=True,
        )
        ref, ref_lse = ref_attention(q[0][None], ks[0], vs[0], causal=False)
        np.testing.assert_allclose(np.asarray(lse)[0], ref_lse[:, 0], rtol=1e-3, atol=1e-3)


class TestFlashAttnAPI:
    def test_varlen_matches_padded(self, rng):
        from sgl_kernel_tpu.ops.attention.api import flash_attn_varlen_func
        from sgl_kernel_tpu.ops.attention import flash_attention

        lens = [5, 9]
        tq = sum(lens)
        h, d = 4, 64
        q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float32)
        cu = jnp.asarray([0, 5, 14], jnp.int32)
        out = flash_attn_varlen_func(q, k, v, cu, cu, 16, 16, causal=True)
        # oracle: per-sequence dense attention
        for i, (s0, s1) in enumerate(zip([0, 5], [5, 14])):
            qb = q[s0:s1][None]
            ref = flash_attention(qb, k[s0:s1][None], v[s0:s1][None],
                                  jnp.asarray([s1 - s0], jnp.int32), jnp.asarray([s1 - s0], jnp.int32),
                                  causal=True)
            np.testing.assert_allclose(np.asarray(out[s0:s1]), np.asarray(ref[0]), rtol=2e-3, atol=2e-3)

    def test_with_kvcache_decode_append(self, rng):
        from sgl_kernel_tpu.ops.attention.api import flash_attn_with_kvcache

        b, hq, hkv, d, pages, page = 2, 4, 2, 64, 4, 16
        kc = jnp.zeros((pages, hkv, page, d))
        vc = jnp.zeros((pages, hkv, page, d))
        table = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
        # seed cache with 3 tokens each
        hist_k = rng.standard_normal((b, 3, hkv, d)).astype(np.float32)
        hist_v = rng.standard_normal((b, 3, hkv, d)).astype(np.float32)
        q0 = jnp.asarray(rng.standard_normal((b, 3, hq, d)), jnp.float32)
        _, kc, vc = flash_attn_with_kvcache(
            q0, kc, vc, jnp.asarray(hist_k), jnp.asarray(hist_v),
            cache_seqlens=jnp.zeros(b, jnp.int32), page_table=table, causal=True,
        )
        # now decode one token
        qd = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
        kd = rng.standard_normal((b, 1, hkv, d)).astype(np.float32)
        vd = rng.standard_normal((b, 1, hkv, d)).astype(np.float32)
        out, kc, vc = flash_attn_with_kvcache(
            qd, kc, vc, jnp.asarray(kd), jnp.asarray(vd),
            cache_seqlens=jnp.full(b, 3, jnp.int32), page_table=table, causal=True,
        )
        # oracle: dense attention over the 4 tokens
        kk = np.concatenate([hist_k, kd], 1)
        vv = np.concatenate([hist_v, vd], 1)
        g = hq // hkv
        for i in range(b):
            for hh in range(hq):
                s = np.asarray(qd)[i, 0, hh] @ kk[i, :, hh // g].T / np.sqrt(d)
                p = np.exp(s - s.max()); p /= p.sum()
                ref = p @ vv[i, :, hh // g]
                np.testing.assert_allclose(np.asarray(out)[i, 0, hh], ref, rtol=2e-3, atol=2e-3)


class TestKvcacheDecodeLse:
    def test_decode_lse(self, rng):
        """flash_attn_with_kvcache(return_softmax_lse=True) on the sq=1
        decode path — the reference returns base-2 lse [B, Hq, Sq]."""
        from sgl_kernel_tpu.ops.attention.api import flash_attn_with_kvcache

        b, hq, hkv, d, pages, page = 1, 4, 2, 64, 4, 32
        kc = jnp.zeros((pages, hkv, page, d))
        vc = jnp.zeros_like(kc)
        table = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        hist = 50
        hk = rng.standard_normal((b, hist, hkv, d)).astype(np.float32)
        hv = rng.standard_normal((b, hist, hkv, d)).astype(np.float32)
        q0 = jnp.asarray(rng.standard_normal((b, hist, hq, d)), jnp.float32)
        _, kc, vc = flash_attn_with_kvcache(
            q0, kc, vc, jnp.asarray(hk), jnp.asarray(hv),
            cache_seqlens=jnp.zeros(b, jnp.int32), page_table=table, causal=True,
        )
        qd = rng.standard_normal((b, 1, hq, d)).astype(np.float32)
        out, lse, kc, vc = flash_attn_with_kvcache(
            jnp.asarray(qd), kc, vc,
            cache_seqlens=jnp.full(b, hist, jnp.int32), page_table=table,
            return_softmax_lse=True,
        )
        assert lse.shape == (b, hq, 1)
        g = hq // hkv
        for hh in range(hq):
            s = qd[0, 0, hh] @ np.asarray(hk)[0, :, hh // g].T / np.sqrt(d)
            ref_lse = np.log2(np.exp(s - s.max()).sum()) + s.max() * np.log2(np.e)
            np.testing.assert_allclose(np.asarray(lse)[0, hh, 0], ref_lse, rtol=1e-3, atol=1e-3)


class TestPagedDecodePps:
    @pytest.mark.parametrize("pps", [1, 2, 3, 4])
    def test_pps_variants_match(self, rng, pps):
        b, hq, hkv, d, page = 2, 8, 2, 64, 16
        lengths = [37, 61]
        k_pages, v_pages, table, ks, vs = make_paged(rng, b, hkv, d, page, lengths, n_pages=16)
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        out = attention.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table), pages_per_step=pps,
        )
        for bb in range(b):
            ref, _ = ref_attention(q[bb][None], ks[bb], vs[bb], causal=False)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)


class TestConvertVerticalSlash:
    def test_properties(self, rng):
        """Property oracle: every emitted block is slash-covered (clipped,
        aligned), every emitted column is a requested vertical outside the
        blocks, and nothing crosses the causal bound."""
        from sgl_kernel_tpu.ops.attention.sparse_vs import convert_vertical_slash_indexes

        bM, bN = 16, 16
        q_len = kv_len = 64
        verticals = np.asarray([[[0, 5, 20, 40]]], np.int32)
        slashes = np.asarray([[[30, 10, 0]]], np.int32)  # descending
        bc, bo, cc, ci = convert_vertical_slash_indexes(
            [q_len], [kv_len], verticals, slashes, q_len, bM, bN, causal=True
        )
        rows = q_len // bM
        for r in range(rows):
            end_m = (r + 1) * bM
            bound = min(end_m, kv_len)
            blocks = bo[0, 0, r, : bc[0, 0, r]]
            # aligned + below bound
            assert all(x % bN == 0 for x in blocks)
            assert all(x < bound for x in blocks)
            # slash bands [end_m - s - bM, end_m - s) intersect the blocks
            for s in slashes[0, 0]:
                e = min(end_m - s, bound)
                if e <= 0:
                    continue
                band = set(range(max(e - bM, 0), e))
                covered = set()
                for x in blocks:
                    covered |= set(range(x, x + bN))
                assert band & covered, (r, s)
            cols = ci[0, 0, r, : cc[0, 0, r]]
            for c in cols:
                assert c in verticals[0, 0]
                assert c < bound
                assert all(not (x <= c < x + bN) for x in blocks)

    def test_mergehead_truncates(self):
        from sgl_kernel_tpu.ops.attention.sparse_vs import (
            convert_vertical_slash_indexes, convert_vertical_slash_indexes_mergehead,
        )

        verticals = np.asarray([[[0, 17, 33, 49], [1, 18, 34, 50]]], np.int32)
        slashes = np.asarray([[[20, 4], [22, 6]]], np.int32)
        full = convert_vertical_slash_indexes([64], [64], verticals, slashes, 64, 16, 16)
        trunc = convert_vertical_slash_indexes_mergehead(
            [64], [64], verticals, slashes, np.asarray([2, 4]), np.asarray([1, 2]), 64, 16, 16
        )
        # head 1 untruncated -> identical; head 0's slash truncation can
        # only shrink the block schedule (former slash coverage may
        # reappear as explicit vertical columns)
        for a, b in zip(full, trunc):
            np.testing.assert_array_equal(a[0, 1], b[0, 1])
        assert (trunc[0][0, 0] <= full[0][0, 0]).all()


class TestApplySinks:
    def test_merge_then_sink_equals_single_kernel_sink(self, rng):
        """Split attention in two kv halves run sink-FREE, merge_state, then
        apply_sinks == one flash_attention WITH sinks (the extend/split
        contract, ops/attention/merge_state.apply_sinks)."""
        from sgl_kernel_tpu.ops.attention import (
            apply_sinks, flash_attention, merge_state)

        b, sq, skv, hq, hkv, d = 2, 32, 64, 4, 2, 64
        q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
        sinks = jnp.asarray(np.linspace(-1.0, 2.0, hq), jnp.float32)
        lens_q = jnp.full((b,), sq, jnp.int32)
        lens_kv = jnp.full((b,), skv, jnp.int32)
        qs = lens_kv - lens_q
        ref = flash_attention(q, k, v, lens_q, lens_kv, causal=True, sinks=sinks)
        half = skv // 2
        o1, l1 = flash_attention(
            q, k[:, :half], v[:, :half], lens_q, jnp.full((b,), half, jnp.int32),
            q_start=qs, kv_start=jnp.zeros((b,), jnp.int32),
            causal=True, return_lse=True)
        o2, l2 = flash_attention(
            q, k[:, half:], v[:, half:], lens_q, jnp.full((b,), skv - half, jnp.int32),
            q_start=qs, kv_start=jnp.full((b,), half, jnp.int32),
            causal=True, return_lse=True)
        om, lm = merge_state(
            o1.reshape(b * sq, hq, d), jnp.swapaxes(l1, 1, 2).reshape(b * sq, hq),
            o2.reshape(b * sq, hq, d), jnp.swapaxes(l2, 1, 2).reshape(b * sq, hq))
        got = apply_sinks(om, lm, sinks).reshape(b, sq, hq, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
