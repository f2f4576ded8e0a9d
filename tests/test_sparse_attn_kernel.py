"""Tile-skipping block-sparse attention kernel (sparse_attn_func) vs a
numpy oracle built from the SAME block schedule: the kernel's contract is
block-granular slash coverage + exact vertical columns (MInference
semantics, reference sparse_flash_attn.py::sparse_attn_func)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.attention.sparse_vs import (
    build_vertical_slash_indexes,
    convert_vertical_slash_indexes,
    sparse_attn_func,
    sparse_attn_varlen_func,
)


def oracle_from_schedule(q, k, v, bc, bo, cc, ci, bm, bn, causal, sm_scale,
                         softcap=0.0, with_lse=False):
    """fp64 dense attention restricted to the schedule-defined mask."""
    b, s, h, d = q.shape
    sk = k.shape[1]
    r = (s + bm - 1) // bm
    out = np.zeros((b, s, h, d))
    lse = np.full((b, h, s), -np.inf)
    for bb in range(b):
        for hh in range(h):
            mask = np.zeros((s, sk), bool)
            for rr in range(r):
                rows = slice(rr * bm, min((rr + 1) * bm, s))
                for i in range(bc[bb, hh, rr]):
                    st = bo[bb, hh, rr, i]
                    mask[rows, st : min(st + bn, sk)] = True
                for i in range(cc[bb, hh, rr]):
                    mask[rows, ci[bb, hh, rr, i]] = True
            if causal:
                mask &= np.tril(np.ones((s, sk), bool))
            sc = (q[bb, :, hh].astype(np.float64) @ k[bb, :, hh].astype(np.float64).T) * sm_scale
            if softcap > 0.0:
                sc = softcap * np.tanh(sc / softcap)
            sc = np.where(mask, sc, -np.inf)
            m = np.maximum(sc.max(-1, keepdims=True), -1e30)
            p = np.exp(sc - m)
            l = p.sum(-1, keepdims=True)
            o = p @ v[bb, :, hh].astype(np.float64)
            out[bb, :, hh] = np.where(l > 0, o / np.maximum(l, 1e-300), 0.0)
            lse[bb, hh] = np.where(
                l[:, 0] > 0, m[:, 0] + np.log(np.maximum(l[:, 0], 1e-300)), -np.inf)
    if with_lse:
        return out, lse
    return out


@pytest.mark.parametrize("s,bm,bn", [(256, 64, 128), (384, 128, 128), (256, 64, 64)])
@pytest.mark.parametrize("nv,nsl", [(16, 4), (0, 6), (8, 0)])
def test_vs_oracle(rng, s, bm, bn, nv, nsl):
    b, h, d = 1, 2, 128
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v_idx = np.sort(rng.choice(s, (b, h, max(nv, 1)), replace=False), axis=-1)
    s_idx = np.sort(rng.choice(s, (b, h, max(nsl, 1)), replace=False), axis=-1)[..., ::-1]
    if nv == 0:
        v_idx = v_idx[..., :0].reshape(b, h, 0)
        v_idx = np.zeros((b, h, 1), np.int32)  # builders need >=1; count masks it
        s_idx = np.ascontiguousarray(s_idx)
    if nsl == 0:
        s_idx = np.full((b, h, 1), 1 << 29, np.int32)  # out of range -> no blocks
    bc, bo, cc, ci = convert_vertical_slash_indexes(
        [s], [s], v_idx, np.ascontiguousarray(s_idx), s, bm, bn
    )
    if nv == 0:
        cc[:] = 0
    sm = 1.0 / d**0.5
    ref = oracle_from_schedule(q, k, v, bc, bo, cc, ci, bm, bn, True, sm)
    got = sparse_attn_func(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
        block_size_M=bm, block_size_N=bn,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_vs_full_coverage_matches_dense(rng):
    """Slash set covering every diagonal -> kernel == dense causal attention."""
    b, s, h, d = 1, 256, 2, 128
    bm = bn = 64
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    s_idx = np.broadcast_to(np.arange(s)[::-1].copy(), (b, h, s))
    v_idx = np.zeros((b, h, 1), np.int32)
    bc, bo, cc, ci = convert_vertical_slash_indexes([s], [s], v_idx, s_idx, s, bm, bn)
    cc[:] = 0
    got = np.asarray(sparse_attn_func(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
        block_size_M=bm, block_size_N=bn,
    ))
    sm = 1.0 / d**0.5
    for hh in range(h):
        sc = (q[0, :, hh] @ k[0, :, hh].T).astype(np.float64) * sm
        sc = np.where(np.tril(np.ones((s, s), bool)), sc, -np.inf)
        p = np.exp(sc - sc.max(-1, keepdims=True))
        ref = p @ v[0, :, hh] / p.sum(-1, keepdims=True)
        np.testing.assert_allclose(got[0, :, hh], ref, rtol=2e-3, atol=2e-3)


def test_vs_bf16_and_end_to_end_estimator(rng):
    """build_vertical_slash_indexes -> convert -> kernel pipeline runs and
    approximates dense attention when the pattern captures most mass."""
    b, s, h, d = 1, 256, 2, 128
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    qj, kj, vj = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    v_idx, s_idx = build_vertical_slash_indexes(qj, kj, num_vertical=32, num_slash=32)
    v_idx = np.sort(np.asarray(v_idx), axis=-1)[None].repeat(b, 0)
    s_idx = np.sort(np.asarray(s_idx), axis=-1)[..., ::-1][None].repeat(b, 0)
    bc, bo, cc, ci = convert_vertical_slash_indexes(
        [s], [s], v_idx, np.ascontiguousarray(s_idx), s, 64, 64
    )
    out = sparse_attn_func(
        qj, kj, vj, jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc),
        jnp.asarray(ci), block_size_M=64, block_size_N=64,
    )
    assert out.shape == (b, s, h, d) and out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    ref = oracle_from_schedule(q, k, v, bc, bo, cc, ci, 64, 64, True, 1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.1, atol=0.1)


def test_softcap_and_lse_vs_oracle(rng):
    """softcap folds into the schedule mask math; lse matches the fp64
    oracle's m + log(l) (natural log) and is -inf on empty rows."""
    b, s, h, d = 1, 256, 2, 128
    bm = bn = 64
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v_idx = np.sort(rng.choice(s, (b, h, 16), replace=False), axis=-1)
    s_idx = np.sort(rng.choice(s, (b, h, 4), replace=False), axis=-1)[..., ::-1]
    bc, bo, cc, ci = convert_vertical_slash_indexes(
        [s], [s], v_idx, np.ascontiguousarray(s_idx), s, bm, bn)
    sm = 1.0 / d**0.5
    ref, ref_lse = oracle_from_schedule(
        q, k, v, bc, bo, cc, ci, bm, bn, True, sm, softcap=20.0, with_lse=True)
    got, got_lse = sparse_attn_func(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
        block_size_M=bm, block_size_N=bn, softcap=20.0, return_lse=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
    fin = np.isfinite(ref_lse)
    assert got_lse.shape == (b, h, s)
    np.testing.assert_allclose(
        np.asarray(got_lse)[fin], ref_lse[fin], rtol=2e-3, atol=2e-3)
    assert np.all(np.asarray(got_lse)[~fin] == -np.inf)


class TestVarlen:
    """sparse_attn_varlen_func (reference sparse_flash_attn.py:851-935):
    ragged token streams + per-sequence schedules."""

    def _schedule(self, rng, q_lens, k_lens, h, bm, bn, nv=12, nsl=4, causal=True):
        smax = ((max(max(q_lens), max(k_lens)) + bm - 1) // bm) * bm
        b = len(q_lens)
        # vertical columns must be UNIQUE per head (MInference topk
        # contract) — the kernel sums duplicate columns twice by design
        v_idx = np.stack([
            np.stack([np.sort(rng.choice(max(kl, 1), min(nv, max(kl, 1)),
                                         replace=False)) for _ in range(h)])
            for kl in k_lens])
        s_idx = np.stack([
            np.sort(rng.choice(max(kl, 1), (h, nsl), replace=True), axis=-1)[..., ::-1]
            for kl in k_lens])
        return convert_vertical_slash_indexes(
            q_lens, k_lens, v_idx, np.ascontiguousarray(s_idx), smax, bm, bn,
            causal=causal)

    def test_varlen_vs_per_sequence_oracle(self, rng):
        h, d, bm, bn = 2, 128, 64, 64
        lens = [192, 256, 100]
        bc, bo, cc, ci = self._schedule(rng, lens, lens, h, bm, bn)
        total = sum(lens)
        q = rng.standard_normal((total, h, d)).astype(np.float32)
        k = rng.standard_normal((total, h, d)).astype(np.float32)
        v = rng.standard_normal((total, h, d)).astype(np.float32)
        cu = np.concatenate([[0], np.cumsum(lens)])
        sm = 1.0 / d**0.5
        got, got_lse = sparse_attn_varlen_func(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
            cu, cu, max(lens), max(lens), causal=True,
            block_size_M=bm, block_size_N=bn, return_softmax_lse=True)
        assert got.shape == (total, h, d)
        assert got_lse.shape == (h, total)
        for b_, l in enumerate(lens):
            sl = slice(cu[b_], cu[b_ + 1])
            ref, ref_lse = oracle_from_schedule(
                q[None, sl], k[None, sl], v[None, sl],
                bc[b_ : b_ + 1], bo[b_ : b_ + 1], cc[b_ : b_ + 1], ci[b_ : b_ + 1],
                bm, bn, True, sm, with_lse=True)
            np.testing.assert_allclose(np.asarray(got)[sl], ref[0], rtol=2e-3, atol=2e-3)
            fin = np.isfinite(ref_lse[0])
            np.testing.assert_allclose(
                np.asarray(got_lse)[:, sl][fin], ref_lse[0][fin], rtol=2e-3, atol=2e-3)

    def test_varlen_gqa_noncausal_ragged_kv(self, rng):
        """GQA head expansion + kv_len != q_len (non-causal cross form)."""
        h, hk, d, bm, bn = 4, 2, 128, 64, 64
        q_lens, k_lens = [64, 130], [200, 96]
        bc, bo, cc, ci = self._schedule(
            rng, q_lens, k_lens, h, bm, bn, causal=False)
        tq, tk = sum(q_lens), sum(k_lens)
        q = rng.standard_normal((tq, h, d)).astype(np.float32)
        k = rng.standard_normal((tk, hk, d)).astype(np.float32)
        v = rng.standard_normal((tk, hk, d)).astype(np.float32)
        cu_q = np.concatenate([[0], np.cumsum(q_lens)])
        cu_k = np.concatenate([[0], np.cumsum(k_lens)])
        got = sparse_attn_varlen_func(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
            cu_q, cu_k, max(q_lens), max(k_lens), causal=False,
            block_size_M=bm, block_size_N=bn)
        sm = 1.0 / d**0.5
        kx = np.repeat(k, h // hk, axis=1)
        vx = np.repeat(v, h // hk, axis=1)
        for b_, (lq, lk) in enumerate(zip(q_lens, k_lens)):
            qb = q[cu_q[b_] : cu_q[b_ + 1]][None]
            kb = kx[cu_k[b_] : cu_k[b_ + 1]][None]
            vb = vx[cu_k[b_] : cu_k[b_ + 1]][None]
            ref = oracle_from_schedule(
                qb, kb, vb, bc[b_ : b_ + 1], bo[b_ : b_ + 1],
                cc[b_ : b_ + 1], ci[b_ : b_ + 1], bm, bn, False, sm)
            np.testing.assert_allclose(
                np.asarray(got)[cu_q[b_] : cu_q[b_ + 1]], ref[0],
                rtol=2e-3, atol=2e-3)

    def test_varlen_equal_lengths_matches_batched(self, rng):
        """Uniform lengths: the ragged path must reproduce the batched
        kernel exactly (same rectangle, same schedule)."""
        b, s, h, d = 2, 128, 2, 128
        bm = bn = 64
        bc, bo, cc, ci = self._schedule(rng, [s] * b, [s] * b, h, bm, bn)
        q = rng.standard_normal((b * s, h, d)).astype(np.float32)
        k = rng.standard_normal((b * s, h, d)).astype(np.float32)
        v = rng.standard_normal((b * s, h, d)).astype(np.float32)
        cu = np.arange(b + 1) * s
        got = sparse_attn_varlen_func(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
            cu, cu, s, s, causal=True, block_size_M=bm, block_size_N=bn)
        ref = sparse_attn_func(
            jnp.asarray(q.reshape(b, s, h, d)), jnp.asarray(k.reshape(b, s, h, d)),
            jnp.asarray(v.reshape(b, s, h, d)),
            jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
            block_size_M=bm, block_size_N=bn)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref).reshape(b * s, h, d))


class TestScheduleRegressions:
    def test_zero_length_plan_no_nan(self):
        """lengths==0 (padded slot) must not fire a compress event — an
        all-(-1) window softmaxes -inf into NaN inside a live ring slot."""
        from sgl_kernel_tpu.ops import compression

        src, dst, n = compression.plan_compress_decode(
            jnp.asarray([0, 8], jnp.int32), compress_ratio=4, ring_size=4)
        assert int(dst[0]) == -1 and int(n[0]) == 0
        assert int(dst[1]) >= 0

    def test_noncausal_blocks_clamped_to_kv_len(self, rng):
        """Non-causal schedules must not emit blocks past kv_len."""
        from sgl_kernel_tpu.ops.attention.sparse_vs import convert_vertical_slash_indexes

        s = 100
        bc, bo, cc, ci = convert_vertical_slash_indexes(
            np.asarray([s]), np.asarray([s]),
            np.zeros((1, 1, 4), np.int32),
            np.asarray([[[0, 3, 7, 11]]], np.int32),
            context_size=s, block_size_M=64, block_size_N=128, causal=False)
        for r in range(bc.shape[2]):
            for j in range(int(bc[0, 0, r])):
                assert int(bo[0, 0, r, j]) < s

    def test_negative_vertical_pad_excluded(self, rng):
        from sgl_kernel_tpu.ops.attention.sparse_vs import convert_vertical_slash_indexes

        s = 128
        bc, bo, cc, ci = convert_vertical_slash_indexes(
            np.asarray([s]), np.asarray([s]),
            np.asarray([[[5, -1, -1, -1]]], np.int32),
            np.asarray([[[0]]], np.int32),
            context_size=s, block_size_M=64, block_size_N=64, causal=True)
        for r in range(bc.shape[2]):
            n = int(cc[0, 0, r])
            assert (ci[0, 0, r, :n] >= 0).all()

    def test_varlen_reference_R_contract(self, rng):
        """Schedules built to the REFERENCE contract R = ceil(max_q/bm)
        must work when max_seqlen_k > max_seqlen_q (the kernel rectangle
        has more rows — the adapter zero-pads; advisor r4 finding)."""
        h, d, bm, bn = 2, 128, 64, 64
        q_lens, k_lens = [64, 120], [200, 96]
        # context = max_q rounded to bm -> R_doc = 2 < R_rect = 4
        smax_q = ((max(q_lens) + bm - 1) // bm) * bm
        v_idx = np.stack([
            np.stack([np.sort(rng.choice(kl, 8, replace=False)) for _ in range(h)])
            for kl in k_lens])
        s_idx = np.stack([
            np.sort(rng.choice(kl, (h, 3), replace=True), axis=-1)[..., ::-1]
            for kl in k_lens])
        bc, bo, cc, ci = convert_vertical_slash_indexes(
            q_lens, k_lens, v_idx, np.ascontiguousarray(s_idx), smax_q, bm, bn,
            causal=False)
        assert bc.shape[2] == smax_q // bm  # the documented R
        tq, tk = sum(q_lens), sum(k_lens)
        q = rng.standard_normal((tq, h, d)).astype(np.float32)
        k = rng.standard_normal((tk, h, d)).astype(np.float32)
        v = rng.standard_normal((tk, h, d)).astype(np.float32)
        cu_q = np.concatenate([[0], np.cumsum(q_lens)])
        cu_k = np.concatenate([[0], np.cumsum(k_lens)])
        got = sparse_attn_varlen_func(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bc), jnp.asarray(bo), jnp.asarray(cc), jnp.asarray(ci),
            cu_q, cu_k, max(q_lens), max(k_lens), causal=False,
            block_size_M=bm, block_size_N=bn)
        sm = 1.0 / d**0.5
        for b_, (lq, lk) in enumerate(zip(q_lens, k_lens)):
            qb = q[cu_q[b_] : cu_q[b_ + 1]][None]
            kb = k[cu_k[b_] : cu_k[b_ + 1]][None]
            vb = v[cu_k[b_] : cu_k[b_ + 1]][None]
            ref = oracle_from_schedule(
                qb, kb, vb, bc[b_ : b_ + 1], bo[b_ : b_ + 1],
                cc[b_ : b_ + 1], ci[b_ : b_ + 1], bm, bn, False, sm)
            np.testing.assert_allclose(
                np.asarray(got)[cu_q[b_] : cu_q[b_ + 1]], ref[0],
                rtol=2e-3, atol=2e-3)
