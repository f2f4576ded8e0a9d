"""MLA (DeepSeek latent attention) tests vs numpy oracle.

Shape contract from the reference (attention.py:77-81): D_latent=512,
D_rope=64, D_ckv=576; latent doubles as V.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.attention import mla


def ref_mla(q_nope, q_pe, kv, sm_scale, causal=False, q_len=None):
    """q_nope [S,H,512], q_pe [S,H,64], kv [T,576] -> [S,H,512]."""
    s, h, _ = q_nope.shape
    t = kv.shape[0]
    out = np.zeros((s, h, 512))
    lse = np.zeros((s, h))
    off = t - (q_len if q_len is not None else s)
    for hh in range(h):
        q = np.concatenate([q_nope[:, hh], q_pe[:, hh]], -1).astype(np.float64)
        sc = q @ kv.T.astype(np.float64) * sm_scale
        if causal:
            cols = np.arange(t)[None, :]
            rows = np.arange(s)[:, None]
            sc = np.where(cols <= rows + off, sc, -np.inf)
        m = sc.max(-1, keepdims=True)
        p = np.exp(sc - m)
        l = p.sum(-1, keepdims=True)
        out[:, hh] = p @ kv[:, :512].astype(np.float64) / l
        lse[:, hh] = ((m + np.log(l)) * np.log2(np.e))[:, 0]
    return out, lse


class TestMlaDecode:
    @pytest.mark.parametrize("h", [8, 16])
    def test_basic(self, rng, h):
        b, page = 2, 64
        lengths = [150, 80]
        n_pages = 8
        kv_pool = np.zeros((n_pages, page, 576), np.float32)
        kvs = []
        table = np.zeros((b, 3), np.int32)
        nxt = 1
        for bb in range(b):
            kv = (rng.standard_normal((lengths[bb], 576)) * 0.3).astype(np.float32)
            kvs.append(kv)
            for i in range((lengths[bb] + page - 1) // page):
                table[bb, i] = nxt
                chunk = kv[i * page : (i + 1) * page]
                kv_pool[nxt, : len(chunk)] = chunk
                nxt += 1
        q_nope = rng.standard_normal((b, h, 512)).astype(np.float32) * 0.3
        q_pe = rng.standard_normal((b, h, 64)).astype(np.float32) * 0.3
        sm = 1.0 / np.sqrt(576)
        out, lse = mla.mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(kv_pool),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table), return_lse=True,
        )
        for bb in range(b):
            ref, ref_lse = ref_mla(q_nope[bb][None], q_pe[bb][None], kvs[bb], sm)
            np.testing.assert_allclose(np.asarray(out)[bb], ref[0], rtol=2e-2, atol=2e-2)
            np.testing.assert_allclose(np.asarray(lse)[bb], ref_lse[0], rtol=1e-3, atol=1e-3)


class TestMlaPrefill:
    def test_causal(self, rng):
        b, s, h = 1, 64, 4
        q_nope = rng.standard_normal((b, s, h, 512)).astype(np.float32) * 0.3
        q_pe = rng.standard_normal((b, s, h, 64)).astype(np.float32) * 0.3
        kv = rng.standard_normal((b, s, 576)).astype(np.float32) * 0.3
        out = mla.mla_prefill(jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(kv))
        ref, _ = ref_mla(q_nope[0], q_pe[0], kv[0], 1.0 / np.sqrt(576), causal=True)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-2, atol=2e-2)

    def test_extend_against_longer_kv(self, rng):
        b, s, skv, h = 1, 32, 96, 2
        q_nope = rng.standard_normal((b, s, h, 512)).astype(np.float32) * 0.3
        q_pe = rng.standard_normal((b, s, h, 64)).astype(np.float32) * 0.3
        kv = rng.standard_normal((b, skv, 576)).astype(np.float32) * 0.3
        out = mla.mla_prefill(jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(kv))
        ref, _ = ref_mla(q_nope[0], q_pe[0], kv[0], 1.0 / np.sqrt(576), causal=True, q_len=s)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-2, atol=2e-2)


class TestMlaSplit:
    @pytest.mark.parametrize("num_splits", [2, 3, 4])
    @pytest.mark.parametrize("ctx", [40, 64, 17])
    def test_split_matches_nonsplit(self, rng, num_splits, ctx):
        """Split-KV MLA decode == non-split (merge_states combine)."""
        from sgl_kernel_tpu.ops.attention.mla import D_CKV, D_LATENT, D_ROPE, mla_decode

        b, h, page = 2, 4, 8
        nb = (ctx + page - 1) // page + 1
        n_pages = b * nb + 1
        kv = jnp.asarray(rng.standard_normal((n_pages, page, D_CKV)), jnp.float32)
        qn = jnp.asarray(rng.standard_normal((b, h, D_LATENT)), jnp.float32)
        qp = jnp.asarray(rng.standard_normal((b, h, D_ROPE)), jnp.float32)
        lengths = jnp.asarray([ctx, max(ctx - 9, 1)], jnp.int32)
        table = jnp.asarray(
            rng.permutation(np.arange(1, n_pages))[: b * nb].reshape(b, nb), jnp.int32)
        ref = mla.mla_decode(qn, qp, kv, lengths, table)
        got = mla.mla_decode(qn, qp, kv, lengths, table, num_splits=num_splits)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_split_stacked_layer(self, rng):
        from sgl_kernel_tpu.ops.attention.mla import D_CKV, D_LATENT, D_ROPE, mla_decode

        b, h, page, nb, l = 1, 4, 8, 6, 2
        n_pages = b * nb + 1
        kv = jnp.asarray(rng.standard_normal((l, n_pages, page, D_CKV)), jnp.float32)
        qn = jnp.asarray(rng.standard_normal((b, h, D_LATENT)), jnp.float32)
        qp = jnp.asarray(rng.standard_normal((b, h, D_ROPE)), jnp.float32)
        lengths = jnp.asarray([37], jnp.int32)
        table = jnp.asarray(np.arange(1, nb + 1)[None], jnp.int32)
        for lid in range(l):
            ref = mla.mla_decode(qn, qp, kv, lengths, table, layer_id=lid)
            got = mla.mla_decode(qn, qp, kv, lengths, table, layer_id=lid, num_splits=2)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestDmaEngineParity:
    """Round-4 DMA-engine rewrite: the manual-DMA body must match the
    BlockSpec-pipelined form bit-for-bit-in-f32-tolerance on every path."""

    def test_engines_match(self):
        rng = np.random.default_rng(7)
        b, h, page, blocks = 5, 16, 16, 4
        n_pages = b * blocks + 1
        cache = jnp.asarray(rng.standard_normal((n_pages, page, 576)) / 8, jnp.bfloat16)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray([64, 17, 1, 33, 64], jnp.int32)  # ragged
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        o_d, l_d = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.12,
                              return_lse=True, engine="dma")
        o_b, l_b = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.12,
                              return_lse=True, engine="blockspec")
        np.testing.assert_allclose(np.asarray(o_d, np.float32),
                                   np.asarray(o_b, np.float32), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(l_d), np.asarray(l_b), atol=1e-4, rtol=1e-5)

    def test_engines_match_stacked(self):
        """Layer-stacked bf16 pool: real DMA-vs-BlockSpec parity through
        the layer_id scalar-prefetch path (itemsize >= 2, so the dma
        engine actually runs — advisor r4: the old fp8 variant silently
        compared blockspec against itself)."""
        rng = np.random.default_rng(8)
        b, h, page, blocks, L = 3, 8, 16, 3, 2
        n_pages = b * blocks + 1
        cache = jnp.asarray(rng.standard_normal((L, n_pages, page, 576)) / 8,
                            jnp.bfloat16)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray([40, 9, 25], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        lid = jnp.asarray([1], jnp.int32)
        o_d = mla.mla_decode(qn, qp, cache, lens, pt, lid, sm_scale=0.1, engine="dma")
        o_b = mla.mla_decode(qn, qp, cache, lens, pt, lid, sm_scale=0.1, engine="blockspec")
        np.testing.assert_allclose(np.asarray(o_d, np.float32),
                                   np.asarray(o_b, np.float32), atol=2e-2, rtol=2e-2)

    def test_fp8_pool_routes_to_blockspec(self):
        """engine='dma' on a sub-2-byte pool falls back to blockspec BY
        DESIGN (Mosaic cannot byte-group-decode the 1152-lane u8 view —
        docs/PERF.md round 4); pin the fallback's equality so the gate
        is explicit, not an accident of a vacuous comparison."""
        rng = np.random.default_rng(8)
        b, h, page, blocks = 2, 8, 16, 3
        n_pages = b * blocks + 1
        cache = jnp.asarray(rng.standard_normal((n_pages, page, 576)) / 8,
                            jnp.float32).astype(jnp.float8_e4m3fn)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray([40, 9], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        o_d = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="dma")
        o_b = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="blockspec")
        np.testing.assert_array_equal(np.asarray(o_d, np.float32),
                                      np.asarray(o_b, np.float32))

    def test_engines_match_splits(self):
        rng = np.random.default_rng(9)
        b, h, page, blocks = 2, 16, 16, 8
        n_pages = b * blocks + 1
        cache = jnp.asarray(rng.standard_normal((n_pages, page, 576)) / 8, jnp.bfloat16)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray([128, 70], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        o1 = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="dma")
        o4 = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, num_splits=4, engine="dma")
        np.testing.assert_allclose(np.asarray(o1, np.float32),
                                   np.asarray(o4, np.float32), atol=2e-2, rtol=2e-2)


    def test_engines_match_dsv3_heads(self):
        """H=128 (real DSv3): gp=128 drops the per-step fold to bb=16."""
        rng = np.random.default_rng(10)
        b, h, page, blocks = 3, 128, 16, 2
        n_pages = b * blocks + 1
        cache = jnp.asarray(rng.standard_normal((n_pages, page, 576)) / 8, jnp.bfloat16)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray([32, 5, 20], jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        o_d = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="dma")
        o_b = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="blockspec")
        np.testing.assert_allclose(np.asarray(o_d, np.float32),
                                   np.asarray(o_b, np.float32), atol=2e-2, rtol=2e-2)


class TestPad640Pool:
    """640-lane (576+64 zero) latent pool: lane-aligned DMA slices make the
    manual-DMA engine legal on real TPU (probe_mla640.py). Both engines
    must match the canonical 576 pool bit-for-f32-tolerance."""

    def _mk(self, rng, b, h, page, blocks, L=None, dtype=jnp.bfloat16):
        n_pages = b * blocks + 1
        shape = (n_pages, page, 576) if L is None else (L, n_pages, page, 576)
        cache = jnp.asarray(rng.standard_normal(shape) / 8, jnp.float32).astype(dtype)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)) / 8, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)) / 8, jnp.bfloat16)
        lens = jnp.asarray(rng.integers(1, page * blocks, b), jnp.int32)
        pt = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        pad = [(0, 0)] * (cache.ndim - 1) + [(0, 64)]
        return cache, jnp.pad(cache, pad), qn, qp, lens, pt

    @pytest.mark.parametrize("engine", ["blockspec", "dma"])
    def test_pad640_matches_576(self, engine):
        rng = np.random.default_rng(31)
        cache, cache640, qn, qp, lens, pt = self._mk(rng, 3, 16, 16, 4)
        ref, lref = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.12,
                                   return_lse=True, engine="blockspec")
        got, lgot = mla.mla_decode(qn, qp, cache640, lens, pt, sm_scale=0.12,
                                   return_lse=True, engine=engine)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(lgot), np.asarray(lref),
                                   atol=1e-4, rtol=1e-5)

    def test_pad640_fp8_dma(self):
        """fp8 640 pools ARE dma-eligible (typed u8-aligned rows, bitcast
        upcast) — unlike fp8 576 pools which fall back to blockspec."""
        rng = np.random.default_rng(32)
        cache, cache640, qn, qp, lens, pt = self._mk(
            rng, 2, 8, 16, 3, dtype=jnp.float8_e4m3fn)
        ref = mla.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1, engine="blockspec")
        got = mla.mla_decode(qn, qp, cache640, lens, pt, sm_scale=0.1, engine="dma")
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)

    def test_pad640_stacked_splits(self):
        rng = np.random.default_rng(33)
        cache, cache640, qn, qp, lens, pt = self._mk(rng, 2, 16, 16, 8, L=2)
        lid = jnp.asarray([1], jnp.int32)
        ref = mla.mla_decode(qn, qp, cache, lens, pt, lid, sm_scale=0.1)
        got = mla.mla_decode(qn, qp, cache640, lens, pt, lid, sm_scale=0.1,
                             engine="dma", num_splits=2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)
