"""MoE stack tests: routing, alignment, grouped GEMM, fused_experts.

Oracles: inline numpy loops per expert (reference pattern from
test_moe_gemm.py / test_moe_fused_gate.py), bf16-grade tolerances
rtol=2e-2 (reference uses 1e-1/2e-2 for bf16 MoE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import gemm, moe


def np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


class TestRouting:
    def test_topk_softmax(self, rng):
        t, e, k = 16, 64, 8
        g = rng.standard_normal((t, e)).astype(np.float32)
        w, ids = moe.topk_softmax(jnp.asarray(g), k)
        sm = np.exp(g - g.max(-1, keepdims=True))
        sm /= sm.sum(-1, keepdims=True)
        ref_ids = np.argsort(-sm, axis=-1)[:, :k]
        np.testing.assert_array_equal(np.sort(np.asarray(ids), -1), np.sort(ref_ids, -1))
        np.testing.assert_allclose(np.asarray(w), np.take_along_axis(sm, np.asarray(ids), -1), rtol=1e-5)

    def test_topk_sigmoid_renorm(self, rng):
        t, e, k = 8, 32, 4
        g = rng.standard_normal((t, e)).astype(np.float32)
        w, ids = moe.topk_sigmoid(jnp.asarray(g), k, renormalize=True)
        np.testing.assert_allclose(np.asarray(w).sum(-1), np.ones(t), rtol=1e-5)

    def test_biased_topk_selects_by_biased_weights_unbiased(self, rng):
        t, e, k = 8, 16, 2
        g = rng.standard_normal((t, e)).astype(np.float32)
        bias = (rng.standard_normal(e) * 2).astype(np.float32)
        w, ids = moe.biased_topk(jnp.asarray(g), jnp.asarray(bias), k)
        scores = np_sigmoid(g)
        choice = scores + bias
        ref_ids = np.argsort(-choice, -1)[:, :k]
        np.testing.assert_array_equal(np.sort(np.asarray(ids), -1), np.sort(ref_ids, -1))
        np.testing.assert_allclose(np.asarray(w), np.take_along_axis(scores, np.asarray(ids), -1), rtol=1e-5)

    def test_moe_fused_gate_group_limit(self, rng):
        t, e, groups, topk_group, k = 8, 64, 8, 3, 6
        g = rng.standard_normal((t, e)).astype(np.float32)
        bias = rng.standard_normal(e).astype(np.float32)
        w, ids = moe.moe_fused_gate(jnp.asarray(g), jnp.asarray(bias), groups, topk_group, k)
        # every selected expert must lie in one of the topk_group best groups
        scores = np_sigmoid(g)
        choice = scores + bias
        gs = choice.reshape(t, groups, -1)
        top2sum = np.sort(gs, -1)[:, :, -2:].sum(-1)
        sel_groups = np.argsort(-top2sum, -1)[:, :topk_group]
        for tt in range(t):
            assert set(np.asarray(ids)[tt] // (e // groups)) <= set(sel_groups[tt])
        np.testing.assert_allclose(np.asarray(w).sum(-1), np.ones(t), rtol=1e-5)

    def test_shared_experts_append(self, rng):
        # topk is INCLUSIVE of fused shared experts (TopKSigMoid.cpp:105):
        # topk=3 with one shared expert selects 2 routed + 1 shared slot.
        t, e, k = 4, 16, 3
        g = rng.standard_normal((t, e)).astype(np.float32)
        w, ids = moe.topk_sigmoid(jnp.asarray(g), k, routed_scaling_factor=2.0, num_fused_shared_experts=1)
        assert ids.shape == (t, k)
        assert np.all(np.asarray(ids)[:, -1] == e)
        np.testing.assert_allclose(np.asarray(w)[:, -1], 1.0)  # renormalize=True -> shared weight 1.0 (TopKSigMoid.cpp:167)
        s = np_sigmoid(g)
        ref_routed = np.sort(s, -1)[:, -(k - 1):]  # 2 routed experts
        scale = 2.0 / (ref_routed.sum(-1, keepdims=True) + 1e-20)
        np.testing.assert_allclose(np.sort(np.asarray(w)[:, :-1], -1), ref_routed * scale, rtol=1e-5)

    def test_hash_topk(self, rng):
        t, e, k, vocab = 6, 16, 2, 100
        logits = rng.standard_normal((t, e)).astype(np.float32)
        input_ids = rng.integers(0, vocab, t)
        tid2eid = rng.integers(0, e, (vocab, k)).astype(np.int32)
        w, ids = moe.hash_topk(jnp.asarray(logits), jnp.asarray(input_ids), jnp.asarray(tid2eid), k)
        np.testing.assert_array_equal(np.asarray(ids), tid2eid[input_ids])
        # HashTopK.cpp:79-92: routed weights are sqrtsoftplus scores
        # renormalized by their row sum; rsf never scales routed weights
        scores = np.sqrt(np.log1p(np.exp(logits)))
        raw = np.take_along_axis(scores, tid2eid[input_ids], axis=-1)
        ref = raw / raw.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(w), ref, rtol=1e-5)
        w2, _ = moe.hash_topk(
            jnp.asarray(logits), jnp.asarray(input_ids), jnp.asarray(tid2eid), k,
            routed_scaling_factor=2.0,
        )
        np.testing.assert_allclose(np.asarray(w2), ref, rtol=1e-5)

    def test_hash_topk_invalid_ids_zero_weight(self, rng):
        """HashTopK.cpp:64-76: negative input_ids, out-of-table input_ids,
        and out-of-range mapped experts produce expert 0 with weight 0."""
        t, e, k, vocab = 5, 8, 2, 20
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        tid2eid = rng.integers(0, e, (vocab, k)).astype(np.int32)
        tid2eid[3, 1] = -1  # unmapped slot
        tid2eid[4, 0] = e + 5  # out-of-range expert
        input_ids = np.array([-1, vocab + 7, 3, 4, 1], np.int64)
        w, ids = moe.hash_topk(logits, jnp.asarray(input_ids), jnp.asarray(tid2eid), k)
        w, ids = np.asarray(w), np.asarray(ids)
        assert np.all(w[0] == 0.0) and np.all(ids[0] == 0)  # negative token id
        assert np.all(w[1] == 0.0) and np.all(ids[1] == 0)  # beyond the table
        assert w[2, 1] == 0.0 and ids[2, 1] == 0  # unmapped expert slot
        assert w[3, 0] == 0.0 and ids[3, 0] == 0  # out-of-range expert
        np.testing.assert_allclose(w[4].sum(), 1.0, rtol=1e-6)  # valid row renormalized

    def test_hash_topk_shared_expert(self, rng):
        t, e, k, vocab = 4, 8, 2, 20
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        tid2eid = jnp.asarray(rng.integers(0, e, (vocab, k)).astype(np.int32))
        input_ids = jnp.asarray(rng.integers(0, vocab, t))
        w, ids = moe.hash_topk(logits, input_ids, tid2eid, k + 1, routed_scaling_factor=2.5, num_fused_shared_experts=1)
        assert ids.shape == (t, k + 1)
        assert np.all(np.asarray(ids)[:, -1] == e)
        np.testing.assert_allclose(np.asarray(w)[:, -1], 1 / 2.5)  # HashTopK.cpp:87
        np.testing.assert_allclose(np.asarray(w)[:, :-1].sum(-1), 1.0, rtol=1e-6)

    def test_biased_topk_shared_expert_epilogue(self, rng):
        """BiasedTopK.cpp:158-172: the (weight/norm)*scale epilogue covers
        the shared lane too — renorm+apply_on_output makes shared exactly
        rsf/rsf... i.e. (row_sum/rsf)/row_sum*rsf = 1.0; renorm-only makes
        it 1/rsf."""
        t, e, k, rsf = 4, 16, 9, 2.5
        g = rng.standard_normal((t, e)).astype(np.float32)
        bias = rng.standard_normal(e).astype(np.float32)
        w, ids = moe.biased_topk(
            jnp.asarray(g), jnp.asarray(bias), k, renormalize=True,
            routed_scaling_factor=rsf, apply_routed_scaling_factor_on_output=True,
            num_fused_shared_experts=1,
        )
        assert ids.shape == (t, k)  # topk inclusive: 8 routed + 1 shared
        assert np.all(np.asarray(ids)[:, -1] == e)
        np.testing.assert_allclose(np.asarray(w)[:, -1], 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(w)[:, :-1].sum(-1), rsf, rtol=1e-5)
        # renorm only: shared = 1/rsf
        w2, _ = moe.biased_topk(
            jnp.asarray(g), jnp.asarray(bias), k, renormalize=True,
            routed_scaling_factor=rsf, num_fused_shared_experts=1,
        )
        np.testing.assert_allclose(np.asarray(w2)[:, -1], 1 / rsf, rtol=1e-6)
        # no renorm, apply-on-output: scale = rsf is NOT nested under
        # renormalize in BiasedTopK (unlike MoE_fused_gate) -> shared = row_sum
        w3, ids3 = moe.biased_topk(
            jnp.asarray(g), jnp.asarray(bias), k, renormalize=False,
            routed_scaling_factor=rsf, apply_routed_scaling_factor_on_output=True,
            num_fused_shared_experts=1,
        )
        np.testing.assert_allclose(
            np.asarray(w3)[:, -1], np.asarray(w3)[:, :-1].sum(-1) / rsf, rtol=1e-5
        )

    def test_moe_fused_gate_shared_expert_epilogue(self, rng):
        """MoE_fused_gate.cpp:290-326: shared weight = routed_sum/rsf, then
        the renormalize loop rescales ALL topk slots (shared included) by
        1/routed_sum and (nested inside renormalize) by rsf."""
        t, e, groups, topk_group, k, rsf = 4, 64, 8, 3, 9, 2.5
        g = rng.standard_normal((t, e)).astype(np.float32)
        bias = rng.standard_normal(e).astype(np.float32)
        w, ids = moe.moe_fused_gate(
            jnp.asarray(g), jnp.asarray(bias), groups, topk_group, k,
            renormalize=True, num_fused_shared_experts=1,
            routed_scaling_factor=rsf, apply_routed_scaling_factor_on_output=True,
        )
        assert ids.shape == (t, k)
        assert np.all(np.asarray(ids)[:, -1] == e)
        np.testing.assert_allclose(np.asarray(w)[:, -1], 1.0, rtol=1e-5)  # (sum/rsf)/sum*rsf
        # without apply-on-output: shared = (sum/rsf)/sum = 1/rsf
        w2, _ = moe.moe_fused_gate(
            jnp.asarray(g), jnp.asarray(bias), groups, topk_group, k,
            renormalize=True, num_fused_shared_experts=1, routed_scaling_factor=rsf,
        )
        np.testing.assert_allclose(np.asarray(w2)[:, -1], 1 / rsf, rtol=1e-5)
        # renormalize=False: apply-on-output is a no-op (nested under renorm)
        w3, _ = moe.moe_fused_gate(
            jnp.asarray(g), jnp.asarray(bias), groups, topk_group, k,
            renormalize=False, num_fused_shared_experts=1,
            routed_scaling_factor=rsf, apply_routed_scaling_factor_on_output=True,
        )
        np.testing.assert_allclose(
            np.asarray(w3)[:, -1] * rsf, np.asarray(w3)[:, :-1].sum(-1), rtol=1e-5
        )


class TestAlign:
    def test_alignment_structure(self, rng):
        t, k, e, bs = 16, 4, 8, 8
        ids = rng.integers(0, e, (t, k)).astype(np.int32)
        w = rng.random((t, k)).astype(np.float32)
        al = moe.moe_align_block_size(jnp.asarray(ids), jnp.asarray(w), e, bs)
        spi = np.asarray(al.sorted_pair_ids)
        be = np.asarray(al.block_expert_ids)
        flat = ids.reshape(-1)
        # every valid slot's pair belongs to its block's expert
        for blk in range(int(al.num_valid_blocks)):
            for slot in range(blk * bs, (blk + 1) * bs):
                if spi[slot] < t * k:
                    assert flat[spi[slot]] == be[blk], (slot, blk)
        # all pairs appear exactly once
        valid = spi[spi < t * k]
        assert sorted(valid.tolist()) == list(range(t * k))
        # weights land in the right slots
        pw = np.asarray(al.pair_weight)
        for slot in range(len(spi)):
            if spi[slot] < t * k:
                assert pw[slot] == w.reshape(-1)[spi[slot]]
            else:
                assert pw[slot] == 0.0


def moe_oracle(x, w1, w2, topk_w, topk_ids, act="silu"):
    t, h = x.shape
    out = np.zeros((t, w2.shape[2]), np.float64)
    for tt in range(t):
        for j in range(topk_ids.shape[1]):
            eid = topk_ids[tt, j]
            inter = x[tt].astype(np.float64) @ w1[eid].astype(np.float64)  # [2I]
            half = inter.shape[0] // 2
            gate, up = inter[:half], inter[half:]
            a = gate / (1 + np.exp(-gate)) * up
            out[tt] += topk_w[tt, j] * (a @ w2[eid].astype(np.float64))
    return out


class TestFusedExperts:
    @pytest.mark.parametrize("t", [4, 64])
    def test_bf16(self, rng, t):
        e, h, inter, k = 8, 128, 256, 2
        x = rng.standard_normal((t, h)).astype(np.float32)
        w1 = (rng.standard_normal((e, h, 2 * inter)) * 0.05).astype(np.float32)
        w2 = (rng.standard_normal((e, inter, h)) * 0.05).astype(np.float32)
        g = rng.standard_normal((t, e)).astype(np.float32)
        tw, tids = moe.topk_softmax(jnp.asarray(g), k, renormalize=True)
        weights = moe.MoeWeights(w1=jnp.asarray(w1), w2=jnp.asarray(w2), fmt="bf16")
        out = moe.fused_experts(jnp.asarray(x), weights, tw, tids, block_size=16)
        ref = moe_oracle(x, w1, w2, np.asarray(tw), np.asarray(tids))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)

    def test_w4a16_int4(self, rng):
        t, e, h, inter, k = 32, 4, 256, 512, 2
        x = rng.standard_normal((t, h)).astype(np.float32)
        w1f = (rng.standard_normal((e, 2 * inter, h)) * 0.05).astype(np.float32)
        w2f = (rng.standard_normal((e, h, inter)) * 0.05).astype(np.float32)
        # per-expert quantize
        w1c, w1s, _ = jax.vmap(lambda w: gemm.quantize_w4(w, group_size=128))(jnp.asarray(w1f))
        w2c, w2s, _ = jax.vmap(lambda w: gemm.quantize_w4(w, group_size=128))(jnp.asarray(w2f))
        w1d = np.stack([np.asarray(gemm.dequant_w4(w1c[i], w1s[i], group_size=128, dtype=jnp.float32)) for i in range(e)])
        w2d = np.stack([np.asarray(gemm.dequant_w4(w2c[i], w2s[i], group_size=128, dtype=jnp.float32)) for i in range(e)])
        g = rng.standard_normal((t, e)).astype(np.float32)
        tw, tids = moe.topk_softmax(jnp.asarray(g), k, renormalize=True)
        weights = moe.MoeWeights(
            w1=w1c, w2=w2c, w1_scales=w1s, w2_scales=w2s, fmt="int4", group_size=128
        )
        out = moe.fused_experts(jnp.asarray(x, jnp.bfloat16), weights, tw, tids, block_size=16)
        # oracle with transposed dequant weights ([E,N,K] -> [E,K,N])
        ref = moe_oracle(x, w1d.transpose(0, 2, 1), w2d.transpose(0, 2, 1), np.asarray(tw), np.asarray(tids))
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=5e-2, atol=0.1 * np.abs(ref).std() + 5e-2)

    def test_empty_and_skewed_experts(self, rng):
        # all tokens to one expert
        t, e, h, inter, k = 8, 8, 128, 128, 2
        x = rng.standard_normal((t, h)).astype(np.float32)
        w1 = (rng.standard_normal((e, h, 2 * inter)) * 0.05).astype(np.float32)
        w2 = (rng.standard_normal((e, inter, h)) * 0.05).astype(np.float32)
        tids = np.full((t, k), 3, np.int32)
        tids[:, 1] = 5
        tw = np.full((t, k), 0.5, np.float32)
        weights = moe.MoeWeights(w1=jnp.asarray(w1), w2=jnp.asarray(w2), fmt="bf16")
        out = moe.fused_experts(jnp.asarray(x), weights, jnp.asarray(tw), jnp.asarray(tids), block_size=16)
        ref = moe_oracle(x, w1, w2, tw, tids)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


class TestW4A8Grouped:
    def test_matches_dequant_oracle(self, rng):
        from sgl_kernel_tpu.ops.gemm.w4a16 import pack_w4_tpu
        from sgl_kernel_tpu.ops.moe import w4a8_grouped_mm

        e, n, k, bm = 2, 128, 256, 8
        cap = 3 * bm
        eids = jnp.asarray([0, 1, 1], jnp.int32)
        codes = rng.integers(0, 16, (e, n, k)).astype(np.uint8)  # unsigned 0..15
        signed = ((codes.astype(np.int32) - 8) & 0xF).astype(np.uint8)
        packed = jnp.stack([pack_w4_tpu(jnp.asarray(signed[i].T)) for i in range(e)])
        s1 = (rng.random((e, n)) * 0.02 + 0.01).astype(np.float32)
        zero = np.full((e, n), 8.0, np.float32)
        x = rng.integers(-100, 100, (cap, k)).astype(np.int8)
        xs = (rng.random(cap) * 0.01 + 0.005).astype(np.float32)
        out = w4a8_grouped_mm(
            jnp.asarray(x), jnp.asarray(xs), packed, jnp.asarray(s1), eids,
            bm=bm, bn=128, out_dtype=jnp.float32,
        )
        # oracle: (codes - 8) * s1 weights (quantize_w4's signed-shift
        # convention), scaled by per-token activation scales
        wf = (codes.astype(np.float32) - 8.0) * s1[:, :, None]
        ref = np.zeros((cap, n), np.float32)
        for blk, eid in enumerate(np.asarray(eids)):
            rows = slice(blk * bm, (blk + 1) * bm)
            ref[rows] = x[rows].astype(np.float32) @ wf[eid].T
        ref *= xs[:, None]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())
