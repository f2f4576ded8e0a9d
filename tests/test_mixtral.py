"""Mixtral MoE model: prefill/decode consistency + numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import mixtral


def np_moe(h2, router, w1, w2, top_k):
    t = h2.shape[0]
    logits = h2 @ router.T
    out = np.zeros_like(h2)
    for i in range(t):
        order = np.argsort(-logits[i])[:top_k]
        ws = np.exp(logits[i][order] - logits[i][order].max())
        ws = ws / ws.sum()
        for w_, e in zip(ws, order):
            gu = h2[i] @ w1[e]
            inter = gu.shape[-1] // 2
            g, u = gu[:inter], gu[inter:]
            act = g / (1 + np.exp(-g)) * u
            out[i] += w_ * (act @ w2[e])
    return out


class TestMixtral:
    def test_moe_mlp_oracle(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        lw = params["layers"]
        h2 = rng.standard_normal((5, cfg.hidden_size)).astype(np.float32)
        out = mixtral._moe_mlp(jnp.asarray(h2), lw, jnp.int32(1), cfg)
        ref = np_moe(
            h2, np.asarray(lw["router"])[1], np.asarray(lw["moe_w1"])[1],
            np.asarray(lw["moe_w2"])[1], cfg.top_k,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)

    def test_prefill_decode_consistency(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(1))
        b, pages, page = 2, 8, 16
        kc, vc = mixtral.make_caches(cfg, pages, page)
        rope = mixtral.build_rope_cache(cfg)
        s = 6
        tokens = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
        positions = np.tile(np.arange(s), (b, 1)).astype(np.int32)
        tables = np.stack([[0, 1, 0, 0], [2, 3, 0, 0]]).astype(np.int32)
        slots = (tables[:, :1] * page + np.arange(s)).astype(np.int32)
        logits, kc, vc = mixtral.prefill(
            params, cfg, kc, vc, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.full((b,), s, jnp.int32), jnp.asarray(slots), rope,
        )
        nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
        # decode one step; then re-prefill s+1 tokens and compare
        dslots = (tables[:, 0] * page + s).astype(np.int32)
        logits_d, _, _ = mixtral.decode_step(
            params, cfg, kc, vc, jnp.asarray(nxt), jnp.full(b, s, jnp.int32),
            jnp.asarray(tables), jnp.full(b, s + 1, jnp.int32), jnp.asarray(dslots), rope,
        )
        kc2, vc2 = mixtral.make_caches(cfg, pages, page)
        t2 = np.concatenate([tokens, nxt[:, None]], 1)
        p2 = np.tile(np.arange(s + 1), (b, 1)).astype(np.int32)
        s2 = (tables[:, :1] * page + np.arange(s + 1)).astype(np.int32)
        logits_p, _, _ = mixtral.prefill(
            params, cfg, kc2, vc2, jnp.asarray(t2), jnp.asarray(p2),
            jnp.full((b,), s + 1, jnp.int32), jnp.asarray(s2), rope,
        )
        np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p), rtol=2e-2, atol=2e-2)


class TestMixtralW4A16:
    def test_quantized_engine_close_to_bf16(self, rng):
        """quant="w4a16": attention + MoE experts + lm_head all run the
        packed-int4 kernels; greedy prefill logits stay close to bf16 and
        the engine serves end-to-end."""
        import jax
        from sgl_kernel_tpu.serving import Engine

        cfg_q = mixtral.MixtralConfig.tiny(quant="w4a16", group_size=32)
        params_q = mixtral.init_weights(cfg_q, jax.random.PRNGKey(0))
        # structural: MoE weights are packed
        assert isinstance(params_q["layers"]["moe_w1"], dict)
        prompt = rng.integers(0, cfg_q.vocab_size, 11).astype(np.int32).tolist()
        eng = Engine(cfg_q, params_q, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 5

    def test_quantized_moe_matches_dequant_oracle(self, rng):
        """One quantized MoE layer forward vs the fp32 dequant oracle."""
        import jax
        import jax.numpy as jnp
        from sgl_kernel_tpu.ops.gemm.w4a16 import dequant_w4
        from sgl_kernel_tpu.ops.moe import fused_experts as fe

        cfg = mixtral.MixtralConfig.tiny(quant="w4a16", group_size=32)
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(1))
        lw = params["layers"]
        t = 8
        h2 = jnp.asarray(rng.standard_normal((t, cfg.hidden_size)), jnp.float32)
        out = mixtral._moe_mlp(h2, lw, 0, cfg)
        # oracle: dequant per expert, dense routing math
        w1p, w1s = lw["moe_w1"]["packed"][0], lw["moe_w1"]["scales"][0]
        w2p, w2s = lw["moe_w2"]["packed"][0], lw["moe_w2"]["scales"][0]
        e = cfg.num_experts
        w1d = np.stack([np.asarray(dequant_w4(w1p[i], w1s[i], group_size=cfg.group_size, dtype=jnp.float64)) for i in range(e)])
        w2d = np.stack([np.asarray(dequant_w4(w2p[i], w2s[i], group_size=cfg.group_size, dtype=jnp.float64)) for i in range(e)])
        from sgl_kernel_tpu.ops.moe import topk_softmax
        logits = np.asarray(h2, np.float64) @ np.asarray(lw["router"][0], np.float64).T
        tw, tids = topk_softmax(jnp.asarray(logits, jnp.float32), cfg.top_k, renormalize=True)
        ref = np.zeros((t, cfg.hidden_size))
        x64 = np.asarray(h2, np.float64)
        for i in range(t):
            for j in range(cfg.top_k):
                eid = int(tids[i, j])
                gu = x64[i] @ w1d[eid].T  # [2I]
                inter = w1d.shape[1] // 2
                g, u = gu[:inter], gu[inter:]
                act = g / (1 + np.exp(-g)) * u
                ref[i] += float(tw[i, j]) * (act @ w2d[eid].T)
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 5e-2, rel


class TestMixtralMxfp4:
    """quant="mxfp4": the gpt-oss checkpoint format — MoE expert banks in
    E2M1+UE8M0, attention/lm_head bf16 (unified grouped-kernel mxfp4 mode,
    reference GroupGemmW4A16Xe20.cpp + mxfp4_utils.py)."""

    def test_moe_matches_dequant_oracle(self, rng):
        import jax
        import jax.numpy as jnp
        from sgl_kernel_tpu.ops.gemm.w4a16 import dequant_w4

        cfg = mixtral.MixtralConfig.tiny(quant="mxfp4")
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(1))
        lw = params["layers"]
        assert isinstance(lw["moe_w1"], dict)
        assert not isinstance(lw["q"], dict)  # attention stays bf16
        t = 8
        h2 = jnp.asarray(rng.standard_normal((t, cfg.hidden_size)), jnp.float32)
        out = mixtral._moe_mlp(h2, lw, 0, cfg)
        w1p, w1s = lw["moe_w1"]["packed"][0], lw["moe_w1"]["scales"][0]
        w2p, w2s = lw["moe_w2"]["packed"][0], lw["moe_w2"]["scales"][0]
        e = cfg.num_experts
        w1d = np.stack([np.asarray(dequant_w4(w1p[i], w1s[i], fmt="mxfp4",
                                              group_size=32, dtype=jnp.float32), np.float64)
                        for i in range(e)])
        w2d = np.stack([np.asarray(dequant_w4(w2p[i], w2s[i], fmt="mxfp4",
                                              group_size=32, dtype=jnp.float32), np.float64)
                        for i in range(e)])
        from sgl_kernel_tpu.ops.moe import topk_softmax
        logits = np.asarray(h2, np.float64) @ np.asarray(lw["router"][0], np.float64).T
        tw, tids = topk_softmax(jnp.asarray(logits, jnp.float32), cfg.top_k, renormalize=True)
        ref = np.zeros((t, cfg.hidden_size))
        x64 = np.asarray(h2, np.float64)
        for i in range(t):
            for j in range(cfg.top_k):
                eid = int(tids[i, j])
                gu = x64[i] @ w1d[eid].T
                inter = w1d.shape[1] // 2
                g, u = gu[:inter], gu[inter:]
                act = g / (1 + np.exp(-g)) * u
                ref[i] += float(tw[i, j]) * (act @ w2d[eid].T)
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 8e-2, rel  # E2M1 is coarser than int4+bf16 scales

    def test_gptoss_mxfp4_engine(self, rng):
        """gpt-oss tiny with mxfp4 experts serves end-to-end."""
        import jax
        from sgl_kernel_tpu.models import gptoss
        from sgl_kernel_tpu.serving import Engine

        cfg = gptoss.GptOssConfig.tiny(quant="mxfp4")
        params = gptoss.init_weights(cfg, jax.random.PRNGKey(0))
        assert isinstance(params["layers"]["moe_w1"], dict)
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 5
