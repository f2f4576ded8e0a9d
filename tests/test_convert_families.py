"""HF-checkpoint conversion for Mixtral and DeepSeek: synthesized HF-style
state dicts must convert into params that (a) match the framework's tree
structure and (b) drive the engine; the MLA absorption split must recover
the exact per-head W_UK/W_UV blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import convert, deepseek, mixtral
from sgl_kernel_tpu.serving import Engine


def mixtral_state(cfg, rng):
    l, e, h, i = cfg.num_layers, cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    s = {}
    s["model.embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    s["model.norm.weight"] = np.ones(h, np.float32)
    s["lm_head.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    for li in range(l):
        p = f"model.layers.{li}."
        s[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "self_attn.q_proj.weight"] = rng.standard_normal((nq * d, h)).astype(np.float32) * 0.05
        s[p + "self_attn.k_proj.weight"] = rng.standard_normal((nkv * d, h)).astype(np.float32) * 0.05
        s[p + "self_attn.v_proj.weight"] = rng.standard_normal((nkv * d, h)).astype(np.float32) * 0.05
        s[p + "self_attn.o_proj.weight"] = rng.standard_normal((h, nq * d)).astype(np.float32) * 0.05
        s[p + "block_sparse_moe.gate.weight"] = rng.standard_normal((e, h)).astype(np.float32) * 0.02
        for j in range(e):
            q = p + f"block_sparse_moe.experts.{j}."
            s[q + "w1.weight"] = rng.standard_normal((i, h)).astype(np.float32) * 0.05
            s[q + "w3.weight"] = rng.standard_normal((i, h)).astype(np.float32) * 0.05
            s[q + "w2.weight"] = rng.standard_normal((h, i)).astype(np.float32) * 0.05
    return s


class TestConvertMixtral:
    def test_structure_and_engine(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        state = mixtral_state(cfg, rng)
        params = convert.convert_hf_mixtral(state, cfg)
        ref_tree = jax.tree.structure(mixtral.init_weights(cfg, jax.random.PRNGKey(0)))
        assert jax.tree.structure(params) == ref_tree
        # HF w1/w3 land as [H, 2I] per expert (x @ w1 convention)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["moe_w1"][0, 0, :, : cfg.intermediate_size]),
            state["model.layers.0.block_sparse_moe.experts.0.w1.weight"].T,
            rtol=2e-2, atol=2e-2)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(), max_new_tokens=4)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 4

    def test_quantized_structure(self, rng):
        cfg = mixtral.MixtralConfig.tiny(quant="w4a16", group_size=32)
        params = convert.convert_hf_mixtral(mixtral_state(cfg, rng), cfg)
        assert isinstance(params["layers"]["moe_w1"], dict)
        assert params["layers"]["moe_w1"]["scales"].dtype == jnp.bfloat16
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(), max_new_tokens=3)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 3


def deepseek_state(cfg, rng):
    from sgl_kernel_tpu.ops.attention.mla import D_LATENT, D_ROPE

    l, e, h = cfg.num_layers, cfg.num_experts, cfg.hidden_size
    nh, dn, dv = cfg.num_heads, cfg.qk_nope_dim, cfg.v_head_dim
    mi, di = cfg.moe_intermediate, cfg.dense_intermediate
    s = {}
    s["model.embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    s["model.norm.weight"] = np.ones(h, np.float32)
    s["lm_head.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    for li in range(l):
        p = f"model.layers.{li}."
        s[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        if cfg.q_lora_rank:
            r = cfg.q_lora_rank
            s[p + "self_attn.q_a_proj.weight"] = rng.standard_normal((r, h)).astype(np.float32) * 0.05
            s[p + "self_attn.q_a_layernorm.weight"] = 1.0 + 0.1 * rng.standard_normal(r).astype(np.float32)
            s[p + "self_attn.q_b_proj.weight"] = rng.standard_normal((nh * (dn + D_ROPE), r)).astype(np.float32) * 0.05
        else:
            s[p + "self_attn.q_proj.weight"] = rng.standard_normal((nh * (dn + D_ROPE), h)).astype(np.float32) * 0.05
        if cfg.nsa:
            hi, di_ = cfg.idx_heads, cfg.idx_dim
            s[p + "self_attn.indexer.wq_b.weight"] = rng.standard_normal(
                (hi * di_, cfg.q_lora_rank or h)).astype(np.float32) * 0.05
            s[p + "self_attn.indexer.wk.weight"] = rng.standard_normal((di_, h)).astype(np.float32) * 0.05
            s[p + "self_attn.indexer.k_norm.weight"] = np.ones(di_, np.float32)
            s[p + "self_attn.indexer.weights_proj.weight"] = rng.standard_normal((hi, h)).astype(np.float32) * 0.02
        s[p + "self_attn.kv_a_proj_with_mqa.weight"] = rng.standard_normal((D_LATENT + D_ROPE, h)).astype(np.float32) * 0.05
        s[p + "self_attn.kv_a_layernorm.weight"] = np.ones(D_LATENT, np.float32)
        s[p + "self_attn.kv_b_proj.weight"] = rng.standard_normal((nh * (dn + dv), D_LATENT)).astype(np.float32) * 0.05
        s[p + "self_attn.o_proj.weight"] = rng.standard_normal((h, nh * dv)).astype(np.float32) * 0.05
        if li < cfg.num_dense_layers:
            s[p + "mlp.gate_proj.weight"] = rng.standard_normal((di, h)).astype(np.float32) * 0.05
            s[p + "mlp.up_proj.weight"] = rng.standard_normal((di, h)).astype(np.float32) * 0.05
            s[p + "mlp.down_proj.weight"] = rng.standard_normal((h, di)).astype(np.float32) * 0.05
        else:
            s[p + "mlp.gate.weight"] = rng.standard_normal((e, h)).astype(np.float32) * 0.02
            s[p + "mlp.gate.e_score_correction_bias"] = np.zeros(e, np.float32)
            for j in range(e):
                q = p + f"mlp.experts.{j}."
                s[q + "gate_proj.weight"] = rng.standard_normal((mi, h)).astype(np.float32) * 0.05
                s[q + "up_proj.weight"] = rng.standard_normal((mi, h)).astype(np.float32) * 0.05
                s[q + "down_proj.weight"] = rng.standard_normal((h, mi)).astype(np.float32) * 0.05
            for nm, shp in (("gate_proj", (mi, h)), ("up_proj", (mi, h)), ("down_proj", (h, mi))):
                s[p + f"mlp.shared_experts.{nm}.weight"] = rng.standard_normal(shp).astype(np.float32) * 0.05
    return s


class TestConvertDeepseek:
    def test_absorption_split_and_engine(self, rng):
        from sgl_kernel_tpu.ops.attention.mla import D_LATENT

        cfg = deepseek.DeepseekConfig.tiny()
        state = deepseek_state(cfg, rng)
        params = convert.convert_hf_deepseek(state, cfg)
        ref_tree = jax.tree.structure(deepseek.init_weights(cfg, jax.random.PRNGKey(0)))
        assert jax.tree.structure(params) == ref_tree
        # absorption: kv_b rows split exactly into per-head W_UK / W_UV^T
        nh, dn, dv = cfg.num_heads, cfg.qk_nope_dim, cfg.v_head_dim
        kvb = state["model.layers.0.self_attn.kv_b_proj.weight"].reshape(nh, dn + dv, D_LATENT)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["w_uk"][0, 1]), kvb[1, :dn], rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["w_uv"][0, 1]), kvb[1, dn:].T, rtol=1e-2, atol=1e-2)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(), max_new_tokens=4)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 4

    def test_q_lora_layout_mismatch_rejected(self, rng):
        cfg = deepseek.DeepseekConfig.tiny()
        state = deepseek_state(cfg, rng)
        state["model.layers.0.self_attn.q_a_proj.weight"] = np.zeros((8, 8), np.float32)
        with pytest.raises(ValueError, match="q_lora_rank"):
            convert.convert_hf_deepseek(state, cfg)
        cfg2 = deepseek.DeepseekConfig.tiny(q_lora_rank=32)
        with pytest.raises(ValueError, match="direct q_proj"):
            convert.convert_hf_deepseek(deepseek_state(deepseek.DeepseekConfig.tiny(), rng), cfg2)

    def test_q_lora_convert_math_and_engine(self, rng):
        """Real-V3 layout: q-LoRA path converts, the model's _q_proj
        matches a numpy fp64 oracle on the HF tensors, and the engine
        serves greedily."""
        cfg = deepseek.DeepseekConfig.tiny(q_lora_rank=32)
        state = deepseek_state(cfg, rng)
        params = convert.convert_hf_deepseek(state, cfg)
        ref_tree = jax.tree.structure(deepseek.init_weights(cfg, jax.random.PRNGKey(0)))
        assert jax.tree.structure(params) == ref_tree

        # fp64 oracle for the low-rank q path (pre-rope: nope rows only,
        # rope rows are de-interleaved at load so they differ from HF order)
        x = rng.standard_normal((3, cfg.hidden_size)).astype(np.float64)
        wa = state["model.layers.0.self_attn.q_a_proj.weight"].astype(np.float64)
        g = state["model.layers.0.self_attn.q_a_layernorm.weight"].astype(np.float64)
        wb = state["model.layers.0.self_attn.q_b_proj.weight"].astype(np.float64)
        cq = x @ wa.T
        cq = cq / np.sqrt((cq**2).mean(-1, keepdims=True) + cfg.rms_eps) * g
        q_ref = (cq @ wb.T).reshape(3, cfg.num_heads, -1)[..., : cfg.qk_nope_dim]

        from sgl_kernel_tpu.models.deepseek import _q_proj
        q_got, cq_got = _q_proj(jnp.asarray(x, cfg.dtype), params["layers"], 0, cfg)
        q_got = np.asarray(q_got).reshape(3, cfg.num_heads, -1)[..., : cfg.qk_nope_dim]
        np.testing.assert_allclose(q_got, q_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cq_got), cq, rtol=2e-4, atol=2e-4)

        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(), max_new_tokens=4)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 4

    def test_q_lora_quantized_w4a16(self, rng):
        cfg = deepseek.DeepseekConfig.tiny(q_lora_rank=32, quant="w4a16", group_size=32)
        params = convert.convert_hf_deepseek(deepseek_state(cfg, rng), cfg)
        ref_tree = jax.tree.structure(deepseek.init_weights(cfg, jax.random.PRNGKey(0)))
        assert jax.tree.structure(params) == ref_tree
        assert isinstance(params["layers"]["wq_b"], dict)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(), max_new_tokens=3)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 3

    def test_fp8_blockwise_shards(self, rng):
        """fp8 shards (weight + weight_scale_inv) dequantize exactly to the
        blockwise product during conversion."""
        import ml_dtypes

        cfg = deepseek.DeepseekConfig.tiny(q_lora_rank=32)
        state = deepseek_state(cfg, rng)
        # fp8-encode wq_a of layer 0 with 16x16 blocks scaled near 1
        name = "model.layers.0.self_attn.q_a_proj.weight"
        w = state[name]
        w8 = w.astype(ml_dtypes.float8_e4m3fn)
        n, k = w.shape
        scale = 1.0 + 0.5 * rng.random((max(1, -(-n // 128)), max(1, -(-k // 128)))).astype(np.float32)
        state[name] = w8
        state[name + "_scale_inv"] = scale
        manual = w8.astype(np.float32) * np.repeat(np.repeat(scale, 128, 0)[:n], 128, 1)[:, :k]
        params = convert.convert_hf_deepseek(state, cfg)
        np.testing.assert_allclose(
            np.asarray(params["layers"]["wq_a"][0], np.float32), manual.astype(np.float32),
            rtol=2e-2, atol=2e-2)

    def test_nsa_indexer_ingest_and_decode(self, rng):
        """V3.2-layout indexer tensors convert and drive decode_step_nsa."""
        cfg = deepseek.DeepseekConfig.tiny(q_lora_rank=32, nsa=True, idx_heads=2, idx_dim=32,
                                           index_topk=16)
        state = deepseek_state(cfg, rng)
        params = convert.convert_hf_deepseek(state, cfg)
        ref_tree = jax.tree.structure(deepseek.init_weights(cfg, jax.random.PRNGKey(0)))
        assert jax.tree.structure(params) == ref_tree
        np.testing.assert_allclose(
            np.asarray(params["layers"]["wq_idx"][1], np.float32),
            state["model.layers.1.self_attn.indexer.wq_b.weight"], rtol=1e-2, atol=1e-2)

        page = 16
        kv = deepseek.make_cache(cfg, 8, page)
        idx_k, idx_s = deepseek.make_indexer_cache(cfg, 8, page)
        rope = deepseek.build_rope_cache(cfg)
        idx_rope = deepseek.build_idx_rope_cache(cfg)
        b = 2
        tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(4), (b, 4))
        slot = tables[:, :1] * page + pos % page
        q_lens = jnp.full((b,), 4, jnp.int32)
        logits, kv, idx_k, idx_s = deepseek.prefill_nsa(
            params, cfg, kv, idx_k, idx_s, prompt, pos, q_lens,
            slot.astype(jnp.int32), rope, idx_rope)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        lengths = jnp.full((b,), 5, jnp.int32)
        positions = jnp.full((b,), 4, jnp.int32)
        slot_d = tables[:, 0] * page + 4
        logits2, kv, idx_k, idx_s = deepseek.decode_step_nsa(
            params, cfg, kv, idx_k, idx_s, tok, positions, tables, lengths,
            slot_d, rope, idx_rope)
        assert logits2.shape == (b, cfg.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits2)))


def gptoss_state(cfg, rng):
    """Synthetic HF gpt-oss shard: mxfp4 expert blocks/scales (+ biases,
    sinks, qkv/o biases, router bias)."""
    l, e, h, i = cfg.num_layers, cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    s = {}
    s["model.embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    s["model.norm.weight"] = np.ones(h, np.float32)
    s["lm_head.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32) * 0.02
    for li in range(l):
        p = f"model.layers.{li}."
        s[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "self_attn.sinks"] = rng.standard_normal(nq).astype(np.float32) * 0.1
        for n, rows in [("q", nq * d), ("k", nkv * d), ("v", nkv * d)]:
            s[p + f"self_attn.{n}_proj.weight"] = rng.standard_normal((rows, h)).astype(np.float32) * 0.05
            s[p + f"self_attn.{n}_proj.bias"] = rng.standard_normal(rows).astype(np.float32) * 0.02
        s[p + "self_attn.o_proj.weight"] = rng.standard_normal((h, nq * d)).astype(np.float32) * 0.05
        s[p + "self_attn.o_proj.bias"] = rng.standard_normal(h).astype(np.float32) * 0.02
        s[p + "mlp.router.weight"] = rng.standard_normal((e, h)).astype(np.float32) * 0.02
        s[p + "mlp.router.bias"] = rng.standard_normal(e).astype(np.float32) * 0.02
        # mxfp4 banks: random nibble codes + UE8M0 exponents near 1.0
        s[p + "mlp.experts.gate_up_proj_blocks"] = rng.integers(
            0, 256, (e, 2 * i, h // 32, 16)).astype(np.uint8)
        s[p + "mlp.experts.gate_up_proj_scales"] = rng.integers(
            120, 130, (e, 2 * i, h // 32)).astype(np.uint8)
        s[p + "mlp.experts.down_proj_blocks"] = rng.integers(
            0, 256, (e, h, i // 32, 16)).astype(np.uint8)
        s[p + "mlp.experts.down_proj_scales"] = rng.integers(
            120, 130, (e, h, i // 32)).astype(np.uint8)
        s[p + "mlp.experts.gate_up_proj_bias"] = rng.standard_normal((e, 2 * i)).astype(np.float32) * 0.02
        s[p + "mlp.experts.down_proj_bias"] = rng.standard_normal((e, h)).astype(np.float32) * 0.02
    return s


class TestConvertGptOss:
    def test_mxfp4_ingest_oracle_and_engine(self, rng):
        """Converted expert banks must decode to the independent numpy
        E2M1*UE8M0 oracle over the de-interleaved HF bytes, and the model
        must serve end-to-end with sinks + biases wired."""
        from sgl_kernel_tpu.models import gptoss
        from sgl_kernel_tpu.ops.gemm.w4a16 import dequant_w4

        cfg = gptoss.GptOssConfig.tiny(quant="mxfp4", qkv_bias=True)
        state = gptoss_state(cfg, rng)
        params = convert.convert_hf_gptoss(state, cfg)

        # independent E2M1 decode table (OCP MX spec nibble values)
        E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                         -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0])

        def hf_dequant(blocks, scales):  # [N, K/32, 16]u8, [N, K/32]u8 -> [N, K]
            lo = E2M1[blocks & 0xF]
            hi = E2M1[blocks >> 4]
            vals = np.stack([lo, hi], axis=-1).reshape(blocks.shape[0], -1)
            se = np.repeat(np.exp2(scales.astype(np.float64) - 127.0), 32, axis=1)
            return vals * se

        li, ei = 1, 2
        blocks = state[f"model.layers.{li}.mlp.experts.gate_up_proj_blocks"][ei]
        scales = state[f"model.layers.{li}.mlp.experts.gate_up_proj_scales"][ei]
        ref = hf_dequant(blocks.astype(np.int64), scales)
        # de-interleave rows (gate even, up odd) to the framework order
        i2 = ref.shape[0] // 2
        ref = np.concatenate([ref[0::2], ref[1::2]], axis=0)
        got = np.asarray(dequant_w4(
            params["layers"]["moe_w1"]["packed"][li, ei],
            params["layers"]["moe_w1"]["scales"][li, ei],
            fmt="mxfp4", group_size=32, dtype=jnp.float32), np.float64)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

        # structure: biases + sinks present
        lw = params["layers"]
        for name in ("router_bias", "o_bias", "q_bias", "moe_b1", "moe_b2", "sinks"):
            assert name in lw, name

        prompt = rng.integers(0, cfg.vocab_size, 7).astype(np.int32).tolist()
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        rid = eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 4
