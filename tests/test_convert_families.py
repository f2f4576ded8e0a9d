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
        s[p + "self_attn.q_proj.weight"] = rng.standard_normal((nh * (dn + D_ROPE), h)).astype(np.float32) * 0.05
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

    def test_q_lora_rejected(self, rng):
        cfg = deepseek.DeepseekConfig.tiny()
        state = deepseek_state(cfg, rng)
        state["model.layers.0.self_attn.q_a_proj.weight"] = np.zeros((8, 8), np.float32)
        with pytest.raises(NotImplementedError):
            convert.convert_hf_deepseek(state, cfg)
