"""End-to-end Llama model + engine tests against a pure-numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.serving import Engine


def np_forward(params, cfg, tokens):
    """Pure numpy full-attention transformer forward; returns logits [S, V]."""

    def rms(x, w, eps=None):
        eps = cfg.rms_eps if eps is None else eps
        return x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w

    def rope(x, pos):
        s, h, d = x.shape
        inv = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2) / d))
        f = np.outer(pos, inv)
        cos, sin = np.cos(f)[:, None, :], np.sin(f)[:, None, :]
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    s = len(tokens)
    x = p["embed"][tokens]
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pos = np.arange(s)
    for li in range(cfg.num_layers):
        lw = {k: v[li] for k, v in p["layers"].items()}
        h = rms(x, lw["input_norm"])
        q = rope((h @ lw["q"].T).reshape(s, nq, d), pos)
        k = rope((h @ lw["k"].T).reshape(s, nkv, d), pos)
        v = (h @ lw["v"].T).reshape(s, nkv, d)
        attn = np.zeros((s, nq, d))
        g = nq // nkv
        for hh in range(nq):
            sc = q[:, hh] @ k[:, hh // g].T / np.sqrt(d)
            mask = np.tril(np.ones((s, s), bool))
            sc = np.where(mask, sc, -np.inf)
            w = np.exp(sc - sc.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            attn[:, hh] = w @ v[:, hh // g]
        x = x + attn.reshape(s, -1) @ lw["o"].T
        h2 = rms(x, lw["post_norm"])
        gate = h2 @ lw["gate"].T
        up = h2 @ lw["up"].T
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ lw["down"].T
    x = rms(x, p["final_norm"])
    return x @ p["lm_head"].T


@pytest.fixture(scope="module")
def tiny_model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestLlama:
    def test_prefill_matches_oracle(self, tiny_model, rng):
        cfg, params = tiny_model
        s = 10
        tokens = rng.integers(0, cfg.vocab_size, s).astype(np.int32)
        kc, vc = llama.make_caches(cfg, num_pages=8, page_size=16)
        rope_cache = llama.build_rope_cache(cfg)
        pad = 16
        tok_pad = np.zeros((1, pad), np.int32)
        tok_pad[0, :s] = tokens
        pos_pad = np.zeros((1, pad), np.int32)
        pos_pad[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32)
        slots[0, :s] = 16 + np.arange(s)  # page 1
        logits, kc, vc = llama.prefill(
            params, cfg, kc, vc, jnp.asarray(tok_pad), jnp.asarray(pos_pad),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        ref = np_forward(params, cfg, tokens)
        np.testing.assert_allclose(np.asarray(logits)[0], ref[-1], rtol=2e-2, atol=2e-2)

    def test_decode_continues_prefill(self, tiny_model, rng):
        cfg, params = tiny_model
        s = 10
        tokens = rng.integers(0, cfg.vocab_size, s + 3).astype(np.int32)
        kc, vc = llama.make_caches(cfg, num_pages=8, page_size=16)
        rope_cache = llama.build_rope_cache(cfg)
        pad = 16
        tok_pad = np.zeros((1, pad), np.int32)
        tok_pad[0, :s] = tokens[:s]
        pos_pad = np.zeros((1, pad), np.int32)
        pos_pad[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32)
        slots[0, :s] = 16 + np.arange(s)
        _, kc, vc = llama.prefill(
            params, cfg, kc, vc, jnp.asarray(tok_pad), jnp.asarray(pos_pad),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        # teacher-forced decode of tokens s..s+2 (pages 1,2 -> table [1, 2])
        table = np.zeros((1, 4), np.int32)
        table[0, :2] = [1, 2]
        for i in range(3):
            pos = s + i
            logits, kc, vc = llama.decode_step(
                params, cfg, kc, vc,
                jnp.asarray([tokens[pos]], jnp.int32), jnp.asarray([pos], jnp.int32),
                jnp.asarray(table), jnp.asarray([pos + 1], jnp.int32),
                jnp.asarray([16 + pos], jnp.int32), rope_cache,
            )
            ref = np_forward(params, cfg, tokens[: pos + 1])
            np.testing.assert_allclose(np.asarray(logits)[0], ref[-1], rtol=3e-2, atol=3e-2)

    def test_fused_matches_unfused(self, tiny_model, rng):
        cfg, params = tiny_model
        import dataclasses
        cfg_f = dataclasses.replace(cfg, fused=True)
        # build fused params from the same unfused weights
        lw = dict(params["layers"])
        params_f = dict(params)
        params_f["layers"] = {
            "input_norm": lw["input_norm"], "post_norm": lw["post_norm"],
            "qkv": jnp.concatenate([lw["q"], lw["k"], lw["v"]], axis=1),
            "o": lw["o"],
            "gate_up": jnp.concatenate([lw["gate"], lw["up"]], axis=1),
            "down": lw["down"],
        }
        s = 6
        tokens = rng.integers(0, cfg.vocab_size, s).astype(np.int32)
        kc, vc = llama.make_caches(cfg, num_pages=8, page_size=16)
        rope_cache = llama.build_rope_cache(cfg)
        pad = 16
        tok_pad = np.zeros((1, pad), np.int32); tok_pad[0, :s] = tokens
        pos_pad = np.zeros((1, pad), np.int32); pos_pad[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32); slots[0, :s] = 16 + np.arange(s)
        logits_f, _, _ = llama.prefill(
            params_f, cfg_f, kc, vc, jnp.asarray(tok_pad), jnp.asarray(pos_pad),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        kc2, vc2 = llama.make_caches(cfg, num_pages=8, page_size=16)
        logits_u, _, _ = llama.prefill(
            params, cfg, kc2, vc2, jnp.asarray(tok_pad), jnp.asarray(pos_pad),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_u), rtol=1e-4, atol=1e-4)

    def test_w4a16_model_runs(self, rng):
        cfg = llama.LlamaConfig.tiny(quant="w4a16", group_size=32)
        params = llama.init_weights(cfg, jax.random.PRNGKey(1))
        kc, vc = llama.make_caches(cfg, num_pages=8, page_size=16)
        rope_cache = llama.build_rope_cache(cfg)
        tok = np.zeros((1, 16), np.int32)
        tok[0, :4] = [1, 2, 3, 4]
        slots = np.full((1, 16), -1, np.int32)
        slots[0, :4] = 16 + np.arange(4)
        logits, kc, vc = llama.prefill(
            params, cfg, kc, vc, jnp.asarray(tok),
            jnp.asarray(np.arange(16)[None].astype(np.int32) * (np.arange(16) < 4)[None]),
            jnp.asarray([4], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        assert np.isfinite(np.asarray(logits)).all()


class TestEngine:
    def test_greedy_generation_consistent(self, tiny_model, rng):
        cfg, params = tiny_model
        eng = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16, prefill_bucket=16)
        prompt = rng.integers(0, cfg.vocab_size, 7).tolist()
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done(max_steps=50)
        out = eng.finished[rid].output
        assert len(out) == 5
        # teacher-forced oracle: greedy continuation with full numpy forward
        seq = list(prompt)
        for _ in range(5):
            ref_logits = np_forward(params, cfg, np.asarray(seq, np.int32))
            nxt = int(ref_logits[-1].argmax())
            seq.append(nxt)
        assert out == seq[len(prompt):], (out, seq[len(prompt):])

    def test_multiple_requests_batched(self, tiny_model, rng):
        cfg, params = tiny_model
        eng = Engine(cfg, params, max_batch=3, num_pages=64, page_size=16, prefill_bucket=16)
        rids = [eng.add_request(rng.integers(0, cfg.vocab_size, 5 + i).tolist(), max_new_tokens=4) for i in range(3)]
        eng.run_until_done(max_steps=50)
        assert all(len(eng.finished[r].output) == 4 for r in rids)
        # all pages are either free or retained by the prefix cache
        free = eng.allocator.free
        free_n = free if isinstance(free, int) else len(free)
        cached = eng.native.cached_pages if eng.native is not None else 0
        assert free_n + cached == 63


class TestEngineSpec:
    def test_spec_engine_matches_plain_greedy(self, tiny_model, rng):
        """Speculative engine must emit exactly the plain engine's greedy
        stream (chain speculation is lossless for greedy sampling)."""
        import jax as _jax

        cfg, params = tiny_model
        draft_cfg = llama.LlamaConfig(
            vocab_size=cfg.vocab_size, hidden_size=64, intermediate_size=128,
            num_layers=1, num_heads=2, num_kv_heads=1, head_dim=32,
            max_position=256, dtype=jnp.float32,
        )
        draft_params = llama.init_weights(draft_cfg, _jax.random.PRNGKey(3))
        prompts = [rng.integers(0, cfg.vocab_size, 6).tolist(),
                   rng.integers(0, cfg.vocab_size, 4).tolist()]

        plain = Engine(cfg, params, max_batch=2, num_pages=64, page_size=16,
                       prefill_bucket=16, enable_prefix_cache=False)
        rids_p = [plain.add_request(p, max_new_tokens=7) for p in prompts]
        plain.run_until_done(max_steps=50)

        eng = Engine(cfg, params, max_batch=2, num_pages=64, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False,
                     draft_cfg=draft_cfg, draft_params=draft_params, spec_gamma=3)
        rids_s = [eng.add_request(p, max_new_tokens=7) for p in prompts]
        eng.run_until_done(max_steps=50)
        for rp, rs in zip(rids_p, rids_s):
            assert eng.finished[rs].output == plain.finished[rp].output


class TestFp8Kv:
    def test_fp8_kv_cache_close_to_bf16(self, tiny_model, rng):
        import dataclasses
        cfg, params = tiny_model
        cfg8 = dataclasses.replace(cfg, kv_dtype=jnp.float8_e4m3fn)
        s = 8
        tokens = rng.integers(0, cfg.vocab_size, s).astype(np.int32)
        rope_cache = llama.build_rope_cache(cfg)
        pad = 16
        tok_pad = np.zeros((1, pad), np.int32); tok_pad[0, :s] = tokens
        pos_pad = np.zeros((1, pad), np.int32); pos_pad[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32); slots[0, :s] = 16 + np.arange(s)
        args = (jnp.asarray(tok_pad), jnp.asarray(pos_pad), jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope_cache)
        kc, vc = llama.make_caches(cfg, 8, 16)
        ref, kc, vc = llama.prefill(params, cfg, kc, vc, *args)
        kc8, vc8 = llama.make_caches(cfg8, 8, 16)
        assert kc8.dtype == jnp.float8_e4m3fn
        out, kc8, vc8 = llama.prefill(params, cfg8, kc8, vc8, *args)
        # prefill attention doesn't read the cache; decode does
        table = np.zeros((1, 4), np.int32); table[0, 0] = 1
        dargs = (jnp.asarray([int(tokens[-1])], jnp.int32), jnp.asarray([s], jnp.int32),
                 jnp.asarray(table), jnp.asarray([s + 1], jnp.int32), jnp.asarray([16 + s], jnp.int32), rope_cache)
        dref, _, _ = llama.decode_step(params, cfg, kc, vc, *dargs)
        d8, _, _ = llama.decode_step(params, cfg8, kc8, vc8, *dargs)
        # fp8 kv introduces ~6% elementwise error; logits stay close
        np.testing.assert_allclose(np.asarray(d8), np.asarray(dref), rtol=0.2, atol=0.35)


class TestPrefillExtend:
    def test_matches_full_prefill(self, tiny_model, rng):
        cfg, params = tiny_model
        page = 16
        full = rng.integers(0, cfg.vocab_size, 24).astype(np.int32)  # 1 full page + 8
        rope_cache = llama.build_rope_cache(cfg)
        # reference: full prefill
        kc, vc = llama.make_caches(cfg, 8, page)
        pad = 32
        tok = np.zeros((1, pad), np.int32); tok[0, :24] = full
        pos = np.zeros((1, pad), np.int32); pos[0, :24] = np.arange(24)
        slots = np.full((1, pad), -1, np.int32); slots[0, :24] = page + np.arange(24)  # pages 1,2
        ref, _, _ = llama.prefill(params, cfg, kc, vc, jnp.asarray(tok), jnp.asarray(pos),
                                  jnp.asarray([24], jnp.int32), jnp.asarray(slots), rope_cache)
        # extend path: first prefill the 16-token prefix, then extend with 8
        kc2, vc2 = llama.make_caches(cfg, 8, page)
        tokp = np.zeros((1, 16), np.int32); tokp[0] = full[:16]
        posp = np.arange(16, dtype=np.int32)[None]
        slotsp = (page + np.arange(16, dtype=np.int32))[None]
        _, kc2, vc2 = llama.prefill(params, cfg, kc2, vc2, jnp.asarray(tokp), jnp.asarray(posp),
                                    jnp.asarray([16], jnp.int32), jnp.asarray(slotsp), rope_cache)
        toks = np.zeros((1, 16), np.int32); toks[0, :8] = full[16:]
        poss = np.zeros((1, 16), np.int32); poss[0, :8] = np.arange(16, 24)
        slotss = np.full((1, 16), -1, np.int32); slotss[0, :8] = 2 * page + np.arange(8)
        table = np.asarray([[1, 2, 0, 0]], np.int32)
        out, kc2, vc2 = llama.prefill_extend(
            params, cfg, kc2, vc2, jnp.asarray(toks), jnp.asarray(poss),
            jnp.asarray([8], jnp.int32), jnp.asarray([24], jnp.int32),
            jnp.asarray(table), jnp.asarray(slotss), rope_cache, prefix_max=16,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2)


class TestPrefixCache:
    def test_shared_prefix_reuse_matches(self, tiny_model, rng):
        from sgl_kernel_tpu.serving import native as native_mod
        if not native_mod.available():
            pytest.skip("native lib unavailable")
        cfg, params = tiny_model
        shared = rng.integers(0, cfg.vocab_size, 16).tolist()  # one full page
        tail_a = rng.integers(0, cfg.vocab_size, 5).tolist()
        tail_b = rng.integers(0, cfg.vocab_size, 7).tolist()

        def run(enable):
            eng = Engine(cfg, params, max_batch=2, num_pages=64, page_size=16,
                         prefill_bucket=16, enable_prefix_cache=enable)
            r1 = eng.add_request(shared + tail_a, max_new_tokens=4)
            eng.run_until_done(max_steps=40)
            r2 = eng.add_request(shared + tail_b, max_new_tokens=4)
            eng.run_until_done(max_steps=40)
            return eng, eng.finished[r1].output, eng.finished[r2].output

        eng_c, a_c, b_c = run(True)
        _, a_n, b_n = run(False)
        assert a_c == a_n and b_c == b_n
        # the second request must actually have reused the cached prefix
        assert eng_c.finished[1].prefix_len == 16


class TestConvert:
    def test_hf_roundtrip_matches_init_layout(self, rng):
        from sgl_kernel_tpu.models import convert

        cfg = llama.LlamaConfig.tiny()
        h, d = cfg.hidden_size, cfg.head_dim
        nq, nkv, l = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
        state = {}
        for i in range(l):
            p = f"model.layers.{i}."
            state[p + "self_attn.q_proj.weight"] = rng.standard_normal((nq * d, h)).astype(np.float32)
            state[p + "self_attn.k_proj.weight"] = rng.standard_normal((nkv * d, h)).astype(np.float32)
            state[p + "self_attn.v_proj.weight"] = rng.standard_normal((nkv * d, h)).astype(np.float32)
            state[p + "self_attn.o_proj.weight"] = rng.standard_normal((h, nq * d)).astype(np.float32)
            state[p + "mlp.gate_proj.weight"] = rng.standard_normal((cfg.intermediate_size, h)).astype(np.float32)
            state[p + "mlp.up_proj.weight"] = rng.standard_normal((cfg.intermediate_size, h)).astype(np.float32)
            state[p + "mlp.down_proj.weight"] = rng.standard_normal((h, cfg.intermediate_size)).astype(np.float32)
            state[p + "input_layernorm.weight"] = np.ones(h, np.float32)
            state[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        state["model.embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32)
        state["model.norm.weight"] = np.ones(h, np.float32)
        state["lm_head.weight"] = rng.standard_normal((cfg.vocab_size, h)).astype(np.float32)

        params = convert.convert_hf_llama(state, cfg)
        # run a forward to make sure the layout is accepted end-to-end
        kc, vc = llama.make_caches(cfg, 4, 16)
        rope_cache = llama.build_rope_cache(cfg)
        tok = np.zeros((1, 16), np.int32); tok[0, :3] = [1, 2, 3]
        pos = np.zeros((1, 16), np.int32); pos[0, :3] = np.arange(3)
        slots = np.full((1, 16), -1, np.int32); slots[0, :3] = 16 + np.arange(3)
        logits, _, _ = llama.prefill(
            params, cfg, kc, vc, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([3], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        assert np.isfinite(np.asarray(logits)).all()
        np.testing.assert_allclose(
            np.asarray(params["layers"]["q"][1]), state["model.layers.1.self_attn.q_proj.weight"], rtol=1e-6
        )

    def test_safetensors_loader(self, tmp_path, rng):
        from sgl_kernel_tpu.models.convert import load_safetensors
        import json, struct

        arr = rng.standard_normal((4, 8)).astype(np.float32)
        header = {"w": {"dtype": "F32", "shape": [4, 8], "data_offsets": [0, arr.nbytes]}}
        hb = json.dumps(header).encode()
        path = tmp_path / "x.safetensors"
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hb)))
            f.write(hb)
            f.write(arr.tobytes())
        out = load_safetensors(str(path))
        np.testing.assert_array_equal(out["w"], arr)


class TestQwenOptions:
    def test_qk_norm_bias_forward_and_oracle(self, rng):
        import dataclasses
        cfg = dataclasses.replace(llama.LlamaConfig.tiny(), qk_norm=True, qkv_bias=True)
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        # perturb norms/biases so the options actually matter
        d = cfg.head_dim
        params["layers"]["q_norm"] = jnp.asarray(rng.random((cfg.num_layers, d)) + 0.5, cfg.dtype)
        params["layers"]["k_norm"] = jnp.asarray(rng.random((cfg.num_layers, d)) + 0.5, cfg.dtype)
        params["layers"]["q_bias"] = jnp.asarray(rng.standard_normal((cfg.num_layers, cfg.num_heads * d)) * 0.1, cfg.dtype)

        b, pages, page = 2, 8, 16
        kc, vc = llama.make_caches(cfg, pages, page)
        rope_cache = llama.build_rope_cache(cfg)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        tables = jnp.asarray(np.stack([[i, 0, 0, 0] for i in range(b)]).astype(np.int32))
        logits, kc, vc = llama.decode_step(
            params, cfg, kc, vc, tokens, jnp.zeros(b, jnp.int32), tables,
            jnp.ones(b, jnp.int32), jnp.asarray([0, page], jnp.int32), rope_cache,
        )
        assert np.isfinite(np.asarray(logits)).all()
        # oracle via np_forward extended inline: single token, layer 0 math
        x = np.asarray(params["embed"])[np.asarray(tokens)].astype(np.float32)
        lw = {k: np.asarray(v, np.float32) if not isinstance(v, dict) else v
              for k, v in params["layers"].items()}
        h = x / np.sqrt((x**2).mean(-1, keepdims=True) + cfg.rms_eps) * lw["input_norm"][0]
        q = (h @ lw["q"][0].T + lw["q_bias"][0]).reshape(b, cfg.num_heads, d)
        qn = q / np.sqrt((q**2).mean(-1, keepdims=True) + cfg.rms_eps) * lw["q_norm"][0]
        # position 0: rope is identity on cos=1/sin=0 -> compare against kernel q
        from sgl_kernel_tpu.ops.rope import rope_decode_fused
        k_ = (h @ lw["k"][0].T + lw["k_bias"][0]).reshape(b, cfg.num_kv_heads, d)
        kn = k_ / np.sqrt((k_**2).mean(-1, keepdims=True) + cfg.rms_eps) * lw["k_norm"][0]
        # seq 0 wrote position 0 -> layer 0, page 0, row 0: cache == normed k
        # (rope at position 0 is identity)
        got_k = np.asarray(kc)[0, 0, :, 0, :]  # page-major pool: [Hkv, D]
        np.testing.assert_allclose(got_k, kn[0], rtol=2e-4, atol=2e-4)
        assert np.isfinite(qn).all()


class TestEngineSampling:
    def test_stop_tokens_and_params(self, tiny_model, rng):
        cfg, params = tiny_model
        eng = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        prompt = rng.integers(0, cfg.vocab_size, 5).tolist()
        # find the greedy continuation, then use its 2nd token as stop
        r0 = eng.add_request(prompt, max_new_tokens=6)
        eng.run_until_done(max_steps=30)
        out = eng.finished[r0].output
        eng2 = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                      prefill_bucket=16, enable_prefix_cache=False)
        r1 = eng2.add_request(prompt, max_new_tokens=6, stop_tokens=[out[2]])
        eng2.run_until_done(max_steps=30)
        assert eng2.finished[r1].output == out[:3]
        # sampled request with top_k runs and terminates
        eng3 = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                      prefill_bucket=16, enable_prefix_cache=False)
        r2 = eng3.add_request(prompt, max_new_tokens=4, temperature=0.8, top_k=5, top_p=0.9)
        eng3.run_until_done(max_steps=30)
        assert len(eng3.finished[r2].output) == 4


class TestEngineMesh:
    def test_tp_engine_matches_single(self, rng):
        from sgl_kernel_tpu.parallel import mesh as mesh_lib

        cfg = llama.LlamaConfig.tiny()  # fused=False by default
        params = llama.init_weights(cfg, jax.random.PRNGKey(5))
        prompt = rng.integers(0, cfg.vocab_size, 6).tolist()
        single = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                        prefill_bucket=16, enable_prefix_cache=False)
        r0 = single.add_request(prompt, max_new_tokens=5)
        single.run_until_done(max_steps=30)

        m = mesh_lib.make_mesh({"dp": 1, "tp": 2})
        eng = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False, mesh=m)
        r1 = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done(max_steps=30)
        assert eng.finished[r1].output == single.finished[r0].output


class TestChunkedPrefill:
    def test_chunked_matches_full(self, tiny_model, rng):
        cfg, params = tiny_model
        prompt = rng.integers(0, cfg.vocab_size, 21).tolist()
        full = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                      prefill_bucket=8, enable_prefix_cache=False)
        r0 = full.add_request(prompt, max_new_tokens=5)
        full.run_until_done(max_steps=30)
        chunked = Engine(cfg, params, max_batch=2, num_pages=32, page_size=16,
                         prefill_bucket=8, enable_prefix_cache=False, prefill_chunk=8)
        r1 = chunked.add_request(prompt, max_new_tokens=5)
        chunked.run_until_done(max_steps=30)
        assert chunked.finished[r1].output == full.finished[r0].output
