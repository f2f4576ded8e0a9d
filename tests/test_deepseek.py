"""DeepSeek-MLA model tests: decode path consistent with prefill path
(prefill itself rides mla_prefill, which is oracle-tested in test_mla)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import deepseek


@pytest.fixture(scope="module")
def tiny():
    cfg = deepseek.DeepseekConfig.tiny()
    params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestDeepseek:
    def test_decode_continues_prefill(self, tiny, rng):
        cfg, params = tiny
        page = 16
        s = 10
        toks = rng.integers(0, cfg.vocab_size, s + 2).astype(np.int32)
        rope_cache = deepseek.build_rope_cache(cfg)

        def run_prefill(n):
            cache = deepseek.make_cache(cfg, 8, page)
            pad = 16
            tok = np.zeros((1, pad), np.int32); tok[0, :n] = toks[:n]
            pos = np.zeros((1, pad), np.int32); pos[0, :n] = np.arange(n)
            slots = np.full((1, pad), -1, np.int32); slots[0, :n] = page + np.arange(n)
            logits, cache = deepseek.prefill(
                params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
                jnp.asarray([n], jnp.int32), jnp.asarray(slots), rope_cache,
            )
            return logits, cache

        ref_logits, _ = run_prefill(s + 1)
        base_logits, cache = run_prefill(s)
        table = np.asarray([[1, 2, 0, 0]], np.int32)
        dec_logits, cache = deepseek.decode_step(
            params, cfg, cache,
            jnp.asarray([toks[s]], jnp.int32), jnp.asarray([s], jnp.int32),
            jnp.asarray(table), jnp.asarray([s + 1], jnp.int32),
            jnp.asarray([page + s], jnp.int32), rope_cache,
        )
        np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(ref_logits), rtol=3e-2, atol=3e-2)

    def test_moe_layers_active(self, tiny, rng):
        cfg, params = tiny
        # layer >= num_dense_layers routes through experts: zeroing the
        # router must change the output (weights differ per expert)
        import dataclasses
        page = 16
        cache = deepseek.make_cache(cfg, 4, page)
        rope_cache = deepseek.build_rope_cache(cfg)
        tok = np.zeros((1, 16), np.int32); tok[0, :4] = [1, 2, 3, 4]
        pos = np.zeros((1, 16), np.int32); pos[0, :4] = np.arange(4)
        slots = np.full((1, 16), -1, np.int32); slots[0, :4] = page + np.arange(4)
        logits, _ = deepseek.prefill(
            params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([4], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        p2 = jax.tree.map(lambda x: x, params)
        p2["layers"] = dict(p2["layers"])
        p2["layers"]["moe_w2"] = p2["layers"]["moe_w2"] * 0.0
        cache2 = deepseek.make_cache(cfg, 4, page)
        logits2, _ = deepseek.prefill(
            p2, cfg, cache2, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([4], jnp.int32), jnp.asarray(slots), rope_cache,
        )
        assert not np.allclose(np.asarray(logits), np.asarray(logits2))


class TestNSASparseDecode:
    """DSv4 NSA pipeline integrated into the model: fp8 indexer scoring ->
    fast_topk -> sparse MLA gather. With index_topk >= context the selected
    set covers every cached token, so sparse decode must match the dense
    decode step."""

    @pytest.fixture(scope="class")
    def nsa_setup(self):
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def _prefill_both(self, cfg, params, toks, s, page, rng):
        rope = deepseek.build_rope_cache(cfg)
        irope = deepseek.build_idx_rope_cache(cfg)
        pad = 16
        tok = np.zeros((1, pad), np.int32); tok[0, :s] = toks[:s]
        pos = np.zeros((1, pad), np.int32); pos[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32); slots[0, :s] = page + np.arange(s)

        cache_d = deepseek.make_cache(cfg, 8, page)
        _, cache_d = deepseek.prefill(
            params, cfg, cache_d, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope)

        cache_n = deepseek.make_cache(cfg, 8, page)
        ik, isc = deepseek.make_indexer_cache(cfg, 8, page)
        _, cache_n, ik, isc = deepseek.prefill_nsa(
            params, cfg, cache_n, ik, isc, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope, irope)
        np.testing.assert_allclose(np.asarray(cache_d), np.asarray(cache_n),
                                   rtol=1e-5, atol=1e-6)
        return rope, irope, cache_d, cache_n, ik, isc

    def test_full_topk_matches_dense(self, nsa_setup, rng):
        cfg, params = nsa_setup
        page, s = 16, 10
        toks = rng.integers(0, cfg.vocab_size, s + 1).astype(np.int32)
        rope, irope, cache_d, cache_n, ik, isc = self._prefill_both(
            cfg, params, toks, s, page, rng)

        table = np.asarray([[1, 2, 0, 0]], np.int32)
        args = (jnp.asarray([toks[s]], jnp.int32), jnp.asarray([s], jnp.int32),
                jnp.asarray(table), jnp.asarray([s + 1], jnp.int32),
                jnp.asarray([page + s], jnp.int32), rope)
        dense_logits, _ = deepseek.decode_step(params, cfg, cache_d, *args)
        nsa_logits, _, ik, isc = deepseek.decode_step_nsa(
            params, cfg, cache_n, ik, isc, *args, irope)
        np.testing.assert_allclose(np.asarray(nsa_logits), np.asarray(dense_logits),
                                   rtol=2e-3, atol=2e-3)

    def test_small_topk_runs_and_differs(self, nsa_setup, rng):
        """With index_topk < context the output is finite and (generically)
        differs from dense — the sparsity is actually applied."""
        cfg0, _ = nsa_setup
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=4)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        page, s = 16, 12
        toks = rng.integers(0, cfg.vocab_size, s + 1).astype(np.int32)
        rope, irope, cache_d, cache_n, ik, isc = self._prefill_both(
            cfg, params, toks, s, page, rng)
        table = np.asarray([[1, 2, 0, 0]], np.int32)
        args = (jnp.asarray([toks[s]], jnp.int32), jnp.asarray([s], jnp.int32),
                jnp.asarray(table), jnp.asarray([s + 1], jnp.int32),
                jnp.asarray([page + s], jnp.int32), rope)
        dense_logits, _ = deepseek.decode_step(params, cfg, cache_d, *args)
        nsa_logits, _, _, _ = deepseek.decode_step_nsa(
            params, cfg, cache_n, ik, isc, *args, irope)
        out = np.asarray(nsa_logits)
        assert np.all(np.isfinite(out))
        assert not np.allclose(out, np.asarray(dense_logits), atol=1e-5)


class TestPrefillExtend:
    def test_chunked_extend_matches_full_prefill(self, tiny, rng):
        """Ingest a prompt in two chunks through prefill + prefill_extend;
        the final-token logits must match one full prefill (two-pass
        merge_state combine over cached prefix latents)."""
        cfg, params = tiny
        page = 16
        total = 14
        pre = 6
        toks = rng.integers(0, cfg.vocab_size, total).astype(np.int32)
        rope_cache = deepseek.build_rope_cache(cfg)
        pages = [3, 1]  # slots land in these pages (prefix_max = 2 pages)

        def slot(p):
            return pages[p // page] * page + p % page

        # full prefill oracle
        cache = deepseek.make_cache(cfg, 8, page)
        pad = 16
        tok = np.zeros((1, pad), np.int32); tok[0, :total] = toks
        pos = np.zeros((1, pad), np.int32); pos[0, :total] = np.arange(total)
        slots = np.full((1, pad), -1, np.int32)
        slots[0, :total] = [slot(p) for p in range(total)]
        ref_logits, _ = deepseek.prefill(
            params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([total], jnp.int32), jnp.asarray(slots), rope_cache,
        )

        # chunk 1 through prefill, chunk 2 through prefill_extend
        cache = deepseek.make_cache(cfg, 8, page)
        t1 = np.zeros((1, pad), np.int32); t1[0, :pre] = toks[:pre]
        p1 = np.zeros((1, pad), np.int32); p1[0, :pre] = np.arange(pre)
        s1 = np.full((1, pad), -1, np.int32); s1[0, :pre] = [slot(p) for p in range(pre)]
        _, cache = deepseek.prefill(
            params, cfg, cache, jnp.asarray(t1), jnp.asarray(p1),
            jnp.asarray([pre], jnp.int32), jnp.asarray(s1), rope_cache,
        )
        sfx = total - pre
        t2 = np.zeros((1, pad), np.int32); t2[0, :sfx] = toks[pre:]
        p2 = np.zeros((1, pad), np.int32); p2[0, :sfx] = np.arange(pre, total)
        s2 = np.full((1, pad), -1, np.int32); s2[0, :sfx] = [slot(p) for p in range(pre, total)]
        table = np.zeros((1, 4), np.int32); table[0, :2] = pages
        ext_logits, _ = deepseek.prefill_extend(
            params, cfg, cache, jnp.asarray(t2), jnp.asarray(p2),
            jnp.asarray([sfx], jnp.int32), jnp.asarray([total], jnp.int32),
            jnp.asarray(table), jnp.asarray(s2), rope_cache, prefix_max=page,
        )
        np.testing.assert_allclose(
            np.asarray(ext_logits), np.asarray(ref_logits), rtol=3e-2, atol=3e-2
        )


class TestDeepseekQuantFp8:
    def test_w4a16_engine_serves(self, rng):
        """quant='w4a16': every linear + expert bank + lm_head on the
        packed-int4 kernels (stacked layer prefetch); engine end-to-end."""
        cfg = deepseek.DeepseekConfig.tiny(quant="w4a16", group_size=32)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        assert isinstance(params["layers"]["wq"], dict)
        assert isinstance(params["layers"]["moe_w1"], dict)
        from sgl_kernel_tpu.serving import Engine

        eng = Engine(cfg, params, num_pages=16, page_size=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(rng.integers(0, cfg.vocab_size, 9).tolist(),
                              max_new_tokens=5)
        eng.run_until_done()
        assert len(eng.finished[rid].output) == 5

    def test_w4a16_close_to_bf16_logits(self, rng):
        """Quantized prefill logits stay close to the bf16 model built from
        the SAME underlying weights (quantization error bound)."""
        cfg_b = deepseek.DeepseekConfig.tiny()
        params_b = deepseek.init_weights(cfg_b, jax.random.PRNGKey(3))
        cfg_q = deepseek.DeepseekConfig.tiny(quant="w4a16", group_size=32)
        params_q = deepseek.init_weights(cfg_q, jax.random.PRNGKey(3))
        page, s = 16, 8
        toks = rng.integers(0, cfg_b.vocab_size, s).astype(np.int32)
        rope = deepseek.build_rope_cache(cfg_b)
        tok = np.zeros((1, 16), np.int32); tok[0, :s] = toks
        pos = np.zeros((1, 16), np.int32); pos[0, :s] = np.arange(s)
        sl = np.full((1, 16), -1, np.int32); sl[0, :s] = page + np.arange(s)

        def run(cfg, params):
            cache = deepseek.make_cache(cfg, 4, page)
            logits, _ = deepseek.prefill(
                params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
                jnp.asarray([s], jnp.int32), jnp.asarray(sl), rope)
            return np.asarray(logits[0], np.float64)

        lb, lq = run(cfg_b, params_b), run(cfg_q, params_q)
        rel = np.abs(lb - lq).mean() / (np.abs(lb).mean() + 1e-9)
        assert rel < 0.25, rel  # 4-bit quantization noise bound, tiny model

    def test_fp8_latent_cache_close_to_bf16(self, rng):
        """kv_dtype=fp8: decode logits close to the bf16-cache run (same
        weights; only the latent pool is quantized to e4m3)."""
        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        page, s = 16, 10
        toks = rng.integers(0, cfg.vocab_size, s + 1).astype(np.int32)
        rope = deepseek.build_rope_cache(cfg)

        def run(kv_dtype):
            cache = deepseek.make_cache(cfg, 8, page, kv_dtype=kv_dtype)
            tok = np.zeros((1, 16), np.int32); tok[0, :s] = toks[:s]
            pos = np.zeros((1, 16), np.int32); pos[0, :s] = np.arange(s)
            sl = np.full((1, 16), -1, np.int32); sl[0, :s] = page + np.arange(s)
            _, cache = deepseek.prefill(
                params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
                jnp.asarray([s], jnp.int32), jnp.asarray(sl), rope)
            table = np.asarray([[1, 2, 0, 0]], np.int32)
            logits, _ = deepseek.decode_step(
                params, cfg, cache, jnp.asarray([toks[s]], jnp.int32),
                jnp.asarray([s], jnp.int32), jnp.asarray(table),
                jnp.asarray([s + 1], jnp.int32),
                jnp.asarray([page + s], jnp.int32), rope)
            return np.asarray(logits[0], np.float64)

        lb = run(None)
        l8 = run(jnp.float8_e4m3fn)
        rel = np.abs(lb - l8).mean() / (np.abs(lb).mean() + 1e-9)
        assert rel < 0.15, rel
