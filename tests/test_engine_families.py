"""Engine serving for Mixtral / gpt-oss: adapter auto-selection (their
configs SUBCLASS LlamaConfig — most-specific-first dispatch), greedy
parity against direct model stepping, capability gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import gptoss, mixtral
from sgl_kernel_tpu.serving import Engine
from sgl_kernel_tpu.serving.adapters import GptOssAdapter, MixtralAdapter, adapter_for


def oracle(mod, cfg, params, prompt, n_new, page=16, num_pages=32):
    from sgl_kernel_tpu.models import llama

    rope = llama.build_rope_cache(cfg)
    kc, vc = llama.make_caches(cfg, num_pages, page)
    s = len(prompt)
    pad = max(16, 1 << (s - 1).bit_length())
    tok = np.zeros((1, pad), np.int32); tok[0, :s] = prompt
    pos = np.zeros((1, pad), np.int32); pos[0, :s] = np.arange(s)
    slots = np.full((1, pad), -1, np.int32); slots[0, :s] = page + np.arange(s)
    logits, kc, vc = mod.prefill(params, cfg, kc, vc, jnp.asarray(tok),
                                 jnp.asarray(pos), jnp.asarray([s], jnp.int32),
                                 jnp.asarray(slots), rope)
    out = [int(jnp.argmax(logits[0]))]
    table = np.arange(1, 1 + (s + n_new + page) // page, dtype=np.int32)[None]
    for t in range(n_new - 1):
        plen = s + t
        logits, kc, vc = mod.decode_step(
            params, cfg, kc, vc, jnp.asarray([out[-1]], jnp.int32),
            jnp.asarray([plen], jnp.int32), jnp.asarray(table),
            jnp.asarray([plen + 1], jnp.int32),
            jnp.asarray([page + plen], jnp.int32), rope)
        out.append(int(jnp.argmax(logits[0])))
    return out


class TestEngineFamilies:
    def test_adapter_dispatch_most_specific(self):
        mc = mixtral.MixtralConfig.tiny()
        gc = gptoss.GptOssConfig.tiny()
        assert isinstance(adapter_for(mc), MixtralAdapter)
        assert isinstance(adapter_for(gc), GptOssAdapter)
        assert adapter_for(gc).name == "gptoss"

    def test_mixtral_engine_matches_oracle(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        ref = oracle(mixtral, cfg, params, prompt, 5)
        eng = Engine(cfg, params, num_pages=32, page_size=16, prefill_bucket=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert eng.finished[rid].output == ref

    def test_gptoss_engine_matches_oracle(self, rng):
        cfg = gptoss.GptOssConfig.tiny()
        params = gptoss.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        ref = oracle(gptoss, cfg, params, prompt, 5)
        eng = Engine(cfg, params, num_pages=32, page_size=16, prefill_bucket=16)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert eng.finished[rid].output == ref

    def test_mixtral_burst_and_two_requests(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        p1 = rng.integers(0, cfg.vocab_size, 7).astype(np.int32).tolist()
        p2 = rng.integers(0, cfg.vocab_size, 13).astype(np.int32).tolist()
        r1 = oracle(mixtral, cfg, params, p1, 4)
        r2 = oracle(mixtral, cfg, params, p2, 4)
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=4,
                     prefill_bucket=16, decode_burst=2)
        i1 = eng.add_request(p1, max_new_tokens=4)
        i2 = eng.add_request(p2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[i1].output == r1
        assert eng.finished[i2].output == r2

    def test_prefix_cache_auto_disabled(self):
        # hybrid_gdn chunks its own prompts (extend) but can't adopt a
        # radix-cache prefix: the conv/SSM state behind it doesn't exist
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(0))
        eng = Engine(cfg, params, num_pages=32, page_size=16)
        assert eng.native is None  # prefix cache auto-disabled


class TestHybridGdnEngine:
    def _oracle(self, cfg, params, prompt, n_new, page=16, num_pages=32):
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        rope = hg.build_rope_cache(cfg)
        kc, vc = hg.make_caches(cfg, num_pages, page)
        conv, ssm = hg.make_states(cfg, 1)
        s = len(prompt)
        pad = max(16, 1 << (s - 1).bit_length())
        tok = np.zeros((1, pad), np.int32); tok[0, :s] = prompt
        pos = np.zeros((1, pad), np.int32); pos[0, :s] = np.arange(s)
        slots = np.full((1, pad), -1, np.int32); slots[0, :s] = page + np.arange(s)
        logits, kc, vc, conv, ssm = hg.prefill(
            params, cfg, kc, vc, conv, ssm, jnp.asarray(tok), jnp.asarray(pos),
            jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope)
        out = [int(jnp.argmax(logits[0]))]
        table = np.arange(1, 1 + (s + n_new + page) // page, dtype=np.int32)[None]
        for t in range(n_new - 1):
            plen = s + t
            logits, kc, vc, conv, ssm = hg.decode_step(
                params, cfg, kc, vc, conv, ssm, jnp.asarray([out[-1]], jnp.int32),
                jnp.asarray([plen], jnp.int32), jnp.asarray(table),
                jnp.asarray([plen + 1], jnp.int32),
                jnp.asarray([page + plen], jnp.int32), rope)
            out.append(int(jnp.argmax(logits[0])))
        return out

    def test_engine_matches_oracle_two_requests(self, rng):
        """Per-request recurrent state survives batch recomposition: the
        short request retires first and its state slot is recycled without
        touching the longer request's state."""
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(0))
        p1 = rng.integers(0, cfg.vocab_size, 7).astype(np.int32).tolist()
        p2 = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        r1 = self._oracle(cfg, params, p1, 3)
        r2 = self._oracle(cfg, params, p2, 8)
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=4,
                     prefill_bucket=16)
        i1 = eng.add_request(p1, max_new_tokens=3)
        i2 = eng.add_request(p2, max_new_tokens=8)
        eng.run_until_done()
        assert eng.finished[i1].output == r1
        assert eng.finished[i2].output == r2
        # slot recycling: a third request after retirement
        p3 = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        r3 = self._oracle(cfg, params, p3, 4)
        i3 = eng.add_request(p3, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[i3].output == r3

    def test_chunked_prompt_matches_oracle(self, rng):
        """VERDICT r2 #6: a multi-chunk prompt through the normal admission
        path (prefill_chunk) must match the one-shot prefill — the GDN
        conv/SSM recurrence carries across chunks and the GQA layers merge
        fresh-chunk and cached-prefix attention."""
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 40).astype(np.int32).tolist()
        ref = self._oracle(cfg, params, prompt, 5)
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=2,
                     prefill_chunk=16, prefill_bucket=16)
        assert eng.native is None  # chunking OK, prefix reuse still off
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert eng.finished[rid].output == ref
        # non-chunk-aligned length through the same path
        p2 = rng.integers(0, cfg.vocab_size, 23).astype(np.int32).tolist()
        ref2 = self._oracle(cfg, params, p2, 4)
        rid2 = eng.add_request(p2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid2].output == ref2

    def test_burst_stateful(self, rng):
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        ref = self._oracle(cfg, params, prompt, 6)
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=2,
                     prefill_bucket=16, decode_burst=3)
        rid = eng.add_request(prompt, max_new_tokens=6)
        eng.run_until_done()
        assert eng.finished[rid].output == ref


class TestMixtralExtend:
    def test_chunked_prefill_and_prefix_reuse(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 40).astype(np.int32).tolist()
        ref = oracle(mixtral, cfg, params, prompt, 4)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_chunk=16, enable_prefix_cache=True,
                     prefill_bucket=16)
        rid = eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid].output == ref
        prompt2 = prompt[:32] + rng.integers(0, cfg.vocab_size, 4).astype(np.int32).tolist()
        ref2 = oracle(mixtral, cfg, params, prompt2, 4)
        rid2 = eng.add_request(prompt2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid2].output == ref2
        if eng.native is not None:
            assert eng.metrics.counters.get("prefix_cache_hit_tokens", 0) > 0


class TestGptOssExtend:
    def test_chunked_prefill_sinks_window(self, rng):
        """Chunked gpt-oss prefill (sink-free two-pass + apply_sinks +
        alternating window) matches the single-launch oracle."""
        cfg = gptoss.GptOssConfig.tiny()
        params = gptoss.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 40).astype(np.int32).tolist()
        ref = oracle(gptoss, cfg, params, prompt, 4)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_chunk=16, enable_prefix_cache=True,
                     prefill_bucket=16)
        rid = eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid].output == ref
        prompt2 = prompt[:32] + rng.integers(0, cfg.vocab_size, 4).astype(np.int32).tolist()
        ref2 = oracle(gptoss, cfg, params, prompt2, 4)
        rid2 = eng.add_request(prompt2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid2].output == ref2


class TestPackedFamilies:
    def test_gptoss_packed_batch(self, rng):
        """Concurrent gpt-oss admissions route through the packed prefill
        (sinks + alternating window in the packed kernel) — oracle parity."""
        cfg = gptoss.GptOssConfig.tiny()
        params = gptoss.init_weights(cfg, jax.random.PRNGKey(0))
        prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
                   for n in (7, 19, 11)]
        refs = [oracle(gptoss, cfg, params, p, 4) for p in prompts]
        eng = Engine(cfg, params, num_pages=64, page_size=16, max_batch=4,
                     prefill_bucket=16, enable_prefix_cache=False)
        rids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        eng.run_until_done()
        assert [eng.finished[r].output for r in rids] == refs

    def test_mixtral_packed_batch(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
                   for n in (9, 23)]
        refs = [oracle(mixtral, cfg, params, p, 4) for p in prompts]
        eng = Engine(cfg, params, num_pages=64, page_size=16, max_batch=4,
                     prefill_bucket=16, enable_prefix_cache=False)
        rids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        eng.run_until_done()
        assert [eng.finished[r].output for r in rids] == refs


class TestMixtralSpec:
    def test_spec_lossless_vs_plain_greedy(self, rng):
        """Mixtral target + tiny llama draft: chain speculative decoding
        must emit exactly plain greedy's tokens (losslessness)."""
        from sgl_kernel_tpu.models import llama

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        dcfg = llama.LlamaConfig.tiny()
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        plain = Engine(cfg, params, num_pages=64, page_size=16,
                       prefill_bucket=16, enable_prefix_cache=False)
        r0 = plain.add_request(prompt, max_new_tokens=8)
        plain.run_until_done()
        ref = plain.finished[r0].output
        spec = Engine(cfg, params, num_pages=64, page_size=16,
                      prefill_bucket=16, enable_prefix_cache=False,
                      draft_cfg=dcfg, spec_gamma=3)
        r1 = spec.add_request(prompt, max_new_tokens=8)
        spec.run_until_done()
        assert spec.finished[r1].output == ref


class TestTreeSpecEngine:
    def test_tree_spec_lossless_vs_plain_greedy(self, rng):
        """VERDICT r2 #8: tree speculation (spec_topk>1) through the engine
        emits exactly plain greedy's stream, for two concurrent requests
        with an adversarial (random) draft."""
        from sgl_kernel_tpu.models import llama as lm

        cfg = lm.LlamaConfig.tiny()
        params = lm.init_weights(cfg, jax.random.PRNGKey(0))
        dcfg = lm.LlamaConfig(
            vocab_size=cfg.vocab_size, hidden_size=64, intermediate_size=128,
            num_layers=1, num_heads=2, num_kv_heads=1, head_dim=32,
            max_position=256, dtype=jnp.float32)
        p1 = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        p2 = rng.integers(0, cfg.vocab_size, 5).astype(np.int32).tolist()
        plain = Engine(cfg, params, num_pages=64, page_size=16,
                       prefill_bucket=16, enable_prefix_cache=False)
        r1 = plain.add_request(p1, max_new_tokens=10)
        r2 = plain.add_request(p2, max_new_tokens=7)
        plain.run_until_done()
        eng = Engine(cfg, params, num_pages=64, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False,
                     draft_cfg=dcfg, spec_gamma=3, spec_topk=2)
        s1 = eng.add_request(p1, max_new_tokens=10)
        s2 = eng.add_request(p2, max_new_tokens=7)
        eng.run_until_done()
        assert eng.finished[s1].output == plain.finished[r1].output
        assert eng.finished[s2].output == plain.finished[r2].output

    def test_tree_requires_prefill_tree(self, rng):
        from sgl_kernel_tpu.models import llama as lm

        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        with pytest.raises(AssertionError, match="prefill_tree"):
            Engine(cfg, params, num_pages=32, page_size=16,
                   draft_cfg=lm.LlamaConfig.tiny(), spec_topk=2)
