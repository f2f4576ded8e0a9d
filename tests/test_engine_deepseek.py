"""DeepSeek serving-engine variant: the scheduler drives the MLA model
through serving/adapters.DeepseekAdapter — greedy outputs must match
stepping the model directly (prefill + decode_step), with paging, chunked
prefill, prefix reuse and the NSA sparse-decode variant exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import deepseek
from sgl_kernel_tpu.serving import Engine
from sgl_kernel_tpu.serving.adapters import DeepseekAdapter


@pytest.fixture(scope="module")
def tiny():
    cfg = deepseek.DeepseekConfig.tiny()
    params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


def greedy_oracle(cfg, params, prompt, n_new, num_pages=16, page=16):
    """Direct model stepping: one full prefill, then decode_step per token."""
    rope = deepseek.build_rope_cache(cfg)
    cache = deepseek.make_cache(cfg, num_pages, page)
    s = len(prompt)
    pad = max(16, 1 << (s - 1).bit_length())
    tok = np.zeros((1, pad), np.int32); tok[0, :s] = prompt
    pos = np.zeros((1, pad), np.int32); pos[0, :s] = np.arange(s)
    slots = np.full((1, pad), -1, np.int32); slots[0, :s] = page + np.arange(s)
    logits, cache = deepseek.prefill(
        params, cfg, cache, jnp.asarray(tok), jnp.asarray(pos),
        jnp.asarray([s], jnp.int32), jnp.asarray(slots), rope,
    )
    out = [int(jnp.argmax(logits[0]))]
    table = np.arange(1, 1 + (s + n_new + page) // page, dtype=np.int32)[None]
    for t in range(n_new - 1):
        plen = s + t
        logits, cache = deepseek.decode_step(
            params, cfg, cache, jnp.asarray([out[-1]], jnp.int32),
            jnp.asarray([plen], jnp.int32), jnp.asarray(table),
            jnp.asarray([plen + 1], jnp.int32),
            jnp.asarray([page + plen], jnp.int32), rope,
        )
        out.append(int(jnp.argmax(logits[0])))
    return out


class TestDeepseekEngine:
    def test_engine_matches_direct_stepping(self, tiny, rng):
        cfg, params = tiny
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        ref = greedy_oracle(cfg, params, prompt, 6)
        eng = Engine(cfg, params, num_pages=16, page_size=16,
                     enable_prefix_cache=False)
        rid = eng.add_request(prompt, max_new_tokens=6)
        eng.run_until_done()
        assert eng.finished[rid].output == ref

    def test_two_concurrent_requests(self, tiny, rng):
        cfg, params = tiny
        p1 = rng.integers(0, cfg.vocab_size, 7).astype(np.int32).tolist()
        p2 = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        r1 = greedy_oracle(cfg, params, p1, 5)
        r2 = greedy_oracle(cfg, params, p2, 5)
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=4,
                     enable_prefix_cache=False)
        i1 = eng.add_request(p1, max_new_tokens=5)
        i2 = eng.add_request(p2, max_new_tokens=5)
        eng.run_until_done()
        assert eng.finished[i1].output == r1
        assert eng.finished[i2].output == r2

    def test_chunked_prefill_and_prefix_reuse(self, tiny, rng):
        """Long prompt in chunks (prefill_extend) + radix prefix reuse on a
        second request sharing the first pages must not change outputs."""
        cfg, params = tiny
        prompt = rng.integers(0, cfg.vocab_size, 40).astype(np.int32).tolist()
        ref = greedy_oracle(cfg, params, prompt, 4, num_pages=32)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_chunk=16, enable_prefix_cache=True)
        rid = eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid].output == ref
        # second request shares a long prefix -> radix hit
        prompt2 = prompt[:32] + rng.integers(0, cfg.vocab_size, 4).astype(np.int32).tolist()
        ref2 = greedy_oracle(cfg, params, prompt2, 4, num_pages=32)
        rid2 = eng.add_request(prompt2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid2].output == ref2
        if eng.native is not None:
            assert eng.metrics.counters.get("prefix_cache_hit_tokens", 0) > 0

    def test_nsa_engine_full_topk_matches_dense(self, rng):
        """NSA adapter with index_topk >= context: sparse decode selects
        every token, so outputs must equal the dense-MLA engine's."""
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        ref = greedy_oracle(cfg, params, prompt, 5)
        eng = Engine(cfg, params, num_pages=16, page_size=16,
                     enable_prefix_cache=False,
                     adapter=DeepseekAdapter(cfg, use_nsa=True))
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        assert eng.finished[rid].output == ref

    def test_nsa_engine_chunked_prefill_prefix_reuse(self, rng):
        """NSA + chunked prefill (prefill_extend_nsa ingests indexer keys
        per chunk) + radix prefix reuse (reused pages already hold the
        prefix's indexer keys): outputs must match the dense oracle."""
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 40).astype(np.int32).tolist()
        ref = greedy_oracle(cfg, params, prompt, 4, num_pages=32)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_chunk=16, enable_prefix_cache=True,
                     adapter=DeepseekAdapter(cfg, use_nsa=True))
        rid = eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid].output == ref
        prompt2 = prompt[:32] + rng.integers(0, cfg.vocab_size, 4).astype(np.int32).tolist()
        ref2 = greedy_oracle(cfg, params, prompt2, 4, num_pages=32)
        rid2 = eng.add_request(prompt2, max_new_tokens=4)
        eng.run_until_done()
        assert eng.finished[rid2].output == ref2

    def test_nsa_packed_batch_matches_oracle(self, rng):
        """Several NSA prompts admitted in one step route through the
        packed MLA prefill (with indexer ingest) — oracle parity."""
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
                   for n in (7, 19, 11)]
        refs = [greedy_oracle(cfg, params, p, 4, num_pages=32) for p in prompts]
        eng = Engine(cfg, params, num_pages=32, page_size=16, max_batch=4,
                     enable_prefix_cache=False,
                     adapter=DeepseekAdapter(cfg, use_nsa=True))
        rids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        eng.run_until_done()
        assert [eng.finished[r].output for r in rids] == refs


class TestDeepseekMeshEngine:
    def test_mesh_engine_matches_single(self, rng):
        """DeepSeek engine over a tp=2 mesh (adapter-built shard_map steps)
        emits the same greedy tokens as the single-device engine."""
        from sgl_kernel_tpu.parallel import mesh as mesh_lib

        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        e0 = Engine(cfg, params, num_pages=16, page_size=16, enable_prefix_cache=False)
        r0 = e0.add_request(prompt, max_new_tokens=5)
        e0.run_until_done()
        mesh = mesh_lib.make_mesh({"dp": 1, "tp": 2})
        e1 = Engine(cfg, params, num_pages=16, page_size=16,
                    enable_prefix_cache=False, mesh=mesh)
        r1 = e1.add_request(prompt, max_new_tokens=5)
        e1.run_until_done()
        assert e1.finished[r1].output == e0.finished[r0].output

    def test_nsa_mesh_engine_matches_single(self, rng):
        """NSA over a tp=2 mesh (replicated indexer, sharded heads/experts)
        == single-device NSA engine."""
        from sgl_kernel_tpu.parallel import mesh as mesh_lib

        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        e0 = Engine(cfg, params, num_pages=16, page_size=16,
                    enable_prefix_cache=False,
                    adapter=DeepseekAdapter(cfg, use_nsa=True))
        r0 = e0.add_request(prompt, max_new_tokens=5)
        e0.run_until_done()
        mesh = mesh_lib.make_mesh({"dp": 1, "tp": 2})
        e1 = Engine(cfg, params, num_pages=16, page_size=16,
                    enable_prefix_cache=False, mesh=mesh,
                    adapter=DeepseekAdapter(cfg, use_nsa=True))
        r1 = e1.add_request(prompt, max_new_tokens=5)
        e1.run_until_done()
        assert e1.finished[r1].output == e0.finished[r0].output


class TestDeepseekSpec:
    def test_spec_lossless_vs_plain_greedy(self, rng):
        """DeepSeek MLA target + tiny llama draft: chain speculative
        decoding through the latent-pool caches tuple must emit exactly
        plain greedy's tokens (losslessness; deepseek.prefill_extend
        num_logits chain verify)."""
        from sgl_kernel_tpu.models import llama

        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
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

    def test_spec_rejected_for_nsa_and_compress_modes(self, rng):
        from sgl_kernel_tpu.models import llama
        from sgl_kernel_tpu.serving.adapters import DeepseekAdapter

        dcfg = llama.LlamaConfig.tiny()
        for kw in ({"nsa": True, "idx_dim": 32, "idx_heads": 2, "index_topk": 128},
                   {"compress": "c4", "compress_ring": 8, "compress_local": 16}):
            cfg = deepseek.DeepseekConfig.tiny(**kw)
            params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
            with pytest.raises(AssertionError, match="spec"):
                Engine(cfg, params, num_pages=32, page_size=16,
                       prefill_bucket=16, draft_cfg=dcfg)
