"""PD disaggregation: prefill on one engine, whole-page KV handoff, decode
on another — greedy outputs must equal a single monolithic engine's."""

import jax
import numpy as np
import pytest

from sgl_kernel_tpu.models import deepseek, llama
from sgl_kernel_tpu.serving import Engine, PDOrchestrator
from sgl_kernel_tpu.serving.adapters import DeepseekAdapter


def _mono(cfg, params, prompts, n_new):
    eng = Engine(cfg, params, num_pages=64, page_size=16,
                 enable_prefix_cache=False, max_batch=8)
    rids = [eng.add_request(p, max_new_tokens=n_new) for p in prompts]
    eng.run_until_done()
    return [eng.finished[r].output for r in rids]


class TestPD:
    @pytest.mark.parametrize("transport", ["host", "device"])
    def test_llama_pd_matches_monolithic(self, rng, transport):
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
                   for n in (9, 23, 40)]
        ref = _mono(cfg, params, prompts, 6)
        pd = PDOrchestrator(cfg, params, num_pages_prefill=64,
                            num_pages_decode=64, page_size=16,
                            transport=transport, prefill_bucket=16)
        rids = [pd.submit(p, max_new_tokens=6) for p in prompts]
        pd.run_until_done()
        assert [pd.output(r) for r in rids] == ref

    def test_llama_pd_chunked_prefill(self, rng):
        """Prefill instance ingests the long prompt in chunks before the
        handoff — same tokens as monolithic."""
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 50).astype(np.int32).tolist()
        ref = _mono(cfg, params, [prompt], 5)
        pd = PDOrchestrator(cfg, params, num_pages_prefill=64,
                            num_pages_decode=64, page_size=16,
                            transport="host", prefill_bucket=16,
                            prefill_chunk=16)
        rid = pd.submit(prompt, max_new_tokens=5)
        pd.run_until_done()
        assert pd.output(rid) == ref[0]

    def test_deepseek_pd(self, rng):
        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        ref = _mono(cfg, params, [prompt], 5)
        pd = PDOrchestrator(cfg, params, num_pages_prefill=32,
                            num_pages_decode=32, page_size=16,
                            transport="host")
        rid = pd.submit(prompt, max_new_tokens=5)
        pd.run_until_done()
        assert pd.output(rid) == ref[0]

    def test_deepseek_nsa_pd(self, rng):
        """NSA: indexer pools travel with the latent pages."""
        cfg = deepseek.DeepseekConfig.tiny(nsa=True, idx_dim=32, idx_heads=2,
                                           index_topk=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     enable_prefix_cache=False,
                     adapter=DeepseekAdapter(cfg, use_nsa=True))
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        ref = eng.finished[rid].output
        pd = PDOrchestrator(cfg, params, num_pages_prefill=32,
                            num_pages_decode=32, page_size=16,
                            transport="host",
                            adapter=DeepseekAdapter(cfg, use_nsa=True),
                            decode_adapter=DeepseekAdapter(cfg, use_nsa=True))
        prid = pd.submit(prompt, max_new_tokens=5)
        pd.run_until_done()
        assert pd.output(prid) == ref

    def test_hybrid_gdn_pd(self, rng):
        """Recurrent state (conv window + SSM) travels with the pages."""
        from sgl_kernel_tpu.models import hybrid_gdn as hg

        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 11).astype(np.int32).tolist()
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, max_batch=2)
        rid = eng.add_request(prompt, max_new_tokens=5)
        eng.run_until_done()
        ref = eng.finished[rid].output
        pd = PDOrchestrator(cfg, params, num_pages_prefill=32,
                            num_pages_decode=32, page_size=16,
                            transport="host", prefill_bucket=16, max_batch=2)
        prid = pd.submit(prompt, max_new_tokens=5)
        pd.run_until_done()
        assert pd.output(prid) == ref

    @pytest.mark.parametrize("page_size", [16, 32])
    @pytest.mark.parametrize("plen", [7, 16, 33])
    def test_pd_page_boundary_sweep(self, rng, page_size, plen):
        """Prompt lengths straddling page boundaries: the extracted
        whole-page payload count and decode continuation stay exact."""
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, plen).astype(np.int32).tolist()
        ref = _mono(cfg, params, [prompt], 4)[0]
        pd = PDOrchestrator(cfg, params, num_pages_prefill=64,
                            num_pages_decode=64, page_size=page_size,
                            transport="host", prefill_bucket=16)
        rid = pd.submit(prompt, max_new_tokens=4)
        pd.run_until_done()
        assert pd.output(rid) == ref

    def test_adoption_respects_max_batch(self, rng):
        """add_prefilled_request must refuse adoption past max_batch (the
        decode batch is padded to max_batch; over-admission would overflow
        it) and accept again after a retirement."""
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        pd = PDOrchestrator(cfg, params, num_pages_prefill=128,
                            num_pages_decode=128, page_size=16,
                            transport="host", prefill_bucket=16, max_batch=2)
        prompts = [rng.integers(0, cfg.vocab_size, 8).astype(np.int32).tolist()
                   for _ in range(3)]
        r0 = pd.submit(prompts[0], max_new_tokens=3)
        r1 = pd.submit(prompts[1], max_new_tokens=3)
        assert r0 is not None and r1 is not None
        r2 = pd.submit(prompts[2], max_new_tokens=3)
        assert r2 is None  # decode engine full
        pd.run_until_done()
        r2 = pd.submit(prompts[2], max_new_tokens=3)
        assert r2 is not None
        pd.run_until_done()
        assert len(pd.output(r2)) == 3
