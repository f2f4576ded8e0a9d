"""Engine stress: eviction pressure x prefix reuse x chunked prefill x
speculative decoding interacting in one workload (VERDICT #9 engine-stress
item; the reference's analog is the radix/scheduler integration suites).

Oracle: the same greedy workload on a page-rich engine with the prefix
cache disabled — outputs must match token-for-token."""

import jax
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.serving import Engine
from sgl_kernel_tpu.serving import native as native_mod

needs_native = pytest.mark.skipif(not native_mod.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def tiny_model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


def run_workload(cfg, params, prompts, max_new, **engine_kw):
    eng = Engine(cfg, params, **engine_kw)
    rids = [eng.add_request(p, max_new_tokens=m) for p, m in zip(prompts, max_new)]
    eng.run_until_done(max_steps=2000)
    return [eng.finished[r].output for r in rids]


@needs_native
class TestEvictionPrefixStress:
    def test_tight_pool_matches_rich_pool(self, tiny_model, rng):
        """24 requests in waves sharing prefixes, on a pool sized so that
        admission must evict retired pages. Outputs must equal a page-rich
        uncached run."""
        cfg, params = tiny_model
        base = rng.integers(0, cfg.vocab_size, 30).tolist()
        prompts, max_new = [], []
        for i in range(24):
            # 3 prefix families x 8 variations
            fam = base[: 10 * (i % 3 + 1)]
            prompts.append(fam + rng.integers(0, cfg.vocab_size, 3 + i % 5).tolist())
            max_new.append(4 + i % 3)

        tight = run_workload(
            cfg, params, prompts, max_new,
            max_batch=4, num_pages=48, page_size=16, prefill_bucket=16,
            enable_prefix_cache=True,
        )
        rich = run_workload(
            cfg, params, prompts, max_new,
            max_batch=4, num_pages=512, page_size=16, prefill_bucket=16,
            enable_prefix_cache=False,
        )
        assert tight == rich

    def test_chunked_prefill_matches(self, tiny_model, rng):
        """Long prompts through prefill_chunk (extend-path ingestion) under
        prefix sharing must match unchunked outputs."""
        cfg, params = tiny_model
        long_p = rng.integers(0, cfg.vocab_size, 90).tolist()
        prompts = [long_p, long_p[:60] + [5, 6, 7], long_p + [9]]
        max_new = [5, 5, 5]
        chunked = run_workload(
            cfg, params, prompts, max_new,
            max_batch=2, num_pages=96, page_size=16, prefill_bucket=16,
            prefill_chunk=32, enable_prefix_cache=True,
        )
        plain = run_workload(
            cfg, params, prompts, max_new,
            max_batch=2, num_pages=256, page_size=16, prefill_bucket=16,
            enable_prefix_cache=False,
        )
        assert chunked == plain


@needs_native
class TestSpecWithCache:
    def test_spec_decode_with_prefix_cache(self, tiny_model, rng):
        """Chain speculative decoding (draft = same tiny model) + prefix
        cache + eviction pressure stays lossless for greedy requests."""
        cfg, params = tiny_model
        prompts = []
        base = rng.integers(0, cfg.vocab_size, 24).tolist()
        for i in range(6):
            prompts.append(base[: 8 + 4 * (i % 3)] + rng.integers(0, cfg.vocab_size, 2).tolist())
        max_new = [6] * 6
        spec = run_workload(
            cfg, params, prompts, max_new,
            max_batch=3, num_pages=64, page_size=16, prefill_bucket=16,
            enable_prefix_cache=True, draft_cfg=cfg, draft_params=params,
            spec_gamma=3,
        )
        plain = run_workload(
            cfg, params, prompts, max_new,
            max_batch=3, num_pages=256, page_size=16, prefill_bucket=16,
            enable_prefix_cache=False,
        )
        assert spec == plain


class TestDecodeBurst:
    def test_burst_matches_single_step(self, rng):
        """decode_burst engines emit identical greedy tokens, including a
        stop token hit mid-burst (tokens past the stop are discarded)."""
        from sgl_kernel_tpu.models import llama
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
                   for n in (9, 17)]

        def run(burst, stop=()):
            eng = Engine(cfg, params, num_pages=64, page_size=16,
                         prefill_bucket=16, enable_prefix_cache=False,
                         max_batch=4, decode_burst=burst)
            rids = [eng.add_request(p, max_new_tokens=12, stop_tokens=stop)
                    for p in prompts]
            eng.run_until_done()
            return [eng.finished[r].output for r in rids]

        assert run(4) == run(1)
        base = run(1)
        stop_tok = base[0][5]  # force a mid-burst stop for request 0
        assert run(4, stop=(stop_tok,)) == run(1, stop=(stop_tok,))

    def test_burst_deepseek(self, rng):
        from sgl_kernel_tpu.models import deepseek
        cfg = deepseek.DeepseekConfig.tiny()
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()

        def run(burst):
            eng = Engine(cfg, params, num_pages=32, page_size=16,
                         enable_prefix_cache=False, decode_burst=burst)
            rid = eng.add_request(prompt, max_new_tokens=9)
            eng.run_until_done()
            return eng.finished[rid].output

        assert run(3) == run(1)
