"""Grammar-constrained decoding through the engine: per-request token
bitmasks (static or stateful-callable) restrict sampled tokens — the
reference's ApplyTokenBitmaskInplace surface (include/sgl_kernel_ops.h:1058)
wired into the serving loop the way SGLang applies XGrammar masks."""

import jax
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.serving import Engine


def make_mask(vocab, allowed):
    words = (vocab + 31) // 32
    m = np.zeros(words, np.int32)
    for t in allowed:
        m[t // 32] |= np.int32(1 << (t % 32))
    return m


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestEngineGrammar:
    def test_static_mask_restricts_tokens(self, setup, rng):
        cfg, params = setup
        allowed = {3, 17, 42, 99}
        mask = make_mask(cfg.vocab_size, allowed)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        rid = eng.add_request(prompt, max_new_tokens=8, grammar=mask)
        eng.run_until_done()
        out = eng.finished[rid].output
        assert len(out) == 8 and all(t in allowed for t in out)

    def test_stateful_callable_mask(self, setup, rng):
        """Alternating grammar: even steps allow {5}, odd steps {9} — the
        callable sees the tokens generated so far."""
        cfg, params = setup

        def grammar(prev):
            return make_mask(cfg.vocab_size, {5} if len(prev) % 2 == 0 else {9})

        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        prompt = rng.integers(0, cfg.vocab_size, 7).astype(np.int32).tolist()
        rid = eng.add_request(prompt, max_new_tokens=6, grammar=grammar)
        eng.run_until_done()
        assert eng.finished[rid].output == [5, 9, 5, 9, 5, 9]

    def test_grammar_with_sampling(self, setup, rng):
        """temperature > 0 sampling also respects the mask."""
        cfg, params = setup
        allowed = {11, 200}
        mask = make_mask(cfg.vocab_size, allowed)
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False)
        prompt = rng.integers(0, cfg.vocab_size, 8).astype(np.int32).tolist()
        rid = eng.add_request(prompt, max_new_tokens=10, temperature=1.0,
                              grammar=mask)
        eng.run_until_done()
        assert all(t in allowed for t in eng.finished[rid].output)

    def test_mixed_grammar_and_burst(self, setup, rng):
        """A grammar request in the batch disables the burst path without
        affecting other requests' outputs."""
        cfg, params = setup
        p1 = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        p2 = rng.integers(0, cfg.vocab_size, 12).astype(np.int32).tolist()
        eng0 = Engine(cfg, params, num_pages=32, page_size=16,
                      prefill_bucket=16, enable_prefix_cache=False)
        r = eng0.add_request(p1, max_new_tokens=6)
        eng0.run_until_done()
        free_ref = eng0.finished[r].output

        mask = make_mask(cfg.vocab_size, {4})
        eng = Engine(cfg, params, num_pages=64, page_size=16, max_batch=4,
                     prefill_bucket=16, enable_prefix_cache=False,
                     decode_burst=4)
        r1 = eng.add_request(p1, max_new_tokens=6)
        r2 = eng.add_request(p2, max_new_tokens=6, grammar=mask)
        eng.run_until_done()
        assert eng.finished[r1].output == free_ref
        assert eng.finished[r2].output == [4] * 6


class TestGrammarWithSpec:
    def test_spec_engine_respects_grammar(self, setup, rng):
        """A grammar request must NOT be routed through the spec fast path
        (which bypasses masking): tokens stay constrained and other
        requests still spec-decode losslessly."""
        cfg, params = setup
        from sgl_kernel_tpu.models import llama

        allowed = {3, 99}
        mask = make_mask(cfg.vocab_size, allowed)
        eng = Engine(cfg, params, num_pages=64, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=False,
                     draft_cfg=llama.LlamaConfig.tiny(), spec_gamma=3)
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        rid = eng.add_request(prompt, max_new_tokens=6, grammar=mask)
        eng.run_until_done()
        assert all(t in allowed for t in eng.finished[rid].output)
