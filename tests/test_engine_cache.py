"""Regression tests for the radix prefix cache fixes (round-2 ADVICE items):

1. cache poisoning: the final emitted token's KV slot is unwritten and must
   never be inserted into the cache (engine._retire full_pages accounting)
2. eviction on allocation pressure: cache-adopted pages must be reclaimable
   when admission would otherwise starve
3. lock/unlock symmetry across radix edge splits (handle-based pins)
"""

import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.serving import Engine
from sgl_kernel_tpu.serving import native as native_mod

import jax


@pytest.fixture(scope="module")
def tiny_model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_weights(cfg, jax.random.PRNGKey(0))
    return cfg, params


needs_native = pytest.mark.skipif(not native_mod.available(), reason="native lib unavailable")


@needs_native
class TestCachePoisoning:
    def test_cached_continuation_matches_uncached(self, tiny_model, rng):
        """A continuation prompt that extends (prompt + output) of a retired
        request across a page boundary must decode identically with and
        without the prefix cache. Before the fix, the retired request's last
        page contained one unwritten KV row (the final emitted token is never
        fed through the model) and cached runs diverged."""
        cfg, params = tiny_model
        ps = 16
        prompt = rng.integers(0, cfg.vocab_size, 40).tolist()

        eng = Engine(cfg, params, max_batch=2, num_pages=64, page_size=ps,
                     prefill_bucket=16, enable_prefix_cache=True)
        r1 = eng.add_request(prompt, max_new_tokens=8)  # seq = 48 = 3 pages
        eng.run_until_done(max_steps=60)
        out1 = eng.finished[r1].output
        assert len(out1) == 8

        # continuation covering every token of the retired sequence
        prompt2 = prompt + out1 + [int(rng.integers(0, cfg.vocab_size))]
        r2 = eng.add_request(prompt2, max_new_tokens=4)
        eng.run_until_done(max_steps=60)
        cached_out = eng.finished[r2].output

        cold = Engine(cfg, params, max_batch=2, num_pages=64, page_size=ps,
                      prefill_bucket=16, enable_prefix_cache=False)
        r3 = cold.add_request(prompt2, max_new_tokens=4)
        cold.run_until_done(max_steps=60)
        assert cached_out == cold.finished[r3].output

    def test_retire_never_inserts_unwritten_slot(self, tiny_model, rng):
        """Directly: after a retire at seq_len == k * page_size, the cache
        must hold at most (seq_len - 1) // page_size pages of that request."""
        cfg, params = tiny_model
        eng = Engine(cfg, params, max_batch=1, num_pages=64, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=True)
        prompt = rng.integers(0, cfg.vocab_size, 28).tolist()
        eng.add_request(prompt, max_new_tokens=4)  # seq = 32 = 2 pages exactly
        eng.run_until_done(max_steps=60)
        assert eng.native.cached_pages <= (32 - 1) // 16  # == 1


@needs_native
class TestEvictionOnPressure:
    def test_admission_survives_cache_full_pool(self, tiny_model, rng):
        """Distinct prompts retire into the cache until it owns nearly the
        whole pool; later admissions must trigger LRU eviction instead of
        starving forever."""
        cfg, params = tiny_model
        eng = Engine(cfg, params, max_batch=1, num_pages=16, page_size=16,
                     prefill_bucket=16, enable_prefix_cache=True)
        rids = []
        for i in range(20):
            p = rng.integers(0, cfg.vocab_size, 18).tolist()  # distinct prompts
            rids.append(eng.add_request(p, max_new_tokens=6))
        eng.run_until_done(max_steps=600)
        assert not eng.waiting and not eng.running
        assert all(len(eng.finished[r].output) == 6 for r in rids)


@needs_native
class TestLockSplitSymmetry:
    def test_unlock_after_edge_split_releases_all_pins(self):
        """Lock a path, split its edge via a diverging insert, unlock by
        handle: eviction must then reclaim every cached page (no stale pin)."""
        a = native_mod.NativeAllocator(num_pages=64, page_size=4)
        pages = a.alloc(3)
        t1 = [1, 2, 3, 4, 5, 6, 7, 8]
        assert a.insert_prefix(t1, pages[:2]) == 2
        matched, got, lock_id = a.match_prefix_locked(t1)
        assert matched == 8 and got == pages[:2]
        # diverging insert splits the locked 8-token edge at token 4
        t2 = [1, 2, 3, 4, 9, 9, 9, 9]
        a.insert_prefix(t2, [pages[0], pages[2]])
        assert a.cached_pages == 3
        # the unpinned diverging leaf is evictable; the locked split halves are not
        a.evict(100)
        assert a.cached_pages == 2, "a pinned split half was evicted"
        a.unlock(lock_id)
        a.evict(100)
        assert a.cached_pages == 0, "stale pin survived the edge split"

    def test_double_split_with_two_locks(self):
        a = native_mod.NativeAllocator(num_pages=64, page_size=4)
        p = a.alloc(4)
        t1 = list(range(100, 112))  # 12 tokens, 3 pages
        a.insert_prefix(t1, p[:3])
        _, _, l1 = a.match_prefix_locked(t1)
        _, _, l2 = a.match_prefix_locked(t1[:8])
        # split at 4 then the tail again at 8
        a.insert_prefix(t1[:4] + [7, 7, 7, 7], [p[0], p[3]])
        a.insert_prefix(t1[:8] + [8, 8, 8, 8], p[:2] + [a.alloc(1)[0]])
        a.unlock(l1)
        a.evict(100)
        assert a.cached_pages > 0  # l2 still pins the first two pages' path
        a.unlock(l2)
        a.evict(100)
        assert a.cached_pages == 0


class TestChunkedPrefillInterleaving:
    """Decode must not stall behind a long prefill: with prefill_chunk set,
    a long prompt is ingested one chunk per scheduler step while running
    requests keep decoding (reference chunkprefill mixed-batch fairness,
    flash_attention.cpp:1207-1325)."""

    def test_decode_progresses_during_long_prefill(self, tiny_model):
        cfg, params = tiny_model
        from sgl_kernel_tpu.serving.engine import Engine

        eng = Engine(cfg, params, max_batch=2, num_pages=128, page_size=16,
                     prefill_bucket=16, prefill_chunk=16,
                     enable_prefix_cache=False)
        short = eng.add_request([5, 6, 7], max_new_tokens=20)
        eng.step()  # short admitted + prefilled, 1 decode
        long_rid = eng.add_request(list(range(2, 98)), max_new_tokens=4)
        out_before = len(eng.finished.get(short, eng.running[0]).output)
        # long prompt = 96 tokens -> 6 chunks -> at least 5 more steps in
        # prefilling; decode of `short` must advance during them
        eng.step()
        assert any(r.rid == long_rid for r in eng.prefilling)
        eng.step()
        running_short = [r for r in eng.running if r.rid == short]
        assert running_short and len(running_short[0].output) > out_before
        eng.run_until_done()
        assert len(eng.finished[short].output) == 20
        assert len(eng.finished[long_rid].output) == 4

    def test_chunked_outputs_match_unchunked(self, tiny_model):
        cfg, params = tiny_model
        from sgl_kernel_tpu.serving.engine import Engine

        prompt = list(range(3, 75))
        outs = []
        for chunk in (None, 16):
            eng = Engine(cfg, params, max_batch=2, num_pages=128,
                         page_size=16, prefill_bucket=16,
                         prefill_chunk=chunk, enable_prefix_cache=False)
            rid = eng.add_request(prompt, max_new_tokens=8)
            eng.run_until_done()
            outs.append(eng.finished[rid].output)
        assert outs[0] == outs[1]
