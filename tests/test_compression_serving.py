"""DSv4 KV-compression serving integration (models/deepseek.py decode_step_c
/ prefill_c + DeepseekAdapter(use_compress=True)).

Contracts:
  - no-event limit: with ratio 128 and contexts < 128 plus a local window
    covering the whole context, compressed decode == dense MLA decode;
  - ring parity: prefill_c's per-layer ring equals the compress_sequence
    oracle over the stored latent/score rows (same window semantics as
    CompressPlan.cpp / flash_compress_4.py);
  - decode events: crossing a ratio multiple writes compress_window(last
    W rows) into the right ring slot;
  - engine end-to-end: greedy outputs are deterministic, match a manual
    model-level loop, and state slots recycle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgl_kernel_tpu.models import deepseek
from sgl_kernel_tpu.ops import compression


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _prefill_inputs(cfg, prompt_lens, page_size, bucket=32):
    b = len(prompt_lens)
    s = bucket
    tokens = np.zeros((b, s), np.int32)
    positions = np.zeros((b, s), np.int32)
    slot_loc = np.full((b, s), -1, np.int32)
    pages_per = bucket // page_size
    for i, ln in enumerate(prompt_lens):
        tokens[i, :ln] = (np.arange(ln) * 7 + i) % cfg.vocab_size
        positions[i, :ln] = np.arange(ln)
        slot_loc[i, :ln] = i * pages_per * page_size + np.arange(ln)
    tables = np.stack([i * pages_per + np.arange(pages_per) for i in range(b)]).astype(np.int32)
    return (jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(slot_loc),
            jnp.asarray(tables))


class TestCompressedDecode:
    def test_no_event_limit_matches_dense_decode(self, rng):
        """c128 with ctx < 128 and a covering local window: the comp branch
        is empty and the local branch is full attention -> logits match the
        plain MLA decode path."""
        cfg = deepseek.DeepseekConfig.tiny(
            compress="c128", compress_ring=4, compress_local=128)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        page = 16
        kv, sc, comp = deepseek.make_compress_caches(cfg, 8, page, max_slots=4)
        kv2 = deepseek.make_cache(cfg, 8, page)
        rope = deepseek.build_rope_cache(cfg)
        tokens, positions, slot_loc, tables = _prefill_inputs(cfg, [10, 7], page)
        q_lens = jnp.asarray([10, 7], jnp.int32)
        slots = jnp.asarray([0, 1], jnp.int32)

        lg_c, kv, sc, comp = deepseek.prefill_c(
            params, cfg, kv, sc, comp, tokens, positions, q_lens, slot_loc, slots, rope)
        lg_d, kv2 = deepseek.prefill(
            params, cfg, kv2, tokens, positions, q_lens, slot_loc, rope)
        np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_d), rtol=2e-4, atol=2e-4)

        # a few decode steps, still under the ratio
        lengths = np.asarray([10, 7], np.int32)
        tok_c = np.asarray(jnp.argmax(lg_c, -1), np.int32)
        tok_d = np.asarray(jnp.argmax(lg_d, -1), np.int32)
        np.testing.assert_array_equal(tok_c, tok_d)
        for _ in range(3):
            lengths = lengths + 1
            pos = jnp.asarray(lengths - 1, jnp.int32)
            sl = jnp.asarray([tables[i, (lengths[i] - 1) // page] * page
                              + (lengths[i] - 1) % page for i in range(2)], jnp.int32)
            lg_c, kv, sc, comp = deepseek.decode_step_c(
                params, cfg, kv, sc, comp, jnp.asarray(tok_c), pos, tables,
                jnp.asarray(lengths), sl, slots, rope)
            lg_d, kv2 = deepseek.decode_step(
                params, cfg, kv2, jnp.asarray(tok_d), pos, tables,
                jnp.asarray(lengths), sl, rope)
            np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_d), rtol=3e-4, atol=3e-4)
            tok_c = np.asarray(jnp.argmax(lg_c, -1), np.int32)
            tok_d = np.asarray(jnp.argmax(lg_d, -1), np.int32)
            np.testing.assert_array_equal(tok_c, tok_d)

    def test_prefill_ring_matches_compress_sequence_oracle(self, rng):
        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=8)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(1))
        page = 16
        kv, sc, comp = deepseek.make_compress_caches(cfg, 8, page, max_slots=4)
        rope = deepseek.build_rope_cache(cfg)
        ln = 14  # 3 compress events (at 4, 8, 12)
        tokens, positions, slot_loc, tables = _prefill_inputs(cfg, [ln], page)
        slots = jnp.asarray([2], jnp.int32)
        _, kv, sc, comp = deepseek.prefill_c(
            params, cfg, kv, sc, comp, tokens, positions,
            jnp.asarray([ln], jnp.int32), slot_loc, slots, rope)

        slot_rows = np.asarray(slot_loc)[0, :ln]
        for lidx in range(cfg.num_layers):
            kv_rows = np.asarray(kv[lidx].reshape(-1, 576))[slot_rows]
            sc_rows = np.asarray(sc[lidx].reshape(-1, 576))[slot_rows]
            ref = compression.compress_sequence(
                jnp.asarray(kv_rows), jnp.asarray(sc_rows),
                jnp.asarray(params["layers"]["comp_ape"][lidx]), compress_ratio=4)
            got = np.asarray(comp[lidx, 2])
            n = ln // 4
            np.testing.assert_allclose(got[:n], np.asarray(ref), rtol=1e-4, atol=1e-5)
            # slots beyond the live events are untouched zeros
            assert np.all(got[n:] == 0)

    def test_decode_event_writes_ring_slot(self, rng):
        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=8)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(2))
        page = 16
        kv, sc, comp = deepseek.make_compress_caches(cfg, 8, page, max_slots=4)
        rope = deepseek.build_rope_cache(cfg)
        ln = 10
        tokens, positions, slot_loc, tables = _prefill_inputs(cfg, [ln], page)
        slots = jnp.asarray([0], jnp.int32)
        lg, kv, sc, comp = deepseek.prefill_c(
            params, cfg, kv, sc, comp, tokens, positions,
            jnp.asarray([ln], jnp.int32), slot_loc, slots, rope)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
        lengths = ln
        for _ in range(2):  # to length 12 -> event 3 fires on the second step
            lengths += 1
            sl = jnp.asarray([tables[0, (lengths - 1) // page] * page + (lengths - 1) % page], jnp.int32)
            lg, kv, sc, comp = deepseek.decode_step_c(
                params, cfg, kv, sc, comp, tok, jnp.asarray([lengths - 1], jnp.int32),
                tables, jnp.asarray([lengths], jnp.int32), sl, slots, rope)
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
        assert lengths == 12
        slot_rows = np.asarray(slot_loc)[0, :ln].tolist() + [
            int(tables[0, p // page] * page + p % page) for p in (10, 11)]
        for lidx in range(cfg.num_layers):
            kv_rows = np.asarray(kv[lidx].reshape(-1, 576))[np.asarray(slot_rows)]
            sc_rows = np.asarray(sc[lidx].reshape(-1, 576))[np.asarray(slot_rows)]
            # event 3 pools positions [4, 12)
            ref = compression.compress_window(
                jnp.asarray(kv_rows[4:12])[None],
                jnp.asarray(sc_rows[4:12])[None].astype(jnp.float32),
                jnp.asarray(params["layers"]["comp_ape"][lidx]))
            np.testing.assert_allclose(
                np.asarray(comp[lidx, 0, 2]), np.asarray(ref)[0], rtol=1e-4, atol=1e-5)


class TestCompressedEngine:
    def test_engine_end_to_end_deterministic(self, rng):
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(3))
        outs = []
        for _ in range(2):
            eng = Engine(cfg, params, num_pages=32, page_size=16,
                         prefill_bucket=16, max_batch=4)
            assert eng.adapter.use_compress and eng._stateful
            r1 = eng.add_request([1, 5, 9, 13, 2, 6], max_new_tokens=8)
            r2 = eng.add_request([3, 7, 11], max_new_tokens=6)
            eng.run_until_done()
            outs.append((eng.finished[r1].output, eng.finished[r2].output))
        assert outs[0] == outs[1]
        assert len(outs[0][0]) == 8 and len(outs[0][1]) == 6

    def test_engine_matches_model_loop(self, rng):
        """Engine greedy output == a manual prefill_c + decode_step_c loop."""
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(4))
        prompt = [1, 5, 9, 13, 2]
        n_new = 7

        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, max_batch=4)
        rid = eng.add_request(list(prompt), max_new_tokens=n_new)
        eng.run_until_done()
        got = eng.finished[rid].output

        page = 16
        kv, sc, comp = deepseek.make_compress_caches(cfg, 8, page, max_slots=4)
        rope = deepseek.build_rope_cache(cfg)
        ln = len(prompt)
        tokens, positions, slot_loc, tables = _prefill_inputs(cfg, [ln], page)
        tokens = tokens.at[0, :ln].set(jnp.asarray(prompt, jnp.int32))
        slots = jnp.asarray([0], jnp.int32)
        lg, kv, sc, comp = deepseek.prefill_c(
            params, cfg, kv, sc, comp, tokens, positions,
            jnp.asarray([ln], jnp.int32), slot_loc, slots, rope)
        ref = [int(jnp.argmax(lg[0]))]
        lengths = ln
        while len(ref) < n_new:
            lengths += 1
            sl = jnp.asarray([tables[0, (lengths - 1) // page] * page + (lengths - 1) % page], jnp.int32)
            lg, kv, sc, comp = deepseek.decode_step_c(
                params, cfg, kv, sc, comp, jnp.asarray([ref[-1]], jnp.int32),
                jnp.asarray([lengths - 1], jnp.int32), tables,
                jnp.asarray([lengths], jnp.int32), sl, slots, rope)
            ref.append(int(jnp.argmax(lg[0])))
        assert got == ref, (got, ref)

    def test_state_slot_recycling(self, rng):
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(
            compress="c4", compress_ring=8, compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(5))
        eng = Engine(cfg, params, num_pages=32, page_size=16,
                     prefill_bucket=16, max_batch=2)
        for wave in range(3):
            rids = [eng.add_request([wave + 1, 2, 3], max_new_tokens=4) for _ in range(2)]
            eng.run_until_done()
            for rid in rids:
                assert len(eng.finished[rid].output) == 4
        assert len(eng._free_state_slots) == 2


class TestReviewFixes:
    def test_local_window_must_cover_ratio(self):
        """compress_local < ratio would leave tokens older than the window
        but not yet pooled invisible to BOTH decode branches (review
        finding) — the model asserts instead."""
        cfg = deepseek.DeepseekConfig.tiny(
            compress="c128", compress_ring=4, compress_local=32)
        with pytest.raises(AssertionError, match="compress_local"):
            deepseek._comp_local(cfg)
        # default (None) self-sizes to >= ratio
        cfg2 = deepseek.DeepseekConfig.tiny(compress="c128", compress_ring=4)
        assert deepseek._comp_local(cfg2) >= 128

    def test_adapter_for_auto_selects_nsa_and_compress(self):
        from sgl_kernel_tpu.serving.adapters import adapter_for

        a = adapter_for(deepseek.DeepseekConfig.tiny(nsa=True))
        assert a.use_nsa and not a.use_compress
        b = adapter_for(deepseek.DeepseekConfig.tiny(compress="c4"))
        assert b.use_compress and not b.use_nsa
        with pytest.raises(AssertionError, match="exclusive"):
            adapter_for(deepseek.DeepseekConfig.tiny(nsa=True, compress="c4"))

    def test_c4_window_dual_reference_semantics(self, rng):
        """Reference c4 dual-channel contract (flash_compress_4.py:90-147):
        rows store [kv_ov | kv_fr | sc_ov | sc_fr]; the window's older half
        contributes its OVERLAP channels, the fresh half its FRESH channels."""
        hd = 16
        rows = rng.standard_normal((8, 4 * hd)).astype(np.float32)
        ape = rng.standard_normal((8, hd)).astype(np.float32)
        got = compression.c4_window_dual(jnp.asarray(rows), jnp.asarray(ape))
        kv = np.concatenate([rows[:4, :hd], rows[4:, hd:2*hd]], axis=0)
        sc = np.concatenate([rows[:4, 2*hd:3*hd], rows[4:, 3*hd:]], axis=0) + ape
        w = np.exp(sc - sc.max(0)) / np.exp(sc - sc.max(0)).sum(0)
        ref = (kv * w).sum(0)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)

    def test_c4_dual_sequence_first_window_masked(self, rng):
        """compress_sequence_c4_dual: the first window's missing overlap
        half is score-masked (should_overlap=False branch), later windows
        pool [4k-4, 4k+4) with the dual channel split."""
        hd, t = 8, 12
        rows = rng.standard_normal((t, 4 * hd)).astype(np.float32)
        ape = rng.standard_normal((8, hd)).astype(np.float32)
        out = np.asarray(compression.compress_sequence_c4_dual(jnp.asarray(rows), jnp.asarray(ape)))
        assert out.shape == (3, hd)
        # window 0: only the fresh half (rows 0-3) is live
        sc = rows[:4, 3*hd:] + ape[4:]
        w = np.exp(sc - sc.max(0)) / np.exp(sc - sc.max(0)).sum(0)
        ref0 = (rows[:4, hd:2*hd] * w).sum(0)
        np.testing.assert_allclose(out[0], ref0, rtol=1e-5, atol=1e-6)
        # window 2 pools rows [4, 12): overlap rows 4-7, fresh rows 8-11
        win = np.arange(4, 12)
        got2 = np.asarray(compression.c4_window_dual(
            jnp.asarray(rows[win])[None], jnp.asarray(ape)))[0]
        np.testing.assert_allclose(out[2], got2, rtol=1e-5, atol=1e-6)

    def test_tp_param_specs_cover_compress_keys(self):
        from sgl_kernel_tpu.parallel import tp as tp_lib
        from sgl_kernel_tpu.parallel.mesh import make_mesh

        cfg = deepseek.DeepseekConfig.tiny(compress="c4")
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        specs = tp_lib._ds_param_specs(params)
        assert "comp_score" in specs["layers"] and "comp_ape" in specs["layers"]
        # spec tree must match the params tree structure
        jax.tree.map(lambda a, b: None, params["layers"], specs["layers"])

    def test_compress_mesh_engine_matches_single(self, rng):
        """Compressed-KV DeepSeek over a tp=2 mesh (sharded heads/experts,
        replicated latent/score/ring pools) == single-device engine."""
        from sgl_kernel_tpu.parallel import mesh as mesh_lib
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(compress="c4", compress_ring=8,
                                           compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(6))
        prompt = rng.integers(0, cfg.vocab_size, 9).astype(np.int32).tolist()
        e0 = Engine(cfg, params, num_pages=16, page_size=16, prefill_bucket=16)
        r0 = e0.add_request(prompt, max_new_tokens=6)
        e0.run_until_done()
        mesh = mesh_lib.make_mesh({"dp": 1, "tp": 2})
        e1 = Engine(cfg, params, num_pages=16, page_size=16, prefill_bucket=16,
                    mesh=mesh)
        r1 = e1.add_request(prompt, max_new_tokens=6)
        e1.run_until_done()
        assert e1.finished[r1].output == e0.finished[r0].output

    def test_compress_engine_tight_pool_slot_churn(self, rng):
        """Waves of compressed-family requests on a page-tight pool with
        max_batch-bounded ring slots: outputs must equal a page-rich run
        (slot recycling + page reuse never leak state between requests)."""
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(compress="c4", compress_ring=8,
                                           compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(7))
        prompts = [rng.integers(0, cfg.vocab_size, 5 + i % 7).tolist() for i in range(10)]
        outs = {}
        for pages in (16, 256):
            eng = Engine(cfg, params, num_pages=pages, page_size=16,
                         prefill_bucket=16, max_batch=2)
            rids = [eng.add_request(list(p), max_new_tokens=5 + i % 3)
                    for i, p in enumerate(prompts)]
            eng.run_until_done()
            outs[pages] = [eng.finished[r].output for r in rids]
        assert outs[16] == outs[256]

    def test_compress_packed_prefill_matches_sequential(self, rng):
        """Concurrent admissions take the packed multi-prompt prefill
        (prefill_packed_c: score stores + ring build from the packed
        layout); outputs must equal sequentially-admitted runs."""
        from sgl_kernel_tpu.serving import Engine

        cfg = deepseek.DeepseekConfig.tiny(compress="c4", compress_ring=8,
                                           compress_local=16)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(8))
        prompts = [rng.integers(0, cfg.vocab_size, 4 + 3 * i).tolist() for i in range(3)]

        packed = Engine(cfg, params, num_pages=64, page_size=16,
                        prefill_bucket=16, max_batch=4)
        rids = [packed.add_request(list(p), max_new_tokens=6) for p in prompts]
        packed.run_until_done()
        got = [packed.finished[r].output for r in rids]

        seq_out = []
        for p in prompts:
            eng = Engine(cfg, params, num_pages=64, page_size=16,
                         prefill_bucket=16, max_batch=4)
            r = eng.add_request(list(p), max_new_tokens=6)
            eng.run_until_done()
            seq_out.append(eng.finished[r].output)
        assert got == seq_out
