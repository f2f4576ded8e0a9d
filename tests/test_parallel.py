"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4: the
reference has zero distributed testing; this framework makes it first-class)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sgl_kernel_tpu import parallel
from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.ops import gemm, moe
from sgl_kernel_tpu.parallel import ep, mesh as mesh_lib, tp
from sgl_kernel_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh8():
    return mesh_lib.make_mesh({"dp": 2, "tp": 4})


class TestTPDecode:
    def test_tp_matches_single_device(self, mesh8, rng):
        cfg = llama.LlamaConfig.tiny()  # 4 q heads, 2 kv heads — pad tp to 2
        mesh = mesh_lib.make_mesh({"dp": 2, "tp": 2})
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        b, pages, page = 4, 8, 16

        kc, vc = llama.make_caches(cfg, pages, page)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        positions = jnp.zeros(b, jnp.int32)
        # each sequence owns one page: seq i -> global page i
        tables = jnp.asarray(np.stack([[i, 0, 0, 0] for i in range(b)]).astype(np.int32))
        lengths = jnp.ones(b, jnp.int32)
        slots = jnp.asarray([i * page for i in range(b)], jnp.int32)
        rope_cache = llama.build_rope_cache(cfg)

        ref_logits, ref_kc, ref_vc = llama.decode_step(
            params, cfg, kc, vc, tokens, positions, tables, lengths, slots, rope_cache
        )

        # parallel: dp=2 shards batch, tp=2 shards heads; pages sharded on dp
        # -> give each dp shard its own half of the pool and local tables
        kc2, vc2 = llama.make_caches(cfg, pages, page)
        step = tp.make_parallel_decode_step(cfg, mesh, params)
        # local pools: dp shard owns pages/2; seq i -> local page i % 2
        tables_l = jnp.asarray(np.stack([[i % 2, 0, 0, 0] for i in range(b)]).astype(np.int32))
        slots_l = jnp.asarray([(i % 2) * page for i in range(b)], jnp.int32)
        out_logits, out_kc, out_vc = jax.jit(step)(
            params, kc2, vc2, tokens, positions, tables_l, lengths, slots_l, rope_cache
        )
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-2, atol=2e-2)

    def test_param_sharding_specs(self, mesh8):
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        specs = tp._param_specs(params)
        sharded = mesh_lib.shard_params(params, mesh8, specs)
        assert sharded["layers"]["q"].sharding.spec == P(None, "tp", None)

    def test_tp_quantized_matches_single_device(self, rng):
        """W4A16 TP: K-paired packed [L, K/2, N] shards N for column-
        parallel and K for row-parallel (the layout migration inverted the
        sharded dims; this pins the spec against the real kernel)."""
        cfg = llama.LlamaConfig.tiny(quant="w4a16", group_size=32)
        mesh = mesh_lib.make_mesh({"dp": 2, "tp": 2})
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        b, pages, page = 4, 8, 16
        kc, vc = llama.make_caches(cfg, pages, page)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        positions = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray(np.stack([[i, 0, 0, 0] for i in range(b)]).astype(np.int32))
        lengths = jnp.ones(b, jnp.int32)
        slots = jnp.asarray([i * page for i in range(b)], jnp.int32)
        rope_cache = llama.build_rope_cache(cfg)
        ref_logits, _, _ = llama.decode_step(
            params, cfg, kc, vc, tokens, positions, tables, lengths, slots, rope_cache
        )
        kc2, vc2 = llama.make_caches(cfg, pages, page)
        step = tp.make_parallel_decode_step(cfg, mesh, params)
        tables_l = jnp.asarray(np.stack([[i % 2, 0, 0, 0] for i in range(b)]).astype(np.int32))
        slots_l = jnp.asarray([(i % 2) * page for i in range(b)], jnp.int32)
        out_logits, _, _ = jax.jit(step)(
            params, kc2, vc2, tokens, positions, tables_l, lengths, slots_l, rope_cache
        )
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-2, atol=2e-2)


class TestEP:
    def test_ep_matches_single_device(self, rng):
        mesh = mesh_lib.make_mesh({"ep": 4})
        t, e, h, inter, k = 16, 8, 64, 128, 2
        x = rng.standard_normal((t, h)).astype(np.float32)
        w1 = (rng.standard_normal((e, h, 2 * inter)) * 0.05).astype(np.float32)
        w2 = (rng.standard_normal((e, inter, h)) * 0.05).astype(np.float32)
        g = rng.standard_normal((t, e)).astype(np.float32)
        tw, tids = moe.topk_softmax(jnp.asarray(g), k, renormalize=True)
        weights = moe.MoeWeights(w1=jnp.asarray(w1), w2=jnp.asarray(w2), fmt="bf16")
        ref = moe.fused_experts(jnp.asarray(x), weights, tw, tids, block_size=16)

        def run(x, w1, w2, tw, tids):
            lw = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
            return ep.ep_fused_experts(
                x, lw, tw, tids, axis_name="ep", num_experts_global=e, block_size=16
            )

        out = jax.jit(
            shard_map(
                run, mesh=mesh,
                in_specs=(P(None, None), P("ep", None, None), P("ep", None, None), P(None, None), P(None, None)),
                out_specs=P(None, None),
                check_vma=False,
            )
        )(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2), tw, tids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


class TestRingAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_full_attention(self, rng, causal):
        mesh = mesh_lib.make_mesh({"sp": 4})
        b, s_total, h, d = 2, 256, 2, 64
        q = rng.standard_normal((b, s_total, h, d)).astype(np.float32)
        k = rng.standard_normal((b, s_total, h, d)).astype(np.float32)
        v = rng.standard_normal((b, s_total, h, d)).astype(np.float32)

        from sgl_kernel_tpu.ops.attention import flash_attention

        ref = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)

        def run(ql, kl, vl):
            return ring_attention(ql, kl, vl, axis_name="sp", causal=causal)

        out = jax.jit(
            shard_map(
                run, mesh=mesh,
                in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
                out_specs=P(None, "sp"),
                check_vma=False,
            )
        )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=3e-3)


class TestEPAllToAll:
    def test_matches_single_device(self, rng):
        mesh = mesh_lib.make_mesh({"ep": 4})
        t, e, h, inter, k = 8, 8, 64, 128, 2
        # per-shard tokens: 4 shards x t tokens
        xs = rng.standard_normal((4 * t, h)).astype(np.float32)
        w1 = (rng.standard_normal((e, h, 2 * inter)) * 0.05).astype(np.float32)
        w2 = (rng.standard_normal((e, inter, h)) * 0.05).astype(np.float32)
        g = rng.standard_normal((4 * t, e)).astype(np.float32)
        tw, tids = moe.topk_softmax(jnp.asarray(g), k, renormalize=True)
        weights = moe.MoeWeights(w1=jnp.asarray(w1), w2=jnp.asarray(w2), fmt="bf16")
        ref = moe.fused_experts(jnp.asarray(xs), weights, tw, tids, block_size=16)

        def run(x, w1, w2, tw, tids):
            lw = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
            return ep.ep_fused_experts_a2a(
                x, lw, tw, tids, axis_name="ep", num_experts_global=e, block_size=16
            )

        out = jax.jit(
            shard_map(
                run, mesh=mesh,
                in_specs=(P("ep", None), P("ep", None, None), P("ep", None, None), P("ep", None), P("ep", None)),
                out_specs=P("ep", None),
                check_vma=False,
            )
        )(jnp.asarray(xs), jnp.asarray(w1), jnp.asarray(w2), tw, tids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2)


class TestPPDecode:
    def test_pp_matches_single_device(self, rng):
        from sgl_kernel_tpu.parallel import pp as pp_lib

        cfg = llama.LlamaConfig.tiny()  # 2 layers -> 2 stages x 1 layer
        mesh = mesh_lib.make_mesh({"pp": 2})
        params = llama.init_weights(cfg, jax.random.PRNGKey(1))
        n_micro, bm, pages, page = 2, 3, 8, 16
        b = n_micro * bm

        kc, vc = llama.make_caches(cfg, pages, page)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        positions = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray(np.stack([[i, 0, 0, 0] for i in range(b)]).astype(np.int32))
        lengths = jnp.ones(b, jnp.int32)
        slots = jnp.asarray([i * page for i in range(b)], jnp.int32)
        rope_cache = llama.build_rope_cache(cfg)

        ref_logits, ref_kc, ref_vc = llama.decode_step(
            params, cfg, kc, vc, tokens, positions, tables, lengths, slots, rope_cache
        )

        step = pp_lib.make_pp_decode_step(cfg, mesh, params, n_micro)
        kc2, vc2 = llama.make_caches(cfg, pages, page)
        mb = lambda a: a.reshape(n_micro, bm, *a.shape[1:])
        out_logits, out_kc, out_vc = jax.jit(step)(
            params, kc2, vc2, mb(tokens), mb(positions), mb(tables), mb(lengths), mb(slots), rope_cache
        )
        np.testing.assert_allclose(
            np.asarray(out_logits).reshape(b, -1), np.asarray(ref_logits), rtol=2e-2, atol=2e-2
        )
        np.testing.assert_allclose(np.asarray(out_kc), np.asarray(ref_kc), rtol=1e-2, atol=1e-2)


class TestPPPrefill:
    def test_pp_prefill_matches_single_device(self, rng):
        """Prompt microbatches flow through the stage pipeline; logits AND
        the stage-sharded KV pools match the single-device prefill, and a
        subsequent PP decode step consumes the pipelined pools correctly."""
        from sgl_kernel_tpu.parallel import pp as pp_lib

        cfg = llama.LlamaConfig.tiny()
        mesh = mesh_lib.make_mesh({"pp": 2})
        params = llama.init_weights(cfg, jax.random.PRNGKey(1))
        n_micro, bm, pages, page, s = 2, 2, 12, 16, 8
        b = n_micro * bm

        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
        positions = jnp.tile(jnp.arange(s)[None], (b, 1))
        q_lens = jnp.asarray([8, 5, 8, 3], jnp.int32)
        slot_loc = jnp.where(positions < q_lens[:, None],
                             jnp.arange(b)[:, None] * page + positions, -1)
        rope_cache = llama.build_rope_cache(cfg)

        kc, vc = llama.make_caches(cfg, pages, page)
        ref_logits, ref_kc, ref_vc = llama.prefill(
            params, cfg, kc, vc, tokens, positions, q_lens, slot_loc, rope_cache)

        step = pp_lib.make_pp_prefill_step(cfg, mesh, params, n_micro)
        kc2, vc2 = llama.make_caches(cfg, pages, page)
        mb = lambda a: a.reshape(n_micro, bm, *a.shape[1:])
        out_logits, out_kc, out_vc = jax.jit(step)(
            params, kc2, vc2, mb(tokens), mb(positions), mb(q_lens),
            mb(slot_loc), rope_cache)
        np.testing.assert_allclose(
            np.asarray(out_logits).reshape(b, -1), np.asarray(ref_logits),
            rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out_kc), np.asarray(ref_kc), rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out_vc), np.asarray(ref_vc), rtol=1e-2, atol=1e-2)

        # decode one token on top of the pipelined pools
        dec_tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        tables = jnp.asarray([[i, 0] for i in range(b)], jnp.int32)
        dslots = (jnp.arange(b) * page + q_lens).astype(jnp.int32)
        ref_dec, _, _ = llama.decode_step(
            params, cfg, ref_kc, ref_vc, dec_tokens, q_lens, tables,
            q_lens + 1, dslots, rope_cache)
        dstep = pp_lib.make_pp_decode_step(cfg, mesh, params, n_micro)
        out_dec, _, _ = jax.jit(dstep)(
            params, out_kc, out_vc, mb(dec_tokens), mb(q_lens), mb(tables),
            mb(q_lens + 1), mb(dslots), rope_cache)
        np.testing.assert_allclose(
            np.asarray(out_dec).reshape(b, -1), np.asarray(ref_dec),
            rtol=2e-2, atol=2e-2)


class TestUlysses:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_full_attention(self, rng, causal):
        from sgl_kernel_tpu.parallel.ulysses import ulysses_attention
        from sgl_kernel_tpu.ops.attention import flash_attention

        mesh = mesh_lib.make_mesh({"sp": 4})
        b, s, h, d = 2, 64, 8, 64
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        lens = jnp.full((b,), s, jnp.int32)
        ref = flash_attention(q, k, v, lens, lens, causal=causal)

        out = jax.jit(
            shard_map(
                lambda ql, kl, vl: ulysses_attention(ql, kl, vl, axis_name="sp", causal=causal),
                mesh=mesh,
                in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
                out_specs=P(None, "sp"),
                check_vma=False,
            )
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestDeepseekTP:
    @pytest.mark.parametrize("quant", [None, "w4a16"])
    def test_matches_single_device(self, rng, quant):
        """MLA TP (heads + experts + intermediates sharded, latent pool
        replicated): decode logits match the single-device step."""
        from sgl_kernel_tpu.models import deepseek

        kw = dict(quant=quant, group_size=32) if quant else {}
        cfg = deepseek.DeepseekConfig.tiny(**kw)
        mesh = mesh_lib.make_mesh({"dp": 2, "tp": 2})
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        b, pages, page = 4, 8, 16
        cache = deepseek.make_cache(cfg, pages, page)
        rope = deepseek.build_rope_cache(cfg)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        positions = jnp.zeros(b, jnp.int32)
        tables = jnp.asarray(np.stack([[i, 0, 0, 0] for i in range(b)]).astype(np.int32))
        lengths = jnp.ones(b, jnp.int32)
        slots = jnp.asarray([i * page for i in range(b)], jnp.int32)
        ref_logits, _ = deepseek.decode_step(
            params, cfg, cache, tokens, positions, tables, lengths, slots, rope)

        cache2 = deepseek.make_cache(cfg, pages, page)
        step = tp.make_parallel_deepseek_decode_step(cfg, mesh, params)
        # dp shards pages: seq i -> local page i % 2 in its dp shard's pool
        tables_l = jnp.asarray(np.stack([[i % 2, 0, 0, 0] for i in range(b)]).astype(np.int32))
        slots_l = jnp.asarray([(i % 2) * page for i in range(b)], jnp.int32)
        out_logits, _ = jax.jit(step)(
            params, cache2, tokens, positions, tables_l, lengths, slots_l, rope)
        np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits),
                                   rtol=3e-2, atol=3e-2)
