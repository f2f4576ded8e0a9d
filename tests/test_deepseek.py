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
