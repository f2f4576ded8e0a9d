"""Hybrid GDN model: prefill/decode consistency across both layer types."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.models import hybrid_gdn as hg


class TestHybridGdn:
    def test_prefill_decode_consistency(self, rng):
        cfg = hg.HybridGdnConfig.tiny()
        params = hg.init_weights(cfg, jax.random.PRNGKey(3))
        b, pages, page = 2, 8, 16
        kc, vc = hg.make_caches(cfg, pages, page)
        conv, ssm = hg.make_states(cfg, b)
        rope = hg.build_rope_cache(cfg)
        s = 7
        tokens = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
        positions = np.tile(np.arange(s), (b, 1)).astype(np.int32)
        tables = np.stack([[0, 1, 0, 0], [2, 3, 0, 0]]).astype(np.int32)
        slots = (tables[:, :1] * page + np.arange(s)).astype(np.int32)
        logits, kc, vc, conv, ssm = hg.prefill(
            params, cfg, kc, vc, conv, ssm, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.full((b,), s, jnp.int32), jnp.asarray(slots), rope,
        )
        nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
        dslots = (tables[:, 0] * page + s).astype(np.int32)
        logits_d, _, _, _, _ = hg.decode_step(
            params, cfg, kc, vc, conv, ssm, jnp.asarray(nxt), jnp.full(b, s, jnp.int32),
            jnp.asarray(tables), jnp.full(b, s + 1, jnp.int32), jnp.asarray(dslots), rope,
        )
        # oracle: full prefill of s+1 tokens
        kc2, vc2 = hg.make_caches(cfg, pages, page)
        conv2, ssm2 = hg.make_states(cfg, b)
        t2 = np.concatenate([tokens, nxt[:, None]], 1)
        p2 = np.tile(np.arange(s + 1), (b, 1)).astype(np.int32)
        s2 = (tables[:, :1] * page + np.arange(s + 1)).astype(np.int32)
        logits_p, _, _, _, _ = hg.prefill(
            params, cfg, kc2, vc2, conv2, ssm2, jnp.asarray(t2), jnp.asarray(p2),
            jnp.full((b,), s + 1, jnp.int32), jnp.asarray(s2), rope,
        )
        np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p), rtol=2e-2, atol=2e-2)
