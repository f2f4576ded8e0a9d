"""gpt-oss model: prefill/decode consistency (sinks + sliding window +
clamped swiglu MoE all active)."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.models import gptoss


class TestGptOss:
    def test_prefill_decode_consistency(self, rng):
        cfg = gptoss.GptOssConfig.tiny()
        params = gptoss.init_weights(cfg, jax.random.PRNGKey(2))
        # non-trivial sinks so the path actually matters
        params["layers"]["sinks"] = jnp.asarray(
            rng.standard_normal((cfg.num_layers, cfg.num_heads)) * 0.5, cfg.dtype
        )
        b, pages, page = 2, 8, 16
        kc, vc = gptoss.make_caches(cfg, pages, page)
        rope = gptoss.build_rope_cache(cfg)
        s = 20  # > sliding_window(16) so windowing matters
        tokens = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
        positions = np.tile(np.arange(s), (b, 1)).astype(np.int32)
        tables = np.stack([[0, 1, 0, 0], [2, 3, 0, 0]]).astype(np.int32)
        slots = (tables[:, np.arange(s) // page] * page + np.arange(s) % page).astype(np.int32)
        logits, kc, vc = gptoss.prefill(
            params, cfg, kc, vc, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.full((b,), s, jnp.int32), jnp.asarray(slots), rope,
        )
        nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
        dslots = (tables[:, s // page] * page + s % page).astype(np.int32)
        logits_d, _, _ = gptoss.decode_step(
            params, cfg, kc, vc, jnp.asarray(nxt), jnp.full(b, s, jnp.int32),
            jnp.asarray(tables), jnp.full(b, s + 1, jnp.int32), jnp.asarray(dslots), rope,
        )
        kc2, vc2 = gptoss.make_caches(cfg, pages, page)
        t2 = np.concatenate([tokens, nxt[:, None]], 1)
        p2 = np.tile(np.arange(s + 1), (b, 1)).astype(np.int32)
        s2 = (tables[:, np.arange(s + 1) // page] * page + np.arange(s + 1) % page).astype(np.int32)
        logits_p, _, _ = gptoss.prefill(
            params, cfg, kc2, vc2, jnp.asarray(t2), jnp.asarray(p2),
            jnp.full((b,), s + 1, jnp.int32), jnp.asarray(s2), rope,
        )
        np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p), rtol=2e-2, atol=2e-2)
