"""Mixtral MoE model: prefill/decode consistency + numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import mixtral


def np_moe(h2, router, w1, w2, top_k):
    t = h2.shape[0]
    logits = h2 @ router.T
    out = np.zeros_like(h2)
    for i in range(t):
        order = np.argsort(-logits[i])[:top_k]
        ws = np.exp(logits[i][order] - logits[i][order].max())
        ws = ws / ws.sum()
        for w_, e in zip(ws, order):
            gu = h2[i] @ w1[e]
            inter = gu.shape[-1] // 2
            g, u = gu[:inter], gu[inter:]
            act = g / (1 + np.exp(-g)) * u
            out[i] += w_ * (act @ w2[e])
    return out


class TestMixtral:
    def test_moe_mlp_oracle(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(0))
        lw = params["layers"]
        h2 = rng.standard_normal((5, cfg.hidden_size)).astype(np.float32)
        out = mixtral._moe_mlp(jnp.asarray(h2), lw, jnp.int32(1), cfg)
        ref = np_moe(
            h2, np.asarray(lw["router"])[1], np.asarray(lw["moe_w1"])[1],
            np.asarray(lw["moe_w2"])[1], cfg.top_k,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)

    def test_prefill_decode_consistency(self, rng):
        cfg = mixtral.MixtralConfig.tiny()
        params = mixtral.init_weights(cfg, jax.random.PRNGKey(1))
        b, pages, page = 2, 8, 16
        kc, vc = mixtral.make_caches(cfg, pages, page)
        rope = mixtral.build_rope_cache(cfg)
        s = 6
        tokens = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
        positions = np.tile(np.arange(s), (b, 1)).astype(np.int32)
        tables = np.stack([[0, 1, 0, 0], [2, 3, 0, 0]]).astype(np.int32)
        slots = (tables[:, :1] * page + np.arange(s)).astype(np.int32)
        logits, kc, vc = mixtral.prefill(
            params, cfg, kc, vc, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.full((b,), s, jnp.int32), jnp.asarray(slots), rope,
        )
        nxt = np.asarray(jnp.argmax(logits, -1), np.int32)
        # decode one step; then re-prefill s+1 tokens and compare
        dslots = (tables[:, 0] * page + s).astype(np.int32)
        logits_d, _, _ = mixtral.decode_step(
            params, cfg, kc, vc, jnp.asarray(nxt), jnp.full(b, s, jnp.int32),
            jnp.asarray(tables), jnp.full(b, s + 1, jnp.int32), jnp.asarray(dslots), rope,
        )
        kc2, vc2 = mixtral.make_caches(cfg, pages, page)
        t2 = np.concatenate([tokens, nxt[:, None]], 1)
        p2 = np.tile(np.arange(s + 1), (b, 1)).astype(np.int32)
        s2 = (tables[:, :1] * page + np.arange(s + 1)).astype(np.int32)
        logits_p, _, _ = mixtral.prefill(
            params, cfg, kc2, vc2, jnp.asarray(t2), jnp.asarray(p2),
            jnp.full((b,), s + 1, jnp.int32), jnp.asarray(s2), rope,
        )
        np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p), rtol=2e-2, atol=2e-2)
