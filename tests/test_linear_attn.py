"""Causal conv1d + GDN tests (oracle: direct numpy recurrences, the
reference pattern from its mamba/gdn test files)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.linear_attn import (
    causal_conv1d_fwd,
    causal_conv1d_update,
    chunk_gated_delta_rule,
    gated_delta_rule_update,
    gdn_attention_decode,
    gdn_attention_prefill,
    unzip_qkvz_ba,
)


def np_silu(x):
    return x / (1 + np.exp(-x))


def np_conv_ref(x, w, bias, init=None):
    """x [S, D], w [D, W] -> y [S, D] causal depthwise conv + silu."""
    s, d = x.shape
    width = w.shape[1]
    pad = np.zeros((width - 1, d)) if init is None else init
    xp = np.concatenate([pad, x], 0)
    y = np.zeros((s, d))
    for t in range(s):
        y[t] = (xp[t : t + width] * w.T).sum(0)
    if bias is not None:
        y += bias
    return np_silu(y)


class TestCausalConv:
    def test_fwd_matches_oracle(self, rng):
        b, s, d, w = 2, 16, 8, 4
        x = rng.standard_normal((b, s, d)).astype(np.float32)
        weight = rng.standard_normal((d, w)).astype(np.float32)
        bias = rng.standard_normal(d).astype(np.float32)
        y, final = causal_conv1d_fwd(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias))
        for bb in range(b):
            ref = np_conv_ref(x[bb], weight, bias)
            np.testing.assert_allclose(np.asarray(y)[bb], ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(final)[0], x[0, -3:], rtol=1e-5)

    def test_varlen_and_state_carry(self, rng):
        b, s, d, w = 1, 12, 4, 3
        x = rng.standard_normal((b, s, d)).astype(np.float32)
        weight = rng.standard_normal((d, w)).astype(np.float32)
        # split into two chunks with state carry == full run
        y_full, _ = causal_conv1d_fwd(jnp.asarray(x), jnp.asarray(weight), None)
        y1, st = causal_conv1d_fwd(jnp.asarray(x[:, :5]), jnp.asarray(weight), None)
        y2, _ = causal_conv1d_fwd(jnp.asarray(x[:, 5:]), jnp.asarray(weight), None, initial_states=st)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(y1), np.asarray(y2)], 1), np.asarray(y_full), rtol=1e-5, atol=1e-6
        )

    def test_update_matches_fwd(self, rng):
        b, s, d, w = 2, 6, 4, 4
        x = rng.standard_normal((b, s, d)).astype(np.float32)
        weight = rng.standard_normal((d, w)).astype(np.float32)
        y_full, _ = causal_conv1d_fwd(jnp.asarray(x), jnp.asarray(weight), None)
        state = jnp.zeros((b, w - 1, d))
        ys = []
        for t in range(s):
            y, state = causal_conv1d_update(jnp.asarray(x[:, t]), state, jnp.asarray(weight), None)
            ys.append(np.asarray(y))
        np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_full), rtol=1e-5, atol=1e-6)


class TestGatedDeltaRule:
    def np_ref(self, q, k, v, g, beta, s0):
        """Sequential oracle: per-token gated delta rule."""
        bsz, s, h, dk = q.shape
        dv = v.shape[-1]
        state = s0.copy()
        o = np.zeros((bsz, s, h, dv))
        for t in range(s):
            state = state * np.exp(g[:, t])[..., None, None]
            mem = np.einsum("bhvk,bhk->bhv", state, k[:, t])
            delta = (v[:, t] - mem) * beta[:, t][..., None]
            state = state + np.einsum("bhv,bhk->bhvk", delta, k[:, t])
            o[:, t] = np.einsum("bhvk,bhk->bhv", state, q[:, t])
        return o, state

    def test_chunk_matches_oracle(self, rng):
        b, s, h, dk, dv = 2, 10, 3, 8, 16
        q = rng.standard_normal((b, s, h, dk)).astype(np.float32)
        k = rng.standard_normal((b, s, h, dk)).astype(np.float32)
        v = rng.standard_normal((b, s, h, dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((b, s, h))).astype(np.float32)
        beta = rng.random((b, s, h)).astype(np.float32)
        s0 = rng.standard_normal((b, h, dv, dk)).astype(np.float32) * 0.1
        o, fs = chunk_gated_delta_rule(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g), jnp.asarray(beta), jnp.asarray(s0)
        )
        ref_o, ref_s = self.np_ref(q, k, v, g, beta, s0)
        np.testing.assert_allclose(np.asarray(o), ref_o, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(fs), ref_s, rtol=1e-3, atol=1e-3)

    def test_decode_continues_prefill(self, rng):
        b, s, h, dk, dv = 1, 6, 2, 4, 8
        q = rng.standard_normal((b, s + 1, h, dk)).astype(np.float32)
        k = rng.standard_normal((b, s + 1, h, dk)).astype(np.float32)
        v = rng.standard_normal((b, s + 1, h, dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((b, s + 1, h))).astype(np.float32)
        beta = rng.random((b, s + 1, h)).astype(np.float32)
        s0 = np.zeros((b, h, dv, dk), np.float32)
        ref_o, _ = self.np_ref(q, k, v, g, beta, s0)
        _, fs = chunk_gated_delta_rule(
            jnp.asarray(q[:, :s]), jnp.asarray(k[:, :s]), jnp.asarray(v[:, :s]),
            jnp.asarray(g[:, :s]), jnp.asarray(beta[:, :s]), jnp.asarray(s0),
        )
        o1, _ = gated_delta_rule_update(
            jnp.asarray(q[:, s]), jnp.asarray(k[:, s]), jnp.asarray(v[:, s]),
            jnp.asarray(g[:, s]), jnp.asarray(beta[:, s]), fs,
        )
        np.testing.assert_allclose(np.asarray(o1), ref_o[:, s], rtol=1e-3, atol=1e-3)

    def test_length_masking_freezes_state(self, rng):
        b, s, h, dk, dv = 2, 8, 1, 4, 4
        q = rng.standard_normal((b, s, h, dk)).astype(np.float32)
        k = rng.standard_normal((b, s, h, dk)).astype(np.float32)
        v = rng.standard_normal((b, s, h, dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((b, s, h))).astype(np.float32)
        beta = rng.random((b, s, h)).astype(np.float32)
        lens = jnp.asarray([8, 3], jnp.int32)
        _, fs = chunk_gated_delta_rule(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g), jnp.asarray(beta), seq_lens=lens
        )
        ref_o, ref_s = self.np_ref(q[1:2, :3], k[1:2, :3], v[1:2, :3], g[1:2, :3], beta[1:2, :3], np.zeros((1, h, dv, dk), np.float32))
        np.testing.assert_allclose(np.asarray(fs)[1], ref_s[0], rtol=1e-3, atol=1e-3)


class TestGdnFull:
    def test_prefill_decode_consistency(self, rng):
        b, hk, hv, dk, dv, w = 1, 2, 4, 8, 16, 4
        s = 5
        qkvz_dim = hk * (2 * dk + 2 * (hv // hk) * dv)
        ba_dim = hk * 2 * (hv // hk)
        conv_dim = hk * 2 * dk + hv * dv
        qkvz = rng.standard_normal((b, s + 1, qkvz_dim)).astype(np.float32)
        ba = rng.standard_normal((b, s + 1, ba_dim)).astype(np.float32)
        cw = rng.standard_normal((conv_dim, w)).astype(np.float32) * 0.3
        cb = rng.standard_normal(conv_dim).astype(np.float32) * 0.1
        a_log = rng.standard_normal(hv).astype(np.float32) * 0.1
        dt_bias = rng.standard_normal(hv).astype(np.float32) * 0.1
        conv0 = jnp.zeros((b, w - 1, conv_dim))
        ssm0 = jnp.zeros((b, hv, dv, dk))
        kw = dict(num_k_heads=hk, num_v_heads=hv, head_k_dim=dk, head_v_dim=dv)

        # full prefill over s+1 tokens
        o_full, z_full, _, _ = gdn_attention_prefill(
            jnp.asarray(qkvz), jnp.asarray(ba), jnp.asarray(cw), jnp.asarray(cb),
            jnp.asarray(a_log), jnp.asarray(dt_bias), conv0, ssm0,
            jnp.asarray([s + 1], jnp.int32), **kw,
        )
        # prefill s then decode 1
        o_p, _, cs, ss = gdn_attention_prefill(
            jnp.asarray(qkvz[:, :s]), jnp.asarray(ba[:, :s]), jnp.asarray(cw), jnp.asarray(cb),
            jnp.asarray(a_log), jnp.asarray(dt_bias), conv0, ssm0,
            jnp.asarray([s], jnp.int32), **kw,
        )
        o_d, z_d, _, _ = gdn_attention_decode(
            jnp.asarray(qkvz[:, s]), jnp.asarray(ba[:, s]), jnp.asarray(cw), jnp.asarray(cb),
            jnp.asarray(a_log), jnp.asarray(dt_bias), cs, ss, **kw,
        )
        np.testing.assert_allclose(np.asarray(o_d), np.asarray(o_full)[:, s], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z_d), np.asarray(z_full)[:, s], rtol=1e-5, atol=1e-6)


class TestStateCache:
    def test_update_gather_roundtrip(self, rng):
        from sgl_kernel_tpu.ops.linear_attn import (
            state_cache_gather, state_cache_gather_scatter, state_cache_update,
        )
        cache = jnp.zeros((8, 3, 4))
        states = rng.standard_normal((2, 3, 4)).astype(np.float32)
        cache = state_cache_update(cache, jnp.asarray([2, 5]), jnp.asarray(states))
        out = state_cache_gather(cache, jnp.asarray([5, 2, -1]))
        np.testing.assert_allclose(np.asarray(out)[0], states[1], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[1], states[0], rtol=1e-6)
        assert np.all(np.asarray(out)[2] == 0)
        cache = state_cache_gather_scatter(cache, jnp.asarray([2]), jnp.asarray([7]))
        np.testing.assert_allclose(np.asarray(cache)[7], states[0], rtol=1e-6)


class TestChunkedParallelGdn:
    """The chunked WY-representation form must match the per-timestep scan
    exactly (both f32): odd lengths, chunk boundaries, ragged batches."""

    @pytest.mark.parametrize("s,chunk", [(10, 4), (64, 16), (65, 16), (128, 64), (33, 64)])
    def test_matches_scan(self, rng, s, chunk):
        from sgl_kernel_tpu.ops.linear_attn import gated_delta_rule_scan

        b, h, dk, dv = 2, 3, 16, 32
        mk = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.float32)
        q = mk(b, s, h, dk); k = mk(b, s, h, dk)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        v = mk(b, s, h, dv)
        g = -jnp.abs(mk(b, s, h)) * 0.5
        beta = jax.nn.sigmoid(mk(b, s, h))
        s0 = mk(b, h, dv, dk) * 0.3
        lens = jnp.asarray(rng.integers(1, s + 1, b), jnp.int32)
        o_ref, st_ref = gated_delta_rule_scan(q, k, v, g, beta, s0, lens)
        o, st = chunk_gated_delta_rule(q, k, v, g, beta, s0, lens, chunk=chunk)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref), rtol=2e-4, atol=2e-4)
