"""Inkling sconv + attention prologue tests.

Oracle: direct numpy transcription of the reference kernel math
(InklingAttnPrologue.cpp compute_q_head :264-278,
verify_or_extend_conv_value :281-320, k-gamma norm :389-395)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import inkling

HD = inkling.HEAD_DIM


def np_head_rmsnorm(x, gamma, eps=1e-6):
    xh = x.reshape(*x.shape[:-1], -1, HD).astype(np.float64)
    inv = 1.0 / np.sqrt((xh**2).mean(-1, keepdims=True) + eps)
    return (xh * inv * gamma).reshape(x.shape)


def np_conv(x, prefix, w, silu, residual):
    # x [T, D], prefix [W-1, D]
    t, d = x.shape
    width = w.shape[1]
    xp = np.concatenate([prefix, x], 0)
    acc = np.zeros((t, d))
    for iw in range(width):
        acc += xp[iw : iw + t] * w[:, iw]
    if silu:
        acc = acc / (1 + np.exp(-acc))
    if residual:
        acc = acc + x
    return acc


class TestPrologue:
    @pytest.mark.parametrize("tokens_per_seq", [1, 3])
    def test_matches_oracle(self, rng, tokens_per_seq):
        b, hq, hkv, w = 2, 2, 1, 4
        dq, dkv = hq * HD, hkv * HD
        t = b * tokens_per_seq
        dtot = dq + 2 * dkv
        qkvr = rng.standard_normal((t, dtot)).astype(np.float32)
        kcache = rng.standard_normal((4, w - 1, dkv)).astype(np.float32)
        vcache = rng.standard_normal((4, w - 1, dkv)).astype(np.float32)
        kw = rng.standard_normal((dkv, w)).astype(np.float32) * 0.3
        vw = rng.standard_normal((dkv, w)).astype(np.float32) * 0.3
        qg = rng.random(HD).astype(np.float32) + 0.5
        kg = rng.random(HD).astype(np.float32) + 0.5
        ci = np.asarray([1, -1], np.int32)  # seq 1 has no initial state
        cm = ci >= 0
        loc = np.arange(t, dtype=np.int32)
        kbuf = np.zeros((16, dkv), np.float32)
        vbuf = np.zeros((16, dkv), np.float32)

        q, k, v, kb, vb, kc2, vc2 = inkling.inkling_attn_prologue(
            jnp.asarray(qkvr), jnp.asarray(kcache), jnp.asarray(vcache),
            jnp.asarray(ci), jnp.asarray(cm), jnp.asarray(kw), jnp.asarray(vw),
            jnp.asarray(qg), jnp.asarray(kg), jnp.asarray(loc),
            jnp.asarray(kbuf), jnp.asarray(vbuf),
            q_off=0, k_off=dq, v_off=dq + dkv, dq=dq, dkv=dkv,
            tokens_per_seq=tokens_per_seq, activation="silu", use_residual=True,
        )

        np.testing.assert_allclose(np.asarray(q), np_head_rmsnorm(qkvr[:, :dq], qg), rtol=2e-4, atol=2e-4)
        for s in range(b):
            rows = slice(s * tokens_per_seq, (s + 1) * tokens_per_seq)
            pre_k = kcache[ci[s]] if ci[s] >= 0 else np.zeros((w - 1, dkv), np.float32)
            kraw = np_conv(qkvr[rows, dq : dq + dkv], pre_k, kw, True, True)
            np.testing.assert_allclose(np.asarray(k)[rows], np_head_rmsnorm(kraw, kg), rtol=2e-3, atol=2e-3)
            pre_v = vcache[ci[s]] if ci[s] >= 0 else np.zeros((w - 1, dkv), np.float32)
            vraw = np_conv(qkvr[rows, dq + dkv :], pre_v, vw, True, True)
            np.testing.assert_allclose(np.asarray(v)[rows], vraw, rtol=2e-3, atol=2e-3)
        # buffers hold the outputs at loc
        np.testing.assert_allclose(np.asarray(kb)[:t], np.asarray(k), rtol=1e-6)
        # conv cache updated for seq 0 (slot 1): last W-1 raw inputs
        xp = np.concatenate([kcache[1], qkvr[0:tokens_per_seq, dq : dq + dkv]], 0)
        np.testing.assert_allclose(np.asarray(kc2)[1], xp[-(w - 1):], rtol=1e-6)

    def test_verify_does_not_touch_cache(self, rng):
        b, w, dkv = 1, 3, HD
        qkvr = rng.standard_normal((2, HD + 2 * dkv)).astype(np.float32)
        kc = jnp.asarray(rng.standard_normal((2, w - 1, dkv)).astype(np.float32))
        vc = jnp.asarray(rng.standard_normal((2, w - 1, dkv)).astype(np.float32))
        out = inkling.inkling_attn_prologue_verify(
            jnp.asarray(qkvr), kc, vc, jnp.asarray([0]), jnp.asarray([True]),
            jnp.ones((dkv, w)), jnp.ones((dkv, w)), jnp.ones(HD), jnp.ones(HD),
            jnp.asarray([-1, -1]), jnp.zeros((4, dkv)), jnp.zeros((4, dkv)),
            q_off=0, k_off=HD, v_off=HD + dkv, dq=HD, dkv=dkv, draft_token_num=2,
        )
        np.testing.assert_allclose(np.asarray(out[5]), np.asarray(kc))


class TestSconvCacheOps:
    def test_draft_extend_commit(self, rng):
        b, t, w, d = 1, 3, 4, 8
        x = rng.standard_normal((b, t, d)).astype(np.float32)
        windows = rng.standard_normal((b, t, w - 1, d)).astype(np.float32)
        cache = jnp.zeros((2, w - 1, d))
        out = inkling.fused_draft_extend_sconv_cache(
            cache, jnp.asarray(windows), jnp.asarray(x), jnp.asarray([1]), jnp.asarray([2])
        )
        exp = np.concatenate([windows[0, 2, 1:], x[0, 2:3]], 0)
        np.testing.assert_allclose(np.asarray(out)[1], exp, rtol=1e-6)

    def test_migrate(self, rng):
        cache = jnp.asarray(rng.standard_normal((4, 2, 3)).astype(np.float32))
        out = inkling.migrate_sconv_cache(cache, jnp.asarray([0]), jnp.asarray([3]))
        np.testing.assert_allclose(np.asarray(out)[3], np.asarray(cache)[0])

    def test_gather_scatter(self, rng):
        """Oracle: reference tests/sconv_reference.py:157-168 —
        cache[dst[b], w] = hidden[track_idx[b, w]] where mask[b]."""
        hidden = rng.standard_normal((10, 3)).astype(np.float32)
        cache = rng.standard_normal((4, 2, 3)).astype(np.float32)
        track = np.asarray([[5, 6], [1, 2]], np.int32)
        mask = np.asarray([True, False])
        dst = np.asarray([3, 0], np.int32)
        out = np.asarray(inkling.fused_gather_scatter_to_sconv_cache(
            jnp.asarray(hidden), jnp.asarray(cache), jnp.asarray(track),
            jnp.asarray(mask), jnp.asarray(dst)))
        exp = cache.copy()
        exp[3] = hidden[[5, 6]]
        np.testing.assert_allclose(out, exp, rtol=1e-6)


class TestTrackAndFusedDecode:
    def test_track_conv_indices(self):
        """Oracle: InklingSconv.cpp:1360-1380 — idx = qsl[b] +
        floor(max(track - prefix, 0) / chunk) * chunk - W1 + w, clamped."""
        qsl = np.asarray([0, 100, 250], np.int32)
        track = np.asarray([130, 70], np.int32)
        prefix = np.asarray([2, 0], np.int32)
        w1, chunk, total = 3, 64, 250
        out = np.asarray(inkling.track_conv_indices(
            jnp.asarray(qsl), jnp.asarray(track), jnp.asarray(prefix),
            w1, chunk, total))
        exp = np.zeros((2, w1), np.int64)
        for b in range(2):
            lens = max(int(track[b]) - int(prefix[b]), 0)
            aligned = (lens // chunk) * chunk
            for w in range(w1):
                exp[b, w] = min(max(int(qsl[b]) + aligned - w1 + w, 0), total - 1)
        np.testing.assert_array_equal(out, exp)

    def test_track_clamps_to_zero(self):
        out = np.asarray(inkling.track_conv_indices(
            jnp.asarray([0, 1], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray([5], jnp.int32), 3, 64, 1))
        np.testing.assert_array_equal(out, np.zeros((1, 3)))

    @pytest.mark.parametrize("silu,residual", [(False, False), (True, True)])
    def test_fused_decode_update(self, rng, silu, residual):
        t, w, d, s = 3, 4, 8, 6
        x = rng.standard_normal((t, d)).astype(np.float32)
        weight = (rng.standard_normal((d, w)) * 0.3).astype(np.float32)
        cache = rng.standard_normal((s, w - 1, d)).astype(np.float32)
        ci = np.asarray([2, -1, 4], np.int32)
        cm = np.asarray([True, True, False])
        y, nc = inkling.fused_causal_conv1d_update_decode(
            jnp.asarray(x), jnp.asarray(weight), jnp.asarray(cache),
            jnp.asarray(ci), jnp.asarray(cm),
            activation="silu" if silu else None, use_residual=residual)
        y, nc = np.asarray(y), np.asarray(nc)
        for tt in range(t):
            pre = cache[ci[tt]] if (ci[tt] >= 0 and cm[tt]) else np.zeros((w - 1, d))
            exp = np_conv(x[tt : tt + 1], pre, weight, silu, residual)
            np.testing.assert_allclose(y[tt], exp[0], rtol=2e-5, atol=2e-5)
            if ci[tt] >= 0:  # cache shifts x in (zeros when unmasked)
                np.testing.assert_allclose(
                    nc[ci[tt]], np.concatenate([pre[1:], x[tt : tt + 1]], 0), rtol=1e-6)
        np.testing.assert_allclose(nc[0], cache[0], rtol=1e-6)  # untouched slot

    def test_fused_decode_update_tracks(self, rng):
        t, w, d, s = 2, 3, 4, 8
        x = rng.standard_normal((t, d)).astype(np.float32)
        weight = np.ones((d, w), np.float32)
        cache = rng.standard_normal((s, w - 1, d)).astype(np.float32)
        ci = np.asarray([0, 1], np.int32)
        _, nc = inkling.fused_causal_conv1d_update_decode(
            jnp.asarray(x), jnp.asarray(weight), jnp.asarray(cache),
            jnp.asarray(ci), jnp.asarray([True, True]),
            track_mask=jnp.asarray([True, False]),
            track_indices=jnp.asarray([5, 6]))
        nc = np.asarray(nc)
        np.testing.assert_allclose(nc[5], nc[0], rtol=1e-6)  # tracked copy
        np.testing.assert_allclose(nc[6], cache[6], rtol=1e-6)  # masked off

    def test_helion_metadata(self):
        ci = jnp.asarray([2, -1, 0], jnp.int32)
        his = jnp.asarray([True, True, False])
        md = inkling.precompute_helion_decode_metadata(ci, his)
        np.testing.assert_array_equal(
            np.asarray(md.cache_mask)[:, 0, 0], [True, False, False])
        np.testing.assert_array_equal(np.asarray(md.safe_idx), [2, 0, 0])
        np.testing.assert_array_equal(np.asarray(md.cu), [0, 1, 2, 3])
        qsl = jnp.asarray([0, 3, 5, 9], jnp.int32)
        me = inkling.precompute_helion_extend_metadata(ci, his, qsl, total_tokens=9)
        np.testing.assert_array_equal(
            np.asarray(me.si), [0, 0, 0, 1, 1, 2, 2, 2, 2])

    def test_windows_consistent_with_conv(self, rng):
        b, t, w, dkv = 1, 4, 3, HD
        qkvr = rng.standard_normal((t, 2 * dkv)).astype(np.float32)
        kc = jnp.asarray(rng.standard_normal((1, w - 1, dkv)).astype(np.float32))
        wins = inkling.save_intermediate_conv_windows(
            jnp.asarray(qkvr), kc, jnp.asarray([0]), jnp.asarray([True]),
            x_off=0, dkv=dkv, tokens_per_seq=t, width=w,
        )
        # window of token 0 == cache tail; window of token 2 == inputs 0,1
        np.testing.assert_allclose(np.asarray(wins)[0, 0], np.asarray(kc)[0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(wins)[0, 2], qkvr[0:2, :dkv], rtol=1e-6)
