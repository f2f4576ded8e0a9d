"""Sampling + KV-cache op tests (oracle pattern per reference
tests/test_sampling.py golden semantics and test_kvcacheio.py round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import kvcache, sampling


class TestSampling:
    def test_top_k_renorm(self, rng):
        t, v = 8, 128
        probs = rng.random((t, v)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        out = np.asarray(sampling.top_k_renorm_probs(jnp.asarray(probs), 10))
        for tt in range(t):
            kept = np.argsort(-probs[tt])[:10]
            assert np.count_nonzero(out[tt]) == 10
            assert set(np.nonzero(out[tt])[0]) == set(kept)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)

    def test_top_p_renorm(self, rng):
        t, v = 4, 64
        probs = rng.random((t, v)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        out = np.asarray(sampling.top_p_renorm_probs(jnp.asarray(probs), 0.7))
        for tt in range(t):
            order = np.argsort(-probs[tt])
            csum = np.cumsum(probs[tt][order])
            n_keep = int(np.searchsorted(csum, 0.7) + 1)
            kept = set(order[:n_keep])
            assert set(np.nonzero(out[tt])[0]) == kept
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)

    def test_min_p_filter(self, rng):
        t, v = 4, 64
        probs = rng.random((t, v)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        out = np.asarray(sampling.min_p_filter_probs(jnp.asarray(probs), 0.5))
        for tt in range(t):
            thresh = 0.5 * probs[tt].max()
            assert set(np.nonzero(out[tt])[0]) == set(np.nonzero(probs[tt] >= thresh)[0])

    def test_sampling_distribution(self):
        probs = jnp.asarray([[0.1, 0.6, 0.3, 0.0]] * 512, jnp.float32)
        toks = np.asarray(sampling.sampling_from_probs(probs, jax.random.PRNGKey(0)))
        counts = np.bincount(toks, minlength=4) / len(toks)
        assert counts[3] == 0.0
        np.testing.assert_allclose(counts[:3], [0.1, 0.6, 0.3], atol=0.08)

    def test_greedy(self, rng):
        logits = rng.standard_normal((4, 32)).astype(np.float32)
        out = sampling.sample_tokens(jnp.asarray(logits), jax.random.PRNGKey(0), temperature_is_zero=True)
        np.testing.assert_array_equal(np.asarray(out), logits.argmax(-1))

    def test_deterministic(self, rng):
        probs = rng.random((8, 100)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        a = sampling.top_k_top_p_sampling_from_probs(jnp.asarray(probs), jax.random.PRNGKey(7), 20, 0.9)
        b = sampling.top_k_top_p_sampling_from_probs(jnp.asarray(probs), jax.random.PRNGKey(7), 20, 0.9)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestKvCache:
    def test_store_cache_roundtrip(self, rng):
        # page-major pools [P, H, page, D]
        h, p, page, d, t = 2, 4, 8, 16, 5
        kp = jnp.zeros((p, h, page, d))
        vp = jnp.zeros((p, h, page, d))
        k = rng.standard_normal((t, h, d)).astype(np.float32)
        v = rng.standard_normal((t, h, d)).astype(np.float32)
        loc = jnp.asarray([0, 3, 8, 17, 31], jnp.int32)  # pages 0,0,1,2,3
        kp2, vp2 = kvcache.store_cache(jnp.asarray(k), jnp.asarray(v), kp, vp, loc)
        got = np.asarray(kp2)
        for i, l in enumerate([0, 3, 8, 17, 31]):
            np.testing.assert_allclose(got[l // page, :, l % page], k[i], rtol=1e-6)

    def test_store_cache_negative_skips(self, rng):
        h, p, page, d = 1, 2, 4, 8
        kp = jnp.ones((p, h, page, d))
        vp = jnp.ones((p, h, page, d))
        k = rng.standard_normal((2, h, d)).astype(np.float32)
        kp2, _ = kvcache.store_cache(jnp.asarray(k), jnp.asarray(k), kp, vp, jnp.asarray([-1, 2]))
        got = np.asarray(kp2)
        assert np.all(got[0, :, 0] == 1.0)  # loc -1 dropped
        np.testing.assert_allclose(got[0, :, 2], k[1], rtol=1e-6)

    def test_store_cache_head_major_roundtrip(self, rng):
        h, p, page, d, t = 2, 4, 8, 16, 3
        kp = jnp.zeros((h, p, page, d))
        vp = jnp.zeros((h, p, page, d))
        k = rng.standard_normal((t, h, d)).astype(np.float32)
        loc = jnp.asarray([0, 9, 30], jnp.int32)
        kp2, _ = kvcache.store_cache_head_major(jnp.asarray(k), jnp.asarray(k), kp, vp, loc)
        flat = np.asarray(kp2).reshape(h, p * page, d)
        for i, l in enumerate([0, 9, 30]):
            np.testing.assert_allclose(flat[:, l], k[i], rtol=1e-6)

    def test_store_cache_stacked_page_major(self, rng):
        l, p, h, page, d, t = 3, 4, 2, 8, 16, 4
        kp = jnp.zeros((l, p, h, page, d))
        vp = jnp.zeros((l, p, h, page, d))
        k = rng.standard_normal((t, h, d)).astype(np.float32)
        v = rng.standard_normal((t, h, d)).astype(np.float32)
        loc = jnp.asarray([2, 8, 17, -1], jnp.int32)
        kp2, vp2 = kvcache.store_cache_stacked(jnp.asarray(k), jnp.asarray(v), kp, vp, loc, jnp.int32(1))
        got = np.asarray(kp2)
        assert np.all(got[0] == 0) and np.all(got[2] == 0)
        for i, s in enumerate([2, 8, 17]):
            np.testing.assert_allclose(got[1, s // page, :, s % page], k[i], rtol=1e-6)

    def test_store_cache_all_layers_page_major(self, rng):
        l, p, h, page, d, t = 2, 3, 2, 4, 8, 3
        kp = jnp.zeros((l, p, h, page, d))
        vp = jnp.zeros((l, p, h, page, d))
        k_all = rng.standard_normal((l, t, h, d)).astype(np.float32)
        v_all = rng.standard_normal((l, t, h, d)).astype(np.float32)
        loc = jnp.asarray([1, 5, 11], jnp.int32)
        kp2, vp2 = kvcache.store_cache_all_layers(jnp.asarray(k_all), jnp.asarray(v_all), kp, vp, loc)
        got = np.asarray(vp2)
        for li in range(l):
            for i, s in enumerate([1, 5, 11]):
                np.testing.assert_allclose(got[li, s // page, :, s % page], v_all[li, i], rtol=1e-6)

    def test_transfer_per_layer(self, rng):
        src_k = jnp.asarray(rng.standard_normal((16, 2, 8)), jnp.float32)
        src_v = jnp.asarray(rng.standard_normal((16, 2, 8)), jnp.float32)
        dst_k = jnp.zeros((16, 2, 8))
        dst_v = jnp.zeros((16, 2, 8))
        si = jnp.asarray([1, 5, 9], jnp.int32)
        di = jnp.asarray([0, 1, 2], jnp.int32)
        dk, dv = kvcache.transfer_kv_per_layer(src_k, src_v, dst_k, dst_v, si, di)
        np.testing.assert_allclose(np.asarray(dk)[:3], np.asarray(src_k)[np.asarray(si)], rtol=1e-6)

    def test_lf_pf_roundtrip(self, rng):
        l, t, item = 3, 16, 8
        src_k = jnp.asarray(rng.standard_normal((l, t, item)), jnp.float32)
        src_v = jnp.asarray(rng.standard_normal((l, t, item)), jnp.float32)
        pf = jnp.zeros((t, 2 * l, item))
        si = jnp.asarray([2, 7], jnp.int32)
        di = jnp.asarray([0, 1], jnp.int32)
        pf2 = kvcache.transfer_kv_all_layer_lf_pf(src_k, src_v, pf, si, di)
        # back to lf layer 1
        dk = jnp.zeros((t, item))
        dv = jnp.zeros((t, item))
        dk2, dv2 = kvcache.transfer_kv_per_layer_pf_lf(pf2, dk, dv, di, jnp.asarray([4, 5], jnp.int32), jnp.int32(1))
        np.testing.assert_allclose(np.asarray(dk2)[4], np.asarray(src_k)[1, 2], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dv2)[5], np.asarray(src_v)[1, 7], rtol=1e-6)

    def test_lf_ph_roundtrip(self, rng):
        l, t, h, d, page = 2, 32, 2, 8, 4
        src_k = jnp.asarray(rng.standard_normal((l, t, h, d)), jnp.float32)
        src_v = jnp.asarray(rng.standard_normal((l, t, h, d)), jnp.float32)
        ph = jnp.zeros((4, h, page, 2 * l, d))
        src_pages = jnp.asarray([1, 3], jnp.int32)
        dst_pages = jnp.asarray([0, 2], jnp.int32)
        ph2 = kvcache.transfer_kv_all_layer_lf_ph(src_k, src_v, ph, src_pages, dst_pages, page)
        dk = jnp.zeros((t, h, d))
        dv = jnp.zeros((t, h, d))
        dk2, dv2 = kvcache.transfer_kv_per_layer_ph_lf(ph2, dk, dv, dst_pages, jnp.asarray([0, 1], jnp.int32), jnp.int32(0), page)
        # page 1 of src layer 0 should land at dst page 0 (tokens 0..3)
        np.testing.assert_allclose(np.asarray(dk2)[:page], np.asarray(src_k)[0, page : 2 * page], rtol=1e-6)


class TestSamplingEdgeCases:
    def test_top_k_disabled_sentinel(self, rng):
        """top_k <= 0 means 'no filtering' (SGLang/HF convention), not
        top-1 (regression: clip turned 0/-1 into greedy)."""
        from sgl_kernel_tpu.ops.sampling import top_k_renorm_probs

        p = jnp.asarray(rng.random((3, 16)), jnp.float32)
        p = p / p.sum(-1, keepdims=True)
        for k in (0, -1):
            out = top_k_renorm_probs(p, k)
            np.testing.assert_allclose(np.asarray(out), np.asarray(p), rtol=1e-6)

    def test_top_p_zero_keeps_top1(self, rng):
        from sgl_kernel_tpu.ops.sampling import top_p_renorm_probs

        p = jnp.asarray(rng.random((2, 8)), jnp.float32)
        p = p / p.sum(-1, keepdims=True)
        out = np.asarray(top_p_renorm_probs(p, 0.0))
        assert (out.sum(-1) > 0.99).all()
        np.testing.assert_array_equal(out.argmax(-1), np.asarray(p).argmax(-1))
        assert ((out > 0).sum(-1) == 1).all()

    def test_sampler_never_emits_filtered_token(self, rng):
        """Filtered (zero-probability) tokens must never be sampled even
        when the float32 cumsum undershoots 1 (regression)."""
        from sgl_kernel_tpu.ops.sampling import sampling_from_probs, top_k_renorm_probs

        p = jnp.asarray(rng.random((4, 4096)), jnp.float32)
        p = top_k_renorm_probs(p / p.sum(-1, keepdims=True), 7)
        allowed = np.asarray(p) > 0
        for i in range(20):
            toks = np.asarray(sampling_from_probs(p, jax.random.PRNGKey(i)))
            assert all(allowed[r, t] for r, t in enumerate(toks))

    def test_per_token_temperature(self, rng):
        from sgl_kernel_tpu.ops.sampling import sample_tokens

        logits = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
        toks = sample_tokens(logits, jax.random.PRNGKey(0),
                             temperature=jnp.asarray([0.5, 1.0, 2.0]))
        assert toks.shape == (3,)


class TestBisectionMatchesSortOracle:
    """The bit-bisection thresholds must reproduce the sort formulation
    exactly (same >= threshold rule), including tie-heavy rows."""

    def test_top_k_matches_sort(self, rng):
        from sgl_kernel_tpu.ops.sampling import top_k_renorm_probs

        p = rng.random((8, 257)).astype(np.float32)
        p[3, 10:200] = p[3, 10]  # massive tie group
        p = p / p.sum(-1, keepdims=True)
        for k in (1, 5, 200, 257, 0, -1):
            got = np.asarray(top_k_renorm_probs(jnp.asarray(p), k), np.float64)
            srt = np.sort(p, axis=-1)[:, ::-1]
            if k <= 0:
                ref = p / p.sum(-1, keepdims=True)
            else:
                thr = srt[:, min(k, 257) - 1][:, None]
                f = np.where(p >= thr, p, 0.0)
                ref = f / f.sum(-1, keepdims=True)
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)

    def test_top_p_matches_sort_distinct(self, rng):
        from sgl_kernel_tpu.ops.sampling import top_p_renorm_probs

        # distinct values: threshold rule == sorted-prefix rule exactly
        p = rng.permutation(np.arange(1, 129, dtype=np.float32))[None].repeat(4, 0)
        p = p / p.sum(-1, keepdims=True)
        for tp in (0.1, 0.5, 0.9, 0.999):
            got = np.asarray(top_p_renorm_probs(jnp.asarray(p), tp), np.float64)
            srt = np.sort(p, axis=-1)[:, ::-1]
            cs = np.cumsum(srt, -1)
            keep_sorted = (cs - srt) < tp
            keep_sorted[:, 0] = True
            thr = np.min(np.where(keep_sorted, srt, np.inf), -1, keepdims=True)
            f = np.where(p >= thr, p, 0.0)
            ref = f / f.sum(-1, keepdims=True)
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
