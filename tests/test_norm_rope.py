"""RMSNorm / RoPE tests with inline fp32 numpy oracles (reference pattern:
test_rmsnorm.py, test_rope.py tolerances ~1e-2 for bf16, 1e-5 fp32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import norm, rope


def np_rmsnorm(x, w, eps=1e-6, gemma=False):
    var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    wf = w + 1.0 if gemma else w
    return x / np.sqrt(var + eps) * wf


class TestNorm:
    @pytest.mark.parametrize("gemma", [False, True])
    @pytest.mark.parametrize("shape", [(16, 512), (3, 7, 128)])
    def test_rmsnorm(self, rng, shape, gemma):
        x = rng.standard_normal(shape).astype(np.float32)
        w = rng.standard_normal(shape[-1]).astype(np.float32)
        out = norm.rmsnorm(jnp.asarray(x), jnp.asarray(w), gemma=gemma)
        np.testing.assert_allclose(np.asarray(out), np_rmsnorm(x, w, gemma=gemma), rtol=1e-5, atol=1e-5)

    def test_fused_add_rmsnorm(self, rng):
        x = rng.standard_normal((8, 256)).astype(np.float32)
        res = rng.standard_normal((8, 256)).astype(np.float32)
        w = rng.standard_normal(256).astype(np.float32)
        out, new_res = norm.fused_add_rmsnorm(jnp.asarray(x), jnp.asarray(res), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(new_res), x + res, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np_rmsnorm(x + res, w), rtol=1e-5, atol=1e-5)

    def test_bf16_numerics(self, rng):
        # stats must be fp32 even for bf16 IO (reference value-safe flags)
        x = (rng.standard_normal((4, 1024)) * 30).astype(np.float32)
        w = rng.standard_normal(1024).astype(np.float32)
        out = norm.rmsnorm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))
        ref = np_rmsnorm(x, w)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.06, atol=0.06)

    def test_l2norm(self, rng):
        x = rng.standard_normal((4, 64)).astype(np.float32)
        out = norm.l2norm(jnp.asarray(x))
        ref = x / np.sqrt((x**2).sum(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def np_rope_neox(x, pos, base, rot_dim):
    # x [T, H, D]
    t, h, d = x.shape
    inv = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    freqs = np.outer(pos, inv)  # [T, rot/2]
    cos, sin = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
    x1, x2 = x[..., : rot_dim // 2], x[..., rot_dim // 2 : rot_dim]
    o = np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin, x[..., rot_dim:]], -1)
    return o


class TestRope:
    @pytest.mark.parametrize("rot_dim,head", [(64, 64), (64, 128)])
    def test_neox(self, rng, rot_dim, head):
        t, hq, hk = 9, 4, 2
        q = rng.standard_normal((t, hq, head)).astype(np.float32)
        k = rng.standard_normal((t, hk, head)).astype(np.float32)
        pos = rng.integers(0, 100, t)
        cache = rope.compute_cos_sin_cache(rot_dim, 128)
        qo, ko = rope.rotary_embedding(jnp.asarray(pos), jnp.asarray(q), jnp.asarray(k), head, cache)
        np.testing.assert_allclose(np.asarray(qo), np_rope_neox(q, pos, 10000.0, rot_dim), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ko), np_rope_neox(k, pos, 10000.0, rot_dim), rtol=1e-4, atol=1e-4)

    def test_flat_layout(self, rng):
        t, h, d = 5, 4, 64
        q = rng.standard_normal((t, h * d)).astype(np.float32)
        pos = np.arange(t)
        cache = rope.compute_cos_sin_cache(d, 32)
        qo, _ = rope.rotary_embedding(jnp.asarray(pos), jnp.asarray(q), None, d, cache)
        ref = np_rope_neox(q.reshape(t, h, d), pos, 10000.0, d).reshape(t, h * d)
        np.testing.assert_allclose(np.asarray(qo), ref, rtol=1e-4, atol=1e-4)

    def test_interleaved_matches_neox_on_reordered_input(self, rng):
        # interleaved rope on pair-interleaved input == neox rope on split input
        t, d = 6, 32
        x_half = rng.standard_normal((t, 1, d)).astype(np.float32)
        pos = np.arange(t)
        cache = rope.compute_cos_sin_cache(d, 16)
        neox_out, _ = rope.rotary_embedding(jnp.asarray(pos), jnp.asarray(x_half), None, d, cache, is_neox=True)
        # build interleaved version: x_il[2i] = x[i], x_il[2i+1] = x[i + d/2]
        perm = np.empty(d, np.int64)
        perm[0::2] = np.arange(d // 2)
        perm[1::2] = np.arange(d // 2) + d // 2
        x_il = x_half[..., perm]
        il_out, _ = rope.rotary_embedding(jnp.asarray(pos), jnp.asarray(x_il), None, d, cache, is_neox=False)
        # il_out[2i] == neox_out[i], il_out[2i+1] == neox_out[i + d/2]
        deil = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
        np.testing.assert_allclose(np.asarray(il_out)[..., deil], np.asarray(neox_out), rtol=1e-5, atol=1e-5)

    def test_llama3_scaling_cache(self):
        cache = rope.compute_cos_sin_cache(
            64, 64, scaling_factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0, original_max_position=8192
        )
        assert cache.shape == (64, 64)
        base = rope.compute_cos_sin_cache(64, 64)
        assert not np.allclose(np.asarray(cache), np.asarray(base))

    def test_mrope_sections(self, rng):
        t, h, d = 6, 2, 64
        q = rng.standard_normal((t, h, d)).astype(np.float32)
        pos3 = np.stack([np.arange(t), np.arange(t) + 3, np.arange(t) + 7])
        cache = rope.compute_cos_sin_cache(d, 64)
        qo, _ = rope.mrope_rotary_embedding(
            jnp.asarray(pos3), jnp.asarray(q), None, d, cache, mrope_sections=(16, 8, 8)
        )
        # oracle: frequency slot j uses position channel by section
        inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
        sel = np.array([0] * 16 + [1] * 8 + [2] * 8)
        pos_per_freq = pos3[sel, :]  # [half, T]
        freqs = pos_per_freq.T * inv[None, :]  # [T, half]
        cos, sin = np.cos(freqs)[:, None, :], np.sin(freqs)[:, None, :]
        x1, x2 = q[..., : d // 2], q[..., d // 2 :]
        ref = np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
        np.testing.assert_allclose(np.asarray(qo), ref, rtol=1e-4, atol=1e-4)

    def test_fused_qk_norm_rope(self, rng):
        t, nq, nk, nv, d = 5, 4, 2, 2, 64
        qkv = rng.standard_normal((t, (nq + nk + nv) * d)).astype(np.float32)
        qw = rng.standard_normal(d).astype(np.float32)
        kw = rng.standard_normal(d).astype(np.float32)
        pos = np.arange(t)
        cache = rope.compute_cos_sin_cache(d, 16)
        out = rope.fused_qk_norm_rope(
            jnp.asarray(qkv), nq, nk, nv, d, jnp.asarray(qw), jnp.asarray(kw), jnp.asarray(pos), cache
        )
        q = np_rmsnorm(qkv[:, : nq * d].reshape(t, nq, d), qw)
        k = np_rmsnorm(qkv[:, nq * d : (nq + nk) * d].reshape(t, nk, d), kw)
        qr = np_rope_neox(q, pos, 10000.0, d)
        kr = np_rope_neox(k, pos, 10000.0, d)
        ref = np.concatenate([qr.reshape(t, -1), kr.reshape(t, -1), qkv[:, (nq + nk) * d :]], -1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TestRopeDecodeFused:
    def test_matches_rotary_embedding(self, rng):
        from sgl_kernel_tpu.ops.rope import rope_decode_fused

        b, hq, hkv, d = 4, 8, 2, 64
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        k = rng.standard_normal((b, hkv, d)).astype(np.float32)
        pos = rng.integers(0, 30, b).astype(np.int32)
        cache = rope.compute_cos_sin_cache(d, 32)
        qf, kf = rope_decode_fused(jnp.asarray(pos), jnp.asarray(q), jnp.asarray(k), cache)
        qr, kr = rope.rotary_embedding(jnp.asarray(pos), jnp.asarray(q), jnp.asarray(k), d, cache)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qr), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kf), np.asarray(kr), rtol=1e-5, atol=1e-5)


def test_rope_decode_fused_qkv_matches_split(rng):
    """GEMM->rope with no XLA slices: the 3-BlockSpec variant must equal
    slice + rope_decode_fused exactly (v is a pure copy)."""
    from sgl_kernel_tpu.ops.rope import (
        compute_cos_sin_cache, rope_decode_fused, rope_decode_fused_qkv)

    b, nq, nkv, d = 3, 8, 2, 64
    cache = compute_cos_sin_cache(d, 128, 10000.0)
    qkv = jnp.asarray(rng.standard_normal((b, (nq + 2 * nkv) * d)), jnp.bfloat16)
    pos = jnp.asarray([0, 5, 17], jnp.int32)
    q = qkv[:, : nq * d].reshape(b, nq, d)
    k = qkv[:, nq * d : (nq + nkv) * d].reshape(b, nkv, d)
    v = qkv[:, (nq + nkv) * d :].reshape(b, nkv, d)
    qr, kr = rope_decode_fused(pos, q, k, cache)
    qo, ko, vo = rope_decode_fused_qkv(pos, qkv, cache, num_q=nq, num_kv=nkv, head_dim=d)
    np.testing.assert_array_equal(np.asarray(qo), np.asarray(qr))
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(kr))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(v))


def test_mla_qkv_prep_matches_jnp(rng):
    """Fused MLA decode qkv-prep == the jnp glue chain (slices + two
    ropes + latent rmsnorm + concat), at real DSv3 head dims."""
    from sgl_kernel_tpu.ops.norm import rmsnorm
    from sgl_kernel_tpu.ops.rope import (
        compute_cos_sin_cache, mla_qkv_prep, rotary_embedding)

    t, nh, dn, rot, lat, L = 5, 16, 128, 64, 512, 3
    cache = compute_cos_sin_cache(rot, 64, 10000.0)
    q = jnp.asarray(rng.standard_normal((t, nh, dn + rot)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((t, lat + rot)), jnp.bfloat16)
    w = jnp.asarray(rng.random((L, lat)) + 0.5, jnp.bfloat16)
    pos = jnp.asarray([0, 3, 9, 1, 60], jnp.int32)
    lid = 1
    qn, qpe, kvrow = mla_qkv_prep(pos, lid, q, kv, w, cache, nope_dim=dn, eps=1e-5)
    ref_qpe, _ = rotary_embedding(pos, q[..., dn:], None, rot, cache)
    kv_c = rmsnorm(kv[:, :lat], w[lid], 1e-5)
    k_pe, _ = rotary_embedding(pos, kv[:, lat:][:, None, :], None, rot, cache)
    ref_row = jnp.concatenate([kv_c, k_pe[:, 0]], axis=-1)
    np.testing.assert_array_equal(np.asarray(qn), np.asarray(q[..., :dn]))
    np.testing.assert_allclose(np.asarray(qpe, np.float64), np.asarray(ref_qpe, np.float64),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(kvrow, np.float64), np.asarray(ref_row, np.float64),
                               rtol=2e-2, atol=2e-2)
