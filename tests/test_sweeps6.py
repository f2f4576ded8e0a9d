"""Sixth sweep batch: activation-family grids, norm grids (shape x dtype x
gemma x fused-add), Hadamard transform properties, and grammar-bitmask
grids (VERDICT round-1 #9 continued — reference analogs
tests/test_activation.py, test_norm.py, test_apply_token_bitmask.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import activation, grammar, hadamard, norm


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


class TestActivationSweep:
    @pytest.mark.parametrize("t", [1, 7, 128])
    @pytest.mark.parametrize("d", [64, 256, 1000])
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_silu_and_mul_grid(self, rng, t, d, dtype):
        x = rng.standard_normal((t, 2 * d)).astype(np.float32)
        out = np.asarray(activation.silu_and_mul(jnp.asarray(x, dtype)), np.float32)
        ref = _np_silu(x[:, :d]) * x[:, d:]
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)

    @pytest.mark.parametrize("t", [2, 32])
    def test_gelu_and_mul(self, rng, t):
        from scipy.special import erf
        d = 128
        x = rng.standard_normal((t, 2 * d)).astype(np.float32)
        out = np.asarray(activation.gelu_and_mul(jnp.asarray(x)), np.float32)
        g = x[:, :d]
        ref = 0.5 * g * (1 + erf(g / np.sqrt(2))) * x[:, d:]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("t", [4, 64])
    def test_gelu_tanh_and_mul(self, rng, t):
        d = 128
        x = rng.standard_normal((t, 2 * d)).astype(np.float32)
        out = np.asarray(activation.gelu_tanh_and_mul(jnp.asarray(x)), np.float32)
        g = x[:, :d]
        inner = np.sqrt(2 / np.pi) * (g + 0.044715 * g**3)
        ref = 0.5 * g * (1 + np.tanh(inner)) * x[:, d:]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("limit", [1.0, 7.0, 30.0])
    @pytest.mark.parametrize("alpha", [1.0, 1.702])
    def test_swiglu_clamp_grid(self, rng, limit, alpha):
        t, d = 16, 64
        x = (rng.standard_normal((t, 2 * d)) * 10).astype(np.float32)
        out = np.asarray(activation.swiglu_alpha_limit(jnp.asarray(x), alpha=alpha, limit=limit), np.float32)
        # gpt-oss convention: INTERLEAVED gate/up pairs, gate clipped above
        # only, out = gate*sigmoid(alpha*gate) * (up+1)
        g = np.minimum(x[:, 0::2], limit)
        u = np.clip(x[:, 1::2], -limit, limit)
        ref = g * (1.0 / (1.0 + np.exp(-alpha * g))) * (u + 1.0)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


class TestNormSweep:
    @pytest.mark.parametrize("t", [1, 5, 64])
    @pytest.mark.parametrize("h", [128, 512, 4096])
    @pytest.mark.parametrize("gemma", [False, True])
    def test_rmsnorm_grid(self, rng, t, h, gemma):
        x = rng.standard_normal((t, h)).astype(np.float32)
        w = (rng.standard_normal(h) * 0.1).astype(np.float32)
        out = np.asarray(norm.rmsnorm(jnp.asarray(x), jnp.asarray(w), 1e-6, gemma=gemma), np.float32)
        r = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
        ref = r * (1.0 + w) if gemma else r * w
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("h", [256, 1024])
    @pytest.mark.parametrize("gemma", [False, True])
    def test_fused_add_grid(self, rng, h, gemma):
        t = 8
        x = rng.standard_normal((t, h)).astype(np.float32)
        res = rng.standard_normal((t, h)).astype(np.float32)
        w = (rng.standard_normal(h) * 0.1).astype(np.float32)
        out, new_res = norm.fused_add_rmsnorm(
            jnp.asarray(x), jnp.asarray(res), jnp.asarray(w), 1e-6, gemma=gemma)
        s = x + res
        r = s / np.sqrt((s**2).mean(-1, keepdims=True) + 1e-6)
        ref = r * (1.0 + w) if gemma else r * w
        np.testing.assert_allclose(np.asarray(new_res), s, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("shape", [(4, 64), (2, 8, 32), (128,)])
    def test_l2norm_grid(self, rng, shape):
        x = rng.standard_normal(shape).astype(np.float32)
        out = np.asarray(norm.l2norm(jnp.asarray(x)), np.float32)
        ref = x / np.sqrt((x**2).sum(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestHadamardSweep:
    @pytest.mark.parametrize("d", [2, 8, 64, 512])
    def test_involution(self, rng, d):
        # H/sqrt(d) is orthogonal: applying the normalized transform twice
        # recovers the input
        x = rng.standard_normal((4, d)).astype(np.float32)
        once = hadamard.hadamard_transform(jnp.asarray(x), scale=1.0 / np.sqrt(d))
        twice = np.asarray(hadamard.hadamard_transform(once, scale=1.0 / np.sqrt(d)), np.float32)
        np.testing.assert_allclose(twice, x, rtol=1e-4, atol=1e-4)

    def test_matches_matrix(self, rng):
        d = 16
        h = np.array([[1.0]])
        while h.shape[0] < d:
            h = np.block([[h, h], [h, -h]])
        x = rng.standard_normal((3, d)).astype(np.float32)
        out = np.asarray(hadamard.hadamard_transform(jnp.asarray(x)), np.float32)
        np.testing.assert_allclose(out, x @ h.T, rtol=1e-4, atol=1e-4)


class TestGrammarSweep:
    @pytest.mark.parametrize("v", [17, 64, 300])
    @pytest.mark.parametrize("t", [1, 5])
    def test_bitmask_grid(self, rng, v, t):
        logits = rng.standard_normal((t, v)).astype(np.float32)
        allow = rng.integers(0, 2, (t, v)).astype(np.uint8)
        allow[:, 0] = 1  # keep at least one token
        nbytes = (v + 31) // 32 * 4
        bits = np.zeros((t, nbytes * 8), np.uint8)
        bits[:, :v] = allow
        mask_words = np.packbits(bits, axis=-1, bitorder="little").view(np.int32)
        out = np.asarray(grammar.apply_token_bitmask(
            jnp.asarray(logits), jnp.asarray(mask_words)), np.float32)
        ref = np.where(allow[:, :v] > 0, logits, -np.inf)
        np.testing.assert_array_equal(np.isneginf(out), np.isneginf(ref))
        np.testing.assert_allclose(out[allow[:, :v] > 0], logits[allow[:, :v] > 0])

    def test_indices_subset(self, rng):
        t, v = 6, 64
        logits = rng.standard_normal((t, v)).astype(np.float32)
        allow = np.zeros((2, v), np.uint8)
        allow[:, 3] = 1
        mask_words = np.packbits(
            np.pad(allow, ((0, 0), (0, 0))), axis=-1, bitorder="little").view(np.int32)
        indices = jnp.asarray([1, 4], jnp.int32)
        out = np.asarray(grammar.apply_token_bitmask(
            jnp.asarray(logits), jnp.asarray(mask_words), indices=indices), np.float32)
        for r in range(t):
            if r in (1, 4):
                assert np.isneginf(out[r, 0]) and out[r, 3] == logits[r, 3]
            else:
                np.testing.assert_allclose(out[r], logits[r])
