"""Scaled KV-cache pools (int8 / fp8 with per-tensor kv_scale).

The TPU-native low-bit KV path: int8 pools upcast with ONE hardware
convert inside the decode kernel (vs the fp8-e4m3 bit-twiddle chain), and
the symmetric per-tensor scale folds into q (k_scale) and the output
(v_scale) — zero per-element cost on the KV stream. Reference fp8-KV
descale contract: src/sycl/flash_attention.cpp:46-74.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.ops.attention.paged_decode_dma import paged_attention_decode_dma


def _oracle(q, kd, vd, table, lengths, hq, hkv, d):
    """fp64 attention over the dequantized pool."""
    b = q.shape[0]
    out = np.zeros((b, hq, d))
    for i in range(b):
        pages = np.asarray(table)[i]
        kk = kd[pages].transpose(1, 0, 2, 3).reshape(hkv, -1, d)
        vv = vd[pages].transpose(1, 0, 2, 3).reshape(hkv, -1, d)
        n = int(lengths[i])
        for h in range(hq):
            g = h // (hq // hkv)
            sc = (np.asarray(q[i, h], np.float64) @ kk[g, :n].T) / np.sqrt(d)
            p = np.exp(sc - sc.max())
            p /= p.sum()
            out[i, h] = p @ vv[g, :n]
    return out


@pytest.mark.parametrize("kv_dtype,scale", [
    (jnp.int8, 1 / 16),
    (jnp.float8_e5m2, 0.5),
    (jnp.float8_e4m3fn, 0.25),
])
def test_decode_kernel_scaled_pool_oracle(kv_dtype, scale):
    rng = np.random.default_rng(0)
    b, hq, hkv, d, page, blocks = 4, 8, 2, 128, 64, 4
    npg = b * blocks + 1
    kf = rng.standard_normal((npg, hkv, page, d)) * 0.3
    vf = rng.standard_normal((npg, hkv, page, d)) * 0.3
    if kv_dtype == jnp.int8:
        kq = np.clip(np.round(kf / scale), -127, 127).astype(np.int8)
        vq = np.clip(np.round(vf / scale), -127, 127).astype(np.int8)
        kp, vp = jnp.asarray(kq), jnp.asarray(vq)
        kd, vd = kq.astype(np.float64) * scale, vq.astype(np.float64) * scale
    else:
        kp = jnp.asarray(kf / scale, jnp.float32).astype(kv_dtype)
        vp = jnp.asarray(vf / scale, jnp.float32).astype(kv_dtype)
        kd = np.asarray(kp.astype(jnp.float32), np.float64) * scale
        vd = np.asarray(vp.astype(jnp.float32), np.float64) * scale
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    lengths = jnp.full((b,), page * blocks, jnp.int32)
    table = jnp.arange(1, npg, dtype=jnp.int32).reshape(b, blocks)
    o = paged_attention_decode_dma(q, kp[None], vp[None], lengths, table,
                                   k_scale=scale, v_scale=scale)
    ref = _oracle(q, kd, vd, table, lengths, hq, hkv, d)
    assert np.abs(np.asarray(o, np.float64) - ref).max() < 2e-2


def _drive(cfg, key):
    params = llama.init_weights(cfg, key)
    kc, vc = llama.make_caches(cfg, 9, 32)
    rope = llama.build_rope_cache(cfg)
    b, s = 2, 16
    toks = jax.random.randint(key, (b, s), 0, cfg.vocab_size)
    pos = jnp.tile(jnp.arange(s)[None], (b, 1))
    q_lens = jnp.array([16, 11], jnp.int32)
    tables = jnp.arange(1, 9, dtype=jnp.int32).reshape(b, 4)
    slot = jnp.where(pos < q_lens[:, None], tables[:, 0:1] * 32 + pos, -1)
    logits, kc, vc = llama.prefill(params, cfg, kc, vc, toks, pos, q_lens, slot, rope)
    # pinned token stream (NOT argmax feedback: one flipped near-tie would
    # make the two variants diverge arbitrarily and the comparison void)
    dec_toks = jax.random.randint(jax.random.fold_in(key, 3), (2, b), 0, cfg.vocab_size)
    positions, lengths = q_lens, q_lens + 1
    outs = [np.asarray(logits, np.float64)]
    for t in range(2):
        slots = (tables[jnp.arange(b), positions // 32] * 32 + positions % 32).astype(jnp.int32)
        lg, kc, vc = llama.decode_step(params, cfg, kc, vc, dec_toks[t], positions,
                                       tables, lengths, slots, rope)
        outs.append(np.asarray(lg, np.float64))
        positions, lengths = positions + 1, lengths + 1
    # extend path (gathered-prefix dequant): 3 more tokens against the cache
    ext = jax.random.randint(jax.random.fold_in(key, 7), (b, 3), 0, cfg.vocab_size)
    epos = positions[:, None] + jnp.arange(3)[None]
    eslot = tables[jnp.arange(b)[:, None], epos // 32] * 32 + epos % 32
    lg, kc, vc = llama.prefill_extend(
        params, cfg, kc, vc, ext, epos, jnp.full((b,), 3, jnp.int32),
        lengths + 2, tables, eslot.astype(jnp.int32), rope, prefix_max=96)
    outs.append(np.asarray(lg, np.float64))
    return outs


@pytest.mark.parametrize("kv_dtype,scale", [
    (jnp.int8, 0.02),
    (jnp.float8_e5m2, 1.0),
])
def test_model_scaled_kv_close_to_bf16(kv_dtype, scale):
    """decode_step + prefill + prefill_extend stay within quantization
    noise of the bf16-pool model (same weights, same tokens)."""
    key = jax.random.PRNGKey(0)
    ref = _drive(llama.LlamaConfig.tiny(), key)
    got = _drive(llama.LlamaConfig.tiny(kv_dtype=kv_dtype, kv_scale=scale), key)
    for r, g in zip(ref, got):
        scale_mag = np.abs(r).max()
        assert np.abs(r - g).max() < 0.12 * max(scale_mag, 1.0)


def test_kv_quant_store_roundtrip():
    """_kv_quant writes exactly round(x/scale) clipped — the pool holds
    integers the kernel's astype+fold reconstructs as scale*q exactly."""
    cfg = llama.LlamaConfig.tiny(kv_dtype=jnp.int8, kv_scale=0.25)
    x = jnp.asarray([[0.12, -0.13, 31.9, -100.0]], jnp.float32)
    q = llama._kv_quant(cfg, x)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [[0, -1, 127, -127]])
    deq = llama._kv_deq(cfg, q, jnp.float32)
    np.testing.assert_allclose(np.asarray(deq), [[0.0, -0.25, 31.75, -31.75]])


class TestDeepseekScaledLatent:
    """int8/fp8 latent pools with per-tensor kv_scale (MLA): stores write
    kv/s, pool reads fold s into sm_scale + one output multiply."""

    def _drive_ds(self, cfg, key):
        from sgl_kernel_tpu.models import deepseek

        params = deepseek.init_weights(cfg, key)
        cache = deepseek.make_cache(cfg, 9, 32)
        rope = deepseek.build_rope_cache(cfg)
        b, s = 2, 12
        toks = jax.random.randint(key, (b, s), 0, cfg.vocab_size)
        pos = jnp.tile(jnp.arange(s)[None], (b, 1))
        q_lens = jnp.array([12, 7], jnp.int32)
        tables = jnp.arange(1, 9, dtype=jnp.int32).reshape(b, 4)
        slot = jnp.where(pos < q_lens[:, None], tables[:, 0:1] * 32 + pos, -1)
        logits, cache = deepseek.prefill(params, cfg, cache, toks, pos, q_lens, slot, rope)
        outs = [np.asarray(logits, np.float64)]
        dec = jax.random.randint(jax.random.fold_in(key, 5), (2, b), 0, cfg.vocab_size)
        positions, lengths = q_lens, q_lens + 1
        for t in range(2):
            slots = (tables[jnp.arange(b), positions // 32] * 32 + positions % 32).astype(jnp.int32)
            lg, cache = deepseek.decode_step(params, cfg, cache, dec[t], positions,
                                             tables, lengths, slots, rope)
            outs.append(np.asarray(lg, np.float64))
            positions, lengths = positions + 1, lengths + 1
        # extend (gathered-prefix dequant)
        ext = jax.random.randint(jax.random.fold_in(key, 9), (b, 3), 0, cfg.vocab_size)
        epos = positions[:, None] + jnp.arange(3)[None]
        eslot = (tables[jnp.arange(b)[:, None], epos // 32] * 32 + epos % 32).astype(jnp.int32)
        lg, cache = deepseek.prefill_extend(
            params, cfg, cache, ext, epos, jnp.full((b,), 3, jnp.int32),
            lengths + 2, tables, eslot, rope, prefix_max=96)
        outs.append(np.asarray(lg, np.float64))
        return outs

    @pytest.mark.parametrize("kv_dtype,scale", [(jnp.int8, 1 / 16), (jnp.float8_e4m3fn, 0.25)])
    def test_dense_close_to_bf16(self, kv_dtype, scale):
        from sgl_kernel_tpu.models import deepseek

        key = jax.random.PRNGKey(0)
        ref = self._drive_ds(deepseek.DeepseekConfig.tiny(), key)
        got = self._drive_ds(deepseek.DeepseekConfig.tiny(kv_dtype=kv_dtype, kv_scale=scale), key)
        for r, g in zip(ref, got):
            # MLA amplifies latent quant noise through the W_UV absorption
            # einsum; the bound is proportionate to the representation error
            # (int8@1/16 ~ 0.03/elem over 576-dim rows)
            assert np.abs(r - g).max() < 0.25 * max(np.abs(r).max(), 1.0)

    def test_nsa_int8_latent_runs(self):
        """NSA decode over an int8 latent pool: the sparse gather keeps the
        pool dtype and the folded scale keeps logits close to bf16."""
        from sgl_kernel_tpu.models import deepseek

        key = jax.random.PRNGKey(1)
        outs = {}
        for tag, kw in [("bf16", {}), ("int8", dict(kv_dtype=jnp.int8, kv_scale=0.02))]:
            cfg = deepseek.DeepseekConfig.tiny(nsa=True, **kw)
            params = deepseek.init_weights(cfg, key)
            cache = deepseek.make_cache(cfg, 9, 32)
            ik, isc = deepseek.make_indexer_cache(cfg, 9, 32)
            rope = deepseek.build_rope_cache(cfg)
            irope = deepseek.build_idx_rope_cache(cfg)
            b, s = 2, 8
            toks = jax.random.randint(key, (b, s), 0, cfg.vocab_size)
            pos = jnp.tile(jnp.arange(s)[None], (b, 1))
            q_lens = jnp.full((b,), s, jnp.int32)
            tables = jnp.arange(1, 9, dtype=jnp.int32).reshape(b, 4)
            slot = tables[:, 0:1] * 32 + pos
            _, cache, ik, isc = deepseek.prefill_nsa(
                params, cfg, cache, ik, isc, toks, pos, q_lens, slot, rope, irope)
            dec = jnp.asarray([3, 5], jnp.int32)
            slots = (tables[:, 0] * 32 + s).astype(jnp.int32)
            lg, cache, ik, isc = deepseek.decode_step_nsa(
                params, cfg, cache, ik, isc, dec, q_lens, tables, q_lens + 1,
                slots, rope, irope)
            outs[tag] = np.asarray(lg, np.float64)
        d = np.abs(outs["bf16"] - outs["int8"]).max()
        assert d < 0.15 * max(np.abs(outs["bf16"]).max(), 1.0), d

    def test_compress_gate(self):
        from sgl_kernel_tpu.models import deepseek

        cfg = deepseek.DeepseekConfig.tiny(compress="c4", kv_scale=0.02, kv_dtype=jnp.int8)
        params = deepseek.init_weights(cfg, jax.random.PRNGKey(0))
        with pytest.raises(AssertionError, match="compress"):
            kv, sc, comp = deepseek.make_compress_caches(cfg, 4, 32, max_slots=2)
            rope = deepseek.build_rope_cache(cfg)
            b = 1
            toks = jnp.zeros((b, 8), jnp.int32)
            pos = jnp.tile(jnp.arange(8)[None], (b, 1))
            deepseek.prefill_c(
                params, cfg, kv, sc, comp, toks, pos,
                jnp.full((b,), 8, jnp.int32), pos.astype(jnp.int32),
                jnp.zeros((b,), jnp.int32), rope)
