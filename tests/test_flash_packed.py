"""Block-aligned packed flash prefill vs the padded kernel (which is
itself fp64-oracle-tested in test_attention.py): identical math on ragged
batches, every feature flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.attention import (
    flash_attention,
    flash_attention_packed,
    make_seq_meta,
    pack_padded,
    unpack_to_padded,
)

BLOCK = 256


def _mk(rng, b, s, hq, hkv, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    return q, k, v


def _run_both(rng, lens, hq=4, hkv=2, d=64, block=BLOCK, **kw):
    b = len(lens)
    s = max(lens)
    q, k, v = _mk(rng, b, s, hq, hkv, d)
    lens_j = jnp.asarray(lens, jnp.int32)
    ref = flash_attention(q, k, v, lens_j, lens_j, causal=kw.get("causal", True),
                          sliding_window=kw.get("sliding_window"),
                          logit_soft_cap=kw.get("logit_soft_cap"),
                          sinks=kw.get("sinks"))
    qp, _ = pack_padded(q, lens, block=block)
    kp, _ = pack_padded(k, lens, block=block)
    vp, _ = pack_padded(v, lens, block=block)
    seq_meta, meta = make_seq_meta(lens, block=block)
    outp = flash_attention_packed(
        qp, kp, vp,
        jnp.asarray(meta["blk_seq"]), jnp.asarray(meta["blk_q0"]),
        jnp.asarray(seq_meta), max_kvb=meta["max_kvb"], block=block, **kw,
    )
    got = unpack_to_padded(outp, lens, s, block=block)
    # compare only valid rows
    for i, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got[i, :n]), np.asarray(ref[i, :n]), rtol=2e-3, atol=2e-3,
        )


class TestFlashPacked:
    def test_uniform(self, rng):
        _run_both(rng, [300, 300])

    def test_ragged(self, rng):
        _run_both(rng, [17, 511, 256, 650])

    def test_single_long(self, rng):
        _run_both(rng, [777])

    def test_gqa_wide(self, rng):
        _run_both(rng, [130, 70], hq=8, hkv=2)

    def test_window(self, rng):
        _run_both(rng, [400, 300], sliding_window=128)

    def test_softcap(self, rng):
        _run_both(rng, [300, 100], logit_soft_cap=30.0)

    def test_sinks(self, rng):
        _run_both(rng, [280, 90], sinks=jnp.asarray(np.linspace(-1, 1, 4), jnp.float32))

    def test_noncausal(self, rng):
        _run_both(rng, [260, 90], causal=False)

    def test_lse_matches_padded(self, rng):
        lens = [300, 90]
        b, s = len(lens), max(lens)
        q, k, v = _mk(rng, b, s, 4, 2, 64)
        lens_j = jnp.asarray(lens, jnp.int32)
        ref, ref_lse = flash_attention(q, k, v, lens_j, lens_j, causal=True, return_lse=True)
        qp, _ = pack_padded(q, lens, block=BLOCK)
        kp, _ = pack_padded(k, lens, block=BLOCK)
        vp, _ = pack_padded(v, lens, block=BLOCK)
        seq_meta, meta = make_seq_meta(lens, block=BLOCK)
        outp, lsep = flash_attention_packed(
            qp, kp, vp, jnp.asarray(meta["blk_seq"]), jnp.asarray(meta["blk_q0"]),
            jnp.asarray(seq_meta), max_kvb=meta["max_kvb"], return_lse=True,
        )
        for i, n in enumerate(lens):
            t0 = meta["seq_tok0"][i]
            np.testing.assert_allclose(
                np.asarray(lsep[:, t0 : t0 + n]), np.asarray(ref_lse[i, :, :n]),
                rtol=2e-3, atol=2e-3,
            )

    def test_extend_offsets(self, rng):
        """q_start/kv_start offsets (chunked extend): packed vs padded."""
        lens_q = [80, 300]
        kv_lens = [200, 420]  # prefix of 120 each
        b = len(lens_q)
        sq, skv = max(lens_q), max(kv_lens)
        q = jnp.asarray(rng.standard_normal((b, sq, 4, 64)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, skv, 2, 64)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, skv, 2, 64)), jnp.float32)
        qs = jnp.asarray([120, 120], jnp.int32)
        ref = flash_attention(
            q, k, v, jnp.asarray(lens_q, jnp.int32), jnp.asarray(kv_lens, jnp.int32),
            q_start=qs, kv_start=jnp.zeros(2, jnp.int32), causal=True,
        )
        qp, _ = pack_padded(q, lens_q, block=BLOCK)
        kp, _ = pack_padded(k, kv_lens, block=BLOCK)
        vp, _ = pack_padded(v, kv_lens, block=BLOCK)
        seq_meta, meta = make_seq_meta(
            lens_q, kv_lens, q_start=[120, 120], kv_start=[0, 0], block=BLOCK
        )
        outp = flash_attention_packed(
            qp, kp, vp, jnp.asarray(meta["blk_seq"]), jnp.asarray(meta["blk_q0"]),
            jnp.asarray(seq_meta), max_kvb=meta["max_kvb"],
        )
        got = unpack_to_padded(outp, lens_q, sq, block=BLOCK)
        for i, n in enumerate(lens_q):
            np.testing.assert_allclose(
                np.asarray(got[i, :n]), np.asarray(ref[i, :n]), rtol=2e-3, atol=2e-3,
            )


class TestFlashPackedCombos:
    @pytest.mark.parametrize("window,softcap", [(64, None), (None, 20.0), (96, 25.0)])
    def test_window_softcap_combos(self, rng, window, softcap):
        _run_both(rng, [300, 150], sliding_window=window, logit_soft_cap=softcap)

    @pytest.mark.parametrize("lens", [[256], [256, 256, 256], [1, 1000]])
    def test_degenerate_lengths(self, rng, lens):
        _run_both(rng, lens)

    def test_block_128(self, rng):
        _run_both(rng, [200, 90], block=128)

    def test_sinks_with_window(self, rng):
        import jax.numpy as jnp
        _run_both(rng, [280, 90], sliding_window=128,
                  sinks=jnp.asarray(np.linspace(-1, 1, 4), jnp.float32))
