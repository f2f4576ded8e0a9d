"""Wide flash-attention parameter grid with DYNAMIC tolerance (VERDICT r4
#9; reference pattern: tests/test_flash_attention.py:1844-1881 — the
permissible error is measured, not guessed: the fp64 oracle re-run on
inputs ROUNDED THROUGH the kernel's compute dtype gives the intrinsic
precision floor for the shape, and the kernel must land within a small
multiple of it).

Covers (batch, seq_q, seq_kv, GQA ratio, head_dim, causal, dtype) classes
the single-shape tests don't, plus a paged-decode sub-grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sgl_kernel_tpu.ops.attention import flash_attention
from tests.ref_attention import ref_attention


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def dyn_tol(q, k, v, dtype, **kw):
    """Error floor: fp64 oracle on dtype-rounded inputs vs the fp64 oracle
    on exact inputs — the shape's intrinsic low-precision error."""
    ref, _ = ref_attention(q, k, v, **kw)
    qr = np.asarray(jnp.asarray(q, dtype), np.float64)
    kr = np.asarray(jnp.asarray(k, dtype), np.float64)
    vr = np.asarray(jnp.asarray(v, dtype), np.float64)
    ref_r, _ = ref_attention(qr, kr, vr, **kw)
    floor = np.abs(ref - ref_r).max()
    return ref, max(4.0 * floor, 2e-3)


GRID = [
    # b, sq, skv, hq, hkv, d, causal
    (1, 128, 128, 4, 4, 128, True),
    (3, 64, 64, 8, 2, 128, True),
    (1, 64, 192, 8, 2, 128, False),
    (2, 1, 128, 4, 1, 128, False),
    (1, 128, 128, 4, 4, 64, True),
    (2, 96, 96, 16, 4, 64, True),
    (1, 200, 200, 2, 2, 256, True),
    (1, 64, 256, 4, 2, 64, False),
]


class TestFlashGridDynamicTolerance:
    @pytest.mark.parametrize("b,sq,skv,hq,hkv,d,causal", GRID)
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    def test_grid(self, rng, b, sq, skv, hq, hkv, d, causal, dtype):
        if causal:
            assert sq == skv
        q = rng.standard_normal((b, sq, hq, d)) * 0.5
        k = rng.standard_normal((b, skv, hkv, d)) * 0.5
        v = rng.standard_normal((b, skv, hkv, d)) * 0.5
        out = flash_attention(
            jnp.asarray(q, dtype), jnp.asarray(k, dtype), jnp.asarray(v, dtype),
            causal=causal)
        out = np.asarray(out, np.float64)
        for bb in range(b):
            ref, tol = dyn_tol(q[bb], k[bb], v[bb], dtype, causal=causal)
            err = np.abs(out[bb] - ref).max()
            assert err <= tol, (bb, err, tol)

    @pytest.mark.parametrize("window", [32, 96])
    @pytest.mark.parametrize("softcap", [None, 20.0])
    def test_window_softcap_grid(self, rng, window, softcap):
        b, s, hq, hkv, d = 2, 128, 8, 2, 128
        q = rng.standard_normal((b, s, hq, d)) * 0.5
        k = rng.standard_normal((b, s, hkv, d)) * 0.5
        v = rng.standard_normal((b, s, hkv, d)) * 0.5
        out = np.asarray(flash_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), causal=True, sliding_window=window,
            logit_soft_cap=softcap), np.float64)
        for bb in range(b):
            ref, tol = dyn_tol(q[bb], k[bb], v[bb], jnp.bfloat16,
                               causal=True, window=window, soft_cap=softcap)
            err = np.abs(out[bb] - ref).max()
            assert err <= tol, (bb, err, tol)

    @pytest.mark.parametrize("hq,hkv,d,ctx", [(4, 1, 128, 160), (8, 8, 64, 96),
                                              (16, 2, 128, 224), (4, 2, 256, 96)])
    def test_paged_decode_grid(self, rng, hq, hkv, d, ctx):
        """Paged DMA decode across GQA ratio x head_dim x ragged ctx with
        the same measured-floor tolerance."""
        from sgl_kernel_tpu.ops.attention.paged_decode_dma import (
            paged_attention_decode_dma)

        b, page = 3, 32
        blocks = (ctx + page - 1) // page
        n_pages = b * blocks + 1
        kp = rng.standard_normal((n_pages, hkv, page, d)) * 0.5
        vp = rng.standard_normal((n_pages, hkv, page, d)) * 0.5
        q = rng.standard_normal((b, hq, d)) * 0.5
        lens = np.asarray([ctx, max(1, ctx - 37), max(1, ctx // 3)], np.int32)
        pt = rng.integers(1, n_pages, (b, blocks)).astype(np.int32)
        out = np.asarray(paged_attention_decode_dma(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(kp, jnp.bfloat16),
            jnp.asarray(vp, jnp.bfloat16), jnp.asarray(lens), jnp.asarray(pt),
            chunk_pages=2), np.float64)
        for bb in range(b):
            l = int(lens[bb])
            rows = np.concatenate([kp[pt[bb, i]].transpose(1, 0, 2)
                                   for i in range(blocks)])[:l]
            vrows = np.concatenate([vp[pt[bb, i]].transpose(1, 0, 2)
                                    for i in range(blocks)])[:l]
            qq = q[bb][None]  # [1, Hq, D]
            ref, tol = dyn_tol(qq, rows, vrows, jnp.bfloat16, causal=False)
            err = np.abs(out[bb][None] - ref).max()
            assert err <= tol, (bb, err, tol)
