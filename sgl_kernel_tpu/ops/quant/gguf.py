"""GGUF / GGML block-quant dequantization + matmul.

TPU-native coverage of the reference's GGUF surface (tests/test_gguf.py:
ggml_dequantize / ggml_mul_mat_a8 / ggml_mul_mat_vec_a8 / ggml_moe_a8
over Q4_0, Q8_0, Q4_K, Q6_K — kernels are declared-only on XPU,
SURVEY.md §2.6). Layouts follow the ggml spec:

  Q4_0: 18-byte blocks of 32 values — f16 scale d, 16 bytes of nibbles;
        v = (nib - 8) * d; nibble j holds value j (lo) / j+16 (hi).
  Q8_0: 34-byte blocks of 32 values — f16 d + 32 int8; v = q * d.
  Q4_K: 144-byte super-blocks of 256 values (8 sub-blocks of 32):
        f16 d, dmin, 12 bytes packed 6-bit scales/mins, 128 nibble bytes;
        v = d*sc[j] * nib - dmin*m[j].
  Q6_K: 210-byte super-blocks of 256: 128 bytes ql, 64 bytes qh,
        16 int8 scales, f16 d; v = d * sc * (q6 - 32).

Dequant runs as vectorized jnp (bitwise unpack + scale) — bandwidth-
bound and XLA-fused; the matmuls dequantize then hit the MXU in bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Q4_0, Q8_0, Q4_K, Q6_K = 2, 8, 12, 14  # GGMLQuantizationType values

_BLOCK = {Q4_0: (32, 18), Q8_0: (32, 34), Q4_K: (256, 144), Q6_K: (256, 210)}


def ggml_moe_get_block_size(quant_type: int) -> int:
    return _BLOCK[quant_type][0]


def _f16(lo_hi_bytes):
    """uint8 [..., 2] little-endian -> float32 via f16 bit decode."""
    u16 = lo_hi_bytes[..., 0].astype(jnp.uint16) | (lo_hi_bytes[..., 1].astype(jnp.uint16) << 8)
    return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


def _deq_q4_0(blocks):
    d = _f16(blocks[..., 0:2])[..., None]  # [NB, 1]
    q = blocks[..., 2:18]
    lo = (q & 0xF).astype(jnp.float32) - 8.0
    hi = (q >> 4).astype(jnp.float32) - 8.0
    return jnp.concatenate([lo, hi], axis=-1) * d


def _deq_q8_0(blocks):
    d = _f16(blocks[..., 0:2])[..., None]
    q = blocks[..., 2:34].astype(jnp.int8).astype(jnp.float32)
    return q * d


def _q4k_scales(sc12):
    """12 packed bytes -> (scales [8], mins [8]) 6-bit each (ggml layout)."""
    sc12 = sc12.astype(jnp.int32)
    lo = sc12[..., :8]
    sc_lo = lo[..., :4] & 63
    m_lo = lo[..., 4:8] & 63
    hi = sc12[..., 8:12]
    sc_hi = (hi & 0xF) | ((lo[..., :4] >> 6) << 4)
    m_hi = (hi >> 4) | ((lo[..., 4:8] >> 6) << 4)
    return (
        jnp.concatenate([sc_lo, sc_hi], axis=-1).astype(jnp.float32),
        jnp.concatenate([m_lo, m_hi], axis=-1).astype(jnp.float32),
    )


def _deq_q4_k(blocks):
    d = _f16(blocks[..., 0:2])
    dmin = _f16(blocks[..., 2:4])
    scales, mins = _q4k_scales(blocks[..., 4:16])  # [..., 8]
    q = blocks[..., 16:144]  # 128 bytes; 4 chunks of 32 bytes -> 2 sub-blocks each
    qc = q.reshape(*q.shape[:-1], 4, 32)
    lo = (qc & 0xF).astype(jnp.float32)
    hi = (qc >> 4).astype(jnp.float32)
    vals = jnp.stack([lo, hi], axis=-2).reshape(*q.shape[:-1], 8, 32)  # sub-block order
    sc = (d[..., None] * scales)[..., None]
    mn = (dmin[..., None] * mins)[..., None]
    return (vals * sc - mn).reshape(*q.shape[:-1], 256)


def _deq_q6_k(blocks):
    ql = blocks[..., 0:128]
    qh = blocks[..., 128:192]
    sc = blocks[..., 192:208].astype(jnp.int8).astype(jnp.float32)  # [..., 16]
    d = _f16(blocks[..., 208:210])
    # ggml q6_K: two 128-value halves, each from 64 ql bytes + 32 qh bytes
    def half(qlh, qhh):
        # values n (0..127): ql low/high nibbles + 2 bits from qh
        q1 = (qlh[..., :32] & 0xF) | ((qhh & 0x3) << 4)
        q2 = (qlh[..., 32:64] & 0xF) | (((qhh >> 2) & 0x3) << 4)
        q3 = (qlh[..., :32] >> 4) | (((qhh >> 4) & 0x3) << 4)
        q4 = (qlh[..., 32:64] >> 4) | (((qhh >> 6) & 0x3) << 4)
        return jnp.concatenate([q1, q2, q3, q4], axis=-1).astype(jnp.float32) - 32.0
    v1 = half(ql[..., :64], qh[..., :32])
    v2 = half(ql[..., 64:128], qh[..., 32:64])
    vals = jnp.concatenate([v1, v2], axis=-1)  # [..., 256]
    scales = jnp.repeat(sc, 16, axis=-1)  # 16 sub-blocks of 16 values
    return vals * scales * d[..., None]


_DEQ = {Q4_0: _deq_q4_0, Q8_0: _deq_q8_0, Q4_K: _deq_q4_k, Q6_K: _deq_q6_k}


@functools.partial(jax.jit, static_argnames=("quant_type", "rows", "cols", "dtype"))
def ggml_dequantize(qweight, quant_type: int, rows: int, cols: int, dtype=jnp.float32):
    """qweight: uint8 [rows, cols//block * bsize] raw ggml data -> [rows, cols]."""
    block, bsize = _BLOCK[quant_type]
    nb = cols // block
    blocks = qweight.reshape(rows, nb, bsize)
    return _DEQ[quant_type](blocks).reshape(rows, cols).astype(dtype)


@functools.partial(jax.jit, static_argnames=("quant_type", "row"))
def ggml_mul_mat_a8(qweight, x, quant_type: int, row: int):
    """x [M, K] @ dequant(W [row, K])^T -> [M, row] (test_gguf.py:118-140)."""
    k = x.shape[-1]
    w = ggml_dequantize(qweight, quant_type, row, k, jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32).astype(x.dtype)


ggml_mul_mat_vec_a8 = ggml_mul_mat_a8  # M == 1 takes the same path on TPU


@functools.partial(jax.jit, static_argnames=("quant_type", "row", "top_k"))
def ggml_moe_a8(x, qweight_experts, topk_ids, quant_type: int, row: int, top_k: int):
    """Grouped GGUF matmul for MoE (test_gguf.py:142-200): x [T, K],
    qweight_experts [E, row, K_packed], topk_ids [T, top_k] ->
    [T*top_k, row] (token-major expansion, reference output layout)."""
    t, k = x.shape
    e = qweight_experts.shape[0]
    w = jax.vmap(lambda qw: ggml_dequantize(qw, quant_type, row, k, jnp.bfloat16))(qweight_experts)
    xe = jnp.repeat(x, top_k, axis=0).astype(jnp.bfloat16)  # [T*top_k, K]
    eid = topk_ids.reshape(-1)
    # contract against the [E, row, K] bank with a per-expert routing mask
    # instead of gathering w[eid] ([T*top_k, row, K] — 64 GiB at serving
    # shapes). One [T*top_k, E, row] einsum then a mask-select keeps the
    # intermediate at activations scale.
    all_out = jnp.einsum("td,end->ten", xe, w, preferred_element_type=jnp.float32)
    out = jnp.take_along_axis(all_out, eid[:, None, None], axis=1)[:, 0]
    return out.astype(x.dtype)


ggml_moe_a8_vec = ggml_moe_a8
