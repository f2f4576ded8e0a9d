"""Rotary position embedding family.

TPU-native equivalents of the reference's RoPE kernels (src/sycl/Rope.cpp,
MRope.cpp, FusedQKRope.cpp, FusedQKNormRope.cpp): plain neox/interleaved
rotary_embedding over a cos-sin cache, multimodal mrope with sections, and
the fused per-head QK-RMSNorm + RoPE over packed QKV (llama3-style scaling
supported through the cache builder).

Layout convention: cos_sin_cache [max_pos, rot_dim] = [cos | sin] halves,
matching the reference cache contract (Rope.cpp). Elementwise — XLA fuses;
pure jnp.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pallas_interpret
from .norm import rmsnorm


def compute_cos_sin_cache(
    rotary_dim: int,
    max_position: int,
    base: float = 10000.0,
    *,
    scaling_factor: float = 1.0,
    low_freq_factor: Optional[float] = None,
    high_freq_factor: Optional[float] = None,
    original_max_position: Optional[int] = None,
    attention_factor: float = 1.0,
    dtype=jnp.float32,
):
    """Build [max_position, rotary_dim] cache = [cos | sin].

    With low/high_freq_factor set, applies llama3-style frequency scaling
    (the reference plumbs the same three factors through
    fused_qk_norm_rope, torch_extension_sycl.cc:398-437).
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    if low_freq_factor is not None:
        # llama3 rope scaling. The wavelength thresholds are defined in
        # terms of the ORIGINAL (pre-extension) context: defaulting to the
        # extended max_position would silently scale the wrong bands.
        assert high_freq_factor is not None, "llama3 scaling needs BOTH freq factors"
        assert original_max_position is not None, (
            "llama3 scaling needs original_max_position (the pre-extension "
            "context, e.g. 8192 for Llama-3) — max_position is the EXTENDED "
            "cache size and would mis-scale every band")
        omax = float(original_max_position)
        low_wl = omax / low_freq_factor
        high_wl = omax / high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (omax / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
        scaled = jnp.where(
            wavelen < high_wl,
            inv_freq,
            jnp.where(wavelen > low_wl, inv_freq / scaling_factor, (1 - smooth) * inv_freq / scaling_factor + smooth * inv_freq),
        )
        inv_freq = scaled
    elif scaling_factor != 1.0:
        inv_freq = inv_freq / scaling_factor
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.concatenate([jnp.cos(freqs) * attention_factor, jnp.sin(freqs) * attention_factor], axis=-1).astype(dtype)


def _rotate(x, cos, sin, interleaved: bool):
    """Apply rotation to the first rot_dim dims of x [..., D].

    cos/sin: [..., rot_dim//2] broadcastable against x's leading dims.
    """
    rot = 2 * cos.shape[-1]
    xr, xp = x[..., :rot], x[..., rot:]
    xf = xr.astype(jnp.float32)
    if interleaved:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    else:
        half = rot // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([out.astype(x.dtype), xp], axis=-1) if xp.shape[-1] else out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("head_size", "is_neox"))
def rotary_embedding(
    positions,
    query,
    key,
    head_size: int,
    cos_sin_cache,
    is_neox: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Apply RoPE to query/key at given positions.

    positions [T]; query [T, Hq*head_size] or [T, Hq, head_size]; key
    likewise. Returns rotated (query, key) with the input shapes.
    Reference: rotary_embedding (Rope.cpp; neox vs interleaved variants).
    """
    rot_dim = cos_sin_cache.shape[-1]
    cs = cos_sin_cache[positions].astype(jnp.float32)  # [T, rot_dim]
    cos, sin = cs[..., : rot_dim // 2], cs[..., rot_dim // 2 :]
    cos = cos[:, None, :]
    sin = sin[:, None, :]

    def apply(x):
        if x is None:
            return None
        shp = x.shape
        xh = x.reshape(shp[0], -1, head_size)
        out = _rotate(xh, cos, sin, interleaved=not is_neox)
        return out.reshape(shp)

    return apply(query), apply(key)


@functools.partial(jax.jit, static_argnames=("head_size", "is_neox", "mrope_sections"))
def mrope_rotary_embedding(
    positions,
    query,
    key,
    head_size: int,
    cos_sin_cache,
    mrope_sections: Tuple[int, ...],
    is_neox: bool = True,
):
    """Multimodal RoPE (MRope.cpp): positions [3, T] (t/h/w channels); the
    rot_dim/2 frequency slots are split into ``mrope_sections`` consuming
    the matching position channel."""
    rot_dim = cos_sin_cache.shape[-1]
    half = rot_dim // 2
    assert sum(mrope_sections) == half
    cs = cos_sin_cache[positions].astype(jnp.float32)  # [3, T, rot_dim]
    cos3, sin3 = cs[..., :half], cs[..., half:]
    idx = []
    for sec_i, sec in enumerate(mrope_sections):
        idx += [sec_i] * sec
    sel = jnp.asarray(idx)
    ar = jnp.arange(half)
    cos = cos3[sel, :, ar].T[:, None, :]  # [T, 1, half]
    sin = sin3[sel, :, ar].T[:, None, :]

    def apply(x):
        if x is None:
            return None
        shp = x.shape
        xh = x.reshape(shp[0], -1, head_size)
        return _rotate(xh, cos, sin, interleaved=not is_neox).reshape(shp)

    return apply(query), apply(key)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads_q", "num_heads_k", "num_heads_v", "head_dim", "is_neox", "eps"),
)
def fused_qk_norm_rope(
    qkv,
    num_heads_q: int,
    num_heads_k: int,
    num_heads_v: int,
    head_dim: int,
    q_weight,
    k_weight,
    positions,
    cos_sin_cache,
    *,
    eps: float = 1e-6,
    is_neox: bool = True,
):
    """Per-head RMSNorm on Q/K + RoPE over packed QKV [T, (Hq+Hk+Hv)*D].

    Functional form of the reference's in-place fused op
    (FusedQKNormRope.cpp; torch_extension_sycl.cc:398-437). Returns the
    updated qkv tensor.
    """
    t = qkv.shape[0]
    nq, nk, nv = num_heads_q, num_heads_k, num_heads_v
    q, k, v = jnp.split(qkv, [nq * head_dim, (nq + nk) * head_dim], axis=-1)
    q = rmsnorm(q.reshape(t, nq, head_dim), q_weight, eps).reshape(t, -1)
    k = rmsnorm(k.reshape(t, nk, head_dim), k_weight, eps).reshape(t, -1)
    q, k = rotary_embedding(positions, q, k, head_dim, cos_sin_cache, is_neox)
    return jnp.concatenate([q, k, v], axis=-1)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_k_norm_rope_mla(
    kv_latent,
    k_pe,
    norm_weight,
    positions,
    cos_sin_cache,
    kv_cache,
    slot_loc,
    *,
    eps: float = 1e-6,
):
    """RMSNorm the latent + RoPE the rope-part and scatter straight into the
    MLA paged cache (reference fused_k_norm_rope_flashmla, FusedQKRope.cpp):
    kv_latent [T, 512]; k_pe [T, 64]; kv_cache [P, page, 576]; slot_loc [T].
    Returns the updated cache."""
    latent = rmsnorm(kv_latent, norm_weight, eps)
    k_pe_rot, _ = rotary_embedding(positions, k_pe[:, None, :], None, k_pe.shape[-1], cos_sin_cache)
    row = jnp.concatenate([latent, k_pe_rot[:, 0]], axis=-1)
    p, page, d = kv_cache.shape
    flat = kv_cache.reshape(p * page, d)
    safe = jnp.where(slot_loc >= 0, slot_loc, p * page)
    return flat.at[safe].set(row.astype(kv_cache.dtype), mode="drop").reshape(kv_cache.shape)


def _rope_decode_qkv_kernel(pos_ref, q_ref, k_ref, v_ref, cache_ref, qo_ref, ko_ref, vo_ref, *, rot):
    _rope_decode_kernel(pos_ref, q_ref, k_ref, cache_ref, qo_ref, ko_ref, rot=rot)
    vo_ref[0] = v_ref[0]


@functools.partial(jax.jit, static_argnames=("num_q", "num_kv", "head_dim"))
def rope_decode_fused_qkv(positions, qkv, cos_sin_cache, *, num_q: int, num_kv: int, head_dim: int):
    """rope_decode_fused taking the UNSPLIT fused-qkv GEMM output
    [B, (num_q + 2*num_kv) * head_dim]: the q/k/v head ranges are read via
    three BlockSpecs over one (trivially reshaped) array, so the decode
    layer runs GEMM -> rope with NO standalone XLA slice kernels between
    the two Pallas calls (~24us per XLA fusion launch on this runtime,
    docs/PERF.md). Returns (q [B, Hq, D] roped, k [B, Hkv, D] roped,
    v [B, Hkv, D])."""
    b = qkv.shape[0]
    nq, nkv, d = num_q, num_kv, head_dim
    assert qkv.shape[1] == (nq + 2 * nkv) * d, (qkv.shape, nq, nkv, d)
    assert nq % nkv == 0  # GQA: k/v head offsets in whole block units
    g = nq // nkv
    rot = cos_sin_cache.shape[-1]
    qkv3 = qkv.reshape(b, nq + 2 * nkv, d)  # contiguous-dims reshape: free
    qo, ko, vo = pl.pallas_call(
        functools.partial(_rope_decode_qkv_kernel, rot=rot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, nq, d), lambda bb, pos: (bb, 0, 0)),
                pl.BlockSpec((1, nkv, d), lambda bb, pos: (bb, g, 0)),
                pl.BlockSpec((1, nkv, d), lambda bb, pos: (bb, g + 1, 0)),
                pl.BlockSpec((1, 1, rot), lambda bb, pos: (pos[bb], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, nq, d), lambda bb, pos: (bb, 0, 0)),
                pl.BlockSpec((1, nkv, d), lambda bb, pos: (bb, 0, 0)),
                pl.BlockSpec((1, nkv, d), lambda bb, pos: (bb, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, nkv, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, nkv, d), qkv.dtype),
        ],
        interpret=pallas_interpret(),
    )(positions.astype(jnp.int32), qkv3, qkv3, qkv3, cos_sin_cache[:, None, :])
    return qo, ko, vo


def _mla_prep_kernel(pos_ref, lid_ref, q_ref, kv_ref, w_ref, cache_ref,
                     qn_ref, qpe_ref, kvrow_ref, *, nope_dim, eps):
    cs = cache_ref[0, 0].astype(jnp.float32)  # [rot]
    rot = cs.shape[0]
    half = rot // 2
    cos = cs[:half][None, :]
    sin = cs[half:][None, :]

    def rotate(x):  # [rows, rot] neox
        xf = x.astype(jnp.float32)
        x1, x2 = xf[:, :half], xf[:, half:]
        return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)

    q = q_ref[0]  # [nh, nope+rot]
    qn_ref[0] = q[:, :nope_dim]
    qpe_ref[0] = rotate(q[:, nope_dim:])
    kv = kv_ref[0]  # [1, lat+rot]
    lat = kv[:, : kv.shape[1] - rot].astype(jnp.float32)
    ms = jnp.mean(lat * lat, axis=-1, keepdims=True)
    latn = (lat * jax.lax.rsqrt(ms + eps)) * w_ref[0].astype(jnp.float32)[None, :]
    kvrow_ref[0] = jnp.concatenate(
        [latn.astype(kvrow_ref.dtype), rotate(kv[:, kv.shape[1] - rot :]).astype(kvrow_ref.dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("nope_dim", "eps"))
def mla_qkv_prep(positions, layer_id, q, kv, kv_norm_w, cos_sin_cache, *,
                 nope_dim: int, eps: float = 1e-6):
    """Fused MLA decode qkv-prep: ONE Pallas call replacing the per-layer
    XLA glue chain (q nope/pe slices, two rotary_embedding fusions, the
    latent rmsnorm's companion slices and the kv_row concat — each a
    standalone XLA kernel between Pallas calls, ~24us/launch on this
    runtime, docs/PERF.md).

    q [T, nh, nope+rot]; kv [T, lat+rot] (wkv_a output); kv_norm_w
    [L, lat] stacked (selected via scalar-prefetched layer_id);
    cos_sin_cache [max_pos, rot]. Returns (q_nope [T, nh, nope],
    q_pe [T, nh, rot] roped, kv_row [T, lat+rot] normed+roped).
    Decode bucket (grid = T rows; use the jnp path for prefill)."""
    t, nh, dq = q.shape
    rot = cos_sin_cache.shape[-1]
    lat = kv.shape[-1] - rot
    assert dq == nope_dim + rot, (dq, nope_dim, rot)
    qn, qpe, kvrow = pl.pallas_call(
        functools.partial(_mla_prep_kernel, nope_dim=nope_dim, eps=eps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, nh, dq), lambda bb, pos, lid: (bb, 0, 0)),
                pl.BlockSpec((1, 1, lat + rot), lambda bb, pos, lid: (bb, 0, 0)),
                pl.BlockSpec((None, 1, lat), lambda bb, pos, lid: (lid[0], 0, 0)),
                pl.BlockSpec((1, 1, rot), lambda bb, pos, lid: (pos[bb], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, nh, nope_dim), lambda bb, pos, lid: (bb, 0, 0)),
                pl.BlockSpec((1, nh, rot), lambda bb, pos, lid: (bb, 0, 0)),
                pl.BlockSpec((1, 1, lat + rot), lambda bb, pos, lid: (bb, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, nh, nope_dim), q.dtype),
            jax.ShapeDtypeStruct((t, nh, rot), q.dtype),
            jax.ShapeDtypeStruct((t, 1, lat + rot), kv.dtype),
        ],
        interpret=pallas_interpret(),
    )(positions.astype(jnp.int32), jnp.asarray(layer_id, jnp.int32).reshape(1),
      q, kv[:, None, :], kv_norm_w[:, None, :], cos_sin_cache[:, None, :])
    return qn, qpe, kvrow[:, 0]


def _rope_decode_kernel(pos_ref, q_ref, k_ref, cache_ref, qo_ref, ko_ref, *, rot):
    b = pl.program_id(0)
    cs = cache_ref[0].astype(jnp.float32)  # [1, rot] block at row pos[b]
    half = rot // 2
    cos = cs[:, :half]
    sin = cs[:, half:]

    def rotate(x):
        xr = x[..., :rot].astype(jnp.float32)
        x1, x2 = xr[..., :half], xr[..., half:]
        o = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        if x.shape[-1] > rot:
            return jnp.concatenate([o.astype(x.dtype), x[..., rot:]], axis=-1)
        return o.astype(x.dtype)

    qo_ref[0] = rotate(q_ref[0])
    ko_ref[0] = rotate(k_ref[0])


@functools.partial(jax.jit, static_argnames=())
def rope_decode_fused(positions, q, k, cos_sin_cache):
    """Single-launch neox RoPE for decode: q [B, Hq, D], k [B, Hkv, D],
    positions [B]. The cos/sin row is fetched per batch element via a
    scalar-prefetched position index (one Pallas call instead of the
    gather + rotate XLA fusion chain — launch costs dominate decode glue
    on this runtime, docs/PERF.md)."""
    b, hq, d = q.shape
    hkv = k.shape[1]
    rot = cos_sin_cache.shape[-1]
    qo, ko = pl.pallas_call(
        functools.partial(_rope_decode_kernel, rot=rot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda bb, pos: (bb, 0, 0)),
                pl.BlockSpec((1, hkv, d), lambda bb, pos: (bb, 0, 0)),
                # [max_pos, 1, rot] so the block's last two dims equal the
                # array dims (Mosaic block rule; a (1, rot) block on the 2D
                # cache is rejected on hardware)
                pl.BlockSpec((1, 1, rot), lambda bb, pos: (pos[bb], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, hq, d), lambda bb, pos: (bb, 0, 0)),
                pl.BlockSpec((1, hkv, d), lambda bb, pos: (bb, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, d), k.dtype),
        ],
        interpret=pallas_interpret(),
    )(positions.astype(jnp.int32), q, k, cos_sin_cache[:, None, :])
    return qo, ko
