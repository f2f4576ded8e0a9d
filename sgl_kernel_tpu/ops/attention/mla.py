"""DeepSeek MLA (multi-head latent attention) kernels.

TPU-native replacement for the reference's MLA stack (src/sycl/mla_decode.cpp,
mla_prefill.cpp, kernels/mla/): attention against a compressed latent KV
cache with the DeepSeek shape contract (python/sgl_kernel/attention.py:77-81):

    D_latent = 512 (kv_c, doubles as V), D_rope = 64, D_ckv = 576
    q = [q_nope (512) | q_pe (64)]  per head;  cache row = [kv_c | k_pe]

Decode is a dedicated Pallas kernel: all H query heads share the single
latent "KV head" (MQA structure), so the heads pack into the matmul M dim
and each 576-wide cache row is read ONCE from HBM and used as both K and V
— the bandwidth saving that motivates MLA. The page table is scalar-
prefetched exactly like ops/attention/paged_decode.

Prefill reuses the flash kernel: latent treated as a 1-head MQA KV with V
zero-padded from 512 to 576 lanes (sliced back after) — the padding costs
~12% MXU on a compute-bound path, zero extra HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up
from .flash_prefill import flash_attention
from .paged_decode_dma import _upcast

D_LATENT = 512
D_ROPE = 64
D_CKV = 576
# 640-lane padded pool (576 data + 64 zero lanes = 5x128): every DMA slice
# is lane-aligned, so the manual-DMA engine streams TYPED rows directly —
# no u8-view byte-pair decode (the round-4 toolchain blocker: Mosaic
# rejects both DMA slices of 576-lane memrefs and bitwidth-changing
# bitcasts of the u8 view; probed 2026-08-20, benchmark/probe_mla640.py
# confirms the 640 form lowers). Costs 11% extra pool bytes; serving
# opts in per model (DeepseekConfig.latent_pad).
D_CKV_PAD = 640

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _decode_kernel(
    lens_ref,
    pt_ref,
    q_ref,  # [1, Hp, D_CKV]
    kv_ref,  # [1, page, D_CKV]
    o_ref,  # [1, Hp, D_LATENT]
    lse_ref,  # [1, 8, Hp] or None
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    page: int,
    n_blocks: int,
    has_lse: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    length = lens_ref[b]

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(i * page < length)
    def _body():
        q = q_ref[0]  # [Hp, D_CKV]
        kv = _upcast(kv_ref[0], q.dtype)  # [page, D_CKV]; fp8 pools upcast
        # via the integer-bitcast fast path (Mosaic's native f8 convert is
        # scalar-slow — paged_decode_dma._upcast)
        s = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale  # [Hp, page]
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * page
        s = jnp.where(pos < length, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = kv[:, :D_LATENT]  # latent doubles as V — no second HBM read
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(i == n_blocks - 1)
    def _fin():
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if has_lse:
            lse = ((m + jnp.log(jnp.maximum(l, 1e-38))) * LOG2E)[:, 0]
            lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


_DMA_DECODE_FORM = "A"  # byte-pair decode form; see _rows_from_bytes


def _rows_from_bytes(raw, dtype, d):
    """u8-view buffer rows -> typed rows: raw [..., d*itemsize] u8.

    Manual DMA cannot slice a 576-lane memref (Mosaic: "slice shape along
    dim 3 must be aligned to tiling (128)"), so the pool is streamed
    through its uint8 VIEW — 1152 lanes for bf16 (9x128, aligned), 2304
    for f32 — and the byte groups fold back to the element dtype here.
    Form A: lax.bitcast collapse of the [.., itemsize] minor dim.
    Form B: i32 widen + shift-or (the blockwise_fp8 pair-decode shape)."""
    it = jnp.dtype(dtype).itemsize
    wide_t = {2: jnp.uint16, 4: jnp.uint32}[it]
    grp = raw.reshape(*raw.shape[:-1], d, it)
    if _DMA_DECODE_FORM == "A":
        wide = jax.lax.bitcast_convert_type(grp, wide_t)
    else:
        u = grp.astype(jnp.int32)
        wide = u[..., 0]
        for byte in range(1, it):
            wide = wide | (u[..., byte] << (8 * byte))
        wide = wide.astype(wide_t)
    return jax.lax.bitcast_convert_type(wide, dtype)


def _dma_kernel(
    lens_ref,   # [B] scalar prefetch
    pt_ref,     # [B, n_blocks] scalar prefetch
    layer_ref,  # [1] scalar prefetch
    q_ref,      # [bb, gp, 576] VMEM
    kv_hbm,     # ANY [L, P, page, 576*itemsize] uint8 view
    o_ref,      # [bb, 1, gp, 512]
    lse_ref,    # [bb, 1, 8, gp] or None
    kb,         # VMEM [2, cpp, page, 576*itemsize] u8
    sem,        # DMA sems [2]
    m_scr, l_scr,  # VMEM [bb, gp, 128] f32
    acc_scr,       # VMEM [bb, gp, 512] f32
    *,
    sm_scale: float,
    page: int,
    cpp: int,
    n_chunks: int,
    gp: int,
    bb: int,
    batch: int,
    has_lse: bool,
    kv_dtype,
    dck: int = D_CKV,
    typed: bool = False,
):
    """MLA decode on the manual-DMA engine (paged_decode_dma's design
    applied to the latent cache): many sequences fold into one grid step
    and their pages stream through a double-buffered VMEM window with
    explicit DMAs, buffer parity carried across sequence boundaries. MLA's
    MQA structure makes this STRICTLY cheaper than the GQA engine — the
    576-wide latent row is both K and V, so there is ONE pool buffer and
    half the DMA traffic. Replaces the BlockSpec-pipelined form that
    measured 224-280 GB/s vs the engine's ~850 (benchmark/ab_mla_decode.py,
    2026-08-20). The pool rides as its uint8 view (_rows_from_bytes)."""
    blk = pl.program_id(0)
    span = page * cpp
    lid = layer_ref[0]

    def seq_of(t):
        return t // n_chunks

    def chunk_of(t):
        return jax.lax.rem(t, n_chunks)

    def length_of(i_local):
        bg = jnp.minimum(blk * bb + i_local, batch - 1)
        return lens_ref[bg]

    def valid(t):
        in_batch = (blk * bb + seq_of(t)) < batch
        return jnp.logical_and(in_batch, chunk_of(t) * span < length_of(seq_of(t)))

    def dmas(t, slot):
        i, c = seq_of(t), chunk_of(t)
        bg = jnp.minimum(blk * bb + i, batch - 1)
        return [
            pltpu.make_async_copy(
                kv_hbm.at[lid, pt_ref[bg, c * cpp + j]], kb.at[slot, j], sem.at[slot])
            for j in range(cpp)
        ]

    def start(t, slot):
        for d in dmas(t, slot):
            d.start()

    def wait(t, slot):
        for d in dmas(t, slot):
            d.wait()

    m_scr[...] = jnp.full_like(m_scr, -1e30)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    T = bb * n_chunks

    @pl.when(valid(0))
    def _warm():
        start(0, 0)

    def compute(t, slot):
        i, c = seq_of(t), chunk_of(t)
        q = q_ref[i]  # [gp, dck]
        if typed:
            # lane-aligned pool: rows arrive typed; fp8 pools ride the
            # bitcast fast-path upcast (Mosaic's native f8 convert is
            # scalar-slow — paged_decode_dma._upcast)
            kv = _upcast(kb[slot].reshape(span, dck), q.dtype)
        else:
            it = jnp.dtype(kv_dtype).itemsize
            kv = _rows_from_bytes(kb[slot].reshape(span, dck * it),
                                  kv_dtype, dck).astype(q.dtype)
        sc = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = sc * sm_scale
        pos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1) + c * span
        sc = jnp.where(pos < length_of(i), sc, DEFAULT_MASK_VALUE)

        m_prev = m_scr[i, :, :1]
        l_prev = l_scr[i, :, :1]
        m_curr = jnp.max(sc, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(sc - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[i, :, :] = jnp.broadcast_to(m_next, (gp, 128))
        l_scr[i, :, :] = jnp.broadcast_to(l_next, (gp, 128))
        v = kv[:, :D_LATENT]  # latent doubles as V — no second read
        acc_scr[i, :, :] = acc_scr[i, :, :] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    def body(t, carry):
        m_issued, w_done = carry

        @pl.when(jnp.logical_and(t + 1 < T, valid(t + 1)))
        def _next():
            start(t + 1, jax.lax.rem(m_issued, 2))
        m_issued = m_issued + jnp.where(jnp.logical_and(t + 1 < T, valid(t + 1)), 1, 0)

        @pl.when(valid(t))
        def _this():
            slot = jax.lax.rem(w_done, 2)
            wait(t, slot)
            compute(t, slot)
        w_done = w_done + jnp.where(valid(t), 1, 0)
        return (m_issued, w_done)

    jax.lax.fori_loop(0, T, body, (jnp.where(valid(0), 1, 0), 0))

    for i in range(bb):
        m = m_scr[i, :, :1]
        l = l_scr[i, :, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[i, 0] = (acc_scr[i] * l_inv).astype(o_ref.dtype)
        if has_lse:
            lse = ((m + jnp.log(jnp.maximum(l, 1e-38))) * LOG2E)[:, 0]
            lse = jnp.where(l[:, 0] == 0.0, -jnp.inf, lse)
            lse_ref[i, 0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[2:])


def _dma_entry(lens_ref, pt_ref, layer_ref, *refs, has_lse, **kw):
    q_ref, kv_hbm, o_ref = refs[0], refs[1], refs[2]
    lse_ref = refs[3] if has_lse else None
    scr = refs[4 if has_lse else 3 :]
    _dma_kernel(lens_ref, pt_ref, layer_ref, q_ref, kv_hbm, o_ref, lse_ref,
                *scr, has_lse=has_lse, **kw)


def _mla_decode_dma(q, kv_cache, lengths, page_table, layer_id, *,
                    sm_scale: float, return_lse: bool, chunk_pages: int = 8):
    """DMA-engine body for mla_decode: q [B, gp-padded H, 576] pre-padded,
    kv_cache [L, P, page, 576] (layer-stacked; callers without stacking
    pass L=1 + layer 0). Requires itemsize >= 2 (the u8 view of a 1-byte
    pool is 576 lanes — unaligned for manual DMA; those pools take the
    BlockSpec engine, see mla_decode)."""
    b, gp, _ = q.shape
    nl, n_pages, page, dck = kv_cache.shape
    it = kv_cache.dtype.itemsize
    typed = dck % 128 == 0
    if typed:
        # lane-aligned (padded) pool: DMA slices of the typed memref are
        # legal — stream rows directly, no u8 view / byte-pair decode
        kv_view = kv_cache
    else:
        kv_view = jax.lax.bitcast_convert_type(kv_cache, jnp.uint8).reshape(
            nl, n_pages, page, dck * it)
    n_blocks = page_table.shape[1]
    cpp = min(chunk_pages, n_blocks, max(1, 1024 // page))
    if n_blocks % cpp:
        pad = cpp - n_blocks % cpp
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        n_blocks += pad
    n_chunks = n_blocks // cpp
    # VMEM budget: acc (gp x 512 f32) dominates per folded sequence
    bb = min(b, 32, max(1, 2048 // gp))

    out_shapes = [jax.ShapeDtypeStruct((b, 1, gp, D_LATENT), q.dtype)]
    out_specs = [pl.BlockSpec((bb, 1, gp, D_LATENT), lambda blk, lens, pt, lid: (blk, 0, 0, 0))]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, 8, gp), jnp.float32))
        out_specs.append(pl.BlockSpec((bb, 1, 8, gp), lambda blk, lens, pt, lid: (blk, 0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _dma_entry, sm_scale=sm_scale, page=page, cpp=cpp,
            n_chunks=n_chunks, gp=gp, bb=bb, batch=b, has_lse=return_lse,
            kv_dtype=kv_cache.dtype, dck=dck, typed=typed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cdiv(b, bb),),
            in_specs=[
                pl.BlockSpec((bb, gp, dck), lambda blk, lens, pt, lid: (blk, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                (pltpu.VMEM((2, cpp, page, dck), kv_cache.dtype) if typed
                 else pltpu.VMEM((2, cpp, page, dck * it), jnp.uint8)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((bb, gp, 128), jnp.float32),
                pltpu.VMEM((bb, gp, 128), jnp.float32),
                pltpu.VMEM((bb, gp, D_LATENT), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gp * n_blocks * page * (D_CKV + D_LATENT),
            bytes_accessed=b * n_blocks * page * dck * kv_cache.dtype.itemsize,
            transcendentals=b * gp * n_blocks * page,
        ),
        interpret=pallas_interpret(),
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32),
      jnp.asarray(layer_id, jnp.int32).reshape(1), q, kv_view)
    if return_lse:
        return outs[0][:, 0], outs[1][:, 0, 0]
    return outs[0][:, 0], None


def _decode_entry(lens_ref, pt_ref, *refs, sm_scale, page, n_blocks, has_lse, has_lid=False):
    if has_lid:
        refs = refs[1:]  # layer-id scalar ref consumed by the BlockSpecs
    q_ref, kv_ref = refs[0], refs[1]
    refs = refs[2:]
    o_ref = refs[0]
    lse_ref = refs[1] if has_lse else None
    scr = refs[2 if has_lse else 1 :]
    _decode_kernel(
        lens_ref, pt_ref, q_ref, kv_ref, o_ref, lse_ref, *scr,
        sm_scale=sm_scale, page=page, n_blocks=n_blocks, has_lse=has_lse,
    )


@functools.partial(jax.jit, static_argnames=("sm_scale", "return_lse", "num_splits", "engine"))
def mla_decode(
    q_nope,
    q_pe,
    kv_cache,
    lengths,
    page_table,
    layer_id=None,
    *,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    num_splits: int = 1,
    engine: str = "blockspec",
):
    """MLA paged decode (flash_mla_decode semantics, attention.py:54-132).

    q_nope: [B, H, 512] (already projected into latent space);
    q_pe: [B, H, 64]; kv_cache: [P, page, 576] = [kv_c | k_pe] — or the
    layer-stacked pool [L, P, page, 576] with a traced ``layer_id``
    (scalar-prefetched; avoids the scan-body dynamic-slice cache copy,
    see models/llama.py decode_layers); lengths [B]; page_table
    [B, max_pages]. Returns out [B, H, 512] (+ base-2 lse [B, H]).

    num_splits > 1 splits the KV range into contiguous chunks processed
    as independent grid rows and combines with merge_states — the
    reference's MLA split-decode (mla_decode.cpp:24-31 tuned tables,
    xe_reduce_split_k analogue). Worth it at small B x long ctx on
    multi-core chips; single-core chips prefer 1 (docs/PERF.md).
    """
    if num_splits > 1:
        from .merge_state import merge_states

        b, h, _ = q_nope.shape
        nb = page_table.shape[1]
        s = num_splits
        bps = -(-nb // s)  # blocks per split
        if bps * s != nb:
            page_table = jnp.pad(page_table, ((0, 0), (0, bps * s - nb)))
        # each (seq, split) becomes an independent pseudo-sequence over its
        # chunk of pages with a split-local length
        pt_s = page_table.reshape(b, s, bps).reshape(b * s, bps)
        page = kv_cache.shape[-2]
        local = lengths.astype(jnp.int32)[:, None] - jnp.arange(s, dtype=jnp.int32)[None, :] * bps * page
        len_s = jnp.clip(local, 0, bps * page).reshape(b * s)
        rep = lambda x: jnp.repeat(x, s, axis=0)
        o, lse = mla_decode(
            rep(q_nope), rep(q_pe), kv_cache, len_s, pt_s, layer_id,
            sm_scale=sm_scale, return_lse=True, num_splits=1, engine=engine,
        )
        o_st = o.reshape(b, s, h, D_LATENT).swapaxes(0, 1)  # [S, B, H, D]
        l_st = lse.reshape(b, s, h).swapaxes(0, 1)
        om, lm = merge_states(o_st, l_st)
        return (om, lm) if return_lse else om
    b, h, _ = q_nope.shape
    stacked = layer_id is not None
    n_pages, page, dck = kv_cache.shape[-3:]
    assert dck in (D_CKV, D_CKV_PAD) and q_nope.shape[2] == D_LATENT and q_pe.shape[2] == D_ROPE
    hp = round_up(h, 8)
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (D_CKV**0.5)
    n_blocks = page_table.shape[1]

    q = jnp.concatenate([q_nope, q_pe], axis=-1)  # [B, H, 576]
    if dck == D_CKV_PAD:
        # padded pool: zero q lanes 576..640 contribute nothing to the dot
        q = jnp.pad(q, ((0, 0), (0, 0), (0, D_CKV_PAD - D_CKV)))
    if hp != h:
        q = jnp.pad(q, ((0, 0), (0, hp - h), (0, 0)))

    # The manual-DMA engine is gated OFF by default: Mosaic rejects DMA
    # slices of a 576-lane memref ("slice shape along dim 3 must be
    # aligned to tiling (128)") and every byte-pair decode of a legal u8
    # view fails lowering ("changing bitwidths not supported") — probed
    # on-chip 2026-08-20. The production fix is BIG PAGES: the BlockSpec
    # pipeline is per-step-overhead-bound (224-280 GB/s at page=128), and
    # page=1024/2048 amortizes it with zero kernel changes (Pallas
    # pipelined copies handle 576 lanes fine). mla_decode is page-size
    # agnostic; serving configures the MLA pool page size.
    if engine == "dma" and (kv_cache.dtype.itemsize >= 2 or dck == D_CKV_PAD):
        cache4 = kv_cache if stacked else kv_cache[None]
        out, lse = _mla_decode_dma(
            q, cache4, lengths, page_table,
            layer_id if stacked else jnp.zeros((1,), jnp.int32),
            sm_scale=sm_scale, return_lse=return_lse)
        out = out[:, :h]
        if return_lse:
            return out, lse[:, :h]
        return out

    out_shapes = [jax.ShapeDtypeStruct((b, hp, D_LATENT), q_nope.dtype)]
    if stacked:
        out_specs = [pl.BlockSpec((1, hp, D_LATENT), lambda bb, i, lens, pt, lid: (bb, 0, 0))]
        if return_lse:
            out_shapes.append(jax.ShapeDtypeStruct((b, 8, hp), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 8, hp), lambda bb, i, lens, pt, lid: (bb, 0, 0)))
    else:
        out_specs = [pl.BlockSpec((1, hp, D_LATENT), lambda bb, i, lens, pt: (bb, 0, 0))]
        if return_lse:
            out_shapes.append(jax.ShapeDtypeStruct((b, 8, hp), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 8, hp), lambda bb, i, lens, pt: (bb, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _decode_entry, sm_scale=sm_scale, page=page, n_blocks=n_blocks,
            has_lse=return_lse, has_lid=stacked,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3 if stacked else 2,
            grid=(b, n_blocks),
            in_specs=(
                [
                    pl.BlockSpec((1, hp, dck), lambda bb, i, lens, pt, lid: (bb, 0, 0)),
                    pl.BlockSpec((None, 1, page, dck), lambda bb, i, lens, pt, lid: (lid[0], pt[bb, i], 0, 0)),
                ]
                if stacked
                else [
                    pl.BlockSpec((1, hp, dck), lambda bb, i, lens, pt: (bb, 0, 0)),
                    pl.BlockSpec((1, page, dck), lambda bb, i, lens, pt: (pt[bb, i], 0, 0)),
                ]
            ),
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.VMEM((hp, D_LATENT), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n_blocks * page * (D_CKV + D_LATENT),
            bytes_accessed=b * n_blocks * page * D_CKV * kv_cache.dtype.itemsize,
            transcendentals=b * h * n_blocks * page,
        ),
        interpret=pallas_interpret(),
    )(*([lengths.astype(jnp.int32), page_table.astype(jnp.int32)]
        + ([jnp.asarray(layer_id, jnp.int32).reshape(1)] if stacked else [])),
      q, kv_cache)

    out = outs[0][:, :h]
    if return_lse:
        return out, outs[1][:, 0, :h]
    return out


@functools.partial(jax.jit, static_argnames=("sm_scale", "causal", "return_lse"))
def mla_prefill(
    q_nope,
    q_pe,
    kv,
    q_lens=None,
    kv_lens=None,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = True,
    q_start=None,
    kv_start=None,
    return_lse: bool = False,
):
    """MLA ragged prefill (flash_mla_prefill semantics).

    q_nope [B, S, H, 512], q_pe [B, S, H, 64], kv [B, Skv, 576] (the
    latent sequence, pre-cache layout). Returns [B, S, H, 512] — or
    (out, lse [B, H, S] base-2) with ``return_lse`` for merge_state combining
    (the chunked-extend two-pass path, models/deepseek.prefill_extend).
    ``q_start``/``kv_start`` offset the causal mask for suffix chunks
    whose prefix KV lives elsewhere (flash_attention's contract).
    """
    b, s, h, _ = q_nope.shape
    skv = kv.shape[1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (D_CKV**0.5)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)  # [B, S, H, 576]
    k = kv[:, :, None, :]  # 1-head MQA
    v = jnp.pad(kv[:, :, None, :D_LATENT], ((0, 0), (0, 0), (0, 0), (0, D_ROPE)))
    out = flash_attention(
        q, k.astype(q.dtype), v.astype(q.dtype), q_lens, kv_lens,
        causal=causal, sm_scale=sm_scale,
        q_start=q_start, kv_start=kv_start, return_lse=return_lse,
    )
    if return_lse:
        o, lse = out
        return o[..., :D_LATENT], lse
    return out[..., :D_LATENT]
