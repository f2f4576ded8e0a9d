"""Paged-KV decode attention with manual multi-page DMA (Pallas TPU).

Round-2 rewrite of the decode path (reference analog:
src/sycl/flash_attention.cpp decode::mha_fwd + the split-KV heuristic at
:430-476 and xe_reduce_split_k.hpp). The round-1 kernel pipelined one
BlockSpec page pair per grid step and paid ~1 µs of fixed cost per step
(480 GB/s KV read vs the 730 GB/s stream peak). This kernel instead folds
MANY sequences into one grid step and streams their KV through a
double-buffered VMEM window with explicitly issued page DMAs; buffer
parity is carried across sequence boundaries, so the DMA pipeline never
drains between sequences (the measured failure mode of a per-sequence
grid: 488 -> ~700 GB/s at B=16, ctx=1024).

Two pool layouts:
  - "head"  [L, Hkv, P, page, D]: one DMA per (head, page) (16 KB blocks)
  - "page"  [L, P, Hkv, page, D]: one DMA per page covering all KV heads
    (Hkv*page*D contiguous, 128 KB at Llama-8B shapes) — measured faster.

Split-KV: grid (1, num_splits); each split owns a contiguous chunk range
of every sequence, produces partial (o, lse), and the caller combines
with merge_states — for small-batch long-context decode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up
from .merge_state import merge_states

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _upcast(x, dtype):
    """fp8 pages -> compute dtype via integer bitcast (the w4a16 nibble
    trick applied to fp8): Mosaic's native f8 convert is scalar-slow
    (measured 0.50 ms vs 0.08 ms bf16 at the headline decode shape), but
    shift+or on uint16 vectorizes. e4m3fn: place s|e|m in the bf16 field
    positions, then one multiply by 2^(127-7) rebiases the exponent.
    Exact for normals. Known fast-path deviations (deliberate — fixing
    them costs VPU selects on the bandwidth-critical tile): e4m3
    DENORMALS (|x| <= 0.875 * 2^-6 ~= 0.0137) flush to zero where the
    intermediate bf16 is denormal-flushed, and the NaN encodings
    0x7f/0xff decode to +-480 instead of NaN (a poisoned page contributes
    a large finite logit rather than propagating NaN). e5m2 uses the same
    rebias scheme (the exact bit-upper-half-of-f16 shift form dies on
    Mosaic: f16 vector casts fail "Invalid vector register cast"), so its
    6 SUBNORMAL encodings (|x| <= 0.75 * 2^-14) flush to zero and
    inf/nan decode to large finite values — same deviation policy."""
    if x.dtype == jnp.float8_e4m3fn:
        # shifts on i32 (i16 vector shli does not legalize on Mosaic)
        u32 = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        h = (((u32 & 0x80) << 8) | ((u32 & 0x7F) << 4)).astype(jnp.uint16)
        return (jax.lax.bitcast_convert_type(h, jnp.bfloat16) * jnp.bfloat16(2.0 ** 120)).astype(dtype)
    if x.dtype == jnp.float8_e5m2:
        # same rebias scheme as e4m3 but with the 5-bit exponent field at
        # bf16 bit 5 and rebias 2^(127-15). (The "pure shift into f16"
        # form is dead on this Mosaic: f16 vector casts fail with
        # "Invalid vector register cast", measured 2026-08-19.)
        u32 = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        h = (((u32 & 0x80) << 8) | ((u32 & 0x7F) << 5)).astype(jnp.uint16)
        return (jax.lax.bitcast_convert_type(h, jnp.bfloat16) * jnp.bfloat16(2.0 ** 112)).astype(dtype)
    return x.astype(dtype)


def _kernel(
    lens_ref,   # [B] scalar prefetch
    pt_ref,     # [B, n_blocks] scalar prefetch page table
    layer_ref,  # [1] scalar prefetch layer id
    q_ref,      # [bb, Hkv, Gp, D] VMEM
    k_hbm,      # ANY: [L, Hkv, P, page, D] ("head") or [L, P, Hkv, page, D] ("page")
    v_hbm,
    fk_ref,     # [bb, Hkv, 1, D] or None
    fv_ref,
    sink_ref,   # [1, Hkv, Gp] or None
    o_ref,      # [bb, 1, Hkv, Gp, D]
    lse_ref,    # [bb, 1, 8, Hkv*Gp] or None
    kb, vb,     # VMEM [2, Hkv, span, D]
    sem,        # DMA sems (2, 2)
    m_scr, l_scr,  # VMEM [bb, Hkv*Gp, 128] f32
    acc_scr,       # VMEM [bb, Hkv*Gp, D] f32
    *,
    sm_scale: float,
    window: Optional[int],
    soft_cap: Optional[float],
    page: int,
    cpp: int,            # pages per chunk
    chunks_per_split: int,
    num_splits: int,
    hkv: int,
    gp: int,
    bb: int,             # sequences folded per grid step
    batch: int,
    layout: str,
    has_fresh: bool,
    has_sink: bool,
    has_lse: bool,
):
    blk = pl.program_id(0)
    s = pl.program_id(1) if num_splits > 1 else 0
    span = page * cpp
    lid = layer_ref[0]
    c0 = s * chunks_per_split

    def seq_of(t):
        return t // chunks_per_split  # local seq index within the block

    def chunk_of(t):
        return jax.lax.rem(t, chunks_per_split)

    def pool_limit(i_local):
        bg = blk * bb + i_local
        bg = jnp.minimum(bg, batch - 1)
        length = lens_ref[bg]
        return length - 1 if has_fresh else length

    def valid(t):
        # chunk t (flattened (seq, chunk)) has any in-range KV?
        i = seq_of(t)
        c = chunk_of(t)
        in_batch = (blk * bb + i) < batch
        ok = jnp.logical_and(in_batch, (c0 + c) * span < pool_limit(i))
        if window is not None:
            # sliding window: chunks entirely below the window are fully
            # masked — skip their DMA + compute (long-ctx windowed layers
            # would otherwise stream ~ctx/window x the needed KV)
            length = pool_limit(i) + (1 if has_fresh else 0)
            ok = jnp.logical_and(ok, (c0 + c + 1) * span > length - 1 - window)
        return ok

    def dmas(t, slot):
        """DMA descriptors for flattened chunk t into buffer `slot`."""
        i = seq_of(t)
        c = c0 + chunk_of(t)
        bg = jnp.minimum(blk * bb + i, batch - 1)
        out = []
        for j in range(cpp):
            pid = pt_ref[bg, c * cpp + j]
            if layout == "head":
                for h in range(hkv):
                    out.append(pltpu.make_async_copy(
                        k_hbm.at[lid, h, pid], kb.at[slot, h, pl.ds(j * page, page)], sem.at[slot, 0]))
                    out.append(pltpu.make_async_copy(
                        v_hbm.at[lid, h, pid], vb.at[slot, h, pl.ds(j * page, page)], sem.at[slot, 1]))
            else:
                # buffer is chunk-major [2, cpp, Hkv, page, D]: src page
                # [Hkv, page, D] and dst slot j are BOTH contiguous — one
                # stride-free DMA per page
                out.append(pltpu.make_async_copy(
                    k_hbm.at[lid, pid], kb.at[slot, j], sem.at[slot, 0]))
                out.append(pltpu.make_async_copy(
                    v_hbm.at[lid, pid], vb.at[slot, j], sem.at[slot, 1]))
        return out

    def start(t, slot):
        for d in dmas(t, slot):
            d.start()

    def wait(t, slot):
        for d in dmas(t, slot):
            d.wait()

    m_scr[...] = jnp.full_like(m_scr, -1e30)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    T = bb * chunks_per_split

    @pl.when(valid(0))
    def _warm():
        start(0, 0)

    def compute(t, slot):
        i = seq_of(t)
        c = c0 + chunk_of(t)
        limit = pool_limit(i)
        length = limit + (1 if has_fresh else 0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (gp, span), 1) + c * span
        mask = pos < limit
        if window is not None:
            mask = jnp.logical_and(mask, pos > length - 1 - window)
        for h in range(hkv):
            sl = slice(h * gp, (h + 1) * gp)
            q = q_ref[i, h]                       # [Gp, D]
            if layout == "head":
                k = _upcast(kb[slot, h], q.dtype)  # [span, D]
            else:
                # chunk-major buffer [cpp, Hkv, page, D]: collapse the head
                # slice to [span, D] (Mosaic's tpu.matmul can't contract the
                # (cpp, page) pair directly)
                k = _upcast(kb[slot, :, h].reshape(span, -1), q.dtype)
            sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = sc * sm_scale
            if soft_cap is not None:
                sc = soft_cap * jnp.tanh(sc / soft_cap)
            sc = jnp.where(mask, sc, DEFAULT_MASK_VALUE)

            m_prev = m_scr[i, sl, :1]
            l_prev = l_scr[i, sl, :1]
            m_curr = jnp.max(sc, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(sc - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[i, sl, :] = jnp.broadcast_to(m_next, (gp, 128))
            l_scr[i, sl, :] = jnp.broadcast_to(l_next, (gp, 128))
            if layout == "head":
                v = _upcast(vb[slot, h], q.dtype)
            else:
                v = _upcast(vb[slot, :, h].reshape(span, -1), q.dtype)
            pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            acc_scr[i, sl, :] = acc_scr[i, sl, :] * alpha + pv

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

    init_issued = jnp.where(valid(0), 1, 0)
    jax.lax.fori_loop(0, T, body, (init_issued, 0))

    # finalize every sequence in this block
    for i in range(bb):
        m = m_scr[i, :, :1]
        l = l_scr[i, :, :1]
        acc = acc_scr[i]
        if has_fresh:
            # per-head parts concatenated (NOT .at[slice].set — a full-slice
            # scatter carries an empty i32[0] index constant that Pallas
            # rejects at hkv=1, and scatters are slower anyway)
            last_split = (s == num_splits - 1) if num_splits > 1 else True
            m_parts, l_parts, acc_parts = [], [], []
            for h in range(hkv):
                sl = slice(h * gp, (h + 1) * gp)
                q = q_ref[i, h]
                kf = fk_ref[i, h].astype(jnp.float32)   # [1, D]
                sf = jnp.sum(q.astype(jnp.float32) * kf, axis=1, keepdims=True) * sm_scale
                if soft_cap is not None:
                    sf = soft_cap * jnp.tanh(sf / soft_cap)
                if num_splits > 1:
                    sf = jnp.where(last_split, sf, -1e30)
                m_prev, l_prev = m[sl], l[sl]
                m_next = jnp.maximum(m_prev, sf)
                alpha = jnp.exp(m_prev - m_next)
                pf = jnp.exp(sf - m_next)
                vf = fv_ref[i, h].astype(jnp.float32)
                m_parts.append(m_next)
                l_parts.append(alpha * l_prev + pf)
                acc_parts.append(acc[sl] * alpha + pf * vf)
            m = m_parts[0] if hkv == 1 else jnp.concatenate(m_parts, axis=0)
            l = l_parts[0] if hkv == 1 else jnp.concatenate(l_parts, axis=0)
            acc = acc_parts[0] if hkv == 1 else jnp.concatenate(acc_parts, axis=0)
        if has_sink:
            add = jnp.exp(sink_ref[0].reshape(-1, 1) - m)
            if num_splits > 1:
                add = jnp.where(s == num_splits - 1, add, 0.0)
            l = l + add
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[i, 0] = (acc * l_inv).reshape(hkv, gp, -1).astype(o_ref.dtype)
        if has_lse:
            lse = ((m + jnp.log(jnp.maximum(l, 1e-38))) * LOG2E)[:, 0]
            lse = jnp.where(l[:, 0] == 0.0, -jnp.inf, lse)
            lse_ref[i, 0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[2:])


def choose_num_splits(batch: int, max_context: int, page: int, chunk_pages: int,
                      num_cores: int = 1) -> int:
    """Split-KV heuristic (reference flash_attention.cpp:430-460 analog).

    The reference splits KV to fill idle compute units at small batch.
    Here the folded-batch flat chunk loop keeps ONE core's DMA pipeline
    full at any batch (measured: B=1 ctx=8k runs at 922 GB/s unsplit vs
    505 GB/s with 4 splits — the combine costs, the split buys nothing on
    a single-TensorCore chip). Splits only pay when the part has multiple
    cores to spread the (B, split) grid over."""
    if num_cores <= 1 or batch >= num_cores:
        return 1
    n_chunks = cdiv(max_context, page * chunk_pages)
    return max(1, min(num_cores // batch, n_chunks // 2))


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "sliding_window", "logit_soft_cap", "return_lse",
                     "chunk_pages", "num_splits", "layout"),
)
def paged_attention_decode_dma(
    q,
    k_pages,
    v_pages,
    lengths,
    page_table,
    sinks=None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    layer_id=None,
    fresh_k=None,
    fresh_v=None,
    *,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    logit_soft_cap: Optional[float] = None,
    return_lse: bool = False,
    chunk_pages: int = 16,
    num_splits: int = 1,
    layout: str = "page",
):
    """Decode attention over a paged KV cache (manual-DMA engine).

    Same contract as paged_attention_decode (q [B, Hq, D]; pools
    layer-stacked or not; lengths include the current token), plus:
      chunk_pages: pages streamed per double-buffer refill
      num_splits:  KV-split factor; partials combined via merge_states
      layout: "page" = [L, P, Hkv, page, D] (default, contiguous page DMA);
              "head" = [L, Hkv, P, page, D]
    """
    b, hq, d = q.shape
    if d % 128 and not pallas_interpret():
        # manual DMA cannot slice sub-128-lane rows ON REAL TPU (Mosaic:
        # "slice shape along dimension 4 must be aligned to tiling (128)",
        # hit at head_dim=64 in the round-4 regen) — gather the used pages
        # via XLA and run the flash kernel, whose full-extent blocks are
        # legal at any head dim. ~2x the optimal KV traffic; small-head
        # models carry half-size KV rows so the absolute cost is modest.
        # Interpret mode (CPU tests) keeps the DMA kernel: no Mosaic.
        return _decode_gather_fallback(
            q, k_pages, v_pages, lengths, page_table, sinks, k_scale,
            v_scale, layer_id, fresh_k, fresh_v, sm_scale=sm_scale,
            sliding_window=sliding_window, logit_soft_cap=logit_soft_cap,
            return_lse=return_lse, layout=layout)
    if k_pages.ndim == 4:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
    if layer_id is None:
        layer_id = jnp.zeros((1,), jnp.int32)
    else:
        layer_id = jnp.asarray(layer_id, jnp.int32).reshape(1)
    if layout == "head":
        _, hkv, n_pages, page, _ = k_pages.shape
    else:
        _, n_pages, hkv, page, _ = k_pages.shape
    assert hq % hkv == 0
    group = hq // hkv
    gp = round_up(group, 8)
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    n_blocks = page_table.shape[1]
    if n_blocks == 0:
        # nothing in the pool yet (e.g. first spec-decode step: all context
        # rides fresh_k/v) — keep one padded block; valid() masks it out
        page_table = jnp.zeros((b, 1), jnp.int32)
        n_blocks = 1
    # cap the streamed span so the double buffers stay within a VMEM
    # budget independent of page size AND head count: the budget is
    # ~4 MB per K/V buffer (8 KV heads x 1024 tokens at Llama-8B dims);
    # hkv=32 pools with the flat 1024-token cap allocated 2x16.8 MB and
    # OOM'd the 16 MB scoped limit on-chip (round-4 regen)
    span_tokens = max(page, 1024 * 8 // max(hkv, 1))
    cpp = min(chunk_pages, n_blocks, max(1, span_tokens // page))
    if n_blocks % cpp:
        pad = cpp - n_blocks % cpp
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        n_blocks += pad
    n_chunks = n_blocks // cpp
    num_splits = min(num_splits, n_chunks)
    chunks_per_split = cdiv(n_chunks, num_splits)
    span = page * cpp
    # fold at most 32 sequences per grid step: the per-block scratch
    # (q/m/l/acc/out rows) scales with bb x hkv and b=64 (and hkv=32 MHA
    # at bb=16) exceeded the 16 MB scoped-VMEM limit on-chip (grid dim 0
    # already covers b > bb)
    bb = min(b, 32, max(1, 256 // hkv))

    qh = q.reshape(b, hkv, group, d).astype(jnp.float32)
    if k_scale is not None:
        # per-tensor descale folds into q (free) — but q multiplies the
        # UNQUANTIZED fresh_k too, so compensate fresh_k below (the same
        # for v_scale / fresh_v): pool logits get k_scale, fresh logits
        # get k_scale * (1/k_scale) = 1.
        qh = qh * jnp.asarray(k_scale, jnp.float32)
        if fresh_k is not None:
            fresh_k = (fresh_k.astype(jnp.float32) / jnp.asarray(k_scale, jnp.float32)).astype(fresh_k.dtype)
    if v_scale is not None and fresh_v is not None:
        fresh_v = (fresh_v.astype(jnp.float32) / jnp.asarray(v_scale, jnp.float32)).astype(fresh_v.dtype)
    if gp != group:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, gp - group), (0, 0)))
    qh = qh.astype(q.dtype)

    has_fresh = fresh_k is not None
    has_sink = sinks is not None
    need_lse = return_lse or num_splits > 1

    grid = (cdiv(b, bb), num_splits)
    inputs = [qh, k_pages, v_pages]
    in_specs = [
        pl.BlockSpec((bb, hkv, gp, d), lambda blk, ss, lens, pt, lid: (blk, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_fresh:
        fk = fresh_k.reshape(b, hkv, 1, d).astype(qh.dtype)
        fv = fresh_v.reshape(b, hkv, 1, d).astype(qh.dtype)
        inputs += [fk, fv]
        in_specs += [
            pl.BlockSpec((bb, hkv, 1, d), lambda blk, ss, lens, pt, lid: (blk, 0, 0, 0)),
            pl.BlockSpec((bb, hkv, 1, d), lambda blk, ss, lens, pt, lid: (blk, 0, 0, 0)),
        ]
    if has_sink:
        sink_arr = jnp.pad(sinks.astype(jnp.float32).reshape(1, hkv, group),
                           ((0, 0), (0, 0), (0, gp - group)))
        inputs.append(sink_arr)
        in_specs.append(pl.BlockSpec((1, hkv, gp), lambda blk, ss, lens, pt, lid: (0, 0, 0)))

    out_shapes = [jax.ShapeDtypeStruct((b, num_splits, hkv, gp, d), q.dtype)]
    out_specs = [pl.BlockSpec((bb, 1, hkv, gp, d), lambda blk, ss, lens, pt, lid: (blk, ss, 0, 0, 0))]
    if need_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, num_splits, 8, hkv * gp), jnp.float32))
        out_specs.append(pl.BlockSpec((bb, 1, 8, hkv * gp), lambda blk, ss, lens, pt, lid: (blk, ss, 0, 0)))

    kernel = functools.partial(
        _kernel_entry,
        sm_scale=sm_scale,
        window=sliding_window,
        soft_cap=logit_soft_cap,
        page=page,
        cpp=cpp,
        chunks_per_split=chunks_per_split,
        num_splits=num_splits,
        hkv=hkv,
        gp=gp,
        bb=bb,
        batch=b,
        layout=layout,
        has_fresh=has_fresh,
        has_sink=has_sink,
        has_lse=need_lse,
    )

    if layout == "head":
        buf = lambda dt: pltpu.VMEM((2, hkv, span, d), dt)
    else:
        buf = lambda dt: pltpu.VMEM((2, cpp, hkv, page, d), dt)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                buf(k_pages.dtype), buf(v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((bb, hkv * gp, 128), jnp.float32),
                pltpu.VMEM((bb, hkv * gp, 128), jnp.float32),
                pltpu.VMEM((bb, hkv * gp, d), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * n_blocks * page * d,
            bytes_accessed=2 * b * n_blocks * page * hkv * d * k_pages.dtype.itemsize,
            transcendentals=b * hq * n_blocks * page,
        ),
        interpret=pallas_interpret(),
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), layer_id, *inputs)

    if num_splits > 1:
        o_parts = outs[0].reshape(b, num_splits, hkv * gp, d).swapaxes(0, 1)  # [S, B, H', D]
        lse_parts = outs[1][:, :, 0].swapaxes(0, 1)                           # [S, B, H']
        o, lse = merge_states(o_parts.astype(jnp.float32), lse_parts)
        o = o.reshape(b, hkv, gp, d)[:, :, :group].reshape(b, hq, d).astype(q.dtype)
        lse_full = lse.reshape(b, hkv, gp)[:, :, :group].reshape(b, hq)
    else:
        o = outs[0][:, 0, :, :group].reshape(b, hq, d)
        if need_lse:
            lse_full = outs[1][:, 0, 0].reshape(b, hkv, gp)[:, :, :group].reshape(b, hq)
    if v_scale is not None:
        o = (o.astype(jnp.float32) * jnp.asarray(v_scale, jnp.float32)).astype(q.dtype)
    if return_lse:
        return o, lse_full
    return o


def _kernel_entry(lens_ref, pt_ref, layer_ref, *refs, has_fresh, has_sink, has_lse, **kw):
    q_ref, k_hbm, v_hbm = refs[0], refs[1], refs[2]
    idx = 3
    if has_fresh:
        fk_ref, fv_ref = refs[idx], refs[idx + 1]
        idx += 2
    else:
        fk_ref = fv_ref = None
    sink_ref = refs[idx] if has_sink else None
    idx += int(has_sink)
    o_ref = refs[idx]
    idx += 1
    lse_ref = refs[idx] if has_lse else None
    idx += int(has_lse)
    kb, vb, sem, m_scr, l_scr, acc_scr = refs[idx:idx + 6]
    _kernel(
        lens_ref, pt_ref, layer_ref, q_ref, k_hbm, v_hbm, fk_ref, fv_ref, sink_ref,
        o_ref, lse_ref, kb, vb, sem, m_scr, l_scr, acc_scr,
        has_fresh=has_fresh, has_sink=has_sink, has_lse=has_lse, **kw,
    )


def _decode_gather_fallback(q, k_pages, v_pages, lengths, page_table, sinks,
                            k_scale, v_scale, layer_id, fresh_k, fresh_v, *,
                            sm_scale, sliding_window, logit_soft_cap,
                            return_lse, layout="page"):
    """head_dim % 128 != 0 decode: gather used pages + flash (see caller)."""
    from .flash_prefill import flash_attention

    b, hq, d = q.shape
    if k_pages.ndim == 4:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
    lid = 0 if layer_id is None else jnp.asarray(layer_id, jnp.int32).reshape(())
    kp = jax.lax.dynamic_index_in_dim(k_pages, lid, 0, keepdims=False)
    vp = jax.lax.dynamic_index_in_dim(v_pages, lid, 0, keepdims=False)
    if layout == "head":
        # legacy head-major pools [Hkv, P, page, D]: reading the head axis
        # as pages would gather the WRONG rows (advisor r4 medium finding)
        kp = jnp.swapaxes(kp, 0, 1)
        vp = jnp.swapaxes(vp, 0, 1)
    n_pages, hkv, page, _ = kp.shape
    nb = page_table.shape[1]
    pt = jnp.clip(page_table, 0, n_pages - 1)
    # [B, nb, Hkv, page, D] -> [B, nb*page, Hkv, D]
    kg = kp[pt].swapaxes(2, 3).reshape(b, nb * page, hkv, d)
    vg = vp[pt].swapaxes(2, 3).reshape(b, nb * page, hkv, d)
    kg = _upcast(kg, q.dtype)
    vg = _upcast(vg, q.dtype)
    if k_scale is not None:
        kg = (kg.astype(jnp.float32) * jnp.asarray(k_scale, jnp.float32)).astype(q.dtype)
    if v_scale is not None:
        vg = (vg.astype(jnp.float32) * jnp.asarray(v_scale, jnp.float32)).astype(q.dtype)
    kv_lens = lengths.astype(jnp.int32)
    if fresh_k is not None:
        # the current token's row rides appended; its pool slot (length-1)
        # is masked off by writing the fresh row OVER position length-1
        fk = fresh_k.reshape(b, 1, hkv, d).astype(q.dtype)
        fv = fresh_v.reshape(b, 1, hkv, d).astype(q.dtype)
        pos = jnp.clip(kv_lens - 1, 0, nb * page - 1)
        kg = kg.at[jnp.arange(b), pos].set(fk[:, 0])
        vg = vg.at[jnp.arange(b), pos].set(fv[:, 0])
    group = hq // hkv
    if sinks is None and sliding_window is None and group > 1:
        # fold (B, hkv) into flash's batch and the GQA group into its
        # q-seq axis: the sq=1 form launches a [B, Hq, 1, nkv] grid of
        # tiny programs and is per-step-pipeline-overhead bound (~1 ms at
        # hq=64, 33 GB/s — round-5 regen row paged_decode_dma:16-1024-
        # 64-8-64-128); group-folding cuts the grid by group x hq/hkv and
        # feeds [group, d] x [d, bkv] dots. Per-head sinks cannot ride the
        # folded layout (one sink scalar per flash head) and a sliding
        # window needs every row at position kv_len-1 (folded rows span
        # group positions), so those calls keep the unfolded form.
        s_tot = kg.shape[1]
        kgt = kg.swapaxes(1, 2).reshape(b * hkv, s_tot, 1, d)
        vgt = vg.swapaxes(1, 2).reshape(b * hkv, s_tot, 1, d)
        qg = q.reshape(b, hkv, group, d).reshape(b * hkv, group, 1, d)
        out = flash_attention(
            qg, kgt, vgt, jnp.full((b * hkv,), group, jnp.int32),
            jnp.repeat(kv_lens, hkv), None,
            causal=False, sm_scale=sm_scale, sliding_window=None,
            logit_soft_cap=logit_soft_cap, return_lse=return_lse,
            block_kv=2048)
        if return_lse:
            o, lse = out
            return o[:, :, 0].reshape(b, hq, d), lse[:, 0].reshape(b, hq)
        return out[:, :, 0].reshape(b, hq, d)
    out = flash_attention(
        q[:, None], kg, vg, jnp.ones((b,), jnp.int32), kv_lens, sinks,
        causal=False, sm_scale=sm_scale, sliding_window=sliding_window,
        logit_soft_cap=logit_soft_cap, return_lse=return_lse)
    if return_lse:
        o, lse = out
        return o[:, 0], lse[:, :, 0]
    return out[:, 0]
