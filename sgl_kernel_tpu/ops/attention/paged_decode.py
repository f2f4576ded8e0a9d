"""Paged-KV decode attention kernel (Pallas TPU).

TPU-native replacement for the reference's FMHA decode path
(src/sycl/flash_attention.cpp `decode::mha_fwd` + FmhaDecodeRunner): one
query token per sequence attends to a paged KV cache.

Design: the KV pools stay in HBM head-major as [Hkv, num_pages, page_size,
D]; the grid walks (batch, kv_block) with the page table scalar-prefetched
so the BlockSpec index_map resolves physical page ids before each fetch —
Pallas's pipeline then double-buffers the page DMAs against compute.
**All KV heads and two pages are folded into a single grid step** (two
(1, Hkv, 1, page, D) blocks per pool with index maps pt[b, 2i] / pt[b,
2i+1]): one step fetches 2*Hkv*page*D bytes per pool, amortizing the fixed
per-grid-step cost that dominates decode at page-sized fetches (measured
480 GB/s KV read on v5e, ~6x the naive per-head grid).

GQA: the Hq = G * Hkv query heads sharing a KV head pack into the matmul M
dim; per-head online-softmax states live in one [Hkv*Gp, 128] scratch.

FP8 KV cache: per-tensor descales fold outside the kernel — k_scale into q
and v_scale into the output — so the kernel reads fp8 pages at half
bandwidth with zero epilogue cost.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _kernel(
    lens_ref,  # [B] scalar prefetch
    pt_ref,  # [B, n_blocks] scalar prefetch page table
    layer_ref,  # [1] scalar prefetch layer id (stacked pools)
    q_ref,  # [1, Hkv, Gp, D]
    krefs,  # tuple of pps refs [1, Hkv, 1, page, D] (leading layer dim)
    vrefs,
    fk_ref,  # fresh current-token K [1, Hkv, 1, D] (or None)
    fv_ref,
    sink_ref,  # [1, Hkv, Gp] or None
    o_ref,  # [1, Hkv, Gp, D]
    lse_ref,  # [1, 8, Hkv*Gp] or None
    m_scr,  # [Hkv*Gp, 128]
    l_scr,
    acc_scr,  # [Hkv*Gp, D]
    *,
    sm_scale: float,
    window: Optional[int],
    soft_cap: Optional[float],
    page: int,
    pps: int,
    n_steps: int,
    hkv: int,
    gp: int,
    has_fresh: bool,
    has_sink: bool,
    has_lse: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    length = lens_ref[b]
    # with a fresh current-token input, the pool's row for the last
    # position is not yet written — mask it out of the paged part
    pool_limit = length - 1 if has_fresh else length
    span = page * pps

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(i * span < pool_limit)
    def _body():
        pos = jax.lax.broadcasted_iota(jnp.int32, (gp, span), 1) + i * span
        mask = pos < pool_limit
        if window is not None:
            mask = jnp.logical_and(mask, pos > length - 1 - window)
        for h in range(hkv):
            q = q_ref[0, h]  # [Gp, D]
            if pps > 1:
                k = jnp.concatenate([kr[0, h, 0] for kr in krefs], axis=0).astype(q.dtype)
            else:
                k = krefs[0][0, h, 0].astype(q.dtype)  # [page, D]; fp8 upcasts losslessly
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = s * sm_scale
            if soft_cap is not None:
                s = soft_cap * jnp.tanh(s / soft_cap)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            sl = slice(h * gp, (h + 1) * gp)
            m_prev = m_scr[sl, :1]
            l_prev = l_scr[sl, :1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[sl, :] = jnp.broadcast_to(m_next, (gp, 128))
            l_scr[sl, :] = jnp.broadcast_to(l_next, (gp, 128))

            if pps > 1:
                v = jnp.concatenate([vr[0, h, 0] for vr in vrefs], axis=0).astype(q.dtype)
            else:
                v = vrefs[0][0, h, 0].astype(q.dtype)
            acc_scr[sl, :] = acc_scr[sl, :] * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(i == n_steps - 1)
    def _finalize():
        if has_fresh:
            # fold the current token's K/V in as one extra position
            for h in range(hkv):
                q = q_ref[0, h]
                kf = fk_ref[0, h].astype(jnp.float32)  # [1, D]
                # N=1 matmuls trip a Mosaic verifier bug; a VPU reduction is
                # equally fast at this size
                sf = jnp.sum(q.astype(jnp.float32) * kf, axis=1, keepdims=True)
                sf = sf * sm_scale  # [Gp, 1]
                if soft_cap is not None:
                    sf = soft_cap * jnp.tanh(sf / soft_cap)
                sl = slice(h * gp, (h + 1) * gp)
                m_prev = m_scr[sl, :1]
                l_prev = l_scr[sl, :1]
                m_next = jnp.maximum(m_prev, sf)
                alpha = jnp.exp(m_prev - m_next)
                pf = jnp.exp(sf - m_next)
                m_scr[sl, :] = jnp.broadcast_to(m_next, (gp, 128))
                l_scr[sl, :] = jnp.broadcast_to(alpha * l_prev + pf, (gp, 128))
                vf = fv_ref[0, h].astype(jnp.float32)  # [1, D]
                acc_scr[sl, :] = acc_scr[sl, :] * alpha + pf * vf  # rank-1 outer product
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        if has_sink:
            l = l + jnp.exp(sink_ref[0].reshape(-1, 1) - m)
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).reshape(hkv, gp, -1).astype(o_ref.dtype)
        if has_lse:
            lse = ((m + jnp.log(jnp.maximum(l, 1e-38))) * LOG2E)[:, 0]  # [Hkv*Gp]
            lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "sliding_window", "logit_soft_cap", "return_lse", "pages_per_step"),
)
def paged_attention_decode(
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
    pages_per_step: int = 4,
):
    """Decode attention over a paged KV cache.

    q: [B, Hq, D]; k_pages/v_pages: [Hkv, P, page_size, D] (bf16 or fp8),
    or layer-stacked [L, Hkv, P, page_size, D] with ``layer_id`` selecting
    the layer inside the kernel — the layer-loop carry then never slices
    or copies the pools (the scan-copy trap; see docs/PERF.md).
    lengths: [B] valid token counts (incl. current token); page_table:
    [B, max_pages_per_seq] physical page ids (pad with 0).
    k_scale/v_scale: optional scalar fp8 descales.
    fresh_k/fresh_v: optional [B, Hkv, D] current-token K/V folded into the
    softmax directly — lets the serving loop defer the cache scatter to one
    batched write per step instead of one per layer (``lengths`` still
    counts the current token; its pool row may be unwritten).
    Returns out [B, Hq, D] (+ lse [B, Hq] base-2 when return_lse).
    """
    b, hq, d = q.shape
    if k_pages.ndim == 4:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
    if layer_id is None:
        layer_id = jnp.zeros((1,), jnp.int32)
    else:
        layer_id = jnp.asarray(layer_id, jnp.int32).reshape(1)
    _, hkv, n_pages, page, _ = k_pages.shape
    assert hq % hkv == 0
    group = hq // hkv
    gp = round_up(group, 8)
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    n_blocks = page_table.shape[1]
    # several pages per grid step (fewer grid iterations -> less per-step
    # fixed cost; pad the table to a multiple of the group size)
    pps = min(pages_per_step, n_blocks)
    if n_blocks % pps:
        pad = pps - n_blocks % pps
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        n_blocks += pad
    n_steps = n_blocks // pps

    qh = q.reshape(b, hkv, group, d).astype(jnp.float32)
    if k_scale is not None:
        qh = qh * jnp.asarray(k_scale, jnp.float32)
        if fresh_k is not None:
            # q now carries k_scale, which would wrongly scale the
            # UNQUANTIZED fresh-token logit — compensate (see the DMA
            # kernel's wrapper)
            fresh_k = (fresh_k.astype(jnp.float32) / jnp.asarray(k_scale, jnp.float32)).astype(fresh_k.dtype)
    if v_scale is not None and fresh_v is not None:
        fresh_v = (fresh_v.astype(jnp.float32) / jnp.asarray(v_scale, jnp.float32)).astype(fresh_v.dtype)
    if gp != group:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, gp - group), (0, 0)))
    qh = qh.astype(q.dtype)

    has_sink = sinks is not None

    def kv_spec(off):
        return pl.BlockSpec(
            (1, hkv, 1, page, d),
            lambda bb, i, lens, pt, lid, off=off: (lid[0], 0, pt[bb, pps * i + off], 0, 0),
        )

    inputs = [qh]
    in_specs = [pl.BlockSpec((1, hkv, gp, d), lambda bb, i, lens, pt, lid: (bb, 0, 0, 0))]
    for off in range(pps):
        inputs += [k_pages, v_pages]
        in_specs += [kv_spec(off), kv_spec(off)]
    has_fresh = fresh_k is not None
    if has_fresh:
        fk = fresh_k.reshape(b, hkv, 1, d).astype(qh.dtype)
        fv = fresh_v.reshape(b, hkv, 1, d).astype(qh.dtype)
        inputs += [fk, fv]
        in_specs += [
            pl.BlockSpec((1, hkv, 1, d), lambda bb, i, lens, pt, lid: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, d), lambda bb, i, lens, pt, lid: (bb, 0, 0, 0)),
        ]
    if has_sink:
        sink_arr = jnp.pad(sinks.astype(jnp.float32).reshape(1, hkv, group), ((0, 0), (0, 0), (0, gp - group)))
        in_specs.append(pl.BlockSpec((1, hkv, gp), lambda bb, i, lens, pt, lid: (0, 0, 0)))
        inputs.append(sink_arr)

    out_shapes = [jax.ShapeDtypeStruct((b, hkv, gp, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, hkv, gp, d), lambda bb, i, lens, pt, lid: (bb, 0, 0, 0))]
    if return_lse:
        # 8-row broadcast satisfies the (x8, x128|full) block rule; sliced after
        out_shapes.append(jax.ShapeDtypeStruct((b, 8, hkv * gp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, hkv * gp), lambda bb, i, lens, pt, lid: (bb, 0, 0)))

    kernel = functools.partial(
        _kernel_entry,
        sm_scale=sm_scale,
        window=sliding_window,
        soft_cap=logit_soft_cap,
        page=page,
        pps=pps,
        n_steps=n_steps,
        hkv=hkv,
        gp=gp,
        has_fresh=has_fresh,
        has_sink=has_sink,
        has_lse=return_lse,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hkv * gp, 128), jnp.float32),
                pltpu.VMEM((hkv * gp, 128), jnp.float32),
                pltpu.VMEM((hkv * gp, d), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * n_blocks * page * d,
            bytes_accessed=2 * b * n_blocks * page * hkv * d * k_pages.dtype.itemsize,
            transcendentals=b * hq * n_blocks * page,
        ),
        interpret=pallas_interpret(),
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), layer_id, *inputs)

    out = outs[0][:, :, :group].reshape(b, hq, d)
    if v_scale is not None:
        out = (out.astype(jnp.float32) * jnp.asarray(v_scale, jnp.float32)).astype(q.dtype)
    if return_lse:
        lse = outs[1][:, 0].reshape(b, hkv, gp)[:, :, :group].reshape(b, hq)
        return out, lse
    return out


def _kernel_entry(lens_ref, pt_ref, layer_ref, *refs, sm_scale, window, soft_cap, page, pps, n_steps, hkv, gp, has_fresh, has_sink, has_lse):
    q_ref = refs[0]
    idx = 1
    krefs, vrefs = [], []
    for _ in range(pps):
        krefs.append(refs[idx]); vrefs.append(refs[idx + 1])
        idx += 2
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
    m_scr, l_scr, acc_scr = refs[idx], refs[idx + 1], refs[idx + 2]
    _kernel(
        lens_ref, pt_ref, layer_ref, q_ref, tuple(krefs), tuple(vrefs), fk_ref, fv_ref, sink_ref, o_ref, lse_ref,
        m_scr, l_scr, acc_scr,
        sm_scale=sm_scale, window=window, soft_cap=soft_cap, page=page, pps=pps,
        n_steps=n_steps, hkv=hkv, gp=gp, has_fresh=has_fresh, has_sink=has_sink, has_lse=has_lse,
    )
