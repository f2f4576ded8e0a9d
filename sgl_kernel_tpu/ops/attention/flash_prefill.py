"""Flash-attention prefill/extend kernel (Pallas TPU).

TPU-native replacement for the reference's FMHA prefill path
(src/sycl/flash_attention.cpp `prefill::mha_fwd`;
kernels/flash_attention_v2/ mainloop+epilogue): online-softmax tiled
attention with

  - GQA (query-head groups share a KV head),
  - causal masking with chunked-prefill offset (q block attends as the
    *last* q_len positions of kv_len — the reference's extend semantics),
  - per-sequence ragged q/kv lengths (varlen),
  - sliding window (local attention),
  - logit softcap (tanh), and
  - attention sinks (per-head denominator logit, gpt-oss style).

Returns attention output and optionally the base-2 LSE (the merge_state
convention, so chunked/ring callers can combine partial results).

Layout: head-major [B, H, S, D] inside the kernel; the wrapper accepts
[B, S, H, D] and transposes (a relayout XLA fuses into neighbours).
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


def flash_tile_update(q, k, v, mask, m_scr, l_scr, acc_scr, *, sm_scale, soft_cap):
    """One online-softmax KV-tile update (shared by the padded and packed
    kernels — flash_packed.py imports this so the softmax/accumulator math
    cannot diverge between them).

    q [bq, D]; k/v [bkv, D]; mask [bq, bkv] bool; scratches as allocated
    by the callers ([bq, 128] m/l broadcast rows + [bq, D] f32 acc).
    """
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * sm_scale
    if soft_cap is not None:
        s = soft_cap * jnp.tanh(s / soft_cap)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )


def flash_finalize(m_scr, l_scr, acc_scr, sink_val):
    """Normalize the accumulator; returns (o [bq, D] f32, lse [bq] base-2).
    sink_val: per-head sink logit scalar or None (added to the denominator
    ONCE — the single-kernel sink semantics)."""
    m = m_scr[:, :1]
    l = l_scr[:, :1]
    if sink_val is not None:
        l = l + jnp.exp(sink_val - m)
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o = acc_scr[...] * l_inv
    lse = ((m + jnp.log(jnp.maximum(l, 1e-38))) * LOG2E)[:, 0]
    return o, lse


def _kernel(
    lens_ref,  # scalar prefetch [B, 4] (q_len, kv_len, q_start, kv_start)
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, bkv, D]
    v_ref,  # [1, 1, bkv, D]
    sink_ref,  # [1, 1, 1] or None
    o_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 8, bq] or None
    m_scr,  # [bq, 128] f32
    l_scr,  # [bq, 128] f32
    acc_scr,  # [bq, D] f32
    *,
    causal: bool,
    sm_scale: float,
    window: Optional[int],
    soft_cap: Optional[float],
    bq: int,
    bkv: int,
    n_kv: int,
    has_sink: bool,
    has_lse: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)

    q_len = lens_ref[b, 0]
    kv_len = lens_ref[b, 1]
    q_start = lens_ref[b, 2]  # global position of q row 0
    kv_start0 = lens_ref[b, 3]  # global position of kv row 0

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # --- tile relevance (skip fully-masked KV tiles) ---
    kv_tile = ikv * bkv
    q_end = jnp.minimum((iq + 1) * bq, q_len)
    run = kv_tile < kv_len
    if causal:
        run = jnp.logical_and(run, kv_start0 + kv_tile <= q_start + q_end - 1)
    if window is not None:
        run = jnp.logical_and(run, kv_start0 + kv_tile + bkv - 1 >= q_start + iq * bq - window + 1)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + iq * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + kv_tile
        q_pos = rows + q_start
        kv_pos = cols + kv_start0
        mask = cols < kv_len
        if causal:
            mask = jnp.logical_and(mask, kv_pos <= q_pos)
        if window is not None:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window)
        flash_tile_update(
            q, k_ref[0, 0].astype(q.dtype), v_ref[0, 0].astype(q.dtype), mask,
            m_scr, l_scr, acc_scr, sm_scale=sm_scale, soft_cap=soft_cap)

    @pl.when(ikv == n_kv - 1)
    def _finalize():
        o, lse = flash_finalize(
            m_scr, l_scr, acc_scr, sink_ref[0, 0, 0] if has_sink else None)
        o_ref[0, 0] = o.astype(o_ref.dtype)
        if has_lse:
            lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "sm_scale",
        "sliding_window",
        "logit_soft_cap",
        "return_lse",
        "block_q",
        "block_kv",
    ),
)
def flash_attention(
    q,
    k,
    v,
    q_lens=None,
    kv_lens=None,
    sinks=None,
    q_start=None,
    kv_start=None,
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    logit_soft_cap: Optional[float] = None,
    return_lse: bool = False,
    block_q: int = 256,
    block_kv: int = 512,
):
    """Batched (optionally ragged) flash attention.

    q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D]; q_lens/kv_lens: [B] int32.
    sinks: optional [Hq] f32.
    q_start/kv_start: optional [B] *global* positions of q row 0 / kv row 0
    for causal/window masking across chunks (ring attention, chunked
    prefill against a remote KV shard). Defaults: q_start = kv_len - q_len
    (self-extend: q is the last q_len tokens of the context), kv_start = 0.
    Returns out [B, Sq, Hq, D] (+ lse [B, Hq, Sq] base-2 when return_lse).
    """
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    assert hq % hkv == 0
    group = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)

    bq = min(block_q, round_up(sq, 8))
    bkv = min(block_kv, round_up(skv, 128))
    sq_p = round_up(sq, bq)
    skv_p = round_up(skv, bkv)

    qt = jnp.swapaxes(q, 1, 2)  # [B, Hq, Sq, D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if sq_p != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    if q_lens is None:
        q_lens = jnp.full((b,), sq, jnp.int32)
    if kv_lens is None:
        kv_lens = jnp.full((b,), skv, jnp.int32)
    q_lens = q_lens.astype(jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)
    if q_start is None:
        q_start = kv_lens - q_lens
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    lens = jnp.stack([q_lens, kv_lens, q_start.astype(jnp.int32), kv_start.astype(jnp.int32)], axis=1)

    n_kv = skv_p // bkv
    grid = (b, hq, sq_p // bq, n_kv)

    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda bb, h, iq, ikv, lens: (bb, h, iq, 0)),
        pl.BlockSpec((1, 1, bkv, d), lambda bb, h, iq, ikv, lens: (bb, h // group, ikv, 0)),
        pl.BlockSpec((1, 1, bkv, d), lambda bb, h, iq, ikv, lens: (bb, h // group, ikv, 0)),
    ]
    inputs = [qt, kt, vt]
    has_sink = sinks is not None
    if has_sink:
        # [Hq, 1, 1] with block (1, 1, 1): last-two dims equal the array's
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda bb, h, iq, ikv, lens: (h, 0, 0)))
        inputs.append(sinks.astype(jnp.float32).reshape(hq, 1, 1))

    out_shapes = [jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bq, d), lambda bb, h, iq, ikv, lens: (bb, h, iq, 0))]
    if return_lse:
        # [B*Hq, 8, Sq] with an 8-row broadcast per tile (Mosaic block rule)
        out_shapes.append(jax.ShapeDtypeStruct((b * hq, 8, sq_p), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, bq), lambda bb, h, iq, ikv, lens, _hq=hq: (bb * _hq + h, 0, iq)))

    kernel = functools.partial(
        _kernel_entry,
        causal=causal,
        sm_scale=sm_scale,
        window=sliding_window,
        soft_cap=logit_soft_cap,
        bq=bq,
        bkv=bkv,
        n_kv=n_kv,
        has_sink=has_sink,
        has_lse=return_lse,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * hq * sq_p * skv_p * d * (0.5 if causal else 1.0)),
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize + b * hq * sq_p * d * 2,
            transcendentals=b * hq * sq_p * skv_p,
        ),
        interpret=pallas_interpret(),
    )(lens, *inputs)

    out = jnp.swapaxes(outs[0], 1, 2)[:, :sq]
    if return_lse:
        return out, outs[1][:, 0, :].reshape(b, hq, sq_p)[:, :, :sq]
    return out


def _kernel_entry(lens_ref, *refs, causal, sm_scale, window, soft_cap, bq, bkv, n_kv, has_sink, has_lse):
    # refs: q, k, v, [sink], o, [lse], m_scr, l_scr, acc_scr
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    idx = 3
    sink_ref = refs[idx] if has_sink else None
    idx += int(has_sink)
    o_ref = refs[idx]
    idx += 1
    lse_ref = refs[idx] if has_lse else None
    idx += int(has_lse)
    m_scr, l_scr, acc_scr = refs[idx], refs[idx + 1], refs[idx + 2]
    _kernel(
        lens_ref,
        q_ref,
        k_ref,
        v_ref,
        sink_ref,
        o_ref,
        lse_ref,
        m_scr,
        l_scr,
        acc_scr,
        causal=causal,
        sm_scale=sm_scale,
        window=window,
        soft_cap=soft_cap,
        bq=bq,
        bkv=bkv,
        n_kv=n_kv,
        has_sink=has_sink,
        has_lse=has_lse,
    )
