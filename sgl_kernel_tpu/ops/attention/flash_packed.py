"""Token-packed (cu_seqlens-style) flash-attention prefill — Pallas TPU.

The reference runs prefill cu_seqlens-packed end-to-end
(flash_attn_varlen_func, src/sycl/flash_attention.cpp varlen path): ragged
batches pay no cross-sequence padding. A literal cu_seqlens port would put
dynamic sequence boundaries inside tiles, which Mosaic cannot tile. The
TPU-native form is **block-aligned packing** (the same trick as
moe_align_block_size): each sequence starts at a multiple of the attention
block, so every (q-block, kv-block) pair belongs to exactly one sequence
and the grid walks exactly the blocks that exist:

  - tokens packed [TP, H, D] with TP = sum(round_up(len_i, block));
    per-sequence padding is < block tokens instead of bucket - len_i,
  - grid (total_q_blocks, Hq, max_kv_blocks): no (B, max_len) rectangle,
  - per-block scalar-prefetch metadata maps blocks to sequences; kv-block
    index maps CLAMP beyond-end / causally-irrelevant steps to the
    previous block (revisit -> Mosaic skips the re-fetch), so short
    sequences in a mixed batch cost neither DMA nor FLOPs.

Supports GQA, causal with chunked-extend offsets (q_start/kv_start),
sliding window, softcap, sinks, and base-2 LSE — feature parity with the
padded flash_attention (flash_prefill.py), oracle-tested against it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up
from .flash_prefill import flash_finalize, flash_tile_update


def build_packed_metadata(q_lens, kv_lens=None, *, block: int = 256):
    """Host-side packing plan (numpy, scheduler-side).

    Returns a dict with
      blk_seq   [NQB] sequence id of each packed q block
      blk_q0    [NQB] in-sequence token index of the block's row 0
      seq_tok0  [B]   packed token offset of each sequence (q side)
      seq_kvblk0[B]   first packed kv block of each sequence
      total_q   packed q size (sum of block-rounded lens)
      max_kvb   max kv blocks over sequences (grid's kv extent)
    kv defaults to the q packing (self-attention prefill).
    """
    q_lens = np.asarray(q_lens, np.int32)
    kv_lens = q_lens if kv_lens is None else np.asarray(kv_lens, np.int32)
    nqb = np.maximum(cdiv(q_lens, block), 1)
    nkvb = np.maximum(cdiv(kv_lens, block), 1)
    qblk0 = np.concatenate([[0], np.cumsum(nqb)])[:-1].astype(np.int32)
    kvblk0 = np.concatenate([[0], np.cumsum(nkvb)])[:-1].astype(np.int32)
    blk_seq = np.repeat(np.arange(len(q_lens), dtype=np.int32), nqb)
    blk_q0 = (np.arange(len(blk_seq), dtype=np.int32) - qblk0[blk_seq]) * block
    return dict(
        blk_seq=blk_seq,
        blk_q0=blk_q0,
        seq_tok0=qblk0 * block,
        seq_kvblk0=kvblk0,
        nkvb=nkvb,
        total_q=int(nqb.sum()) * block,
        total_kv=int(nkvb.sum()) * block,
        max_kvb=int(nkvb.max()),
    )


def pack_padded(x, lens, *, block: int = 256):
    """[B, S, ...] padded batch -> block-aligned packed [TP, ...] (XLA;
    test/convenience helper — the engine packs host-side)."""
    lens = np.asarray(lens, np.int32)
    meta = build_packed_metadata(lens, block=block)
    b, s = x.shape[:2]
    rows = []
    for i in range(b):
        n = round_up(max(int(lens[i]), 1), block)
        seg = x[i, : min(n, s)]
        if n > s:
            seg = jnp.concatenate([seg, jnp.zeros((n - s,) + x.shape[2:], x.dtype)])
        rows.append(seg)
    return jnp.concatenate(rows), meta


def unpack_to_padded(xp, lens, s, *, block: int = 256):
    """Inverse of pack_padded onto a [B, S, ...] zero-padded batch."""
    lens = np.asarray(lens, np.int32)
    meta = build_packed_metadata(lens, block=block)
    outs = []
    for i, t0 in enumerate(meta["seq_tok0"]):
        n = round_up(max(int(lens[i]), 1), block)
        seg = xp[t0 : t0 + min(n, s)]
        if n < s:
            seg = jnp.concatenate([seg, jnp.zeros((s - n,) + xp.shape[1:], xp.dtype)])
        outs.append(seg[:s])
    return jnp.stack(outs)


def _kernel(
    blk_ref,   # [NQB, 2] scalar prefetch: (seq_id, q0_in_seq)
    seq_ref,   # [B, 6] scalar prefetch: (q_len, kv_len, q_start, kv_start, kvblk0, kvblks)
    q_ref,     # [1, bq, D]
    k_ref,     # [1, bkv, D]
    v_ref,     # [1, bkv, D]
    sink_ref,  # [1, 1, 1] or None
    o_ref,     # [1, bq, D]
    lse_ref,   # [1, 8, bq] or None
    m_scr,
    l_scr,
    acc_scr,
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
    nb = pl.program_id(0)
    ikv = pl.program_id(2)
    seq = blk_ref[nb, 0]
    q0 = blk_ref[nb, 1]

    q_len = seq_ref[seq, 0]
    kv_len = seq_ref[seq, 1]
    q_start = seq_ref[seq, 2]
    kv_start0 = seq_ref[seq, 3]

    @pl.when(ikv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_tile = ikv * bkv
    q_end = jnp.minimum(q0 + bq, q_len)
    run = jnp.logical_and(kv_tile < kv_len, q0 < q_len)
    if causal:
        run = jnp.logical_and(run, kv_start0 + kv_tile <= q_start + q_end - 1)
    if window is not None:
        run = jnp.logical_and(run, kv_start0 + kv_tile + bkv - 1 >= q_start + q0 - window + 1)

    @pl.when(run)
    def _body():
        q = q_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + q0
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + kv_tile
        q_pos = rows + q_start
        kv_pos = cols + kv_start0
        mask = jnp.logical_and(cols < kv_len, rows < q_len)
        if causal:
            mask = jnp.logical_and(mask, kv_pos <= q_pos)
        if window is not None:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window)
        flash_tile_update(
            q, k_ref[0].astype(q.dtype), v_ref[0].astype(q.dtype), mask,
            m_scr, l_scr, acc_scr, sm_scale=sm_scale, soft_cap=soft_cap)

    @pl.when(ikv == n_kv - 1)
    def _finalize():
        o, lse = flash_finalize(
            m_scr, l_scr, acc_scr, sink_ref[0, 0, 0] if has_sink else None)
        o_ref[0] = o.astype(o_ref.dtype)
        if has_lse:
            lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _kernel_entry(blk_ref, seq_ref, *refs, has_sink, has_lse, **kw):
    idx = 3
    sink_ref = refs[idx] if has_sink else None
    idx += int(has_sink)
    o_ref = refs[idx]
    lse_ref = refs[idx + 1] if has_lse else None
    idx += 1 + int(has_lse)
    m_scr, l_scr, acc_scr = refs[idx], refs[idx + 1], refs[idx + 2]
    _kernel(
        blk_ref, seq_ref, refs[0], refs[1], refs[2], sink_ref, o_ref, lse_ref,
        m_scr, l_scr, acc_scr, has_sink=has_sink, has_lse=has_lse, **kw,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_kvb", "causal", "sm_scale", "sliding_window", "logit_soft_cap",
        "return_lse", "block",
    ),
)
def flash_attention_packed(
    q,
    k,
    v,
    blk_seq,
    blk_q0,
    seq_meta,
    *,
    max_kvb: int,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    logit_soft_cap: Optional[float] = None,
    sinks=None,
    return_lse: bool = False,
    block: int = 256,
):
    """Block-aligned packed flash attention.

    q [TPq, Hq, D], k/v [TPkv, Hkv, D]: block-aligned packed tokens
    (build_packed_metadata / pack_padded). blk_seq/blk_q0 [NQB] int32;
    seq_meta [B, 6] int32 rows (q_len, kv_len, q_start, kv_start,
    kv_blk0, kv_blks). max_kvb: static max kv blocks per sequence.
    Returns packed out [TPq, Hq, D] (+ lse [Hq, TPq] base-2).
    """
    tp, hq, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0
    group = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    bq = bkv = block
    assert tp % bq == 0 and k.shape[0] % bkv == 0
    nqb = tp // bq
    assert blk_seq.shape[0] == nqb, (
        f"metadata built for a different block size: {blk_seq.shape[0]} q-block "
        f"rows vs {nqb} packed q blocks (tp={tp}, block={block})")

    qt = jnp.swapaxes(q, 0, 1)  # [Hq, TPq, D]
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)

    grid = (nqb, hq, max_kvb)

    def kv_index(nb, h, ikv, blk, seq, _g=group):
        # clamp beyond-end / causally-irrelevant / pre-window steps to a
        # neighbouring relevant block: consecutive identical indices ->
        # Mosaic skips the refetch, so skipped tiles cost no DMA either
        s = blk[nb, 0]
        kvblks = seq[s, 5]
        jmax = kvblks - 1
        jmin = 0
        if causal:
            # last kv block with any kv_pos <= last q_pos of this block
            q_hi = seq[s, 2] + jnp.minimum(blk[nb, 1] + bq, seq[s, 0]) - 1
            cmax = (q_hi - seq[s, 3]) // bkv
            jmax = jnp.minimum(jmax, jnp.maximum(cmax, 0))
        if sliding_window is not None:
            # first kv block with any kv_pos > first q_pos - window
            q_lo = seq[s, 2] + blk[nb, 1]
            wmin = (q_lo - sliding_window + 1 - seq[s, 3]) // bkv
            jmin = jnp.clip(wmin, 0, jmax)
        j = seq[s, 4] + jnp.clip(ikv, jmin, jmax)
        return (h // _g, j, 0)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda nb, h, ikv, blk, seq: (h, nb, 0)),
        pl.BlockSpec((1, bkv, d), kv_index),
        pl.BlockSpec((1, bkv, d), kv_index),
    ]
    inputs = [qt, kt, vt]
    has_sink = sinks is not None
    if has_sink:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda nb, h, ikv, blk, seq: (h, 0, 0)))
        inputs.append(sinks.astype(jnp.float32).reshape(hq, 1, 1))

    out_shapes = [jax.ShapeDtypeStruct((hq, tp, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda nb, h, ikv, blk, seq: (h, nb, 0))]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((nqb * hq, 8, bq), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 8, bq), lambda nb, h, ikv, blk, seq, _hq=hq: (nb * _hq + h, 0, 0))
        )

    kernel = functools.partial(
        _kernel_entry,
        causal=causal,
        sm_scale=sm_scale,
        window=sliding_window,
        soft_cap=logit_soft_cap,
        bq=bq,
        bkv=bkv,
        n_kv=max_kvb,
        has_sink=has_sink,
        has_lse=return_lse,
    )

    blk = jnp.stack([blk_seq.astype(jnp.int32), blk_q0.astype(jnp.int32)], axis=1)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
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
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * hq * tp * max_kvb * bkv * d * (0.5 if causal else 1.0)),
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize + hq * tp * d * 2,
            transcendentals=hq * tp * max_kvb * bkv,
        ),
        interpret=pallas_interpret(),
    )(blk, seq_meta.astype(jnp.int32), *inputs)

    out = jnp.swapaxes(outs[0], 0, 1)  # [TPq, Hq, D]
    if return_lse:
        lse = outs[1][:, 0, :].reshape(nqb, hq, bq)
        return out, jnp.swapaxes(lse, 1, 2).reshape(tp, hq).T  # [Hq, TPq]
    return out


def make_seq_meta(q_lens, kv_lens=None, q_start=None, kv_start=None, *, block: int = 256):
    """Assemble the [B, 6] seq_meta rows from host metadata (numpy)."""
    meta = build_packed_metadata(q_lens, kv_lens, block=block)
    q_lens = np.asarray(q_lens, np.int32)
    kv_lens = q_lens if kv_lens is None else np.asarray(kv_lens, np.int32)
    q_start = (kv_lens - q_lens) if q_start is None else np.asarray(q_start, np.int32)
    kv_start = np.zeros_like(q_lens) if kv_start is None else np.asarray(kv_start, np.int32)
    return (
        np.stack([q_lens, kv_lens, q_start, kv_start, meta["seq_kvblk0"], meta["nkvb"]], axis=1),
        meta,
    )
