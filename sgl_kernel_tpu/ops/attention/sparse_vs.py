"""MInference-style vertical + slash sparse attention.

TPU-native equivalent of the reference's sparse attention fallback
(python/sgl_kernel/sparse_flash_attn.py — itself a pure-torch fallback for
the declared-only mha_fwd_sparse surface, SURVEY §2.6): attention restricted
to a per-head set of *vertical* columns (always-attended tokens) and
*slash* diagonals (fixed offsets behind each query).

Two execution paths:

- ``sparse_attention_vertical_slash``: materializes the sparse mask per
  (head, q-tile) and runs masked attention — the same contract the
  reference fallback provides (exact index-set semantics, O(S^2) work).
- ``sparse_attn_func``: the tile-skipping Pallas kernel consuming the
  block schedule from ``convert_vertical_slash_indexes`` (the reference's
  real sparse path, sparse_flash_attn.py::sparse_attn_func). Work is
  O(selected blocks + vertical columns): slash KV blocks stream through a
  double-buffered VMEM window, vertical columns are gathered once per
  prefill, and skipped tiles cost nothing. Block semantics match
  MInference: every position inside a selected block is attended (the
  block-granular approximation), vertical columns are exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up


@functools.partial(jax.jit, static_argnames=("sm_scale", "causal"))
def sparse_attention_vertical_slash(
    q,
    k,
    v,
    vertical_idx,
    slash_idx,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = True,
):
    """q/k/v [B, S, H, D]; vertical_idx [H, NV] column ids (-1 pads);
    slash_idx [H, NS] diagonal offsets (0 = self, 1 = previous token, ...;
    -1 pads). Position (i, j) is attended iff j is a vertical column or
    i - j is a slash offset (and j <= i when causal)."""
    b, s, h, d = q.shape
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]

    # [H, S, S] masks built from index sets (-1 entries are padding)
    v_valid = (vertical_idx >= 0)[:, :, None, None]
    s_valid = (slash_idx >= 0)[:, :, None, None]
    vert = ((cols[None] == vertical_idx[:, :, None, None]) & v_valid).any(axis=1)
    vert = jnp.broadcast_to(vert, (h, s, s))
    diag = (((rows - cols)[None] == slash_idx[:, :, None, None]) & s_valid).any(axis=1)
    mask = vert | diag
    if causal:
        mask = mask & (cols <= rows)[None]

    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32)  # [B, H, S, D]
    kf = jnp.swapaxes(k, 1, 2).astype(jnp.float32)
    vf = jnp.swapaxes(v, 1, 2).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    scores = jnp.where(mask[None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vf) / jnp.maximum(l, 1e-38)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def convert_vertical_slash_indexes(
    q_seqlens,
    kv_seqlens,
    vertical_indexes,
    slash_indexes,
    context_size: int,
    block_size_M: int,
    block_size_N: int,
    causal: bool = True,
):
    """Convert per-head vertical/slash index sets into the block-sparse
    schedule (MInference layout; reference convert_vertical_slash_indexes,
    sparse_flash_attn.py:595-668 — CUDA kernel declared-only on XPU).

    Host-side metadata builder (runs once per prefill, like the
    reference's plan step). vertical_indexes [B, H, NV] ascending column
    ids; slash_indexes [B, H, NS] descending distances from the last
    row's diagonal (column of slash s at query row r =
    (kv_len - q_len) + r - s + ... evaluated at each M-block's end row,
    the reference convention). Returns numpy
    (block_count [B, H, R], block_offset [B, H, R, NS],
     column_count [B, H, R], column_index [B, H, R, NV]) with R =
    ceil(context_size / block_size_M); block_offset holds block_size_N-
    aligned KV column starts.
    """
    import numpy as np

    q_seqlens = np.asarray(q_seqlens)
    kv_seqlens = np.asarray(kv_seqlens)
    v_idx = np.asarray(vertical_indexes)
    s_idx = np.asarray(slash_indexes)
    b, h, nv = v_idx.shape
    ns = s_idx.shape[2]
    rows = (context_size + block_size_M - 1) // block_size_M
    block_count = np.zeros((b, h, rows), np.int32)
    block_offset = np.zeros((b, h, rows, ns), np.int32)
    column_count = np.zeros((b, h, rows), np.int32)
    column_index = np.zeros((b, h, rows, nv), np.int32)

    for bb in range(b):
        q_len, kv_len = int(q_seqlens[bb]), int(kv_seqlens[bb])
        shift = kv_len - q_len
        for hh in range(h):
            for r in range(rows):
                end_m = (r + 1) * block_size_M
                col_bound = min(end_m + shift, kv_len) if causal else kv_len
                if col_bound <= 0:
                    continue
                # slash s covers, across this q block's rows, the column
                # band [shift + end_m - s - block_M, shift + end_m - s)
                ends = shift + end_m - s_idx[bb, hh]
                ends = ends[(ends > 0)]
                # clamp to the visible KV range in BOTH modes: unclamped
                # non-causal ends schedule blocks past kv_len whose zero
                # K rows outrank negative real logits in the softmax
                ends = np.minimum(ends, col_bound)
                ranges = sorted((max(int(e) - block_size_M, 0), int(e)) for e in ends if e > 0)
                merged = []
                for st, en in ranges:
                    if merged and st <= merged[-1][1]:
                        merged[-1] = (merged[-1][0], max(merged[-1][1], en))
                    else:
                        merged.append((st, en))
                blocks = []
                for st, en in merged:
                    st_b = st // block_size_N * block_size_N
                    while st_b < en:
                        if not blocks or blocks[-1] != st_b:
                            blocks.append(st_b)
                        st_b += block_size_N
                # a slash band can straddle two N-blocks, so up to 2*NS
                # blocks may be needed; keep the NS nearest (largest) ends
                # and let the EXCLUSION test below use only the KEPT blocks
                # so dropped ranges stay covered by vertical columns
                blocks = blocks[-ns:] if len(blocks) > ns else blocks
                block_count[bb, hh, r] = len(blocks)
                block_offset[bb, hh, r, : len(blocks)] = blocks
                kept = [(bs, bs + block_size_N) for bs in blocks]
                cols = [
                    int(c) for c in v_idx[bb, hh]
                    if 0 <= c < col_bound
                    and not any(st <= c < en for st, en in kept)
                ][:nv]
                column_count[bb, hh, r] = len(cols)
                column_index[bb, hh, r, : len(cols)] = cols
    return block_count, block_offset, column_count, column_index


def convert_vertical_slash_indexes_mergehead(
    q_seqlens,
    kv_seqlens,
    vertical_indexes,
    slash_indexes,
    vertical_indices_count,
    slash_indices_count,
    context_size: int,
    block_size_M: int,
    block_size_N: int,
    causal: bool = True,
):
    """Per-head-truncated variant (reference :671-720): head h uses only
    its first vertical_indices_count[h] / slash_indices_count[h] indices."""
    import numpy as np

    v_idx = np.asarray(vertical_indexes).copy()
    s_idx = np.asarray(slash_indexes).copy()
    vc = np.asarray(vertical_indices_count)
    sc = np.asarray(slash_indices_count)
    big = 1 << 30
    for hh in range(v_idx.shape[1]):
        v_idx[:, hh, int(vc[hh]) :] = big  # beyond-causal -> filtered out
        s_idx[:, hh, int(sc[hh]) :] = big  # huge distance -> column <= 0
    return convert_vertical_slash_indexes(
        q_seqlens, kv_seqlens, v_idx, s_idx, context_size,
        block_size_M, block_size_N, causal,
    )


@functools.partial(jax.jit, static_argnames=("num_vertical", "num_slash", "last_q", "sm_scale"))
def build_vertical_slash_indexes(
    q,
    k,
    num_vertical: int,
    num_slash: int,
    last_q: int = 64,
    *,
    sm_scale: Optional[float] = None,
):
    """Estimate the vertical/slash index sets from the last ``last_q``
    queries' attention pattern (reference convert_vertical_slash_indexes
    role): sum scores per column -> top vertical columns; sum per diagonal
    -> top slash offsets. q/k [B, S, H, D] (uses batch 0)."""
    b, s, h, d = q.shape
    sm = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    qt = jnp.swapaxes(q[0, -last_q:], 0, 1).astype(jnp.float32)  # [H, lq, D]
    kt = jnp.swapaxes(k[0], 0, 1).astype(jnp.float32)  # [H, S, D]
    scores = jnp.einsum("hqd,hkd->hqk", qt, kt) * sm
    rows = s - last_q + jnp.arange(last_q)[:, None]
    cols = jnp.arange(s)[None, :]
    scores = jnp.where(cols <= rows, scores, -jnp.inf)  # mask BEFORE
    # softmax: post-softmax zeroing lets future columns absorb mass and
    # deflates the valid columns' estimated importance
    scores = jax.nn.softmax(scores, axis=-1)
    col_mass = scores.sum(axis=1)  # [H, S]
    _, v_idx = jax.lax.top_k(col_mass, num_vertical)
    # diagonal mass: offset o = row - col in [0, S)
    offs = rows - cols  # [lq, S]
    diag_mass = jnp.zeros((h, s))
    diag_mass = diag_mass.at[:, jnp.clip(offs, 0, s - 1).reshape(-1)].add(
        scores.reshape(h, -1), mode="drop"
    )
    _, s_idx = jax.lax.top_k(diag_mass, num_slash)
    return v_idx.astype(jnp.int32), s_idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Tile-skipping block-sparse kernel (reference sparse_attn_func)
# ---------------------------------------------------------------------------


def _bs_kernel(bc_ref, bo_ref, cc_ref,      # prefetch [B,H,R], [B,H,R,NS], [B,H,R]
               kvl_ref,                     # prefetch [B] per-seq kv length
               q_ref,                       # VMEM [1,1,bm,D]
               ci_ref,                      # VMEM [1,1,R,NVp] int32 column ids
               kc_ref, vc_ref,              # VMEM [1,1,1,NVp,D] gathered columns
               k_hbm, v_hbm,                # ANY [B,H,Sk,D]
               *refs,                       # o_ref [,lse_ref], then scratch
               bm: int, bn: int, ns: int, causal: bool, sm_scale: float,
               softcap: float = 0.0, with_lse: bool = False):
    if with_lse:
        o_ref, lse_ref = refs[0], refs[1]
        kb, vb, in_sem = refs[2:]
    else:
        o_ref = refs[0]
        kb, vb, in_sem = refs[1:]
    b, h, r = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb = bc_ref[b, h, r]
    cc = cc_ref[b, h, r]
    kvl = kvl_ref[b]
    nvp = ci_ref.shape[-1]
    d = q_ref.shape[-1]
    rows = r * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    q = q_ref[0, 0]

    def dmas(t, slot):
        off = bo_ref[b, h, r, t]
        return (
            pltpu.make_async_copy(k_hbm.at[b, h, pl.ds(off, bn), :], kb.at[slot], in_sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, h, pl.ds(off, bn), :], vb.at[slot], in_sem.at[slot, 1]),
        )

    @pl.when(nb > 0)
    def _warm():
        for dma in dmas(0, 0):
            dma.start()

    # --- stage 1: exact vertical columns (gathered to VMEM by the caller)
    colids = ci_ref[0, 0, r]  # [NVp] (full-R block: Mosaic last-two-dims rule)
    s_cols = jax.lax.dot_general(
        q, kc_ref[0, 0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [bm, NVp]
    if softcap > 0.0:
        s_cols = softcap * jnp.tanh(s_cols / softcap)
    cmask = jax.lax.broadcasted_iota(jnp.int32, (bm, nvp), 1) < cc
    cmask = cmask & (colids[None, :] < kvl)
    if causal:
        cmask = cmask & (colids[None, :] <= rows)
    s_cols = jnp.where(cmask, s_cols, -jnp.inf)
    m0 = jnp.maximum(jnp.max(s_cols, axis=-1, keepdims=True), -1e30)  # [bm,1]
    p0 = jnp.exp(s_cols - m0)
    l0 = jnp.sum(p0, axis=-1, keepdims=True)
    acc0 = jax.lax.dot_general(
        p0.astype(kc_ref.dtype), vc_ref[0, 0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, D]

    # --- stage 2: slash KV blocks, double-buffered stream
    def body(t, carry):
        m, l, acc = carry

        @pl.when(t + 1 < nb)
        def _next():
            for dma in dmas(t + 1, jax.lax.rem(t + 1, 2)):
                dma.start()

        slot = jax.lax.rem(t, 2)
        for dma in dmas(t, slot):
            dma.wait()
        off = bo_ref[b, h, r, t]
        s_blk = jax.lax.dot_general(
            q, kb[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [bm, bn]
        if softcap > 0.0:
            s_blk = softcap * jnp.tanh(s_blk / softcap)
        # a scheduled block may overlap past this sequence's kv_len
        # (offsets are clamped to start < kv_len, not end <= kv_len);
        # varlen rectangles zero-pad those rows, so mask them here
        cols = off + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        blk_mask = cols < kvl
        if causal:
            blk_mask = blk_mask & (cols <= rows)
        s_blk = jnp.where(blk_mask, s_blk, -jnp.inf)
        mb = jnp.maximum(jnp.max(s_blk, axis=-1, keepdims=True), -1e30)
        mn = jnp.maximum(m, mb)
        alpha = jnp.exp(m - mn)
        p = jnp.exp(s_blk - mn)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (mn, l, acc)

    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    o_ref[0, 0] = jnp.where(l > 0, acc / jnp.maximum(l, 1e-38), 0.0).astype(o_ref.dtype)
    if with_lse:
        lse = jnp.where(
            l[:, 0] > 0, m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-38)), -jnp.inf
        ).astype(lse_ref.dtype)
        # [B*H, 8, Sq] 8-row broadcast tile (Mosaic last-two-dims rule)
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size_M", "block_size_N", "causal", "sm_scale", "softcap", "return_lse",
    ),
)
def sparse_attn_func(
    q,
    k,
    v,
    block_count,
    block_offset,
    column_count,
    column_index,
    *,
    block_size_M: int = 64,
    block_size_N: int = 128,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    softcap: float = 0.0,
    return_lse: bool = False,
    kv_lens=None,
):
    """Block-sparse attention over the vertical/slash schedule (reference
    sparse_flash_attn.py::sparse_attn_func; kernels declared-only on XPU).

    q/k/v [B, S, H, D] (self-attention, q_len == kv_len); schedule arrays
    from ``convert_vertical_slash_indexes`` with R = ceil(S/block_size_M):
    block_count [B,H,R], block_offset [B,H,R,NS] (block_size_N-aligned KV
    starts), column_count [B,H,R], column_index [B,H,R,NV]. Returns
    [B, S, H, D]. Positions inside a selected block are all attended
    (block-granular, matching MInference); vertical columns are exact.
    """
    b, s, h, d = q.shape
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (d**0.5)
    bm, bn = block_size_M, block_size_N
    r = cdiv(s, bm)
    ns = block_offset.shape[-1]
    nv = column_index.shape[-1]
    nvp = round_up(nv, 128)

    qt = jnp.swapaxes(q, 1, 2)  # [B, H, S, D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    sq = r * bm
    sk = round_up(s, bn)
    if sq != s:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq - s), (0, 0)))
    if sk != s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk - s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk - s), (0, 0)))

    ci = column_index.astype(jnp.int32)
    if nvp != nv:
        ci = jnp.pad(ci, ((0, 0), (0, 0), (0, 0), (0, nvp - nv)))
    # one XLA gather per prefill: exact vertical columns -> [B, H, R, NVp, D]
    bi = jnp.arange(b)[:, None, None, None]
    hi = jnp.arange(h)[None, :, None, None]
    kc = kt[bi, hi, ci, :]
    vc = vt[bi, hi, ci, :]

    kernel = functools.partial(
        _bs_kernel, bm=bm, bn=bn, ns=ns, causal=causal, sm_scale=sm_scale,
        softcap=softcap, with_lse=return_lse,
    )
    out_shapes = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, bm, d), lambda b_, h_, r_, *pf: (b_, h_, r_, 0))]
    if return_lse:
        # [B*H, 8, Sq] with an 8-row broadcast per tile (Mosaic block rule)
        out_shapes.append(jax.ShapeDtypeStruct((b * h, 8, sq), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 8, bm), lambda b_, h_, r_, *pf, _h=h: (b_ * _h + h_, 0, r_)))
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h, r),
            in_specs=[
                pl.BlockSpec((1, 1, bm, d), lambda b_, h_, r_, *pf: (b_, h_, r_, 0)),
                # full-R block: a (1,1,1,nvp) tile trips Mosaic's
                # last-two-dims rule (R not divisible by 8); R*nvp int32
                # is tiny, so load all rows and slice in-kernel
                pl.BlockSpec((1, 1, r, nvp), lambda b_, h_, r_, *pf: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, 1, nvp, d), lambda b_, h_, r_, *pf: (b_, h_, r_, 0, 0)),
                pl.BlockSpec((1, 1, 1, nvp, d), lambda b_, h_, r_, *pf: (b_, h_, r_, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, bn, d), kt.dtype),
                pltpu.VMEM((2, bn, d), vt.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(
        block_count.astype(jnp.int32),
        block_offset.astype(jnp.int32),
        column_count.astype(jnp.int32),
        (jnp.full((b,), s, jnp.int32) if kv_lens is None
         else jnp.asarray(kv_lens).astype(jnp.int32)),
        qt, ci, kc, vc, kt, vt,
    )
    out = jnp.swapaxes(res[0][:, :, :s], 1, 2)
    if return_lse:
        return out, res[1][:, 0, :].reshape(b, h, sq)[:, :, :s]  # lse [B, H, S]
    return out


def sparse_attn_varlen_func(
    q,
    k,
    v,
    block_count,
    block_offset,
    column_count,
    column_index,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    return_softmax_lse: bool = False,
    block_size_M: int = 64,
    block_size_N: int = 64,
):
    """Variable-length vertical+slash sparse attention (reference
    sparse_attn_varlen_func, sparse_flash_attn.py:851-935; block_size_N
    defaults to the reference's 64 — block_offset entries are
    block_size_N-granular, so the default must match the schedules
    ``convert_vertical_slash_indexes`` emits for reference callers).

    q [total_q, H, D]; k/v [total_k, Hk, D] (GQA: Hk divides H); schedule
    arrays [B, H, R(, NNZ)] from ``convert_vertical_slash_indexes`` with
    R >= ceil(max_seqlen_q / block_size_M) (the reference contract; when
    the kernel's rectangle S = round_up(max(max_seqlen_q, max_seqlen_k),
    block_size_M) needs more rows, the schedules are zero-padded here —
    padded query tiles schedule no work); cu_seqlens host int arrays
    [B+1]. The ragged stream is scattered into the [B, S] rectangle once,
    runs the tile-skipping kernel (per-sequence schedules already stop at
    each sequence's length — skipped padding tiles cost nothing), and
    gathers the ragged rows back.
    With ``causal`` each sequence must have q_len == kv_len (the
    MInference prefill contract this schedule encodes; the top-left-
    aligned extend form is not defined for vertical/slash schedules).

    Returns out [total_q, H, D] (+ lse [H, total_q] f32 when
    ``return_softmax_lse``, the reference's layout).
    """
    import numpy as np

    cu_q = np.asarray(cu_seqlens_q, np.int64)
    cu_k = np.asarray(cu_seqlens_k, np.int64)
    nb = len(cu_q) - 1
    q_lens = cu_q[1:] - cu_q[:-1]
    k_lens = cu_k[1:] - cu_k[:-1]
    if causal:
        assert (q_lens == k_lens).all(), (
            "causal sparse_attn_varlen_func requires q_len == kv_len per "
            f"sequence (got q={q_lens.tolist()}, k={k_lens.tolist()})")
    h, d = q.shape[1], q.shape[2]
    hk = k.shape[1]
    s = round_up(max(int(max_seqlen_q), int(max_seqlen_k)), block_size_M)

    def to_rect(x, cu, lens):
        # [total, Hx, D] -> [B, S, Hx, D]; padding rows read row `total`
        # of a zero-extended copy (gather-with-drop)
        pos = cu[:-1, None] + np.arange(s)[None, :]
        pad = pos >= cu[1:, None]
        pos = np.where(pad, x.shape[0], pos)
        xz = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
        return xz[jnp.asarray(pos, jnp.int32)]

    # zero-pad the schedule arrays' R dim up to the kernel rectangle's
    # row count (max_seqlen_k > max_seqlen_q makes S/bm exceed the
    # documented ceil(max_q/bm) — advisor r4: callers following the
    # reference contract crashed on a BlockSpec shape mismatch)
    r_rect = s // block_size_M

    def pad_r(x):
        x = jnp.asarray(x)
        if x.shape[2] < r_rect:
            pad = [(0, 0)] * x.ndim
            pad[2] = (0, r_rect - x.shape[2])
            return jnp.pad(x, pad)
        return x

    block_count, block_offset, column_count, column_index = (
        pad_r(block_count), pad_r(block_offset), pad_r(column_count),
        pad_r(column_index))

    qr = to_rect(q, cu_q, q_lens)
    kr = to_rect(k, cu_k, k_lens)
    vr = to_rect(v, cu_k, k_lens)
    if hk != h:
        assert h % hk == 0, (h, hk)
        kr = jnp.repeat(kr, h // hk, axis=2)
        vr = jnp.repeat(vr, h // hk, axis=2)

    res = sparse_attn_func(
        qr, kr, vr, block_count, block_offset, column_count, column_index,
        block_size_M=block_size_M, block_size_N=block_size_N, causal=causal,
        sm_scale=softmax_scale, softcap=softcap, return_lse=return_softmax_lse,
        kv_lens=jnp.asarray(k_lens, jnp.int32),
    )
    out_r = res[0] if return_softmax_lse else res
    # gather the ragged rows back: token t of seq b = rect row (b, t)
    flat_b = np.concatenate([np.full(int(l), i) for i, l in enumerate(q_lens)]) if nb else np.zeros(0, np.int64)
    flat_t = np.concatenate([np.arange(int(l)) for l in q_lens]) if nb else np.zeros(0, np.int64)
    bi = jnp.asarray(flat_b, jnp.int32)
    ti = jnp.asarray(flat_t, jnp.int32)
    out = out_r[bi, ti]
    if return_softmax_lse:
        lse = res[1][bi, :, ti]  # [total_q, H] -> [H, total_q]
        return out, jnp.swapaxes(lse, 0, 1)
    return out
