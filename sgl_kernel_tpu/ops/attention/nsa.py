"""NSA / DSv3.2 sparse-attention indexer + sparse MLA.

TPU-native equivalents of the reference's sparse pipeline (SURVEY §5):
fp8 MQA logits (src/sycl/Fp8MqaLogitsXe20.cpp + python nsa.py), fast radix
top-k with fixed k=2048 (src/sycl/TopKTransform.cpp; python top_k.py:27-33),
and top-k-indexed sparse MLA attention (src/sycl/mla_sparse_decode.cpp).

Design follows the reference's own default: the 2-stage gather->dense
scheme (src/CMakeLists.txt:19-23 chooses gather as the default over the
fused single-pass variant) — XLA's native gather pulls the selected latent
rows at HBM speed, then dense attention runs over the gathered block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up
from .mla import D_CKV, D_LATENT, D_ROPE
from .paged_decode_dma import _upcast

FAST_TOPK_K = 2048  # reference contract: fixed topk (top_k.py:27-33)


def _mqa_logits_kernel(
    lens_ref, pt_ref,          # scalar prefetch [B], [B, n_blocks]
    q_ref,                     # VMEM [B, Hp, D] bf16
    w_ref,                     # VMEM [B, Hp] f32
    k_hbm,                     # ANY [P, page, D]
    ks_hbm,                    # ANY [P, page] f32 or None
    out_hbm,                   # ANY [B, n_blocks*page] f32 (output)
    kb, ksb, ob,               # scratch: [2, cpp, page, D], [2, cpp, page] f32, [2, span] f32
    in_sem, out_sem,           # DMA sems (2, 2) / (2,)
    *,
    page: int,
    cpp: int,
    n_chunks: int,
    batch: int,
    has_scale: bool,
):
    """Streaming NSA indexer scoring (reference Fp8MqaLogitsXe20.cpp +
    the 2-stage schedule in fp8_paged_mqa_logits.py): folds every
    (sequence, chunk) into one flat double-buffered DMA loop — the paged
    KV is never materialized in HBM (the round-1 XLA path gathered
    [B, max_tokens, D], an O(ctx) blowup per decode step)."""
    span = page * cpp

    def seq_of(t):
        return t // n_chunks

    def chunk_of(t):
        return jax.lax.rem(t, n_chunks)

    def valid(t):
        return chunk_of(t) * span < lens_ref[seq_of(t)]

    def in_dmas(t, slot):
        i, c = seq_of(t), chunk_of(t)
        out = []
        for j in range(cpp):
            pid = pt_ref[i, c * cpp + j]
            out.append(pltpu.make_async_copy(k_hbm.at[pid], kb.at[slot, j], in_sem.at[slot, 0]))
            if has_scale:
                out.append(pltpu.make_async_copy(ks_hbm.at[pid], ksb.at[slot, j], in_sem.at[slot, 1]))
        return out

    def out_dma(t, slot):
        i, c = seq_of(t), chunk_of(t)
        # 2-D [1, span] descriptors end-to-end: the 1-D [span] form fed
        # Mosaic 1-D VMEM stores + DMAs and the kernel never lowered on
        # real TPU (HTTP 500 at every probed shape, round-5 regen)
        return pltpu.make_async_copy(
            ob.at[slot], out_hbm.at[pl.ds(i, 1), pl.ds(c * span, span)],
            out_sem.at[slot]
        )

    T = batch * n_chunks

    @pl.when(valid(0))
    def _warm():
        for d in in_dmas(0, 0):
            d.start()

    def body(t, carry):
        in_issued, done = carry
        nxt = jnp.logical_and(t + 1 < T, valid(t + 1))

        @pl.when(nxt)
        def _next():
            for d in in_dmas(t + 1, jax.lax.rem(in_issued, 2)):
                d.start()
        in_issued = in_issued + jnp.where(nxt, 1, 0)

        @pl.when(valid(t))
        def _this():
            slot = jax.lax.rem(done, 2)
            for d in in_dmas(t, slot):
                d.wait()
            # the out DMA issued 2 valid-chunks ago reused this ob slot
            @pl.when(done >= 2)
            def _drain():
                out_dma(t, slot).wait()
            i = seq_of(t)
            k = _upcast(kb[slot].reshape(span, -1), q_ref.dtype)
            sc = jax.lax.dot_general(
                q_ref[i], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hp, span]
            logits = jax.lax.dot_general(
                w_ref[i].reshape(1, -1), jnp.maximum(sc, 0.0),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [1, span]
            if has_scale:
                logits = logits * ksb[slot].reshape(1, span)
            ob[slot] = logits
            out_dma(t, slot).start()
        done = done + jnp.where(valid(t), 1, 0)
        return (in_issued, done)

    init = jnp.where(valid(0), 1, 0)
    _, done = jax.lax.fori_loop(0, T, body, (init, 0))

    # drain the in-flight output DMAs (shape-identical descriptors; the
    # wait is on the semaphore + byte count)
    @pl.when(done >= 1)
    def _d1():
        out_dma(0, jax.lax.rem(done - 1, 2)).wait()

    @pl.when(done >= 2)
    def _d2():
        out_dma(0, jax.lax.rem(done - 2, 2)).wait()


@functools.partial(jax.jit, static_argnames=("chunk_pages",))
def fp8_paged_mqa_logits(q, kv_pages, weights, lengths, page_table,
                         kv_scales=None, *, chunk_pages: int = 16):
    """Indexer scoring: logits[b, t] = sum_h w[b,h] * relu(q[b,h] . k[t]) * s[t].

    q: [B, H, D] (fp8 or bf16); kv_pages: [P, page, D] (fp8 or bf16);
    weights: [B, H] (or [H], broadcast); kv_scales: optional [P, page] f32
    per-token descale (the reference packs fp8 row + f32 scale into one
    132-byte cache line, nsa.py:159); lengths [B]; page_table [B, max_pages].
    Returns logits [B, max_tokens] f32 with -inf beyond length (reference
    fp8_paged_mqa_logits, torch_extension_sycl.cc:489-493).

    Pallas manual-DMA streaming kernel — the selected pages stream through
    a double-buffered VMEM window; nothing O(ctx) is materialized.
    """
    b, h, d = q.shape
    n_pages, page, _ = kv_pages.shape
    n_blocks = page_table.shape[1]
    max_tokens = n_blocks * page
    if weights.ndim == 1:
        weights = jnp.broadcast_to(weights[None, :], (b, h))

    hp = round_up(h, 8)
    # compute dtype: fp8 operands upcast to bf16 (MXU-native); f32 stays f32
    if q.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        qf = _upcast(q, jnp.bfloat16)
    elif q.dtype == jnp.float32 and kv_pages.dtype == jnp.float32:
        qf = q
    else:
        qf = q.astype(jnp.bfloat16)
    if hp != h:
        qf = jnp.pad(qf, ((0, 0), (0, hp - h), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, hp - h)))
    wf = weights.astype(jnp.float32)

    if not pallas_interpret():
        # Mosaic has never lowered the streaming kernel on real TPU (HTTP
        # 500 at every probed shape, incl. the 2-D logits form — round-5
        # probes); gather the used pages via XLA and run the dense relu-
        # weighted einsum instead (the d%128 decode-fallback precedent).
        # At decode geometry this materializes b*max_tokens*d (~33 MB at
        # B=16 ctx=8192). The streaming kernel remains for interpret mode
        # and future toolchains.
        pt = jnp.clip(page_table.astype(jnp.int32), 0, n_pages - 1)
        kg = kv_pages[pt].reshape(b, max_tokens, d)
        if kv_pages.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            kg = _upcast(kg, jnp.bfloat16)
        sc = jax.lax.dot_general(
            qf, kg.astype(qf.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [B, Hp, T]
        logits = jnp.einsum("bh,bht->bt", wf, jnp.maximum(sc, 0.0))
        if kv_scales is not None:
            logits = logits * kv_scales.astype(jnp.float32)[pt].reshape(b, max_tokens)
        pos = jnp.arange(max_tokens)[None, :]
        return jnp.where(pos < lengths[:, None], logits, -jnp.inf)

    cpp = min(chunk_pages, n_blocks, max(1, 2048 // page))
    if n_blocks % cpp:
        pad = cpp - n_blocks % cpp
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        n_blocks += pad
    n_chunks = n_blocks // cpp
    span = page * cpp
    has_scale = kv_scales is not None

    inputs = [qf, wf, kv_pages]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # q/w live in VMEM blocks (whole array)
    in_specs[0] = pl.BlockSpec((b, hp, d), lambda g, lens, pt: (0, 0, 0))
    in_specs[1] = pl.BlockSpec((b, hp), lambda g, lens, pt: (0, 0))
    if has_scale:
        inputs.append(kv_scales.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    kernel = functools.partial(
        _mqa_logits_entry,
        page=page, cpp=cpp, n_chunks=n_chunks, batch=b, has_scale=has_scale,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((2, cpp, page, d), kv_pages.dtype),
                pltpu.VMEM((2, cpp, page), jnp.float32),
                pltpu.VMEM((2, 1, span), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, n_blocks * page), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * max_tokens * d,
            bytes_accessed=b * max_tokens * d * kv_pages.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), *inputs)[0]

    pos = jnp.arange(n_blocks * page)[None, :]
    out = jnp.where(pos < lengths[:, None], out, -jnp.inf)
    return out[:, :max_tokens] if out.shape[1] != max_tokens else out


def _mqa_logits_entry(lens_ref, pt_ref, q_ref, w_ref, k_hbm, *rest, has_scale, **kw):
    if has_scale:
        ks_hbm, out_hbm = rest[0], rest[1]
        rest = rest[2:]
    else:
        ks_hbm, out_hbm = None, rest[0]
        rest = rest[1:]
    kb, ksb, ob, in_sem, out_sem = rest
    _mqa_logits_kernel(
        lens_ref, pt_ref, q_ref, w_ref, k_hbm, ks_hbm, out_hbm,
        kb, ksb, ob, in_sem, out_sem, has_scale=has_scale, **kw,
    )


@functools.partial(jax.jit, static_argnames=("clean_logits",))
def fp8_mqa_logits(q_fp8, kv_fp8, weights, ks, ke, clean_logits: bool = False):
    """Ragged (prefill/extend) NSA indexer scores (reference nsa.py:112-142):
    q_fp8 [Nq, H, D] fp8; kv_fp8 = (k_fp8 [Nk, D], k_scale [Nk] f32);
    weights [Nq, H] f32 head gates; ks/ke [Nq] visibility range.
    score[i, j] = sum_h relu(q_i_h . k_j) * w[i, h] * k_scale[j], masked to
    [ks_i, ke_i). The MXU runs the dots in bf16 (fp8 operands upcast on
    read); XLA fuses the relu/weight/scale epilogue."""
    k_fp8, k_scale = kv_fp8
    nq, h, d = q_fp8.shape
    qf = q_fp8.astype(jnp.bfloat16).reshape(nq * h, d)
    kf = k_fp8.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    score = jnp.sum(
        jax.nn.relu(dots.reshape(nq, h, -1)) * weights[..., None].astype(jnp.float32), axis=1
    ) * k_scale[None, :].astype(jnp.float32)
    j = jnp.arange(kf.shape[0], dtype=jnp.int32)[None, :]
    mask = (j >= ks[:, None]) & (j < ke[:, None])
    # clean_logits (reference contract): out-of-window scores become -inf
    # so a direct top_k can never select invisible positions (0.0 would
    # outrank in-window negatives — gate weights can be negative)
    fill = -jnp.inf if clean_logits else 0.0
    return jnp.where(mask, score, fill)


@functools.partial(jax.jit, static_argnames=("topk",))
def fast_topk(logits, lengths, topk: int = FAST_TOPK_K):
    """Top-k token indices per row (fixed k; short rows pad with -1).

    Reference: fast_topk (TopKTransform.cpp; radix select on Xe — on TPU a
    single fused sort is bandwidth-optimal)."""
    b, t = logits.shape
    k = min(topk, t)
    _, idx = jax.lax.top_k(logits, k)
    rank = jnp.arange(k)[None, :]
    valid = rank < jnp.minimum(lengths, k)[:, None]
    idx = jnp.where(valid, idx, -1)
    if k < topk:
        idx = jnp.pad(idx, ((0, 0), (0, topk - k)), constant_values=-1)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("page_size", "topk"))
def fast_topk_transform_fused(logits, lengths, src_page_table, page_size: int, topk: int = FAST_TOPK_K):
    """fast_topk fused with page-table transform: returns the *flat slot
    ids* of the selected tokens (src page table applied), the layout the
    sparse MLA gather consumes (reference fast_topk_transform_fused writes
    the dst page table directly)."""
    idx = fast_topk(logits, lengths, topk)  # token positions or -1
    pages = src_page_table[jnp.arange(idx.shape[0])[:, None], jnp.maximum(idx, 0) // page_size]
    slots = pages * page_size + jnp.maximum(idx, 0) % page_size
    return jnp.where(idx >= 0, slots, -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("page_size", "topk"))
def fast_topk_transform_ragged_fused(logits, ks, ke, src_page_table, page_size: int, topk: int = FAST_TOPK_K):
    """Ragged variant of fast_topk_transform_fused (reference top_k.py):
    visibility window [ks, ke) per query instead of [0, length)."""
    nq, nk = logits.shape
    j = jnp.arange(nk, dtype=jnp.int32)[None, :]
    masked = jnp.where((j >= ks[:, None]) & (j < ke[:, None]), logits, -jnp.inf)
    k = min(topk, nk)  # short KV (< topk cached tokens) clamps like fast_topk
    _, idx = jax.lax.top_k(masked, k)
    valid = jnp.take_along_axis(masked, idx, axis=1) > -jnp.inf
    pages = jnp.take_along_axis(src_page_table, idx // page_size, axis=1)
    slots = pages * page_size + idx % page_size
    out = jnp.where(valid, slots, -1)
    if k < topk:
        out = jnp.pad(out, ((0, 0), (0, topk - k)), constant_values=-1)
    return out


@functools.partial(jax.jit, static_argnames=("sm_scale", "return_lse", "page"))
def sparse_mla_decode(q_nope, q_pe, kv_pool_flat, slot_indices, *,
                      sm_scale: Optional[float] = None,
                      topk_length=None,
                      extra_pool_flat=None, extra_indices=None,
                      extra_topk_length=None,
                      attn_sink=None,
                      return_lse: bool = False,
                      page: int = 1024):
    """Sparse MLA decode over top-k selected latent rows — 2-stage
    gather->dense (the reference's default scheme, mla_sparse_decode.cpp +
    src/CMakeLists.txt:19-23), TPU-native:

    Stage 1 gathers the selected rows at HBM speed with XLA's native
    gather, PRESERVING the pool dtype (fp8 latent pools stay fp8 — the
    round-2 implementation upcast everything to f32, 4x the bytes).
    Stage 2 views the gathered [B, K, 576] block as a contiguous
    pseudo-paged pool and runs the tuned manual-DMA MLA decode kernel
    (ops/attention/mla.py) over it — f32 online softmax, in-kernel fp8
    upcast, same kernel the dense path trusts.

    q_nope [B, H, 512]; q_pe [B, H, 64]; kv_pool_flat [num_slots, 576];
    slot_indices [B, K] flat slots from fast_topk_transform_fused, valid
    entries first, -1 padding suffix (the fast_topk contract). Optional
    reference-parity surface (sgl_flash_kernel_ops.h:96-139):
    ``topk_length`` [B] valid counts (default: counted from the -1s);
    dual pools via ``extra_pool_flat``/``extra_indices``/
    ``extra_topk_length`` (combined with merge_state — the split-KV
    reduce the reference runs as a second kernel); per-head ``attn_sink``
    (natural-log logits, applied once post-merge like the gpt-oss path).
    Returns [B, H, 512] (+ base-2 lse [B, H] when return_lse).
    """
    from .merge_state import apply_sinks, merge_state
    from .mla import mla_decode

    b, h, _ = q_nope.shape
    sm_scale = sm_scale if sm_scale is not None else 1.0 / (D_CKV**0.5)

    def one_pool(pool, idx, tl):
        kk = idx.shape[1]
        # the gathered pseudo-pool is contiguous, so the page size is free
        # to choose: BIG pages amortize the decode pipeline's per-step cost
        # (602-647 vs 206-262 GB/s at page=128 — docs/PERF.md round 4)
        pg = min(page, kk)
        while kk % pg:
            pg //= 2
        if tl is None:
            tl = jnp.sum(idx >= 0, axis=1)
        tl = tl.astype(jnp.int32)
        d = pool.shape[-1]
        rows = pool[jnp.maximum(idx, 0).reshape(-1)].reshape(b, kk, d)
        cache = rows.reshape(b * (kk // pg), pg, d)
        pt = jnp.arange(b * (kk // pg), dtype=jnp.int32).reshape(b, kk // pg)
        o, lse = mla_decode(q_nope, q_pe, cache, jnp.maximum(tl, 1), pt,
                            sm_scale=sm_scale, return_lse=True)
        # an empty selection contributes nothing to the merge
        empty = tl == 0
        o = jnp.where(empty[:, None, None], 0.0, o.astype(jnp.float32))
        lse = jnp.where(empty[:, None], -jnp.inf, lse)
        return o, lse

    o, lse = one_pool(kv_pool_flat, slot_indices, topk_length)
    if extra_pool_flat is not None:
        o2, lse2 = one_pool(extra_pool_flat, extra_indices, extra_topk_length)
        o, lse = merge_state(o, lse, o2, lse2)
        # BOTH pools empty for a row: merge_state of two -inf lses is
        # exp2(-inf - -inf) = NaN — re-assert the empty contract (zeros).
        # (lengths default to counting the -1 padding, like one_pool)
        tl1 = jnp.sum(slot_indices >= 0, axis=1) if topk_length is None else topk_length
        tl2 = jnp.sum(extra_indices >= 0, axis=1) if extra_topk_length is None else extra_topk_length
        both_empty = (tl1 == 0) & (tl2 == 0)
        o = jnp.where(both_empty[:, None, None], 0.0, o)
        lse = jnp.where(both_empty[:, None], -jnp.inf, lse)
    if attn_sink is not None:
        o = apply_sinks(o, lse, attn_sink)
        if return_lse:
            lse = lse + jnp.log1p(
                jnp.exp2(attn_sink[None, :].astype(jnp.float32) * 1.4426950408889634 - lse)
            ) * 1.4426950408889634
    o = o.astype(q_nope.dtype)
    return (o, lse) if return_lse else o


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def sparse_mla_prefill(q_nope, q_pe, kv_pool_flat, slot_indices, *, sm_scale: Optional[float] = None):
    """Ragged-prefill variant: per-token index sets.

    q_nope [T, H, 512]; q_pe [T, H, 64]; slot_indices [T, K].
    Returns [T, H, 512]. (Same math as decode — per-token index sets make
    prefill and decode identical after the gather.)"""
    return sparse_mla_decode(q_nope, q_pe, kv_pool_flat, slot_indices, sm_scale=sm_scale)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_k_indexer_norm_rope_quant_store(
    k, positions, cos_sin_cache, norm_weight, idx_cache, idx_scale_cache, slot_loc, *, eps: float = 1e-6
):
    """DSv4 k-indexer ingest (reference compress_norm_rope_store indexer
    path, fused_norm_rope_v2_torch.py:474-557 — there the fp8 row + f32
    scale pack into one 132-byte cache slot; here they live in two
    aligned pools, the TPU-native layout): RMSNorm -> RoPE -> hadamard ->
    per-token fp8 quant -> scatter at slot_loc.

    k [T, D]; idx_cache [S, D] fp8; idx_scale_cache [S] f32; slot_loc [T]
    (−1 drops). Returns the updated (idx_cache, idx_scale_cache).
    """
    from ..hadamard import hadamard_transform
    from ..norm import rmsnorm
    from ..quant import per_token_quant_fp8
    from ..rope import rotary_embedding

    t, d = k.shape
    kn = rmsnorm(k, norm_weight, eps)
    k_rot, _ = rotary_embedding(positions, kn[:, None, :], None, d, cos_sin_cache)
    k_had = hadamard_transform(k_rot[:, 0], scale=1.0 / (d**0.5))
    k8, scale = per_token_quant_fp8(k_had)
    smax = idx_cache.shape[0]
    safe = jnp.where(slot_loc >= 0, slot_loc, smax)
    idx_cache = idx_cache.at[safe].set(k8, mode="drop")
    idx_scale_cache = idx_scale_cache.at[safe].set(scale.reshape(t), mode="drop")
    return idx_cache, idx_scale_cache


@jax.jit
def fused_q_indexer_rope_hadamard_quant(q, positions, cos_sin_cache):
    """DSv4 q-indexer preprocessing (reference
    fused_q_indexer_rope_hadamard_quant_torch.py): RoPE the query, apply a
    128-point Walsh-Hadamard rotation (1/sqrt(D) normalized), then
    per-token fp8 e4m3 quantization.

    q [T, H, D] (D a power of two, 128 in DSv4); returns (q_fp8, scales
    [T, H, 1]).
    """
    from ..hadamard import hadamard_transform
    from ..quant import per_token_quant_fp8
    from ..rope import rotary_embedding

    t, h, d = q.shape
    q_rot, _ = rotary_embedding(positions, q, None, d, cos_sin_cache)
    q_had = hadamard_transform(q_rot, scale=1.0 / (d**0.5))
    return per_token_quant_fp8(q_had)
