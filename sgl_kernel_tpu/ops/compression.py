"""DSv4 KV compression ("flash compress") — core math.

TPU-native implementation of the reference's compression reduce
(src/sycl/FlashCompress4.cpp / FlashCompress128.cpp; pure-torch oracle
python/sgl_kernel/flash_compress_4.py:96-148): a window of W KV rows is
pooled into one compressed token by a per-channel softmax over learned
score channels plus an additive positional embedding:

    w   = softmax(scores[window] + ape, axis=window)
    out = sum(kv[window] * w, axis=window)

c4 uses overlapping windows (W = 8 = 2*ratio, stride 4); c128 uses plain
windows (W = ratio = 128). The reference's device-built ring-buffer plans
(CompressPlan.cpp) are serving-pool plumbing around this reduce; here the
windowed form operates on explicit sequences — the ring-buffer pool
orchestration is round-2 surface (tracked in README).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def compress_window(kv, scores, ape):
    """kv/scores [..., W, D]; ape [W, D]. Returns [..., D]."""
    s = scores.astype(jnp.float32) + ape.astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-2)
    return jnp.sum(kv.astype(jnp.float32) * w, axis=-2)


@functools.partial(jax.jit, static_argnames=("compress_ratio",))
def compress_sequence(kv, scores, ape, compress_ratio: int = 4):
    """Compress a full sequence: kv/scores [T, D] -> [T // ratio, D].

    ratio 4: overlapping windows of 8 (events at positions 4k+3 pool tokens
    [4k-4, 4k+4), the first window zero-padded with -inf scores — matching
    the c4 overlap semantics). ratio 128 (or any other): plain windows.
    """
    t, d = kv.shape
    r = compress_ratio
    n = t // r
    if r == 4:
        pad_kv = jnp.concatenate([jnp.zeros((r, d), kv.dtype), kv[: n * r]], axis=0)
        pad_sc = jnp.concatenate(
            [jnp.full((r, d), -jnp.inf, jnp.float32), scores[: n * r].astype(jnp.float32)], axis=0
        )
        # one gather, not n traced slices (n = 32k at 128k-token prefills)
        idx = jnp.arange(n)[:, None] * r + jnp.arange(2 * r)[None, :]
        win_kv = pad_kv[idx]  # [n, 2r, D]
        win_sc = pad_sc[idx]
        assert ape.shape[0] == 2 * r
    else:
        win_kv = kv[: n * r].reshape(n, r, d)
        win_sc = scores[: n * r].reshape(n, r, d)
        assert ape.shape[0] == r
    return compress_window(win_kv, win_sc, ape).astype(kv.dtype)


# ---------------------------------------------------------------------------
# serving-pool plumbing: decode-time compress plans + ring-buffer rewrite
# (reference: CompressPlan.cpp plan builders + FlashCompress{4,128} cache
# rewrite with ring buffers; plan tensors are packed int32, dsv4_common.py)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("compress_ratio", "ring_size", "window"))
def plan_compress_decode(lengths, *, compress_ratio: int = 4, ring_size: int = 64, window: int = None):
    """Build the decode-step compress plan.

    A sequence triggers a compress event when its (post-step) length
    crosses a multiple of ``compress_ratio``.  Returns a packed plan:
      src_pos  [B, W] token positions feeding the window (−1 padding for
               the zero-padded first c4 window),
      dst_slot [B]    ring-buffer slot for the compressed token, or −1
               when no event fires this step,
      n_comp   [B]    number of live compressed tokens after the event.
    The ring holds the most recent ``ring_size`` compressed tokens (older
    ones are evicted by overwrite — the reference's ring/SWA-page design).
    """
    r = compress_ratio
    w = window or (2 * r if r == 4 else r)
    event = ((lengths % r) == 0) & (lengths > 0)  # len 0 (padded slot)
    # must NOT fire: an all-(-1) window softmaxes over -inf -> NaN written
    # into a live ring slot
    n_events = lengths // r  # events so far (1-based index of this event)
    # window covers positions [len - w, len)
    start = lengths - w
    src = start[:, None] + jnp.arange(w)[None, :]
    src = jnp.where(event[:, None], src, -1)
    src = jnp.where(src >= 0, src, -1)
    dst = jnp.where(event, (n_events - 1) % ring_size, -1)
    n_comp = jnp.minimum(n_events, ring_size)
    return src.astype(jnp.int32), dst.astype(jnp.int32), n_comp.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("page_size",))
def flash_compress_decode(kv_pool, score_pool, ape, comp_pool, src_pos, dst_slot, page_tables, *, page_size: int):
    """Apply a decode compress plan against paged pools.

    kv_pool/score_pool: flat token pools [P*page, D] (single-head latent
    layout, as the MLA cache); comp_pool [B, ring, D]; src_pos [B, W]
    token *positions* translated through ``page_tables`` [B, maxp];
    dst_slot [B] ring slots (−1 = no event, write dropped).
    Returns the updated comp_pool.
    """
    b, w = src_pos.shape
    d = kv_pool.shape[-1]
    pages = jnp.where(src_pos >= 0, src_pos, 0) // page_size
    offs = jnp.where(src_pos >= 0, src_pos, 0) % page_size
    flat = jnp.take_along_axis(page_tables, pages, axis=1) * page_size + offs
    kv = kv_pool[flat]  # [B, W, D]
    sc = score_pool[flat].astype(jnp.float32)
    sc = jnp.where((src_pos >= 0)[..., None], sc, -jnp.inf)
    out = compress_window(kv, sc, ape).astype(comp_pool.dtype)  # [B, D]
    ring = comp_pool.shape[1]
    safe = jnp.where(dst_slot >= 0, dst_slot, ring)
    return comp_pool.at[jnp.arange(b), safe].set(out, mode="drop")


# named reference-parity entry points (torch_extension_sycl.cc:532-559):
# plan + apply fused per ratio — c4 pools overlapping windows of 8
# (stride 4, first window -inf-padded), c128 plain windows of 128.


@functools.partial(jax.jit, static_argnames=("page_size", "ring_size"))
def flash_compress4_decode(kv_pool, score_pool, ape, comp_pool, lengths,
                           page_tables, *, page_size: int, ring_size: int = 64):
    """c4 decode-step compress: build the event plan for the current
    lengths (event when length crosses a multiple of 4; window = last 8
    tokens) and rewrite the ring buffer. ape [8, D]."""
    src, dst, n_comp = plan_compress_decode(
        lengths, compress_ratio=4, ring_size=ring_size)
    pool = flash_compress_decode(
        kv_pool, score_pool, ape, comp_pool, src, dst, page_tables,
        page_size=page_size)
    return pool, n_comp


@functools.partial(jax.jit, static_argnames=("page_size", "ring_size"))
def flash_compress128_decode(kv_pool, score_pool, ape, comp_pool, lengths,
                             page_tables, *, page_size: int, ring_size: int = 64):
    """c128 decode-step compress: event when length crosses a multiple of
    128; window = last 128 tokens (plain, non-overlapping). ape [128, D]."""
    src, dst, n_comp = plan_compress_decode(
        lengths, compress_ratio=128, ring_size=ring_size)
    pool = flash_compress_decode(
        kv_pool, score_pool, ape, comp_pool, src, dst, page_tables,
        page_size=page_size)
    return pool, n_comp


def flash_compress4_prefill(kv, scores, ape):
    """c4 full-sequence compress (reference flash_compress_4.py:150-209 is
    the pure-torch oracle; overlapping windows of 8, stride 4)."""
    return compress_sequence(kv, scores, ape, compress_ratio=4)


@jax.jit
def c4_window_dual(rows, ape):
    """Reference-exact c4 window pooling over DUAL-channel token rows.

    The reference c4 stores ``elem = 4*head_dim`` per token —
    ``[kv_overlap | kv_fresh | sc_overlap | sc_fresh]`` — and a window's
    OLDER half (positions 0-3, the overlap with the previous window) reads
    the overlap channels while the FRESH half (positions 4-7) reads the
    fresh channels (flash_compress_4.py:90-147 c4_forward_torch: rows
    P-7..P-3 take ``kv[:hd]`` + ``sc[2hd:3hd]``, rows P-3..P take
    ``kv[hd:2hd]`` + ``sc[3hd:4hd]``). A token therefore contributes a
    DIFFERENT projection to each of the two overlapping windows it belongs
    to. ``compress_window`` is the single-channel reduction; this op is
    the dual-channel c4 form.

    rows: [..., 8, 4*hd]; ape: [8, hd]. Masked (padding) rows are signaled
    by -inf in their score channel, as in the single-channel op.
    Returns [..., hd] f32.
    """
    hd = ape.shape[-1]
    assert rows.shape[-2] == 8 and rows.shape[-1] == 4 * hd, (rows.shape, hd)
    kv_ov = rows[..., :4, :hd]
    sc_ov = rows[..., :4, 2 * hd : 3 * hd]
    kv_fr = rows[..., 4:, hd : 2 * hd]
    sc_fr = rows[..., 4:, 3 * hd : 4 * hd]
    kv = jnp.concatenate([kv_ov, kv_fr], axis=-2)
    sc = jnp.concatenate([sc_ov, sc_fr], axis=-2)
    return compress_window(kv, sc, ape)


@functools.partial(jax.jit, static_argnames=())
def compress_sequence_c4_dual(rows, ape):
    """Full-sequence c4 over dual-channel rows [T, 4*hd] -> [T//4, hd]
    (overlapping windows of 8, stride 4; the first window's missing
    overlap half is -inf-masked zeros, matching c4_forward_torch's
    should_overlap=False branch)."""
    t, elem = rows.shape
    hd = elem // 4
    n = t // 4
    # poison the pad rows' score channels so softmax ignores them
    neg = jnp.zeros((4, elem), jnp.float32).at[:, 2 * hd :].set(-jnp.inf)
    pad = jnp.concatenate([neg, rows[: n * 4].astype(jnp.float32)], axis=0)
    idx = jnp.arange(n)[:, None] * 4 + jnp.arange(8)[None, :]
    return c4_window_dual(pad[idx], ape).astype(rows.dtype)


def flash_compress128_prefill(kv, scores, ape):
    """c128 full-sequence compress (FlashCompress128.cpp prefill path)."""
    return compress_sequence(kv, scores, ape, compress_ratio=128)


@functools.partial(jax.jit, static_argnames=("compress_ratio", "ring_size", "window"))
def plan_compress_prefill(lengths, *, compress_ratio: int = 4, ring_size: int = 64, window: int = None):
    """Prefill compress plan: all windows for every already-stored token.

    Returns (src_pos [B, n_max, W], dst_slot [B, n_max], n_comp [B]) where
    n_max = the static per-call window capacity (derived from ring_size):
    windows beyond a sequence's count carry dst_slot = -1. Reference:
    plan_compress_prefill (CompressPlan.cpp); same ring-eviction semantics
    as the decode plan.
    """
    r = compress_ratio
    w = window or (2 * r if r == 4 else r)
    n_max = ring_size
    b = lengths.shape[0]
    n_events = lengths // r  # windows that exist
    # the ring keeps the LAST ring_size windows: event ids
    first = jnp.maximum(n_events - ring_size, 0)
    eid = first[:, None] + jnp.arange(n_max)[None, :]  # [B, n_max]
    live = eid < n_events[:, None]
    end = (eid + 1) * r
    src = end[:, :, None] - w + jnp.arange(w)[None, None, :]
    src = jnp.where(live[:, :, None] & (src >= 0), src, -1)
    dst = jnp.where(live, eid % ring_size, -1)
    return src.astype(jnp.int32), dst.astype(jnp.int32), jnp.minimum(n_events, ring_size).astype(jnp.int32)


# ---------------------------------------------------------------------------
# legacy (pre-ring/SWA-page) plan builders: fixed per-request pool addressing
# (reference compress_plan.py:124-246). Legacy layout — c4 double-buffers TWO
# 4-token pages per request (page = rid*2 + ((pos//4)&1), loc = page*4 +
# pos%4); other ratios keep ONE page per request (page = rid, loc = rid*r +
# pos%r). The reference packs the plans into pinned uint8 rows for the host
# -> device copy; on TPU the plans stay structured int32 (the packing is a
# transport detail, not semantics).
# ---------------------------------------------------------------------------


def _legacy_page(rid, position, compress_ratio: int):
    """compress_plan.py:22-29."""
    if compress_ratio == 4:
        return rid * 2 + ((position // 4) & 1)
    return rid


def _legacy_loc(rid, position, compress_ratio: int):
    """compress_plan.py:32-37."""
    return _legacy_page(rid, position, compress_ratio) * compress_ratio + (
        position % compress_ratio)


@functools.partial(jax.jit, static_argnames=("compress_ratio",))
def plan_compress_decode_legacy(req_pool_indices, seq_lens, compress_ratio: int = 4):
    """Decode-step legacy plan (reference plan_compress_decode_legacy,
    compress_plan.py:237-246): per request, [seq_len, write_loc,
    read_page(pos0), read_page(pos1)] int32 — the reference returns the
    same four lanes viewed as [B, 16] uint8."""
    rid = req_pool_indices.astype(jnp.int32)
    pos1 = seq_lens.astype(jnp.int32) - 1
    pos0 = jnp.maximum(pos1 - compress_ratio, 0)
    return jnp.stack(
        [
            seq_lens.astype(jnp.int32),
            _legacy_loc(rid, pos1, compress_ratio),
            _legacy_page(rid, pos0, compress_ratio),
            _legacy_page(rid, pos1, compress_ratio),
        ],
        axis=1,
    )


def plan_compress_prefill_legacy(req_pool_indices, seq_lens, extend_lens,
                                 num_q_tokens: int, compress_ratio: int = 4):
    """Prefill legacy plan (reference plan_compress_prefill_legacy,
    compress_plan.py:124-234) — a HOST-side planner in the reference too
    (python loops over cpu lists filling a pinned buffer).

    Returns (plan_c [num_c, 4] int32, plan_w [num_w, 2] int32):
      plan_c rows: [position + 1, (buffer_len << 16) | ragged_id,
                    legacy_page(pos0), legacy_page(pos1)] — one row per
      compress event (a token whose 1-based position crosses a multiple of
      compress_ratio); buffer_len = how many window tokens come from the
      state buffer (_prefill_buffer_len rule: window - min(j+1, window)).
      plan_w rows: [ragged_id, legacy_loc(position)] — one row per token in
      the current (possibly double-buffered) window region.
    """
    import numpy as np

    is_overlap = compress_ratio == 4
    window = compress_ratio * (2 if is_overlap else 1)
    rids = np.asarray(req_pool_indices, np.int64)
    seqs = np.asarray(seq_lens, np.int64)
    exts = np.asarray(extend_lens, np.int64)

    c_rows, w_rows = [], []
    counter = 0
    for b, (sl, el) in enumerate(zip(seqs, exts)):
        prefix_len = int(sl - el)
        last_c_pos = (int(sl) // compress_ratio) * compress_ratio
        first_w_pos = last_c_pos - (compress_ratio if is_overlap else 0)
        rid = int(rids[b])
        for j in range(int(el)):
            position = prefix_len + j
            ragged_id = counter + j
            if (position + 1) % compress_ratio == 0:
                buffer_len = window - min(j + 1, window)
                pos0 = max(position - compress_ratio, 0)
                c_rows.append((
                    position + 1,
                    ((buffer_len & 0xFFFF) << 16) | (ragged_id & 0xFFFF),
                    int(_legacy_page(rid, pos0, compress_ratio)),
                    int(_legacy_page(rid, position, compress_ratio)),
                ))
            if position >= first_w_pos:
                w_rows.append((
                    ragged_id & 0xFFFF,
                    int(_legacy_loc(rid, position, compress_ratio)),
                ))
        counter += int(el)
    assert counter <= num_q_tokens, (counter, num_q_tokens)
    plan_c = np.asarray(c_rows, np.int32).reshape(-1, 4)
    plan_w = np.asarray(w_rows, np.int32).reshape(-1, 2)
    return jnp.asarray(plan_c), jnp.asarray(plan_w)
