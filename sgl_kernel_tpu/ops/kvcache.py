"""KV-cache management: paged store + hierarchical-cache transfer ops.

TPU-native equivalents of the reference's cache kernels:

  - store_cache (src/sycl/KVCache.cpp): scatter new K/V rows into the paged
    pools at flat slot indices.
  - the KVCacheIO transfer family (src/sycl/KVCacheIO.cpp:19-31): token
    gather/scatter between pools in three layouts —
      lf = layer-first  [num_layers][num_tokens, item]   (device pools)
      pf = page-first   [num_tokens, num_layers, item]   (host staging pool)
      ph = page-head    [num_pages, heads, page, num_layers, head_dim]
    On TPU the host pools are arrays placed with
    ``jax.device_put(..., memory_kind="pinned_host")`` and the transfers are
    donated gather/scatter jit programs, which XLA turns into async DMA over
    the host fabric — the role the reference's device-addressing-pinned-host
    kernels play.

All functions are functional (return the updated pool); callers use JAX
donation to make them in-place.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pallas_interpret


# ---------------------------------------------------------------------------
# store
# ---------------------------------------------------------------------------


@jax.jit
def store_cache(k, v, k_pool, v_pool, loc):
    """Scatter k/v [T, H, D] into page-major paged pools [P, H, page, D] at
    flat slot indices loc [T] (slot = page_id * page_size + offset; the
    pool layout matches ops/attention/paged_decode_dma "page" — each page
    is one contiguous [H, page, D] block, the unit the decode kernel DMAs).
    loc < 0 skips.

    Scatters go through a flat [P*H*page, D] view with ONE advanced index:
    interior advanced indices around a slice (``pool.at[pid, :, off]``)
    reorder the indexed axes to the front, which XLA lowers as transposes
    of the multi-GB pool around the scatter — measured ~7 ms/step on the
    headline decode (docs/PERF.md round 2)."""
    p, h, page, d = k_pool.shape
    slot = _page_major_slots(loc, p, h, page)  # [T, H]
    fk = k_pool.reshape(p * h * page, d)
    fv = v_pool.reshape(p * h * page, d)
    fk = fk.at[slot].set(k.astype(k_pool.dtype), mode="drop")
    fv = fv.at[slot].set(v.astype(v_pool.dtype), mode="drop")
    return fk.reshape(k_pool.shape), fv.reshape(v_pool.shape)


def _page_major_slots(loc, p, h, page):
    """loc [T] flat (page*page_size+offset) -> flat [T, H] row ids in the
    [P*H*page] page-major view; loc < 0 maps out of range (drop)."""
    pid = jnp.where(loc >= 0, loc // page, p)
    off = jnp.where(loc >= 0, loc % page, 0)
    return (pid * (h * page) + off)[:, None] + jnp.arange(h)[None, :] * page


@jax.jit
def store_cache_head_major(k, v, k_pool, v_pool, loc):
    """Legacy head-major variant: pools [H, P, page, D] (the BlockSpec
    decode kernel's layout, kept for compat)."""
    h, p, page, d = k_pool.shape
    flat_k = k_pool.reshape(h, p * page, d)
    flat_v = v_pool.reshape(h, p * page, d)
    safe = jnp.where(loc >= 0, loc, p * page)
    flat_k = flat_k.at[:, safe].set(jnp.swapaxes(k, 0, 1).astype(k_pool.dtype), mode="drop")
    flat_v = flat_v.at[:, safe].set(jnp.swapaxes(v, 0, 1).astype(v_pool.dtype), mode="drop")
    return flat_k.reshape(k_pool.shape), flat_v.reshape(v_pool.shape)


@jax.jit
def store_cache_stacked(k, v, k_pool, v_pool, loc, layer_id):
    """store_cache into layer-stacked page-major pools [L, P, H, page, D]
    at ``layer_id`` without slicing the stack (keeps the layer-scan carry
    copy-free)."""
    l, p, h, page, d = k_pool.shape
    slot = _page_major_slots(loc, p, h, page)  # [T, H]
    fk = k_pool.reshape(l, p * h * page, d)
    fv = v_pool.reshape(l, p * h * page, d)
    fk = fk.at[layer_id, slot].set(k.astype(k_pool.dtype), mode="drop")
    fv = fv.at[layer_id, slot].set(v.astype(v_pool.dtype), mode="drop")
    return fk.reshape(k_pool.shape), fv.reshape(v_pool.shape)


@jax.jit
def move_cache_rows_stacked(k_pool, v_pool, src_loc, dst_loc):
    """Copy token rows src -> dst across ALL layers of the stacked
    page-major pools (speculative-TREE acceptance fix-up: accepted node
    rows, written at per-node slots during the tree verify forward, move
    to their true position slots). src_loc/dst_loc [T] flat slots; a
    negative src or dst drops that move. Gather-then-scatter on the flat
    view (single leading advanced index — the kvcache scatter rule)."""
    l, p, h, page, d = k_pool.shape
    src = _page_major_slots(jnp.maximum(src_loc, 0), p, h, page)  # [T, H]
    dst = _page_major_slots(dst_loc, p, h, page)
    lids = (jnp.arange(l) * (p * h * page))[:, None, None]
    rows_src = lids + src[None]
    rows_dst = lids + dst[None]
    ok = (dst_loc >= 0) & (dst_loc < p * page) & (src_loc >= 0) & (src_loc < p * page)
    rows_dst = jnp.where(ok[None, :, None], rows_dst, l * p * h * page)
    fk = k_pool.reshape(l * p * h * page, d)
    fv = v_pool.reshape(l * p * h * page, d)
    kk, vv = fk[rows_src], fv[rows_src]  # gather BEFORE any scatter (aliasing)
    fk = fk.at[rows_dst].set(kk, mode="drop")
    fv = fv.at[rows_dst].set(vv, mode="drop")
    return fk.reshape(k_pool.shape), fv.reshape(v_pool.shape)


@jax.jit
def store_cache_all_layers_xla(k_all, v_all, k_pool, v_pool, loc):
    """XLA-scatter variant of store_cache_all_layers (fallback for page
    sizes the DMA kernel can't window). The scatter runs on the FULLY flat
    [L*P*H*page, D] view with one leading advanced index and a trailing
    [D] window — interior advanced indices (``pool.at[:, pid, :, off]``)
    make XLA transpose the multi-GB pool around the scatter (~7 ms/step
    measured on the headline decode; docs/PERF.md round 2)."""
    l, p, h, page, d = k_pool.shape
    slot = _page_major_slots(loc, p, h, page)  # [T, H]
    rows = (jnp.arange(l) * (p * h * page))[:, None, None] + slot[None]  # [L, T, H]
    # re-apply the drop encoding: per-layer OOB offsets (negative OR past
    # the pool) would land in the NEXT layer's region of the flat view
    in_range = (loc >= 0) & (loc < p * page)
    rows = jnp.where(in_range[None, :, None], rows, l * p * h * page)
    fk = k_pool.reshape(l * p * h * page, d)
    fv = v_pool.reshape(l * p * h * page, d)
    fk = fk.at[rows].set(k_all.astype(k_pool.dtype), mode="drop")
    fv = fv.at[rows].set(v_all.astype(v_pool.dtype), mode="drop")
    return fk.reshape(k_pool.shape), fv.reshape(v_pool.shape)


_WIN = 8  # DMA window extent in the page dim (Mosaic sublane tiling unit)


def _store_all_layers_kernel(pid_ref, woff_ref, row_ref, k_all_ref, v_all_ref,
                             k_in, v_in, ko_ref, vo_ref, kwin, vwin, sem,
                             *, t_count: int, n_pages: int):
    """Windowed read-modify-write store: per token DMA the aligned
    [L, H, _WIN, D] page window in, overwrite one row with the fresh KV via
    a vector select, DMA it back. Tokens are serialized (wait-out before
    next read) so same-window tokens — spec decode writes several adjacent
    offsets of one page — stay correct. XLA's scatter lowering walks the
    L*T*H rows one by one (~0.3 ms isolated, ~1.2 ms in-model per step at
    Llama-8B shapes); this kernel moves 32x the bytes but in 64 big strided
    DMAs, ~50 us. Pools are input_output_aliased: in-place by construction."""
    del k_in, v_in  # aliased: ko_ref/vo_ref ARE the pool buffers

    def body(t, _):
        pid = pid_ref[t]
        # woff is built as (off // _WIN) * _WIN by the caller; Mosaic needs
        # the alignment hint to allow a dynamic slice in the tiled page dim
        woff = pl.multiple_of(woff_ref[t], _WIN)
        row = row_ref[t]

        @pl.when(pid < n_pages)
        def _():
            kd = pltpu.make_async_copy(
                ko_ref.at[:, pid, :, pl.ds(woff, _WIN), :], kwin, sem.at[0])
            vd = pltpu.make_async_copy(
                vo_ref.at[:, pid, :, pl.ds(woff, _WIN), :], vwin, sem.at[1])
            kd.start()
            vd.start()
            kd.wait()
            vd.wait()
            mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, _WIN, 1), 2) == row)
            kwin[...] = jnp.where(mask, k_all_ref[:, t][:, :, None, :], kwin[...])
            vwin[...] = jnp.where(mask, v_all_ref[:, t][:, :, None, :], vwin[...])
            ko = pltpu.make_async_copy(
                kwin, ko_ref.at[:, pid, :, pl.ds(woff, _WIN), :], sem.at[0])
            vo = pltpu.make_async_copy(
                vwin, vo_ref.at[:, pid, :, pl.ds(woff, _WIN), :], sem.at[1])
            ko.start()
            vo.start()
            ko.wait()
            vo.wait()
        return 0

    jax.lax.fori_loop(0, t_count, body, 0)


@jax.jit
def store_cache_all_layers(k_all, v_all, k_pool, v_pool, loc):
    """Batched scatter of one decode step's K/V for every layer at once:
    k_all/v_all [L, T, H, D] -> pools [L, P, H, page, D] (the deferred-store
    decode path). Pallas windowed read-modify-write DMA kernel; falls back
    to the XLA scatter when the page size can't host an aligned window."""
    l, p, h, page, d = k_pool.shape
    if page % _WIN:
        return store_cache_all_layers_xla(k_all, v_all, k_pool, v_pool, loc)
    t = loc.shape[0]
    pid = jnp.where(loc >= 0, loc // page, p).astype(jnp.int32)
    off = jnp.where(loc >= 0, loc % page, 0).astype(jnp.int32)
    woff = (off // _WIN) * _WIN
    row = off - woff
    ka = k_all.astype(k_pool.dtype)
    va = v_all.astype(v_pool.dtype)
    kernel = functools.partial(_store_all_layers_kernel, t_count=t, n_pages=p)
    return tuple(pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((l, t, h, d), lambda g, pid, woff, row: (0, 0, 0, 0)),
                pl.BlockSpec((l, t, h, d), lambda g, pid, woff, row: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((l, h, _WIN, d), k_pool.dtype),
                pltpu.VMEM((l, h, _WIN, d), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},  # flattened inputs incl. 3 prefetch args
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=pallas_interpret(),
    )(pid, woff, row, ka, va, k_pool, v_pool))


@jax.jit
def store_cache_mla(kv, pool, loc):
    """MLA single-pool variant: kv [T, D_ckv] into pool [P, page, D_ckv]."""
    p, page, d = pool.shape
    flat = pool.reshape(p * page, d)
    safe = jnp.where(loc >= 0, loc, p * page)
    return flat.at[safe].set(kv.astype(pool.dtype), mode="drop").reshape(pool.shape)


# ---------------------------------------------------------------------------
# layout-transfer family (HiCache / PD-disaggregation data plane)
# ---------------------------------------------------------------------------


def _gather_tokens(pool_flat, indices):
    return pool_flat[indices]


@jax.jit
def transfer_kv_per_layer(src_k, src_v, dst_k, dst_v, src_indices, dst_indices):
    """lf -> lf, one layer: move token rows between two [T, ...] pools."""
    dst_k = dst_k.at[dst_indices].set(src_k[src_indices])
    dst_v = dst_v.at[dst_indices].set(src_v[src_indices])
    return dst_k, dst_v


@jax.jit
def transfer_kv_per_layer_mla(src, dst, src_indices, dst_indices):
    return dst.at[dst_indices].set(src[src_indices])


@jax.jit
def transfer_kv_all_layer(src_k_layers, src_v_layers, dst_k_layers, dst_v_layers, src_indices, dst_indices):
    """lf -> lf, all layers: src/dst stacked [L, T, ...]."""
    dst_k_layers = dst_k_layers.at[:, dst_indices].set(src_k_layers[:, src_indices])
    dst_v_layers = dst_v_layers.at[:, dst_indices].set(src_v_layers[:, src_indices])
    return dst_k_layers, dst_v_layers


@jax.jit
def transfer_kv_all_layer_mla(src_layers, dst_layers, src_indices, dst_indices):
    return dst_layers.at[:, dst_indices].set(src_layers[:, src_indices])


@jax.jit
def transfer_kv_all_layer_lf_pf(src_k_layers, src_v_layers, dst_pf, src_indices, dst_indices):
    """lf [L, T, item] (x2 for k/v) -> pf [T, 2L, item] staging pool."""
    kv = jnp.concatenate([src_k_layers[:, src_indices], src_v_layers[:, src_indices]], axis=0)  # [2L, n, item]
    return dst_pf.at[dst_indices].set(jnp.swapaxes(kv, 0, 1).astype(dst_pf.dtype))


@jax.jit
def transfer_kv_per_layer_pf_lf(src_pf, dst_k, dst_v, src_indices, dst_indices, layer_id: jax.Array):
    """pf [T, 2L, *item] -> lf one layer (item may be flat or [H, D])."""
    rows = src_pf[src_indices]  # [n, 2L, *item]
    l = src_pf.shape[1] // 2
    idx = jnp.full((rows.shape[0], 1) + (1,) * (rows.ndim - 2), layer_id)
    k_rows = jnp.take_along_axis(rows, idx, axis=1)[:, 0]
    v_rows = jnp.take_along_axis(rows, idx + l, axis=1)[:, 0]
    return dst_k.at[dst_indices].set(k_rows.astype(dst_k.dtype)), dst_v.at[dst_indices].set(v_rows.astype(dst_v.dtype))


@jax.jit
def transfer_kv_all_layer_mla_lf_pf(src_layers, dst_pf, src_indices, dst_indices):
    """MLA single-pool lf [L, T, item] -> pf [T, L, item] staging (the
    reference's transfer_kv_all_layer_mla_lf_pf: one latent pool, no K/V
    pair — KVCacheIO.cpp MLA entry points)."""
    rows = jnp.swapaxes(src_layers[:, src_indices], 0, 1)  # [n, L, item]
    return dst_pf.at[dst_indices].set(rows.astype(dst_pf.dtype))


@jax.jit
def transfer_kv_per_layer_mla_pf_lf(src_pf, dst, src_indices, dst_indices, layer_id: jax.Array):
    """pf [T, L, *item] -> MLA lf one layer [T, *item]."""
    rows = src_pf[src_indices]  # [n, L, *item]
    idx = jnp.full((rows.shape[0], 1) + (1,) * (rows.ndim - 2), layer_id)
    sel = jnp.take_along_axis(rows, idx, axis=1)[:, 0]
    return dst.at[dst_indices].set(sel.astype(dst.dtype))


@functools.partial(jax.jit, static_argnames=("page_size",))
def transfer_kv_all_layer_lf_ph(src_k_layers, src_v_layers, dst_ph, src_page_ids, dst_page_ids, page_size: int):
    """lf [L, T, H, D] (x2) -> ph [P, H, page, 2L, D] page-head pool, whole pages."""
    l, _, h, d = src_k_layers.shape
    # gather page token rows: [L, n_pages, page, H, D]
    tok = (src_page_ids[:, None] * page_size + jnp.arange(page_size)[None, :]).reshape(-1)
    k = src_k_layers[:, tok].reshape(l, -1, page_size, h, d)
    v = src_v_layers[:, tok].reshape(l, -1, page_size, h, d)
    kv = jnp.concatenate([k, v], axis=0)  # [2L, n, page, H, D]
    ph = jnp.transpose(kv, (1, 3, 2, 0, 4))  # [n, H, page, 2L, D]
    return dst_ph.at[dst_page_ids].set(ph.astype(dst_ph.dtype))


@functools.partial(jax.jit, static_argnames=("page_size",))
def transfer_kv_per_layer_ph_lf(src_ph, dst_k, dst_v, src_page_ids, dst_page_ids, layer_id: jax.Array, page_size: int):
    """ph [P, H, page, 2L, D] -> lf one layer [T, H, D] (x2), whole pages."""
    l2 = src_ph.shape[3]
    pages = src_ph[src_page_ids]  # [n, H, page, 2L, D]
    sel_k = jnp.take_along_axis(pages, jnp.full(pages.shape[:3] + (1, 1), layer_id), axis=3)[..., 0, :]
    sel_v = jnp.take_along_axis(pages, jnp.full(pages.shape[:3] + (1, 1), layer_id + l2 // 2), axis=3)[..., 0, :]
    k_rows = jnp.swapaxes(sel_k, 1, 2).reshape(-1, pages.shape[1], pages.shape[-1])  # [n*page, H, D]
    v_rows = jnp.swapaxes(sel_v, 1, 2).reshape(-1, pages.shape[1], pages.shape[-1])
    tok = (dst_page_ids[:, None] * page_size + jnp.arange(page_size)[None, :]).reshape(-1)
    return dst_k.at[tok].set(k_rows.astype(dst_k.dtype)), dst_v.at[tok].set(v_rows.astype(dst_v.dtype))


def _placement_device(x):
    """The device x already lives on (preserves mesh placement for sharded
    HiCache round-trips) or the default device for host arrays."""
    devs = getattr(x, "devices", None)
    if callable(devs):
        ds = list(devs())
        if len(ds) == 1:
            return ds[0]
    return jax.devices()[0]


def _supports_pinned_host() -> bool:
    return "pinned_host" in getattr(jax.devices()[0], "memory_spaces_by_kind",
                                    lambda: {"pinned_host": None})()         if False else any(
        m.kind == "pinned_host" for m in getattr(jax.devices()[0], "addressable_memories", lambda: [])()
    )


_PINNED_OK = None


def to_host(x):
    """Move an array to pinned host memory (HiCache staging tier) on the
    SAME device it lives on. The pinned_host probe runs once; backends
    without the memory space (CPU tests) fall back to default placement —
    real placement failures are NOT swallowed."""
    global _PINNED_OK
    if _PINNED_OK is None:
        try:
            _PINNED_OK = _supports_pinned_host()
        except Exception:
            _PINNED_OK = False
    dev = _placement_device(x)
    if not _PINNED_OK:
        return jax.device_put(x, dev)
    return jax.device_put(x, jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host"))


def to_device(x):
    """Move a (possibly pinned-host) array back to device memory, on the
    device it is already associated with."""
    dev = _placement_device(x)
    if not _PINNED_OK and _PINNED_OK is not None:
        return jax.device_put(x, dev)
    try:
        return jax.device_put(x, jax.sharding.SingleDeviceSharding(dev, memory_kind="device"))
    except ValueError:  # backend without named memory kinds
        return jax.device_put(x, dev)
