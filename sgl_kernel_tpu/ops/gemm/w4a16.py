"""W4A16 dequant-fused GEMM (int4 / MXFP4) — the north-star Pallas kernel.

TPU-native replacement for the reference's W4A16 grouped-GEMM mainloop
(src/sycl/kernels/moe/xe20/w4a16/gemm_xe2.hpp: in-register dequant feeding
DPAS).

Design (measured on v5e; round-2 in-model numbers in docs/PERF.md):
  - **K-paired nibble packing**: weights stored as uint8 [K/2, N] where
    byte (r, n) packs code(2r, n) in the low nibble and code(2r+1, n) in
    the high nibble. Inside the kernel a single ``pltpu.bitcast`` to
    ``jnp.int4`` doubles the sublane dim, yielding the logical [K, N] int4
    tile, and ``astype(bfloat16)`` hits the hardware int4 upconvert — the
    load+convert runs at full HBM bandwidth on half the bytes of bf16.
    The decoded tile is already in MXU rhs orientation (contracting dim
    leading): the round-1 N-paired layout ([N/2, K]) forced an rhs
    transpose per tile and plateaued at 476 GB/s in-model on gate_up; the
    K-paired form measures 561 GB/s on identical shapes (the stream-bound
    for this kernel's access pattern is 695 GB/s; the int4->bf16 VPU
    upconvert itself overlaps DMA and is free — docs/PERF.md round 2).
  - **Output-side group scaling**: a per-(n, k-group) scale broadcast over
    the weight tile lowers pathologically in Mosaic (sub-lane group
    broadcast), so the kernel instead computes one depth-G partial matmul
    per scale group and scales the (M, BN) partial *output*: VPU work
    drops from O(N*K) to O(M*N*K/G). Scaling stays f32 (the scale tile is
    upcast in-kernel), but the STORED scales are bf16: f32 scales are 6%
    of the weight traffic and measure 605 -> 635 GB/s when halved
    (in-model gate_up; scale precision is second-order next to the 4-bit
    weight quantization error).
  - Asymmetric zeros fold in as a per-group rank-1 correction:
        (c - z) s = c*s - (sum_k a_g) * (z s).

Math contracts (reference include/sgl_kernel_ops.h:692-712):
  - int4 symmetric:   w = code * scale            (two's-complement nibble)
  - int4 asymmetric:  w = (code - zero) * scale
  - mxfp4:            w = e2m1(code) * 2^(scale_byte - 127)

Layouts consumed by the kernel (produced by quantize_w4 / converters):
  packed  uint8 [K//2, N]             (K-paired nibbles)
  scales  bfloat16 [K//G, N]          (K-group-major; any float dtype is
                                       accepted verbatim — upcast per-tile)
  zeros_x_scales bfloat16 [K//G, N]   (optional, z*s pre-multiplied)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, pallas_interpret, round_up

# E2M1 magnitude for code bits 0..7 (sign handled from the int4 sign bit)
_E2M1_MAG = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)

GROUPS_PER_KTILE = 8  # bk = 8 * group_size

# Per-shape tile table, (N, K, m_bucket) -> (bm, bn, bk). Measured on-chip
# (benchmark/tune_w4a16.py sweep + confirm_w4a16.py noise-proofed confirm
# pass, 2026-08-17; the reference's analog is the per-dim tile
# instantiation grids in src/FMHAPrefillXe20.cmake:11-87 picked by host
# heuristics). m_bucket: 0 = decode (M <= 32), 1 = small prefill
# (M <= 256), 2 = large prefill. Fallback: the global defaults below.
# Only entries that beat the default by >3% with physically plausible
# bandwidth (<819 GB/s HBM) are kept — single-weight rep chains can go
# VMEM-resident and report impossible rates (docs/PERF.md round 2).
# Decode-bucket (m_bucket 0) entries come from the IN-MODEL harness
# (/docs/PERF.md round 2: layer-stacked weights + traced layer_id sweep, a
# DIFFERENT layer per rep — isolated single-weight rep chains mislead: the
# weight goes VMEM/cache-resident and tile ordering inverts). Prefill
# buckets (1/2) come from the isolated confirm sweep (MXU-bound there, tile
# choice is second-order).
_TILE_TABLE = {
    # decode entries re-measured for the gmode="inner" kernel (in-model
    # harness, benchmark/sweep_w4a16_variants.py, 2026-08-19): per-group
    # decode interleaved with the MXU dots beats the materialize-whole-tile
    # form by 1.2-1.7x on every decode shape (o 465->779 GB/s, qkv
    # 477->789, down 493->692, gate_up 497->648). Readings above the
    # 819 GB/s HBM peak are relay-jitter artifacts and were discarded.
    # Big-bn retune (benchmark/sweep_w4a16_bigbn.py, 2026-08-19): the
    # residual scales with the per-layer group-dot COUNT (N/bn * K/G) —
    # shapes at <=128 dots stream ~660-790 GB/s, 224+ dots sit 540-650.
    # lm_head: 129024 = 2048*63, so bn=4096 silently fell back to 2048
    # (2016 dots, 594 GB/s); bn=8064 divides exactly -> 762 GB/s.
    (6144, 4096, 0): (16, 2048, 2048),     # qkv decode: 789 GB/s in-model
    (4096, 4096, 0): (16, 2048, 1024),     # o decode: 779 GB/s
    (28672, 4096, 0): (16, 7168, 1024),    # gate_up decode: 664 GB/s (128 dots)
    (4096, 14336, 0): (16, 4096, 2048),    # down decode: inner4/bk2048 719 GB/s (confirm pass r4; was inner/bk1024 at 666)
    (129024, 4096, 0): (16, 8064, 1024),   # llama3 lm_head decode: 762 GB/s
    (4096, 4096, 2): (256, 512, 2048),    # 195 TFLOP/s (MXU-bound)
    (4096, 14336, 1): (128, 4096, 1024),
    (4096, 14336, 2): (256, 4096, 1024),
    (6144, 4096, 1): (128, 1024, 2048),
    (28672, 4096, 1): (128, 2048, 2048),
    (28672, 4096, 2): (256, 2048, 2048),
}


# per-shape decode gmode overrides, (N, K, m_bucket) -> gmode. Populated
# from the interleaved-repeat on-chip sweep (sweep_w4a16_nacc.py) where a
# multi-accumulator epilogue beats plain "inner" beyond noise.
# Round-4 confirm pass (/tmp/confirm_nacc 2026-08-20, min over 4
# interleaved passes): down-proj (4096, 14336) inner4 + bk=2048 at 719
# GB/s vs inner/bk=1024 at 648 — the K=14336 accumulate chain is long
# enough for 4 accumulators to pay (same mechanism as blockwise-fp8's
# inner2 win at K=7168); gate_up (28672, 4096) keeps inner (inner2
# measured below it on every pass). Final arbiter: the in-model headline
# A/B (bench.py) recorded alongside in docs/PERF.md round 4.
_GMODE_TABLE = {(4096, 14336, 0): "inner4"}


def _m_bucket(m: int) -> int:
    return 0 if m <= 32 else (1 if m <= 256 else 2)


def pick_tiles(m: int, n: int, k: int, group_size: int):
    """(bm, bn, bk) for this shape: exact table hit or measured defaults."""
    hit = _TILE_TABLE.get((n, k, _m_bucket(m)))
    if hit is not None:
        bm, bn, bk = hit
        return bm, bn, bk
    from ...utils import round_up as _ru
    return min(256, _ru(m, 8)), 2048, GROUPS_PER_KTILE * group_size


def register_tiles(table):
    """Merge tuner output {(n, k, m_bucket): (bm, bn, bk)} into the table."""
    _TILE_TABLE.update(table)


def pick_ktile(k: int, group_size: int, budget_groups: int = GROUPS_PER_KTILE) -> int:
    """Largest k-tile that (a) divides K, (b) is a group multiple, and
    (c) Mosaic accepts for the per-tile scale block: the scale BlockSpec
    puts groups-per-tile in the SUBLANE dim, which must be divisible by 8
    or equal to the full K/G (found in the on-chip baseline regen —
    interpret mode doesn't enforce it). Falls back to one full-K tile
    (scale block == array dim, always legal)."""
    ngk = k // group_size
    for c in range(min(ngk, budget_groups), 0, -1):
        if ngk % c == 0 and c % 8 == 0:
            return c * group_size
    return k


def _decode_tile(w_ref, fmt: str):
    """Packed uint8 tile [bk/2, bn] -> bf16 codes [bk, bn] (unscaled).

    The bitcast doubles the SUBLANE dim: packed row r expands to code rows
    2r (low nibble) and 2r+1 (high nibble), so the decoded tile lands in
    MXU rhs orientation (contracting dim leading) with no transpose."""
    w4 = pltpu.bitcast(w_ref[...], jnp.int4)  # [bk, bn], row 2r = low nibble
    if fmt == "int4":
        return w4.astype(jnp.bfloat16)
    # mxfp4: recover the e2m1 bit pattern from the signed int4 value and
    # decode magnitude arithmetically (sign = bit 3).
    bits = w4.astype(jnp.int32) & 0xF
    mag_code = bits & 0x7
    m = (mag_code & 1).astype(jnp.float32)
    e = (mag_code >> 1).astype(jnp.float32)
    val = jnp.where(e == 0.0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2(e - 1.0))
    sign = jnp.where(bits >= 8, -1.0, 1.0)
    return (sign * val).astype(jnp.bfloat16)


def _load_a(a_ref, a2_ref, nw_ref, *, prologue, norm_eps, bk):
    """Activation-tile prologue shared by the kernel bodies.

    ``nw_ref`` set = fused decode rmsnorm (round 4): the a block is the
    FULL [bm, K] row (tiny at decode M — 16x4096 bf16 = 128 KB, fetched
    once per m-tile since its index map is constant over j/k), the rsqrt
    row factor recomputes per grid step (a 64K-element VPU reduce,
    negligible), and the k-slice loads via a dynamic ref slice. Replaces
    the standalone rmsnorm Pallas launch before the qkv / gate_up /
    lm_head decode GEMMs (~2.2us each, 65 calls/step — docs/PERF.md)."""
    if nw_ref is not None:
        k_idx = pl.program_id(2)
        x = a_ref[...].astype(jnp.float32)  # [bm, K]
        r = jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + norm_eps)
        a_sl = a_ref[:, pl.ds(k_idx * bk, bk)].astype(jnp.float32)
        nw = nw_ref[0, pl.ds(k_idx * bk, bk)].astype(jnp.float32)
        return (a_sl * nw[None, :] * r).astype(a_ref.dtype)
    if prologue == "silu_mul":
        g = a_ref[...].astype(jnp.float32)
        return (g * jax.nn.sigmoid(g) * a2_ref[...].astype(jnp.float32)).astype(a_ref.dtype)
    return a_ref[...]


def _kernel(a_ref, a2_ref, w_ref, s_ref, z_ref, b_ref, r_ref, o_ref, acc_ref, *, fmt, group_size, ngb, n_k, has_bias, prologue, gmode="loop", nw_ref=None, norm_eps=1e-5, k_idx=None):
    # k_idx passed in when the caller wraps the body in pl.when (grouped
    # kernel's padding-block skip): pl.program_id cannot be read inside a
    # cond region
    k_idx = pl.program_id(2) if k_idx is None else k_idx
    g0 = group_size

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wf = _decode_tile(w_ref, fmt)  # [bk, bn] bf16 codes (MXU rhs orientation)
    a = _load_a(a_ref, a2_ref, nw_ref, prologue=prologue, norm_eps=norm_eps,
                bk=ngb * g0)
    acc = acc_ref[...]
    if gmode == "batched":
        # one BATCHED dot over all scale groups + a single scale-reduce
        # epilogue — candidate to beat the 8-sequential-dots form (the
        # loop's acc dependency can serialize the MXU feed)
        bm, bk = a.shape
        bn = wf.shape[-1]
        ab = jnp.swapaxes(a.reshape(bm, ngb, g0), 0, 1)      # [G, bm, g0]
        wb = wf.reshape(ngb, g0, bn)                          # [G, g0, bn]
        parts = jax.lax.dot_general(
            ab, wb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, bm, bn]
        acc = acc + jnp.sum(parts * s_ref[...][:, None, :].astype(jnp.float32), axis=0)
        if z_ref is not None:
            asum = jnp.sum(a.astype(jnp.float32).reshape(bm, ngb, g0), axis=2)  # [bm, G]
            acc = acc - jax.lax.dot_general(
                asum, z_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        for g in range(ngb):
            a_g = a[:, g * g0 : (g + 1) * g0]
            part = jax.lax.dot_general(
                a_g, wf[g * g0 : (g + 1) * g0, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bm, bn]
            acc = acc + part * s_ref[g, :][None, :].astype(jnp.float32)
            if z_ref is not None:
                # rank-1 zero-point correction: - (sum_k a_g) * (z*s)[g, n]
                asum = jnp.sum(a_g.astype(jnp.float32), axis=1, keepdims=True)
                acc = acc - asum * z_ref[g, :][None, :].astype(jnp.float32)
    acc_ref[...] = acc

    @pl.when(k_idx == n_k - 1)
    def _done():
        out = acc_ref[...]
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        if r_ref is not None:
            out = out + r_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _kernel_inner(a_ref, a2_ref, w_ref, s_ref, z_ref, b_ref, r_ref, o_ref, acc_ref, *, fmt, group_size, ngb, n_k, has_bias, prologue, nacc: int = 1, nw_ref=None, norm_eps=1e-5, k_idx=None):
    """gmode="inner": decode each scale group's [g0, bn] weight slice right
    before its MXU dot instead of materializing the whole decoded [bk, bn]
    tile in VMEM first. The per-group VPU decode (astype) software-pipelines
    against the previous group's MXU dot, and the decode temp shrinks from
    bk*bn*2 bytes to g0*bn*2.

    nacc > 1 ("inner2"): round-robin the scale epilogue over nacc
    independent accumulators so group g's VPU mul-add does not serialize
    behind group g-1's — the per-layer group-dot count is the measured
    decode residual (sweep_w4a16_bigbn.py)."""
    k_idx = pl.program_id(2) if k_idx is None else k_idx
    g0 = group_size

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = _load_a(a_ref, a2_ref, nw_ref, prologue=prologue, norm_eps=norm_eps,
                bk=ngb * g0)
    accs = [acc_ref[...]] + [jnp.zeros_like(acc_ref) for _ in range(nacc - 1)]
    for g in range(ngb):
        wf_g = _decode_tile(w_ref.at[pl.ds(g * g0 // 2, g0 // 2), :], fmt)  # [g0, bn]
        a_g = a[:, g * g0 : (g + 1) * g0]
        part = jax.lax.dot_general(
            a_g, wf_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        j = g % nacc
        accs[j] = accs[j] + part * s_ref[g, :][None, :].astype(jnp.float32)
        if z_ref is not None:
            asum = jnp.sum(a_g.astype(jnp.float32), axis=1, keepdims=True)
            accs[j] = accs[j] - asum * z_ref[g, :][None, :].astype(jnp.float32)
    acc = accs[0]
    for extra in accs[1:]:
        acc = acc + extra
    acc_ref[...] = acc

    @pl.when(k_idx == n_k - 1)
    def _done():
        out = acc_ref[...]
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        if r_ref is not None:
            out = out + r_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "fmt", "out_dtype", "bm", "bn", "bk", "prologue", "gmode", "fused_gate_up", "norm_eps"),
)
def w4a16_gemm(
    a,
    w,
    scales,
    zeros=None,
    bias=None,
    a2=None,
    residual=None,
    layer_id=None,
    norm_weight=None,
    *,
    norm_eps: float = 1e-5,
    group_size: int = 128,
    fmt: str = "int4",
    out_dtype=None,
    bm: Optional[int] = None,
    bn: int = 2048,
    bk: Optional[int] = None,
    prologue: Optional[str] = None,
    gmode: Optional[str] = None,
    fused_gate_up: bool = False,
):
    """A[M, K] @ dequant(W[N, K])^T with 4-bit weights.

    Args:
      a: [M, K] activations (bf16/f16/f32).
      w: [K//2, N] packed uint8 (K-paired nibble layout, pack_w4_tpu).
      scales: [K//G, N] float (int4 multiplier / decoded mxfp4 exp2 value).
      zeros: optional [K//G, N] z*s pre-product (int4 asymmetric).
      bias: optional [N].
      a2: optional second activation for ``prologue="silu_mul"`` (the gated
         MLP fusion: A = silu(a) * a2 computed in the kernel — saves an XLA
         fusion launch, which costs ~24us on the axon runtime).
      residual: optional [M, N] added in the epilogue (residual-add fusion).
      layer_id: optional traced scalar. When given, w/scales/zeros/bias
         carry a leading layer dim ([L, ...]) and the kernel reads layer
         ``layer_id`` via scalar-prefetched BlockSpec indexing. This is the
         scan-over-layers fast path: a Pallas operand must be materialized,
         so slicing per-layer weights out of the stacked arrays before the
         call would copy ~4GB/step for an 8B model — the same dynamic-slice
         trap the stacked KV pools avoid (docs/PERF.md).
      norm_weight: optional [K] (or stacked [L, K]) rmsnorm weight — the
         round-4 fused decode-norm prologue: a arrives UN-normed, the
         kernel computes x * rsqrt(mean(x^2) + norm_eps) * norm_weight
         per tile (full-row a block; decode-bucket M only — callers gate).
         Mutually exclusive with prologue/a2/fused_gate_up; requires K a
         group multiple (no quantize_w4 zero padding).
      fmt: "int4" | "mxfp4".
    Returns [M, N] in out_dtype (defaults to a.dtype).

    Tile defaults (serialized on-chip sweep, docs/PERF.md): bn=2048 /
    bk=8 groups — e.g. the Llama-8B down proj (4096x14336) runs at
    814 GB/s vs 616 at bn=1024; gate_up (28672x4096) 471 vs 404.
    """
    m, k = a.shape
    if fused_gate_up:
        # a is the FUSED [M, 2K] gate_up output (gate columns then up
        # columns); the kernel reads gate and up blocks from the SAME
        # array via two BlockSpecs — no XLA slice kernels between the
        # gate_up GEMM and this one (an XLA fusion launch costs ~24us on
        # this runtime vs ~0.7us for a Pallas call, docs/PERF.md)
        assert a2 is None and prologue == "silu_mul", (a2, prologue)
        assert k % 2 == 0
        k = k // 2
    stacked = layer_id is not None
    n = w.shape[-1]
    out_dtype = out_dtype or a.dtype
    if gmode is None:
        # decode bucket: per-group decode interleaved with the dots pipelines
        # the VPU upconvert against the MXU and wins 1.2-1.7x on-chip
        # (docs/PERF.md round 3); prefill is MXU-bound and keeps the
        # whole-tile decode that amortizes across the larger bm. Per-shape
        # overrides (measured) live in _GMODE_TABLE.
        if _m_bucket(m) == 0:
            gmode = _GMODE_TABLE.get((n, k, 0), "inner")
        else:
            gmode = "loop"
    assert gmode in ("loop", "batched") or (
        gmode.startswith("inner") and (gmode[5:] == "" or gmode[5:].isdigit())
    ), f"gmode must be 'loop', 'batched', or 'inner[N]', got {gmode!r}"
    has_norm = norm_weight is not None
    if has_norm:
        assert prologue is None and a2 is None and not fused_gate_up, (
            "norm_weight is its own prologue")
    k_pad = w.shape[-2] * 2  # packed layout [.., K/2, N]
    if fused_gate_up:
        assert k_pad == k, (k_pad, k)
    if has_norm:
        # the in-kernel mean runs over the full a row — zero padding would
        # deflate it
        assert k_pad == k, ("norm_weight requires a group-multiple K", k, k_pad)
    if k_pad != k:
        # quantize_w4 zero-padded a non-group-multiple K; pad the
        # activations to match (the padded tail multiplies zero codes)
        assert k < k_pad <= round_up(k, GROUPS_PER_KTILE * group_size), (
            k, k_pad, group_size)
        a = jnp.pad(a, ((0, 0), (0, k_pad - k)))
        if a2 is not None:
            a2 = jnp.pad(a2, ((0, 0), (0, k_pad - k)))
        k = k_pad
    if stacked:
        l = w.shape[0]
        assert w.shape == (l, k // 2, n) and w.dtype == jnp.uint8, (w.shape, w.dtype)
        assert scales.shape == (l, k // group_size, n), scales.shape
    else:
        assert w.shape == (k // 2, n) and w.dtype == jnp.uint8, (w.shape, w.dtype)
        assert scales.shape == (k // group_size, n), (scales.shape, (k // group_size, n))

    assert fused_gate_up or (a2 is not None) == (prologue == "silu_mul"), (
        "prologue='silu_mul' requires a2 (or fused_gate_up)")
    if zeros is not None:
        assert zeros.shape == scales.shape, (zeros.shape, scales.shape)
    tbm, tbn, tbk = pick_tiles(m, n, k, group_size)
    bm = bm or tbm
    bn = tbn if bn == 2048 else bn  # explicit bn kwarg overrides the table
    bn = min(bn, n)
    while n % bn != 0:  # largest power-of-two-ish divisor <= requested bn
        bn //= 2
    if bn % 128 and bn != n:
        # Mosaic requires the lane (last) block dim be a multiple of 128 OR
        # the full array extent. N values like 10944 = 64*171 have NO
        # 128-multiple divisor — fall back to one whole-N block (found in
        # the on-chip baseline regen: V2-Lite dense_intermediate 10944
        # halved down to an illegal bn=64; interpret mode doesn't enforce)
        bn = n
    assert bn >= 2, (n, bn)  # tiny N (tests) still works, just less efficient
    auto_bk = bk is None
    bk = bk or min(tbk, k)
    if k % bk or (auto_bk and (bk // group_size) % 8 and bk != k):
        # K a group multiple but not a legal-tile multiple (e.g. DeepSeek-
        # V2-Lite K=1408 vs the 1024 default, or gate_up K=3584 = 28
        # groups): largest Mosaic-legal dividing tile, else full-K
        bk = pick_ktile(k, group_size, max(GROUPS_PER_KTILE, tbk // group_size))
    assert n % bn == 0 and k % bk == 0 and bk % group_size == 0, (n, bn, k, bk)
    ngb = bk // group_size

    mp = round_up(m, bm)
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))
        if a2 is not None:
            a2 = jnp.pad(a2, ((0, mp - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, mp - m), (0, 0)))

    grid = (n // bn, mp // bm, k // bk)
    # scales/zeros ship in their stored dtype (bf16 canonical) — converting
    # whole stacked arrays here would copy [L, K/G, N] every call; the
    # kernel upcasts the tiny [ngb, bn] tile to f32 instead.
    scales_f = scales

    # With a stacked layer dim, index maps receive the scalar-prefetch ref
    # as an extra trailing arg and select the layer; `None` in the block
    # shape squeezes the dim so the kernel body is identical either way.
    if stacked:
        a_spec = pl.BlockSpec((bm, bk), lambda j, i, kk, lid: (i, kk))
        afull_spec = pl.BlockSpec((bm, k), lambda j, i, kk, lid: (i, 0))
        # nw rides as [L, 1, K] so the squeezed (1, K) block EQUALS the
        # array's last two dims — a (1, K) block over [L, K] fails the
        # sublane-divisibility rule on real TPU (interpret never checks)
        nw_spec = pl.BlockSpec((None, 1, k), lambda j, i, kk, lid: (lid[0], 0, 0))
        w_spec = pl.BlockSpec((None, bk // 2, bn), lambda j, i, kk, lid: (lid[0], kk, j))
        s_spec = pl.BlockSpec((None, ngb, bn), lambda j, i, kk, lid: (lid[0], kk, j))
        b_spec = pl.BlockSpec((None, bn), lambda j, i, kk, lid: (lid[0], j))
        mn_spec = pl.BlockSpec((bm, bn), lambda j, i, kk, lid: (i, j))
    else:
        a_spec = pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk))
        afull_spec = pl.BlockSpec((bm, k), lambda j, i, kk: (i, 0))
        nw_spec = pl.BlockSpec((None, 1, k), lambda j, i, kk: (0, 0, 0))
        w_spec = pl.BlockSpec((bk // 2, bn), lambda j, i, kk: (kk, j))
        s_spec = pl.BlockSpec((ngb, bn), lambda j, i, kk: (kk, j))
        b_spec = pl.BlockSpec((1, bn), lambda j, i, kk: (0, j))
        mn_spec = pl.BlockSpec((bm, bn), lambda j, i, kk: (i, j))

    in_specs = [afull_spec if has_norm else a_spec]
    inputs = [a]
    if has_norm:
        nw = (norm_weight.reshape(-1, 1, k) if stacked
              else norm_weight.reshape(1, 1, k))
        assert nw.shape[-1] == k, (nw.shape, k)
        in_specs.append(nw_spec)
        inputs.append(nw)
    has_a2 = a2 is not None or fused_gate_up
    if fused_gate_up:
        koff = k // bk
        if stacked:
            a2_spec = pl.BlockSpec((bm, bk), lambda j, i, kk, lid: (i, kk + koff))
        else:
            a2_spec = pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk + koff))
        in_specs.append(a2_spec)
        inputs.append(a)
    elif has_a2:
        assert prologue == "silu_mul"
        in_specs.append(a_spec)
        inputs.append(a2)
    in_specs += [w_spec, s_spec]
    inputs += [w, scales_f]
    if zeros is not None:
        in_specs.append(s_spec)
        inputs.append(zeros)
    has_bias = bias is not None
    if has_bias:
        in_specs.append(b_spec)
        inputs.append(bias if stacked else bias.reshape(1, n))
    has_res = residual is not None
    if has_res:
        in_specs.append(mn_spec)
        inputs.append(residual)

    kernel = functools.partial(
        _kernel_entry,
        has_lid=stacked,
        has_norm=has_norm,
        has_a2=has_a2,
        has_zeros=zeros is not None,
        has_bias=has_bias,
        has_res=has_res,
        fmt=fmt,
        group_size=group_size,
        ngb=ngb,
        n_k=k // bk,
        prologue=prologue,
        gmode=gmode,
        norm_eps=norm_eps,
    )

    common = dict(
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + n * k // 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )
    if stacked:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=mn_spec,
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            ),
            **common,
        )(jnp.asarray(layer_id, jnp.int32).reshape(1), *inputs)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=mn_spec,
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            **common,
        )(*inputs)
    return out[:m] if mp != m else out


def _kernel_entry(*refs, has_lid=False, has_norm=False, has_a2, has_zeros, has_bias, has_res, fmt, group_size, ngb, n_k, prologue, gmode="loop", norm_eps=1e-5):
    # refs layout: [lid], a, [nw], [a2], w, s, [z], [bias], [residual], o, acc
    idx = int(has_lid)  # scalar-prefetch ref consumed by the BlockSpecs
    a_ref = refs[idx]; idx += 1
    nw_ref = refs[idx] if has_norm else None
    idx += int(has_norm)
    a2_ref = refs[idx] if has_a2 else None
    idx += int(has_a2)
    w_ref, s_ref = refs[idx], refs[idx + 1]
    idx += 2
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    b_ref = refs[idx] if has_bias else None
    idx += int(has_bias)
    r_ref = refs[idx] if has_res else None
    idx += int(has_res)
    o_ref = refs[idx]
    acc_ref = refs[idx + 1]
    if gmode.startswith("inner"):
        _kernel_inner(
            a_ref, a2_ref, w_ref, s_ref, z_ref, b_ref, r_ref, o_ref, acc_ref,
            fmt=fmt, group_size=group_size, ngb=ngb, n_k=n_k, has_bias=has_bias,
            prologue=prologue, nacc=int(gmode[5:] or 1),
            nw_ref=nw_ref, norm_eps=norm_eps,
        )
        return
    _kernel(
        a_ref, a2_ref, w_ref, s_ref, z_ref, b_ref, r_ref, o_ref, acc_ref,
        fmt=fmt, group_size=group_size, ngb=ngb, n_k=n_k, has_bias=has_bias, prologue=prologue,
        gmode=gmode, nw_ref=nw_ref, norm_eps=norm_eps,
    )


# ---------------------------------------------------------------------------
# Weight preparation (offline, XLA)
# ---------------------------------------------------------------------------


@jax.jit
def pack_w4_tpu(codes):
    """Pack logical uint4 codes [K, N] (nibble values 0..15; signed int4 is
    stored two's complement) into the K-paired uint8 layout [K//2, N]:
    byte(r, n) = code(2r, n) | code(2r+1, n) << 4 — the order
    pltpu.bitcast(., int4) yields on TPU (row 2r = low nibble), putting the
    decoded tile straight into MXU rhs orientation."""
    c = codes.astype(jnp.uint8)
    return (c[0::2] & 0xF) | ((c[1::2] & 0xF) << 4)


@jax.jit
def unpack_w4_tpu(packed):
    """Inverse of pack_w4_tpu -> uint8 logical codes [K, N] (values 0..15)."""
    lo = packed & 0xF
    hi = packed >> 4
    k2, n = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)


@functools.partial(jax.jit, static_argnames=("group_size", "symmetric"))
def quantize_w4(w, *, group_size: int = 128, symmetric: bool = True):
    """Quantize a float weight [N, K] into the kernel's layouts.

    Returns (packed uint8 [K//2, N], scales bf16 [K//G, N],
    zeros_x_scales bf16 [K//G, N] or None). Scales are rounded to bf16
    FIRST and the codes fitted against the rounded scale, so the stored
    pair is self-consistent; scale precision is second-order next to the
    4-bit code quantization error (docs/PERF.md round 2).

    K that is not a group multiple is zero-padded up to one (DeepSeek-V2-
    Lite's dense intermediate 10944 is 85.5 groups of 128); w4a16_gemm
    zero-pads the activation K to match, so the padded tail contributes
    exactly zero.
    """
    n, k = w.shape
    if k % group_size:
        # pad to a full default k-tile (8 groups) so the kernel's tile
        # divisibility holds for any padded K
        kp = round_up(k, GROUPS_PER_KTILE * group_size)
        w = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, kp - k)))
        k = kp
    wf = w.astype(jnp.float32).reshape(n, k // group_size, group_size)
    if symmetric:
        amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1, keepdims=True), 1e-10)
        scale = (amax / 7.0).astype(jnp.bfloat16).astype(jnp.float32)
        codes = jnp.clip(jnp.rint(wf / scale), -8, 7).astype(jnp.int32)
        codes = jnp.where(codes < 0, codes + 16, codes).astype(jnp.uint8).reshape(n, k)
        return pack_w4_tpu(codes.T), scale[..., 0].T.astype(jnp.bfloat16), None
    wmin = jnp.min(wf, axis=-1, keepdims=True)
    wmax = jnp.max(wf, axis=-1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / 15.0, 1e-10).astype(jnp.bfloat16).astype(jnp.float32)
    zero = jnp.rint(-wmin / scale)
    codes = jnp.clip(jnp.rint(wf / scale) + zero, 0, 15).astype(jnp.int32).reshape(n, k)
    # the kernel decodes nibbles as SIGNED two's complement; shift the
    # unsigned 0..15 codes down by 8 and add 8 to the zero point:
    #   (c_u - z) s = ((c_u - 8) - (z - 8)) s
    codes_signed = ((codes - 8) & 0xF).astype(jnp.uint8)
    s_t = scale[..., 0].T.astype(jnp.bfloat16)
    z_t = ((zero[..., 0] - 8.0) * scale[..., 0]).T.astype(jnp.bfloat16)
    return pack_w4_tpu(codes_signed.T), s_t, z_t


@functools.partial(jax.jit, static_argnames=("group_size",))
def awq_to_tpu_layout(qweight, scales, qzeros, *, group_size: int = 128):
    """Convert an AWQ checkpoint (qweight [K, N//8] int32, scales [K//G, N],
    qzeros [K//G, N//8] int32) into the kernel layout:
    (packed uint8 [K//2, N], scales f32 [K//G, N], zeros_x_scales [K//G, N])."""
    from ..quant.formats import awq_unpack_int32

    codes_kn = awq_unpack_int32(qweight).astype(jnp.int32)  # [K, N] 0..15
    zeros_gn = awq_unpack_int32(qzeros).astype(jnp.float32)  # [K//G, N]
    codes_signed = ((codes_kn - 8) & 0xF).astype(jnp.uint8)  # signed shift (see quantize_w4)
    packed = pack_w4_tpu(codes_signed)
    s = scales.astype(jnp.float32)
    return packed, s.astype(jnp.bfloat16), ((zeros_gn - 8.0) * s).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("group_size",))
def gptq_to_tpu_layout(qweight, qzeros, scales, g_idx=None, *, group_size: int = 128):
    """Convert a GPTQ checkpoint into the kernel layout.

    GPTQ stores qweight [K//8, N] int32 (8 sequential 4-bit codes per
    int32 along K), qzeros [K//G, N//8] int32 (8 codes per int32 along
    N), scales [K//G, N].  With ``desc_act`` the quantization groups
    follow the activation-order permutation ``g_idx [K]`` (group of
    channel k = g_idx[k]); the reference handles this with a channel
    gather before the GEMM (python moe.py:18-45, test_gptq_kernel.py).
    Here we instead de-permute the weight rows once at load time so the
    hot path needs no gather: returns (packed uint8 [K//2, N], scales
    f32 [K//G, N], zeros_x_scales f32 [K//G, N], perm [K] or None) where
    ``perm`` must be applied to the activation channels (a[:, perm])
    only when it is not None.
    """
    kdiv8, n = qweight.shape
    k = kdiv8 * 8
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    codes_kn = (
        (qweight.astype(jnp.uint32)[:, None, :] >> shifts[None, :, None]) & 0xF
    ).reshape(k, n)
    zeros_gn = (
        (qzeros.astype(jnp.uint32)[:, :, None] >> shifts[None, None, :]) & 0xF
    ).reshape(-1, n)
    # GPTQ's stored zero is (zero - 1)
    zeros_gn = zeros_gn.astype(jnp.float32) + 1.0
    s = scales.astype(jnp.float32)
    if g_idx is not None:
        # sort channels by group so groups are contiguous; activations
        # must be gathered with the same permutation
        perm = jnp.argsort(g_idx.astype(jnp.int32), stable=True)
        codes_kn = codes_kn[perm]
    else:
        perm = None
    codes_signed = ((codes_kn.astype(jnp.int32) - 8) & 0xF).astype(jnp.uint8)
    packed = pack_w4_tpu(codes_signed)
    return packed, s.astype(jnp.bfloat16), ((zeros_gn - 8.0) * s).astype(jnp.bfloat16), perm


@jax.jit
def mxfp4_to_tpu_layout(q_packed, scale_bytes):
    """Convert MXFP4 packed bytes [N, K//2] (adjacent-pair nibbles from
    ops.quant) + UE8M0 scales [N, K//32] into the kernel layout:
    (packed uint8 [K//2, N], scales f32 [K//32, N])."""
    from ..quant.formats import unpack_int4

    codes = unpack_int4(q_packed)  # [N, K] e2m1 bit patterns 0..15
    # UE8M0 scales are exact powers of two: bf16 (8-bit exponent) is lossless
    scales = jnp.exp2(scale_bytes.astype(jnp.float32) - 127.0).T.astype(jnp.bfloat16)
    return pack_w4_tpu(codes.T), scales


@functools.partial(jax.jit, static_argnames=("group_size", "fmt", "dtype"))
def dequant_w4(w, scales, zeros=None, *, group_size: int = 128, fmt: str = "int4", dtype=jnp.bfloat16):
    """XLA reference dequant of the kernel layout -> [N, K] dtype."""
    codes = unpack_w4_tpu(w).astype(jnp.int32).T  # [N, K] 0..15 nibbles
    n, k = codes.shape
    s = scales.astype(jnp.float32).T.reshape(n, k // group_size, 1)
    if fmt == "mxfp4":
        mag = jnp.asarray(_E2M1_MAG)[codes & 7]
        wf = jnp.where(codes >= 8, -mag, mag).reshape(n, k // group_size, group_size)
        return (wf * s).reshape(n, k).astype(dtype)
    signed = jnp.where(codes >= 8, codes - 16, codes).astype(jnp.float32)
    wf = signed.reshape(n, k // group_size, group_size) * s
    if zeros is not None:
        # kernel semantics: out = c_s*s - asum*(z*s); per-element w = c_s*s - z*s
        zt = zeros.astype(jnp.float32).T.reshape(n, k // group_size, 1)
        wf = wf - zt
    return wf.reshape(n, k).astype(dtype)
