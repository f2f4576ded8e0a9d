"""FP8 blockwise-scaled GEMM (DeepSeek-style 1x128 / 128x128 scale blocks).

TPU-native implementation of the reference's declared
``fp8_blockwise_scaled_mm`` (include/sgl_kernel_ops.h:577-586; oracle
tests/test_fp8_blockwise_gemm.py:23-81):

    out[M, N] = sum_k (scale_a[m, k//128] * A[m, k]) * (scale_b[k//128, n//128] * B[k, n])

Round-4 rewrite to the W4A16 kernel's standard (the round-3 kernel did ONE
128^3 dot per grid step — 8,192 steps at 1024x4096x4096, ~4% of roofline).
Design, mirroring ops/gemm/w4a16.py:

  - **Big tiles, many scale groups per grid step**: grid
    (N/bn, M/bm, K/bk) with bn=2048-class and bk = 8 * 128; each step runs
    one [bm, 128] x [128, bn] MXU dot per 128-k scale group ("inner" mode:
    the per-group VPU decode software-pipelines against the previous
    group's MXU dot).
  - **fp8 -> bf16 decode via integer bitcast** (Mosaic's native f8 convert
    is scalar-slow — measured 0.50 ms vs 0.08 ms bf16 at the headline
    decode shape, ops/attention/paged_decode_dma.py): shift the e4m3
    sign/exp/mant fields into bf16 positions. The PAIRED form ("pair",
    default) bitcasts the byte tile to uint16 and decodes TWO fp8 values
    per 32-bit lane — 5 integer ops per pair:
        spread = (u & 0xFF) | ((u & 0xFF00) << 8)
        h = ((spread & 0x7F007F) << 4) | ((spread & 0x800080) << 8)
    then one width-halving bitcast lands the [bk, bn] bf16 tile.
  - **Rebias folded into scales_b**: the bitcast decode yields B * 2^-120
    (bf16 exp field = raw e4m3 exp). Instead of a per-element rebias
    multiply, the pre-expanded scale rows carry * 2^120 — the rebias is
    FREE. scale_a columns fold into the (tiny) activation tile; scale_b
    rows apply to the [bm, bn] partial dot (scale-on-output, the W4A16
    lesson: per-element weight-side scaling lowers pathologically).
  - **Pre-expanded scales_b**: [K/128, N/128] -> [K/128, N] f32 (x 2^120)
    once per call (3% of B's bytes), or ahead of time via
    ``prepare_blockwise_scales`` for weight-stationary callers.

Numerics note (inner modes): the MXU dots run on 2^-120-biased bf16
weights, so individual a*w products sit ~2^-120 below true scale — they
must stay above f32's normal floor (2^-126) or flush. Production
per-128-block amax scaling spreads weight codes toward +-448 (2^8.8),
keeping products f32-normal for any activation the fp8 input format can
represent; uniformly TINY weight codes (max |code| << 1 across a whole
block — only possible with non-amax scale calibration) would flush.
``gmode="prescale"`` dots at true scale and has no such constraint.

Deviation policy (same as the fp8 KV pools, paged_decode_dma.py:47-56):
e4m3 SUBNORMAL codes (|x| <= 0.875 * 2^-6, 14 of 256 bytes) flush to zero
— the 2^-120 fold maps them below bf16's normal range, and production
blockwise-fp8 weights are per-128-block amax-scaled so a subnormal code
carries < 2^-15 of its block's amax. NaN bytes (0x7f/0xff) decode to
+-480 * scale (finite). Everything else is EXACT (bit-level shift).
tests/test_gemm.py::TestFp8Blockwise pins the policy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pallas_interpret, round_up

BLOCK = 128
REBIAS = 2.0 ** 120  # e4m3 bias 7 -> bf16 bias 127
GROUPS_PER_KTILE = 8

# Per-shape tile table, (N, K, m_bucket) -> (bm, bn, bk); measured on-chip
# 2026-08-20 (benchmark/sweep_blockwise_fp8.py, L=16 distinct weight banks
# per rep — L=8 sat on the 128 MiB VMEM boundary and over-read by ~25%).
# m_bucket as in w4a16.py: 0 = decode (M <= 32), 1 = small prefill
# (M <= 256), 2 = large prefill.
_TILE_TABLE = {
    (4096, 4096, 0): (16, 4096, 1024),   # 909 GB/s weight stream (inner2)
    (4096, 7168, 0): (16, 4096, 1024),   # 660 GB/s (inner2; inner was 504)
    (7168, 4096, 0): (16, 7168, 1024),   # 765-790 GB/s
    # bn=4096 measured 138.5 TF with an fp8 out tile (sweep) but OOMs the
    # 16MB scoped VMEM with a bf16 out (18.8MB, round-4 regen) — the
    # production default must compile for any out_dtype; bn=2048 fits
    (4096, 4096, 2): (256, 2048, 1024),  # bn=4096/fp8-out: 138.5 TF = 1.02x the per-tensor
    # fp8_scaled_mm at the same shape (136.4 TF) and 0.78x the same-shape
    # bf16 matmul (178.6 TF): the fp8->bf16 VPU decode chain is the v5e
    # family ceiling (no fp8 MXU input); blockwise scaling itself is free.
}

# (N, K, m_bucket) -> decode mode override ("pair" | "v32"). "pair" beat
# "v32" everywhere measured (750 vs 440 GB/s at the decode headline shape).
_DECODE_TABLE = {}

# (N, K, m_bucket) -> gmode override ("inner" | "innerN" | "prescale"),
# the w4a16 gmode analog: inner = per-group dots with scale-on-output
# (nacc accumulators for innerN), prescale = whole-tile decode + sb folded
# into the bf16 weights + ONE full-bk dot. Measured: inner2 wins the
# decode bucket (652 -> 918 GB/s at 4096x4096, 504 -> 660 at K=7168 — the
# f32 accumulate dependency chain was the drag), ties inner at prefill;
# prescale loses everywhere (88-117 vs 138 TF); inner4/bk=2048/bm=512
# crash the remote Mosaic compiler (HTTP 500).
_GMODE_TABLE = {
    (7168, 4096, 0): "inner",  # 790 inner vs 765 inner2 (within noise)
    (4096, 4096, 2): "inner",
}


def _parse_gmode(gmode: str):
    if gmode == "prescale":
        return 1, True
    assert gmode.startswith("inner") and (gmode[5:] == "" or gmode[5:].isdigit()), (
        f"gmode must be 'inner[N]' or 'prescale', got {gmode!r}")
    return int(gmode[5:] or 1), False


def _m_bucket(m: int) -> int:
    return 0 if m <= 32 else (1 if m <= 256 else 2)


def pick_tiles(m: int, n: int, k: int):
    hit = _TILE_TABLE.get((n, k, _m_bucket(m)))
    if hit is not None:
        return hit
    # decode default bn=4096 (909 vs 699 GB/s at the measured shape);
    # _resolve_tiles halves it to a divisor of N
    bn = 4096 if _m_bucket(m) == 0 else 2048
    return min(256, round_up(m, 8)), bn, GROUPS_PER_KTILE * BLOCK


def register_tiles(table):
    _TILE_TABLE.update(table)


def _pick_bk(k: int, want: int) -> int:
    """Largest Mosaic-legal k-tile <= want dividing K: the scale-row block
    puts groups-per-tile in the sublane dim (divisible by 8, or the full
    K/128 extent — w4a16.pick_ktile rule)."""
    ngk = k // BLOCK
    for c in range(min(ngk, want // BLOCK), 0, -1):
        if ngk % c == 0 and c % 8 == 0:
            return c * BLOCK
    return k


def _decode_pair(x):
    """fp8 e4m3 tile [g, bn] -> bf16 [g, bn] holding VALUE * 2^-120.

    Two fp8 bytes per 32-bit lane: bitcast to uint16 (row 2r = low byte,
    verified convention), spread the bytes to bits 0-7 / 16-23, shift
    both (sign, exp|mant) field pairs into bf16 positions in one masked
    op each, and bitcast the u32 pairs back to bf16 (row 2r = low half).
    """
    u = pltpu.bitcast(x, jnp.uint16).astype(jnp.int32)
    spread = (u & 0xFF) | ((u & 0xFF00) << 8)
    h = ((spread & 0x007F007F) << 4) | ((spread & 0x00800080) << 8)
    return pltpu.bitcast(h.astype(jnp.uint32), jnp.bfloat16)


def _decode_v32(x):
    """Per-element form of _decode_pair (one fp8 per lane) — the known-
    good baseline the on-chip sweep compares "pair" against."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    h = (((u & 0x7F) << 4) | ((u & 0x80) << 8)).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(h, jnp.bfloat16)


_DECODERS = {"pair": _decode_pair, "v32": _decode_v32}


def _upcast_a(x):
    """fp8 activations -> f32 TRUE values (full rebias; exact for normals,
    subnormals flush per the module policy). The activation tile is tiny
    ([bm, bk]) so the per-element chain is off the critical path."""
    if x.dtype != jnp.float8_e4m3fn:
        return x.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    h = (((u & 0x7F) << 4) | ((u & 0x80) << 8)).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(h, jnp.bfloat16).astype(jnp.float32) * REBIAS


def _group_dots(af, w_ref, sa_ref, sb_ref, *, ngb, decode, nacc, acc0):
    """The shared inner loop: per-128-group MXU dots with scale-on-output
    accumulation. ``nacc`` > 1 round-robins the scaled accumulate over
    independent accumulators (halves/quarters the f32 add dependency
    chain — the W4A16 gmode=inner2 lesson; wins on deep-K prefill)."""
    dec = _DECODERS[decode]
    accs = [acc0] + [jnp.zeros_like(acc0) for _ in range(nacc - 1)]
    for g in range(ngb):
        # scale_a column folds into the activation slice (bm x 128 VPU)
        a_g = (af[:, g * BLOCK : (g + 1) * BLOCK] * sa_ref[g, :, 0][:, None]).astype(jnp.bfloat16)
        w_g = dec(w_ref.at[pl.ds(g * BLOCK, BLOCK), :][...])  # [128, bn] bf16 * 2^-120
        part = jax.lax.dot_general(
            a_g, w_g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        i = g % nacc
        accs[i] = accs[i] + part * sb_ref[g, :][None, :]  # sb rows carry * 2^120
    return functools.reduce(lambda x, y: x + y, accs)


def _prescale_dot(af, w_ref, sa_ref, sb_ref, *, ngb, decode, acc0):
    """Prefill alternative: decode the WHOLE [bk, bn] tile, fold sb into
    the bf16 weight tile via a [ngb, 128, bn] reshape-broadcast, and issue
    ONE full-bk MXU dot — trades ngb scaled [bm, bn] f32 accumulates (the
    VPU drag at large bm) for one bk x bn VPU multiply. Numerics: the
    scaled weight rounds to bf16 BEFORE the dot (the group-dot form scales
    the f32 partial AFTER), a <= 2^-8 relative difference."""
    dec = _DECODERS[decode]
    w = dec(w_ref[...])  # [bk, bn] bf16 * 2^-120; sb rows carry * 2^120
    bk, bn = w.shape
    ws = (w.reshape(ngb, BLOCK, bn).astype(jnp.float32)
          * sb_ref[...].astype(jnp.float32)[:, None, :]).reshape(bk, bn)
    bm = af.shape[0]
    a = (af.reshape(bm, ngb, BLOCK) * sa_ref[:, :, 0].T[:, :, None]).reshape(bm, bk)
    part = jax.lax.dot_general(
        a.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return acc0 + part


def _kernel(a_ref, w_ref, sa_ref, sb_ref, o_ref, acc_ref, *, ngb, n_k, decode, nacc=1, prescale=False):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    af = _upcast_a(a_ref[...])  # [bm, bk] f32 true values
    if prescale:
        acc_ref[...] = _prescale_dot(
            af, w_ref, sa_ref, sb_ref, ngb=ngb, decode=decode, acc0=acc_ref[...])
    else:
        acc_ref[...] = _group_dots(
            af, w_ref, sa_ref, sb_ref, ngb=ngb, decode=decode, nacc=nacc,
            acc0=acc_ref[...])

    @pl.when(k_idx == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rebias",))
def prepare_blockwise_scales(scales_b, *, rebias: bool = True):
    """[.., K/128, N/128] f32 -> [.., K/128, N] f32 expanded scale rows
    with the decode rebias (* 2^120) folded in. Weight-stationary callers
    (models) call this once at load time; fp8_blockwise_scaled_mm accepts
    either form (compact rows are expanded per call — 3% of B's bytes)."""
    out = jnp.repeat(scales_b.astype(jnp.float32), BLOCK, axis=-1)
    return out * REBIAS if rebias else out


def _resolve_tiles(m, n, k, bm, bn, bk):
    tbm, tbn, tbk = pick_tiles(m, n, k)
    bm = bm or tbm
    bm = min(bm, round_up(m, 8))
    bn = bn or tbn
    bn = min(bn, n)
    while n % bn != 0:
        bn //= 2
    if bn % BLOCK and bn != n:
        bn = n  # no 128-multiple divisor: one whole-N block (Mosaic rule)
    bk = bk or tbk
    if k % bk or ((bk // BLOCK) % 8 and bk != k):
        bk = _pick_bk(k, max(bk, tbk))
    return bm, bn, bk


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "decode", "gmode"))
def fp8_blockwise_scaled_mm(
    a, b, scales_a, scales_b, out_dtype=jnp.bfloat16, *,
    bm: Optional[int] = None, bn: Optional[int] = None, bk: Optional[int] = None,
    decode: Optional[str] = None, gmode: Optional[str] = None,
):
    """A [M,K] fp8, B [K,N] fp8, scales_a [M, K/128] f32,
    scales_b [K/128, N/128] f32 (or pre-expanded [K/128, N] from
    prepare_blockwise_scales)."""
    m, k = a.shape
    n = b.shape[1]
    assert k % BLOCK == 0 and n % BLOCK == 0, (m, k, n)
    assert scales_a.shape == (m, k // BLOCK)
    if scales_b.shape == (k // BLOCK, n // BLOCK):
        sbx = prepare_blockwise_scales(scales_b)
    else:
        assert scales_b.shape == (k // BLOCK, n), (
            f"scales_b must be compact [K/128, N/128]={k // BLOCK, n // BLOCK} "
            f"or prepared [K/128, N], got {scales_b.shape}")
        sbx = scales_b
    if decode is None:
        decode = _DECODE_TABLE.get((n, k, _m_bucket(m)), "pair")
    if gmode is None:
        # inner2 is the measured decode-bucket default (the f32 accumulate
        # dependency chain stalls the single-accumulator form at M<=32);
        # prefill keeps inner (ties, fewer VMEM accumulators)
        default = "inner2" if _m_bucket(m) == 0 else "inner"
        gmode = _GMODE_TABLE.get((n, k, _m_bucket(m)), default)
    nacc, prescale = _parse_gmode(gmode)

    bm, bn, bk = _resolve_tiles(m, n, k, bm, bn, bk)
    mp = round_up(m, bm)
    if mp != m:
        a = jnp.pad(a, ((0, mp - m), (0, 0)))
        scales_a = jnp.pad(scales_a, ((0, mp - m), (0, 0)))

    ngb = bk // BLOCK
    n_k = k // bk
    grid = (n // bn, mp // bm, n_k)
    # [K/128, M, 1] layout: trailing dim 1 == full array extent satisfies
    # the Mosaic lane-dim block rule for the narrow scale columns
    sa_t = jnp.swapaxes(scales_a.astype(jnp.float32), 0, 1)[..., None]

    out = pl.pallas_call(
        functools.partial(_kernel, ngb=ngb, n_k=n_k, decode=decode,
                          nacc=nacc, prescale=prescale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda j, i, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda j, i, kk: (kk, j)),
            pl.BlockSpec((ngb, bm, 1), lambda j, i, kk: (kk, i, 0)),
            pl.BlockSpec((ngb, bn), lambda j, i, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(a, b, sa_t, sbx)
    return out[:m] if mp != m else out


def _grouped_kernel(eids_ref, a_ref, w_ref, sa_ref, sb_ref, o_ref, acc_ref, *, ngb, n_k, decode, nacc=1):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dec = _DECODERS[decode]
    af = _upcast_a(a_ref[...])
    accs = [acc_ref[...]] + [jnp.zeros_like(acc_ref[...]) for _ in range(nacc - 1)]
    for g in range(ngb):
        a_g = (af[:, g * BLOCK : (g + 1) * BLOCK] * sa_ref[g, :, 0][:, None]).astype(jnp.bfloat16)
        w_g = dec(w_ref.at[0, pl.ds(g * BLOCK, BLOCK), :][...])
        part = jax.lax.dot_general(
            a_g, w_g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        i = g % nacc
        accs[i] = accs[i] + part * sb_ref[0, g, :][None, :]
    acc_ref[...] = functools.reduce(lambda x, y: x + y, accs)

    @pl.when(k_idx == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "decode", "gmode"))
def fp8_blockwise_scaled_grouped_mm(
    a, b, scales_a, scales_b, expert_ids, out_dtype=jnp.bfloat16, *,
    bm: int = 128, bn: Optional[int] = None, bk: Optional[int] = None,
    decode: str = "pair", gmode: str = "inner",
):
    """Grouped DeepSeek-style blockwise-FP8 GEMM for MoE.

    TPU-native equivalent of the reference's declared
    ``fp8_blockwise_scaled_grouped_mm`` (include/sgl_kernel_ops.h:660-678;
    SURVEY.md §2.6 in-scope quantized-GEMM subset). Same inner-mode kernel
    as fp8_blockwise_scaled_mm with the expert id scalar-prefetched per
    row block (the moe/grouped_gemm.py pattern).

    a: [M, K] fp8, rows sorted by expert and padded so each ``bm``-row
       block belongs to ONE expert (the moe/align.py block-aligned sort).
    b: [E, K, N] fp8.  scales_a: [M, K/128] f32.
    scales_b: [E, K/128, N/128] f32 (or prepared [E, K/128, N]).
    expert_ids: [M/bm] int32 — the expert owning each row block.
    """
    m, k = a.shape
    e, _, n = b.shape
    assert k % BLOCK == 0 and n % BLOCK == 0 and m % bm == 0, (m, k, n, bm)
    assert scales_a.shape == (m, k // BLOCK), (
        f"scales_a must be [M, K/128]={m, k // BLOCK}, got {scales_a.shape}")
    assert expert_ids.shape == (m // bm,), (
        f"expert_ids is PER ROW BLOCK [M/bm]={m // bm,}, got "
        f"{expert_ids.shape} (per-row ids silently misroute blocks)")
    if scales_b.shape == (e, k // BLOCK, n // BLOCK):
        sbx = prepare_blockwise_scales(scales_b)
    else:
        assert scales_b.shape == (e, k // BLOCK, n), scales_b.shape
        sbx = scales_b

    _, bn, bk = _resolve_tiles(m, n, k, bm, bn, bk)
    ngb = bk // BLOCK
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)
    sa_t = jnp.swapaxes(scales_a.astype(jnp.float32), 0, 1)[..., None]

    nacc, prescale = _parse_gmode(gmode)
    assert not prescale, "grouped kernel supports inner[N] gmodes only"
    return pl.pallas_call(
        functools.partial(_grouped_kernel, ngb=ngb, n_k=n_k, decode=decode, nacc=nacc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk, eids: (i, kk)),
                pl.BlockSpec((1, bk, bn), lambda i, j, kk, eids: (eids[i], kk, j)),
                pl.BlockSpec((ngb, bm, 1), lambda i, j, kk, eids: (kk, i, 0)),
                pl.BlockSpec((1, ngb, bn), lambda i, j, kk, eids: (eids[i], kk, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, eids: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + min(e, m // bm) * k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(expert_ids.astype(jnp.int32), a, b, sa_t, sbx)
