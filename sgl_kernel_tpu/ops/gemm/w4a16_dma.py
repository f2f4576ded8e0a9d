"""W4A16 decode GEMM with manual weight DMA (Pallas TPU).

The BlockSpec-pipelined kernel (w4a16.py) measures 635 GB/s in-model on
the decode bucket against a 695 GB/s stream bound for its own access
pattern — while the manual-DMA paged-decode kernel streams KV pages at
822 GB/s on the same chip (ops/attention/paged_decode_dma.py,
docs/PERF.md). This kernel applies the same technique to the weight
stream: double-buffered ``pltpu.make_async_copy`` of [bk/2, bn] packed
chunks from an ANY-space (HBM) weight ref into VMEM scratch, with the
K-chunk loop inside the kernel body so the DMA engine runs ahead of the
MXU instead of behind the grid pipeline.

Same math contract as w4a16.py (reference gemm_xe2.hpp): K-paired int4
bitcast decode in MXU rhs orientation, per-group partial dots with
output-side f32 scaling, optional asymmetric-zero rank-1 correction,
silu_mul prologue, bias/residual epilogue. Decode bucket only (M <= 32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import pallas_interpret, round_up
from .w4a16 import _decode_tile


def _kernel(
    lid_ref,   # [1] scalar prefetch
    a_ref,     # [bm, K] VMEM
    a2_ref,    # [bm, K] VMEM or None
    w_hbm,     # ANY [L, K/2, N]
    s_ref,     # [K/G, bn] VMEM (this column stripe, all K groups)
    z_ref,     # [K/G, bn] VMEM or None
    b_ref,     # [1, bn] VMEM or None
    r_ref,     # [bm, bn] VMEM or None
    o_ref,     # [bm, bn]
    w_buf,     # VMEM [2, bk/2, bn] u8
    sem,       # DMA sems [2]
    acc_scr,   # VMEM [bm, bn] f32
    *,
    fmt: str,
    group_size: int,
    bk: int,
    bn: int,
    n_k: int,
    prologue: Optional[str],
    unroll: bool,
    nbuf: int,
    gmode: str,
):
    j = pl.program_id(0)
    lid = lid_ref[0]
    bkh = bk // 2
    g0 = group_size
    ngb = bk // g0

    def dma(kk, slot):
        return pltpu.make_async_copy(
            w_hbm.at[lid, pl.ds(kk * bkh, bkh), pl.ds(j * bn, bn)],
            w_buf.at[slot],
            sem.at[slot],
        )

    if unroll:
        for kk in range(min(nbuf - 1, n_k)):
            dma(kk, kk % nbuf).start()
    else:
        dma(0, 0).start()

    acc_scr[...] = jnp.zeros_like(acc_scr)

    def load_a(col0):
        # slice activations straight off the VMEM ref: a dynamic_slice on a
        # loaded VALUE does not lower on Mosaic TC (found in the on-chip
        # A/B); ref loads with pl.ds do. The silu prologue recomputes per
        # group slice — VPU work that overlaps the weight DMA.
        if prologue == "silu_mul":
            g = a_ref[:, pl.ds(col0, g0)].astype(jnp.float32)
            return (g * jax.nn.sigmoid(g) * a2_ref[:, pl.ds(col0, g0)].astype(jnp.float32)).astype(a_ref.dtype)
        return a_ref[:, pl.ds(col0, g0)]

    def body(kk, _):
        if isinstance(kk, int):
            # fully-unrolled form: every DMA offset, buffer slot and scale
            # row is STATIC — the dynamic form (fori_loop) crashes Mosaic's
            # remote compiler (HTTP 500 subprocess abort, rounds 2-3)
            slot = kk % nbuf
            ahead = kk + nbuf - 1
            if ahead < n_k:
                dma(ahead, ahead % nbuf).start()
        else:
            slot = jax.lax.rem(kk, 2)

            @pl.when(kk + 1 < n_k)
            def _ahead():
                dma(kk + 1, jax.lax.rem(kk + 1, 2)).start()

        dma(kk, slot).wait()
        if gmode == "loop":
            wf = _decode_tile(w_buf.at[slot], fmt)  # [bk, bn] bf16 codes
        acc = acc_scr[...]
        for gg in range(ngb):
            if gmode == "inner":
                # decode THIS group's [g0, bn] slice right before its dot:
                # the VPU upconvert of group g+1 software-pipelines against
                # the MXU dot of group g (same win as w4a16.py gmode=inner)
                wf_g = _decode_tile(
                    w_buf.at[slot, pl.ds(gg * g0 // 2, g0 // 2), :], fmt)
            else:
                wf_g = wf[gg * g0 : (gg + 1) * g0, :]
            a_g = load_a(kk * bk + gg * g0)
            part = jax.lax.dot_general(
                a_g, wf_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # direct row reads — s_ref[...] would load the whole [ng, bn]
            # block per group iteration in the bandwidth-bound hot loop
            srow = s_ref[pl.ds(kk * ngb + gg, 1), :]
            acc = acc + part * srow.astype(jnp.float32)
            if z_ref is not None:
                asum = jnp.sum(a_g.astype(jnp.float32), axis=1, keepdims=True)
                zrow = z_ref[pl.ds(kk * ngb + gg, 1), :]
                acc = acc - asum * zrow.astype(jnp.float32)
        acc_scr[...] = acc
        return 0

    if unroll:
        for kk in range(n_k):
            body(kk, 0)
    else:
        jax.lax.fori_loop(0, n_k, body, 0)

    out = acc_scr[...]
    if b_ref is not None:
        out = out + b_ref[...].astype(jnp.float32)
    if r_ref is not None:
        out = out + r_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _entry(lid_ref, *refs, has_a2, has_zeros, has_bias, has_res, **kw):
    idx = 0
    a_ref = refs[idx]; idx += 1
    a2_ref = refs[idx] if has_a2 else None
    idx += int(has_a2)
    w_hbm, s_ref = refs[idx], refs[idx + 1]
    idx += 2
    z_ref = refs[idx] if has_zeros else None
    idx += int(has_zeros)
    b_ref = refs[idx] if has_bias else None
    idx += int(has_bias)
    r_ref = refs[idx] if has_res else None
    idx += int(has_res)
    o_ref = refs[idx]
    w_buf, sem, acc_scr = refs[idx + 1], refs[idx + 2], refs[idx + 3]
    _kernel(lid_ref, a_ref, a2_ref, w_hbm, s_ref, z_ref, b_ref, r_ref, o_ref,
            w_buf, sem, acc_scr, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "fmt", "out_dtype", "bn", "bk", "prologue", "unroll", "nbuf", "gmode"),
)
def w4a16_gemm_dma(
    a,
    w,
    scales,
    zeros=None,
    bias=None,
    a2=None,
    residual=None,
    layer_id=None,
    *,
    group_size: int = 128,
    fmt: str = "int4",
    out_dtype=None,
    bn: int = 2048,
    bk: int = 1024,
    prologue: Optional[str] = None,
    unroll: bool = True,
    nbuf: int = 2,
    gmode: str = "inner",
):
    """Decode-bucket W4A16 GEMM with manual weight DMA.

    Same layouts/contract as w4a16.w4a16_gemm (w [K//2, N] or stacked
    [L, K//2, N] K-paired uint8, scales/zeros [K//G, N] bf16); M <= 32.
    """
    m, k = a.shape
    assert m <= 32, "DMA GEMM is the decode-bucket path; use w4a16_gemm for prefill"
    assert gmode in ("loop", "inner"), f"unsupported gmode {gmode!r} (loop | inner)"
    stacked = layer_id is not None
    if not stacked:
        w = w[None]
        scales = scales[None]
        if zeros is not None:
            zeros = zeros[None]
        if bias is not None:
            bias = bias[None] if bias.ndim == 1 else bias
        layer_id = 0
    n = w.shape[-1]
    l = w.shape[0]
    assert w.shape == (l, k // 2, n) and w.dtype == jnp.uint8, (w.shape, w.dtype)
    assert scales.shape == (l, k // group_size, n), scales.shape
    assert (a2 is not None) == (prologue == "silu_mul"), (
        "prologue='silu_mul' requires a2 (and vice versa)")
    if zeros is not None:
        assert zeros.shape == scales.shape, (zeros.shape, scales.shape)
    if residual is not None:
        assert residual.shape == (m, n), (residual.shape, (m, n))
    out_dtype = out_dtype or a.dtype

    bn = min(bn, n)
    while n % bn != 0:
        bn //= 2
    bk = min(bk, k)
    assert k % bk == 0 and bk % group_size == 0
    n_k = k // bk
    ng = k // group_size

    bm = round_up(m, 8)
    if bm != m:
        a = jnp.pad(a, ((0, bm - m), (0, 0)))
        if a2 is not None:
            a2 = jnp.pad(a2, ((0, bm - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, bm - m), (0, 0)))

    grid = (n // bn,)
    a_spec = pl.BlockSpec((bm, k), lambda j, lid: (0, 0))
    s_spec = pl.BlockSpec((None, ng, bn), lambda j, lid: (lid[0], 0, j))
    in_specs = [a_spec]
    inputs = [a]
    has_a2 = a2 is not None
    if has_a2:
        assert prologue == "silu_mul"
        in_specs.append(a_spec)
        inputs.append(a2)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY), s_spec]
    inputs += [w, scales]
    has_zeros = zeros is not None
    if has_zeros:
        in_specs.append(s_spec)
        inputs.append(zeros)
    has_bias = bias is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((None, 1, bn), lambda j, lid: (lid[0], 0, j)))
        inputs.append(bias.reshape(l, 1, n))
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((bm, bn), lambda j, lid: (0, j)))
        inputs.append(residual)

    kernel = functools.partial(
        _entry,
        has_a2=has_a2, has_zeros=has_zeros, has_bias=has_bias, has_res=has_res,
        fmt=fmt, group_size=group_size, bk=bk, bn=bn, n_k=n_k, prologue=prologue,
        unroll=unroll, nbuf=(nbuf if unroll else 2), gmode=gmode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda j, lid: (0, j)),
            scratch_shapes=[
                pltpu.VMEM((nbuf if unroll else 2, bk // 2, bn), jnp.uint8),
                pltpu.SemaphoreType.DMA((nbuf if unroll else 2,)),
                pltpu.VMEM((bm, bn), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bm, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * k,
            bytes_accessed=bm * k * 2 + n * k // 2 + bm * n * 2,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(jnp.asarray(layer_id, jnp.int32).reshape(1), *inputs)
    return out[:m] if bm != m else out
