"""Round-5 grouped W4A16 GEMM retune coverage (VERDICT r4 #1/#9).

The grouped MoE kernel now runs the dense kernel's bodies (per-group
"inner" decode, multi-accumulator epilogues) with tiles from
pick_group_tiles (whole-N bn + big bk — the group-dot-count law,
docs/PERF.md round 3). These tests pin:
  - oracle parity at the DSv3 / V2-Lite production GEMM geometries the
    tuner picks big tiles for (reference analog: test_fused_moe.py's
    per-shape grids over the CUTLASS grouped mainloop),
  - gmode parity (inner/inner2/inner4/loop identical),
  - 256-expert indexing (the DSv3 routed-expert count),
  - tile-picker legality (VMEM budget, divisibility, scale-sublane rule).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgl_kernel_tpu.ops.gemm import w4a16 as gemm
from sgl_kernel_tpu.ops.moe.grouped_gemm import (
    bf16_grouped_mm,
    pick_bf16_group_tiles,
    pick_group_tiles,
    w4a16_grouped_mm,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _quant_bank(rng, e, n, k, g=128):
    pk, sc = [], []
    for _ in range(e):
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
        p, s, _ = gemm.quantize_w4(w, group_size=g)
        pk.append(p)
        sc.append(s)
    return jnp.stack(pk), jnp.stack(sc)


def _check_blocks(out, x, packed, scales, eids, bm, g, tol=2e-2):
    out = np.asarray(out, np.float64)
    for blk in range(len(eids)):
        eid = int(eids[blk])
        wd = np.asarray(gemm.dequant_w4(packed[eid], scales[eid], group_size=g,
                                        dtype=jnp.float32), np.float64)
        rows = slice(blk * bm, (blk + 1) * bm)
        ref = np.asarray(x[rows], np.float64) @ wd.T
        rel = np.abs(out[rows] - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < tol, (blk, rel)


class TestPickGroupTiles:
    # (N, K) -> expected class of tiles at decode bm=16: whole-N bn + the
    # biggest legal bk, per the group-dot-count law
    @pytest.mark.parametrize(
        "n,k,exp_bn,exp_bk",
        [
            (4096, 7168, 4096, 1024),   # DSv3 gate_up (56 groups; 2048 doesn't divide)
            (7168, 2048, 7168, 1024),   # DSv3 down (full-K tile busts VMEM at bn=7168)
            (2816, 2048, 2816, 2048),   # V2-Lite gate_up (was bn=256 / 176 dots in r4)
            (2048, 1408, 2048, 1408),   # V2-Lite down (11 groups -> full-K)
            (2560, 3584, 2560, 3584),   # gpt-oss-class gate_up (28 groups -> full-K)
            (3584, 1280, 3584, 1280),   # gpt-oss-class down (10 groups -> full-K)
        ],
    )
    def test_decode_tiles(self, n, k, exp_bn, exp_bk):
        bn, bk = pick_group_tiles(n, k, 128, bm=16)
        assert (bn, bk) == (exp_bn, exp_bk), (n, k, bn, bk)

    @pytest.mark.parametrize("n,k,g,bm", [
        (4096, 7168, 128, 16), (7168, 2048, 128, 64), (28672, 4096, 128, 128),
        (4096, 14336, 128, 64), (2816, 2048, 128, 16), (2048, 1408, 128, 16),
        (2560, 3584, 128, 64), (3584, 1280, 128, 64), (1280, 704, 64, 8),
        (160, 72 * 2, 8, 8),
    ])
    def test_legal(self, n, k, g, bm):
        bn, bk = pick_group_tiles(n, k, g, bm)
        assert n % bn == 0 and k % bk == 0 and bk % g == 0
        ngb = bk // g
        assert ngb % 8 == 0 or bk == k  # scale-block sublane rule
        assert bn % 128 == 0 or bn == n  # lane rule
        # double-buffered working set stays under the scoped-VMEM class
        w2 = bk // 2 * bn * 2
        acc = bm * bn * 4
        assert w2 + acc <= 15 * 2**20, (bn, bk, w2 + acc)

    def test_mixtral_prefill_vmem(self):
        # gate_up 28672x4096 at bm=128 must NOT pick whole-N (acc alone
        # would be 14.7 MB); the budget walks bn down
        bn, bk = pick_group_tiles(28672, 4096, 128, bm=128)
        assert bn < 28672 and 28672 % bn == 0


class TestGroupedOracleProduction:
    @pytest.mark.parametrize("n,k", [(4096, 7168), (7168, 2048)])
    def test_dsv3_geometry(self, rng, n, k):
        """The DSv3 routed-expert GEMM shapes (gate_up / down) on the
        auto-picked big tiles, vs the fp-dequant oracle."""
        e, bm, g = 4, 16, 128
        packed, scales = _quant_bank(rng, e, n, k, g)
        cap = 4 * bm
        eids = jnp.asarray([0, 3, 3, 1], jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        out = w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm)
        _check_blocks(out, np.asarray(x, np.float32), packed, scales, eids, bm, g)

    def test_v2lite_geometry_stacked(self, rng):
        """Layer-stacked V2-Lite gate_up (N=2816, K=2048) — the in-model
        form (scan over layers, scalar-prefetched layer id)."""
        l, e, n, k, bm, g = 2, 4, 2816, 2048, 16, 128
        banks = [_quant_bank(rng, e, n, k, g) for _ in range(l)]
        packed = jnp.stack([b[0] for b in banks])
        scales = jnp.stack([b[1] for b in banks])
        cap = 2 * bm
        eids = jnp.asarray([2, 0], jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        for lid in range(l):
            out = w4a16_grouped_mm(x, packed, scales, eids, layer_id=jnp.int32(lid),
                                   group_size=g, bm=bm)
            _check_blocks(out, np.asarray(x, np.float32), packed[lid], scales[lid],
                          eids, bm, g)

    def test_256_experts(self, rng):
        """DSv3 expert COUNT: block ids spanning 256 experts index the
        right bank rows (small dims keep the interpret run fast)."""
        e, n, k, bm, g = 256, 256, 256, 8, 128
        codes = rng.integers(0, 16, (e, k, n)).astype(np.uint8)
        packed = jnp.stack([gemm.pack_w4_tpu(jnp.asarray(c)) for c in codes])
        scales = jnp.asarray(rng.random((e, k // g, n)) * 0.1 + 0.01, jnp.bfloat16)
        cap = 6 * bm
        eids = jnp.asarray([0, 255, 17, 255, 128, 3], jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)), jnp.bfloat16)
        out = w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm)
        _check_blocks(out, np.asarray(x, np.float32), packed, scales, eids, bm, g)

    @pytest.mark.parametrize("gmode", ["loop", "inner", "inner2", "inner4"])
    def test_gmode_parity(self, rng, gmode):
        """Every gmode computes the identical grouped GEMM (the dense
        kernel's bodies, shared since round 5)."""
        e, n, k, bm, g = 3, 512, 1024, 16, 128
        packed, scales = _quant_bank(rng, e, n, k, g)
        cap = 4 * bm
        eids = jnp.asarray([1, 0, 2, 1], jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        base = w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm,
                                gmode="loop", out_dtype=jnp.float32)
        out = w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm,
                               gmode=gmode, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)

    def test_zeros_inner_parity(self, rng):
        """Asymmetric zeros ride the rank-1 correction identically through
        the shared inner body."""
        e, n, k, bm, g = 2, 256, 512, 8, 128
        pk, sc, zr = [], [], []
        for _ in range(e):
            w = jnp.asarray(rng.standard_normal((n, k)) * 0.05 + 0.02, jnp.float32)
            p, s, z = gemm.quantize_w4(w, group_size=g, symmetric=False)
            pk.append(p); sc.append(s); zr.append(z)
        packed, scales, zeros = jnp.stack(pk), jnp.stack(sc), jnp.stack(zr)
        cap = 2 * bm
        eids = jnp.asarray([1, 0], jnp.int32)
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        a = w4a16_grouped_mm(x, packed, scales, eids, zeros=zeros, group_size=g,
                             bm=bm, gmode="inner", out_dtype=jnp.float32)
        b = w4a16_grouped_mm(x, packed, scales, eids, zeros=zeros, group_size=g,
                             bm=bm, gmode="loop", out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


class TestBf16GroupedRetune:
    def test_picker_legal(self):
        from sgl_kernel_tpu.ops.moe.grouped_gemm import bf16_group_tiles_fit

        for n, k, bm in [(2560, 3584, 16), (3584, 1280, 16), (28672, 4096, 64)]:
            bn, bk = pick_bf16_group_tiles(n, k, bm)
            assert n % bn == 0 and k % bk == 0
            # bk is the A-block LANE dim: 128-multiple or full-K (Mosaic)
            assert bk % 128 == 0 or bk == k
            assert bk * bn * 2 * 2 + bm * bn * 6 <= 14 * 2**20
            assert bf16_group_tiles_fit(n, k, bm)
        # dims with no 128-multiple divisor force full-extent blocks beyond
        # VMEM: the fit gate must say no (fused_experts keeps ragged_dot)
        assert not bf16_group_tiles_fit(2880, 2880, 32)
        bn, bk = pick_bf16_group_tiles(160, 72, 8)  # fallback still divides
        assert 160 % bn == 0 and 72 % bk == 0

    def test_decode_cutover_matches_ragged(self, rng):
        """fused_experts bf16 at decode-class T must match the ragged_dot
        form bit-for-class (same math, different weight fetch)."""
        from sgl_kernel_tpu.ops import moe

        t, e, k, h, inter = 4, 16, 4, 128, 192
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(g, k, renormalize=True)
        w1 = jnp.asarray(rng.standard_normal((e, h, 2 * inter)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.05, jnp.bfloat16)
        ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
        out = moe.fused_experts(x, ws, tw, tids, block_size=16)  # grouped path (t<=64)
        # oracle: dense per-token expert sum
        xf = np.asarray(x, np.float64)
        w1f = np.asarray(w1, np.float64)
        w2f = np.asarray(w2, np.float64)
        ref = np.zeros((t, h))
        for ti in range(t):
            for kk in range(k):
                eid = int(tids[ti, kk])
                inter_o = xf[ti] @ w1f[eid]
                a = inter_o[:inter] / (1 + np.exp(-inter_o[:inter])) * inter_o[inter:]
                ref[ti] += float(tw[ti, kk]) * (a @ w2f[eid])
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 3e-2, rel


def test_grouped_padded_k(rng):
    """Non-group-multiple K: quantize_w4 zero-pads the packed bank; the
    grouped wrapper must pad the sorted activations to match (the dense
    kernel's contract — found driving fused_experts at inter=352)."""
    e, n, k, bm, g = 2, 256, 352, 8, 128
    pk, sc, wd = [], [], []
    for _ in range(e):
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
        p, s, _ = gemm.quantize_w4(w, group_size=g)
        pk.append(p); sc.append(s)
        wd.append(np.asarray(gemm.dequant_w4(p, s, group_size=g, dtype=jnp.float32))[:, :k])
    packed, scales = jnp.stack(pk), jnp.stack(sc)
    assert packed.shape[1] * 2 > k  # really padded
    cap = 2 * bm
    eids = jnp.asarray([1, 0], jnp.int32)
    x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
    out = np.asarray(w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm),
                     np.float64)
    for blk in range(2):
        rows = slice(blk * bm, (blk + 1) * bm)
        ref = np.asarray(x, np.float64)[rows] @ wd[int(eids[blk])].T
        rel = np.abs(out[rows] - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 2e-2, rel


def test_num_valid_blocks_clamp(rng):
    """Trailing (padding) blocks clamp their weight fetches: VALID rows
    must be bit-identical to the all-valid call; trailing rows are
    undefined (the combine drops them)."""
    e, n, k, bm, g = 3, 256, 512, 8, 128
    packed, scales = _quant_bank(rng, e, n, k, g)
    nb, nv = 6, 4
    eids = jnp.asarray([0, 2, 1, 1, 1, 1], jnp.int32)  # trailing pinned to 1
    x = jnp.asarray(rng.standard_normal((nb * bm, k)) * 0.1, jnp.bfloat16)
    full = w4a16_grouped_mm(x, packed, scales, eids, group_size=g, bm=bm,
                            out_dtype=jnp.float32)
    clamped = w4a16_grouped_mm(x, packed, scales, eids,
                               num_valid_blocks=jnp.int32(nv), group_size=g,
                               bm=bm, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(clamped)[: nv * bm],
                                  np.asarray(full)[: nv * bm])

    # bf16 kernel, same contract
    from sgl_kernel_tpu.ops.moe.grouped_gemm import bf16_grouped_mm as bmm
    w = jnp.asarray(rng.standard_normal((e, k, n)) * 0.05, jnp.bfloat16)
    fullb = bmm(x, w, eids, bm=bm, out_dtype=jnp.float32)
    clampb = bmm(x, w, eids, num_valid_blocks=jnp.int32(nv), bm=bm,
                 out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(clampb)[: nv * bm],
                                  np.asarray(fullb)[: nv * bm])


class TestPickBlockSize:
    """The alignment block size scales with mean rows/expert, not t (the
    round-5 regen found bs=128 at (t=128, E=64, topk=8) doubled the
    aligned cap vs bs=64 and with it the ragged GEMM rows + glue)."""

    @pytest.mark.parametrize(
        "t,k,e,exp",
        [
            (1, 8, 64, 16),      # decode: sub-1 rows/expert
            (16, 8, 64, 16),     # serving decode bucket
            (16, 8, 256, 16),    # DSv3 routed geometry
            (128, 8, 64, 16),    # sparse prefill: 16 rows/expert
            (128, 2, 8, 32),     # Mixtral prefill: 32 rows/expert
            (1024, 8, 64, 128),  # dense prefill: 128 rows/expert
            (4096, 8, 64, 128),  # clamped at 128
        ],
    )
    def test_policy(self, t, k, e, exp):
        from sgl_kernel_tpu.ops.moe import pick_block_size

        assert pick_block_size(t, k, e) == exp

    def test_default_matches_explicit(self, rng):
        """fused_experts with block_size=None equals the explicitly-picked
        call bit-for-bit on every weight format."""
        from sgl_kernel_tpu.ops import moe

        t, e, k, h, inter, g = 8, 8, 2, 128, 128, 64
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        gl = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(gl, k, renormalize=True)
        bs = moe.pick_block_size(t, k, e)

        w1 = jnp.asarray(rng.standard_normal((e, h, 2 * inter)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.05, jnp.bfloat16)
        ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
        np.testing.assert_array_equal(
            np.asarray(moe.fused_experts(x, ws, tw, tids)),
            np.asarray(moe.fused_experts(x, ws, tw, tids, block_size=bs)))

        p1, s1 = _quant_bank(rng, e, 2 * inter, h, g)
        p2, s2 = _quant_bank(rng, e, h, inter, g)
        wsq = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2,
                             fmt="int4", group_size=g)
        np.testing.assert_array_equal(
            np.asarray(moe.fused_experts(x, wsq, tw, tids)),
            np.asarray(moe.fused_experts(x, wsq, tw, tids, block_size=bs)))


class TestPrefillGeometry:
    """fused_experts oracle parity at prefill-class token counts under the
    picked block sizes (the sparse-prefill (t>=128, low rows/expert) class
    regressed unseen in round 5 — no test drove t>64 through the quantized
    grouped path)."""

    @pytest.mark.parametrize("t,e,k,fmt", [
        (128, 64, 8, "int4"),   # sparse prefill: 16 rows/expert -> bs=16
        (128, 8, 2, "bf16"),    # Mixtral prefill: 32 rows/expert -> bs=32
        (256, 8, 2, "int4"),    # dense-class: 64 rows/expert -> bs=64
    ])
    def test_oracle(self, rng, t, e, k, fmt):
        from sgl_kernel_tpu.ops import moe

        h, inter, g = 128, 192, 64
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        gl = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(gl, k, renormalize=True)
        if fmt == "bf16":
            w1 = jnp.asarray(rng.standard_normal((e, h, 2 * inter)) * 0.05, jnp.bfloat16)
            w2 = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.05, jnp.bfloat16)
            ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
            w1d = np.asarray(w1, np.float64)
            w2d = np.asarray(w2, np.float64)
        else:
            p1, s1 = _quant_bank(rng, e, 2 * inter, h, g)
            p2, s2 = _quant_bank(rng, e, h, inter, g)
            ws = moe.MoeWeights(w1=p1, w2=p2, w1_scales=s1, w2_scales=s2,
                                fmt="int4", group_size=g)
            w1d = np.stack([np.asarray(gemm.dequant_w4(p1[i], s1[i], group_size=g,
                                                       dtype=jnp.float32), np.float64).T
                            for i in range(e)])
            w2d = np.stack([np.asarray(gemm.dequant_w4(p2[i], s2[i], group_size=g,
                                                       dtype=jnp.float32), np.float64).T
                            for i in range(e)])
        out = moe.fused_experts(x, ws, tw, tids)
        xf = np.asarray(x, np.float64)
        ref = np.zeros((t, h))
        for ti in range(t):
            for kk in range(k):
                eid = int(tids[ti, kk])
                io = xf[ti] @ w1d[eid]
                a = io[:inter] / (1 + np.exp(-io[:inter])) * io[inter:]
                ref[ti] += float(tw[ti, kk]) * (a @ w2d[eid])
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 3e-2, rel


def test_fused_experts_mxfp4(rng):
    """mxfp4 expert banks through the unified grouped kernel (the reference
    W4A16 grouped GEMM treats int4 and mxfp4 as one kernel family,
    GroupGemmW4A16Xe20.cpp) — no test drove fmt='mxfp4' end-to-end."""
    from sgl_kernel_tpu.ops import moe
    from sgl_kernel_tpu.ops.gemm.w4a16 import mxfp4_to_tpu_layout
    from sgl_kernel_tpu.ops.quant import per_token_group_quant_fp4

    t, e, k, h, inter = 8, 8, 2, 128, 192
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    gl = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    tw, tids = moe.topk_softmax(gl, k, renormalize=True)

    p1l, s1l, p2l, s2l, w1d, w2d = [], [], [], [], [], []
    for i in range(e):
        wf1 = jnp.asarray(rng.standard_normal((2 * inter, h)) * 0.05, jnp.float32)
        wf2 = jnp.asarray(rng.standard_normal((h, inter)) * 0.05, jnp.float32)
        q1, sc1 = per_token_group_quant_fp4(wf1)
        q2, sc2 = per_token_group_quant_fp4(wf2)
        pk1, sb1 = mxfp4_to_tpu_layout(q1, sc1)
        pk2, sb2 = mxfp4_to_tpu_layout(q2, sc2)
        p1l.append(pk1); s1l.append(sb1); p2l.append(pk2); s2l.append(sb2)
        w1d.append(np.asarray(gemm.dequant_w4(pk1, sb1, fmt="mxfp4", group_size=32,
                                              dtype=jnp.float32), np.float64).T)
        w2d.append(np.asarray(gemm.dequant_w4(pk2, sb2, fmt="mxfp4", group_size=32,
                                              dtype=jnp.float32), np.float64).T)
    ws = moe.MoeWeights(w1=jnp.stack(p1l), w2=jnp.stack(p2l),
                        w1_scales=jnp.stack(s1l), w2_scales=jnp.stack(s2l),
                        fmt="mxfp4", group_size=32)
    out = moe.fused_experts(x, ws, tw, tids)
    xf = np.asarray(x, np.float64)
    ref = np.zeros((t, h))
    for ti in range(t):
        for kk in range(k):
            eid = int(tids[ti, kk])
            io = xf[ti] @ w1d[eid]
            a = io[:inter] / (1 + np.exp(-io[:inter])) * io[inter:]
            ref[ti] += float(tw[ti, kk]) * (a @ w2d[eid])
    rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 6e-2, rel


class TestExpertBias:
    """Per-expert b1/b2 (reference fused_experts moe.py:409-410; every
    reference fused_moe baseline key carries a with_bias flag and gpt-oss
    checkpoints ship expert biases). b1 applies before the activation."""

    @pytest.mark.parametrize("fmt,stacked", [
        ("bf16", False), ("bf16", True), ("int4", False), ("int4", True),
    ])
    def test_oracle(self, rng, fmt, stacked):
        from sgl_kernel_tpu.ops import moe

        t, e, k, h, inter, g, L = 8, 8, 2, 128, 192, 64, 3
        lidx = 1
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        gl = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(gl, k, renormalize=True)
        b1 = jnp.asarray(rng.standard_normal((e, 2 * inter)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((e, h)) * 0.1, jnp.float32)

        def maybe_stack(a):
            return jnp.tile(a[None], (L,) + (1,) * a.ndim) if stacked else a

        if fmt == "bf16":
            w1 = jnp.asarray(rng.standard_normal((e, h, 2 * inter)) * 0.05, jnp.bfloat16)
            w2 = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.05, jnp.bfloat16)
            ws = moe.MoeWeights(w1=maybe_stack(w1), w2=maybe_stack(w2),
                                b1=maybe_stack(b1), b2=maybe_stack(b2), fmt="bf16")
            w1d = np.asarray(w1, np.float64)
            w2d = np.asarray(w2, np.float64)
        else:
            p1, s1 = _quant_bank(rng, e, 2 * inter, h, g)
            p2, s2 = _quant_bank(rng, e, h, inter, g)
            ws = moe.MoeWeights(w1=maybe_stack(p1), w2=maybe_stack(p2),
                                w1_scales=maybe_stack(s1), w2_scales=maybe_stack(s2),
                                b1=maybe_stack(b1), b2=maybe_stack(b2),
                                fmt="int4", group_size=g)
            w1d = np.stack([np.asarray(gemm.dequant_w4(p1[i], s1[i], group_size=g,
                                                       dtype=jnp.float32), np.float64).T
                            for i in range(e)])
            w2d = np.stack([np.asarray(gemm.dequant_w4(p2[i], s2[i], group_size=g,
                                                       dtype=jnp.float32), np.float64).T
                            for i in range(e)])
        out = moe.fused_experts(x, ws, tw, tids,
                                layer_id=jnp.int32(lidx) if stacked else None)
        xf = np.asarray(x, np.float64)
        b1f, b2f = np.asarray(b1, np.float64), np.asarray(b2, np.float64)
        ref = np.zeros((t, h))
        for ti in range(t):
            for kk in range(k):
                eid = int(tids[ti, kk])
                io = xf[ti] @ w1d[eid] + b1f[eid]
                a = io[:inter] / (1 + np.exp(-io[:inter])) * io[inter:]
                ref[ti] += float(tw[ti, kk]) * (a @ w2d[eid] + b2f[eid])
        rel = np.abs(np.asarray(out, np.float64) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 3e-2, rel

    def test_no_bias_unchanged(self, rng):
        """b1=b2=None is bit-identical to the pre-bias behavior."""
        from sgl_kernel_tpu.ops import moe

        t, e, k, h, inter = 4, 8, 2, 128, 192
        x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
        gl = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
        tw, tids = moe.topk_softmax(gl, k, renormalize=True)
        w1 = jnp.asarray(rng.standard_normal((e, h, 2 * inter)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((e, inter, h)) * 0.05, jnp.bfloat16)
        ws = moe.MoeWeights(w1=w1, w2=w2, fmt="bf16")
        z1 = jnp.zeros((e, 2 * inter), jnp.float32)
        z2 = jnp.zeros((e, h), jnp.float32)
        wsz = moe.MoeWeights(w1=w1, w2=w2, b1=z1, b2=z2, fmt="bf16")
        np.testing.assert_array_equal(
            np.asarray(moe.fused_experts(x, ws, tw, tids)),
            np.asarray(moe.fused_experts(x, wsz, tw, tids)))
