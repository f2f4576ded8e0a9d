#!/usr/bin/env python
"""Second round-5 grid extension: window/softcap/sinks prefill variants,
wider quantized-GEMM grids, routing/activation/sampling/speculative and
cache-transfer families that had 0-1 tracked rows (VERDICT r4 #8: reach
reference-class baseline breadth — its flash_attn grid alone spans 672
configs over causal/local/sinks/page, update_baseline_from_log.py:78-95).

Harness rules (docs/PERF.md): every chain feeds its output back through
the carry the op consumes (no zero-multiply folding), weight-class ops
ride distinct banks (bench_chain_banks), physics guard on known byte/flop
counts."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import (
    bench_chain,
    bench_chain_banks,
    compare_to_baseline,
    load_baseline,
    report,
)

records = []
rng = np.random.default_rng(5)


def add(name, sec, **extra):
    records.append(report(name, sec, **extra))


def feed(o, carry):
    flat = o.reshape(-1)
    w = min(flat.shape[0], carry.reshape(-1).shape[0])
    c = carry.reshape(-1).at[:w].add((flat[:w] * 1e-6).astype(carry.dtype))
    return c.reshape(carry.shape)


def nbanks(weight_bytes, lo=2, hi=12):
    return max(lo, min(hi, (192 << 20) // max(weight_bytes, 1)))


def sub(tag, fn):
    """Per-CONFIG try/except (one relay hiccup / Mosaic-closed shape must
    not kill the rest of the family — bench_grid_ext lesson)."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — loud skip
        print(f"SKIP {tag}: {type(e).__name__} {str(e)[:160]}", flush=True)


def feed_sum(o, carry):
    """Full-reduction feedback: elementwise ops are sliceable, so a
    feed() of o[:1024] lets XLA dead-code 99.9% of the op (the round-5
    swiglu row read 25 TB/s); a sum needs every element."""
    return carry + (o.astype(jnp.float32).sum() * 1e-12).astype(carry.dtype)


def bench_prefill_variants():
    from sgl_kernel_tpu.ops.attention import flash_attention

    grids = [
        # (tag, b, s, hq, hkv, d, kwargs)
        ("window", 1, 8192, 32, 8, 128, {"sliding_window": 1024}),
        ("window", 1, 8192, 32, 8, 128, {"sliding_window": 4096}),
        ("window", 4, 4096, 32, 8, 128, {"sliding_window": 1024}),
        ("softcap", 1, 8192, 32, 8, 128, {"logit_soft_cap": 30.0}),
        ("softcap", 4, 4096, 32, 8, 128, {"logit_soft_cap": 50.0}),
        ("sinks", 1, 8192, 32, 8, 128, {"sinks": True}),
        ("sinks", 4, 4096, 32, 8, 128, {"sinks": True}),
    ]
    for tag, b, s, hq, hkv, d, kw in grids:
        def one(tag=tag, b=b, s=s, hq=hq, hkv=hkv, d=d, kw=dict(kw)):
            q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
            sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32) if kw.pop("sinks", False) else None
            key = kw.get("sliding_window") or kw.get("logit_soft_cap") or 1
            flops = 2 * b * hq * s * s * d
            if "sliding_window" in kw:  # each q row sees <= w keys
                flops = 2 * b * hq * s * min(s, kw["sliding_window"]) * d

            def step(c, k, v, kw=kw, sinks=sinks):
                o = flash_attention(c, k, v, sinks=sinks, causal=True, **kw)
                return c + o * jnp.bfloat16(1e-8)

            sec = bench_chain(step, q, reps=8, args=(k, v))
            add(f"flash_prefill_{tag}:{b}-{s}-{hq}-{hkv}-{d}-{int(key)}", sec,
                tflops=round(flops / sec / 1e12, 1))
        sub(f"flash_prefill_{tag}:{b}-{s}", one)


def bench_blockwise_grid():
    from sgl_kernel_tpu.ops.gemm import fp8_blockwise_scaled_mm
    from sgl_kernel_tpu.ops.gemm.blockwise_fp8 import prepare_blockwise_scales

    for m, n, k in [(16, 2048, 7168), (16, 7168, 2048), (128, 4096, 4096),
                    (128, 7168, 4096)]:
        af = jnp.asarray(rng.standard_normal((m, k)) * 0.2, jnp.bfloat16)
        sab = jnp.asarray(rng.random((m, k // 128)) + 0.5, jnp.float32)
        L = nbanks(k * n)
        banks = [(jnp.asarray(rng.standard_normal((k, n)) * 0.2, jnp.float8_e4m3fn),
                  prepare_blockwise_scales(
                      jnp.asarray(rng.random((k // 128, n // 128)) + 0.5, jnp.float32)))
                 for _ in range(L)]

        def step(carry, bf, sbb, sab=sab):
            o = fp8_blockwise_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf, sab, sbb,
                                        out_dtype=jnp.bfloat16)
            return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

        sec = bench_chain_banks(step, af, banks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k)
        add(f"fp8_blockwise_scaled_mm:{m}-{n}-{k}", sec,
            gbs=round((m * k + k * n) / sec / 1e9, 1),
            tflops=round(2 * m * n * k / sec / 1e12, 1))
        del banks


def bench_scaled_mm_grid():
    from sgl_kernel_tpu.ops.gemm import fp8_scaled_mm, int8_scaled_mm

    for m, n, k in [(1, 4096, 4096), (256, 14336, 4096)]:
        L = nbanks(k * n)
        ibanks = [(jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8),
                   jnp.asarray(rng.random(n) * 0.01 + 0.001, jnp.float32))
                  for _ in range(L)]
        sa = jnp.asarray(rng.random(max(m, 1)) * 0.01 + 0.001, jnp.float32)
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

        def istep(carry, b8, sb, sa=sa):
            o = int8_scaled_mm(carry.astype(jnp.int8), b8, sa, sb, out_dtype=jnp.bfloat16)
            return (carry + o[:, :1].astype(carry.dtype)).astype(carry.dtype)

        sec = bench_chain_banks(istep, a, ibanks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k, int_ops=True)
        add(f"int8_scaled_mm:{m}-{n}-{k}", sec,
            gbs=round((m * k + k * n) / sec / 1e9, 1))

        fbanks = [(jnp.asarray(rng.standard_normal((k, n)) * 0.2, jnp.float8_e4m3fn),)
                  for _ in range(L)]

        def fstep(carry, bf):
            o = fp8_scaled_mm(carry.astype(jnp.float8_e4m3fn), bf,
                              jnp.float32(0.01), jnp.float32(0.01), out_dtype=jnp.bfloat16)
            return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

        sec = bench_chain_banks(fstep, a, fbanks, reps=16 if m <= 128 else 8,
                                bytes_per_step=m * k + k * n,
                                flops_per_step=2 * m * n * k)
        add(f"fp8_scaled_mm:{m}-{n}-{k}", sec,
            gbs=round((m * k + k * n) / sec / 1e9, 1))
        del ibanks, fbanks


def bench_qserve_grid():
    from sgl_kernel_tpu.ops.gemm import qserve_w4a8_per_chn_gemm, qserve_w4a8_per_group_gemm

    M, N, K, g = 128, 4096, 4096, 128
    aq = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    s1 = jnp.asarray(rng.random(N) * 0.01, jnp.float32)
    sa_tok = jnp.asarray(rng.random(M) * 0.01, jnp.float32)
    z1 = jnp.asarray(rng.random(N), jnp.float32)
    asums = jnp.asarray(rng.random(M), jnp.float32)
    L = nbanks(N * K)
    cbanks = [(jnp.asarray(rng.integers(0, 15, (N, K)), jnp.uint8),) for _ in range(L)]

    def cstep(carry, wq, s1=s1, z1=z1, sa_tok=sa_tok, asums=asums):
        o = qserve_w4a8_per_chn_gemm(carry.astype(jnp.int8), wq, s1, sa_tok, z1, asums)
        return carry + o[:, :1].astype(carry.dtype)

    sec = bench_chain_banks(cstep, aq, cbanks, reps=8, bytes_per_step=N * K)
    add(f"qserve_w4a8_per_chn:{M}-{N}-{K}", sec, gbs=round(N * K / sec / 1e9, 1))

    si8 = jnp.asarray(rng.integers(1, 20, (N, K // g)), jnp.int8)
    zxs = jnp.asarray(rng.integers(-10, 10, (N, K // g)) * 1.0, jnp.float32).astype(jnp.int8)
    gbanks = [(jnp.asarray(rng.integers(0, 15, (N, K)), jnp.uint8),) for _ in range(L)]

    def gstep(carry, wq, si8=si8, zxs=zxs):
        o = qserve_w4a8_per_group_gemm(carry.astype(jnp.int8), wq, zxs, si8,
                                       s1.astype(jnp.float16), sa_tok.astype(jnp.float16),
                                       group_size=g)
        return carry + o[:, :1].astype(carry.dtype)

    sec = bench_chain_banks(gstep, aq, gbanks, reps=8, bytes_per_step=N * K)
    add(f"qserve_w4a8_per_group:{M}-{N}-{K}-{g}", sec, gbs=round(N * K / sec / 1e9, 1))


def bench_activation_grid():
    from sgl_kernel_tpu.ops.activation import gelu_and_mul, gelu_tanh_and_mul, silu_and_mul_clamp

    # inputs ride L distinct banks: a <16 MB elementwise chain carry stays
    # VMEM-resident across reps and never touches HBM (the 2.4 TB/s
    # gelu_tanh row the physics guard caught)
    t, inter = 1024, 14336
    L = max(4, (128 << 20) // (t * 2 * inter * 2))
    banks = [(jnp.asarray(rng.standard_normal((t, 2 * inter)), jnp.bfloat16),)
             for _ in range(L)]
    carry = jnp.zeros((8, 128), jnp.bfloat16)
    for fn, tag in [(gelu_and_mul, "gelu_and_mul"),
                    (gelu_tanh_and_mul, "gelu_tanh_and_mul"),
                    (silu_and_mul_clamp, "silu_and_mul_clamp")]:
        def step(c, x, fn=fn):
            return feed_sum(fn(x), c)

        sec = bench_chain_banks(step, carry, banks, reps=8,
                                bytes_per_step=3 * t * inter * 2)
        add(f"{tag}:{t}-{inter}", sec, gbs=round(3 * t * inter * 2 / sec / 1e9, 1))


def bench_routing_grid():
    from sgl_kernel_tpu.ops.moe import biased_topk, moe_fused_gate, topk_softmax

    for t, e, k in [(128, 64, 8), (16, 256, 8)]:
        g = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)

        def step(c):
            tw, tids = topk_softmax(c, k, renormalize=True)
            return c.at[:, :k].add(tw * 1e-6 + tids.astype(jnp.float32) * 1e-9)

        sec = bench_chain(step, g, reps=256)
        add(f"topk_softmax:{t}-{e}-{k}", sec)

    t, e, k = 16, 256, 8
    g = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(e) * 0.1, jnp.float32)

    def bstep(c):
        tw, tids = biased_topk(c, bias, k, routed_scaling_factor=2.5)
        return c.at[:, :k].add(tw * 1e-6 + tids.astype(jnp.float32) * 1e-9)

    sec = bench_chain(bstep, g, reps=256)
    add(f"biased_topk:{t}-{e}-{k}", sec)

    def fstep(c):
        tw, tids = moe_fused_gate(c, bias, num_expert_group=8, topk_group=4, topk=k)
        return c.at[:, :k].add(tw.astype(jnp.float32) * 1e-6 + tids.astype(jnp.float32) * 1e-9)

    sec = bench_chain(fstep, g, reps=256)
    add(f"moe_fused_gate:{t}-{e}-8-4-{k}", sec)


def bench_rope_norm_grid():
    from sgl_kernel_tpu.ops.norm import fused_add_rmsnorm, l2norm, rmsnorm
    from sgl_kernel_tpu.ops.rope import compute_cos_sin_cache, mrope_rotary_embedding, rotary_embedding

    t, h = 1024, 4096
    w = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.bfloat16)
    L = max(4, (64 << 20) // (t * h * 2))
    gbanks = [(jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16),)
              for _ in range(L)]
    carry = jnp.zeros((8, 128), jnp.bfloat16)
    sec = bench_chain_banks(lambda c, x: feed_sum(rmsnorm(x, w, gemma=True), c),
                            carry, gbanks, reps=16, bytes_per_step=2 * t * h * 2)
    add(f"rmsnorm_gemma:{t}-{h}", sec, gbs=round(2 * t * h * 2 / sec / 1e9, 1))

    w7 = jnp.asarray(rng.standard_normal(7168) * 0.1, jnp.bfloat16)
    fbanks = [(jnp.asarray(rng.standard_normal((16, 7168)), jnp.bfloat16),
               jnp.asarray(rng.standard_normal((16, 7168)), jnp.bfloat16))
              for _ in range(64)]

    def fstep(c, x, r):
        o, res = fused_add_rmsnorm(x, r, w7)
        return feed_sum(o + res, c)

    sec = bench_chain_banks(fstep, carry, fbanks, reps=32,
                            bytes_per_step=4 * 16 * 7168 * 2)
    add("fused_add_rmsnorm:16-7168", sec)

    lbanks = [(jnp.asarray(rng.standard_normal((4096, 128)), jnp.bfloat16),)
              for _ in range(32)]
    sec = bench_chain_banks(lambda c, x: feed_sum(l2norm(x), c), carry, lbanks,
                            reps=16, bytes_per_step=2 * 4096 * 128 * 2)
    add("l2norm:4096-128", sec)

    # mrope (multimodal sections) + interleaved rotary over a prefill chunk
    hq, d, rot = 32, 128, 128
    cache = compute_cos_sin_cache(rot, 32768)
    tq = 1024
    q = jnp.asarray(rng.standard_normal((tq, hq * d)), jnp.bfloat16)
    kq = jnp.asarray(rng.standard_normal((tq, 8 * d)), jnp.bfloat16)
    pos3 = jnp.asarray(rng.integers(0, 32768, (3, tq)), jnp.int32)

    def mstep(c):
        qo, ko = mrope_rotary_embedding(pos3, c, kq, d, cache, (24, 20, 20))
        return feed(qo, c)

    sec = bench_chain(mstep, q, reps=32)
    add(f"mrope_rotary_embedding:{tq}-{hq}-{d}", sec)

    pos = jnp.asarray(rng.integers(0, 32768, (tq,)), jnp.int32)

    def istep(c):
        qo, ko = rotary_embedding(pos, c, kq, d, cache, is_neox=False)
        return feed(qo, c)

    sec = bench_chain(istep, q, reps=32)
    add(f"rotary_embedding_interleaved:{tq}-{hq}-{d}", sec)


def bench_sampling_grid():
    from sgl_kernel_tpu.ops.sampling import (
        min_p_sampling_from_probs,
        sampling_from_probs,
        top_k_sampling_from_probs,
    )

    b, v = 16, 128256
    logits = jax.nn.softmax(jnp.asarray(rng.standard_normal((b, v)) * 2, jnp.float32))
    key = jax.random.PRNGKey(0)

    for fn, tag in [(lambda p, k: sampling_from_probs(p, k), "sampling_from_probs"),
                    (lambda p, k: min_p_sampling_from_probs(p, k, jnp.float32(0.05)), "min_p_sampling"),
                    (lambda p, k: top_k_sampling_from_probs(p, k, jnp.int32(40)), "top_k_sampling")]:
        def step(c, fn=fn):
            toks = fn(c, key)
            return c.at[:, 0].add(toks.astype(jnp.float32) * 1e-9)

        sec = bench_chain(step, logits, reps=64)
        add(f"{tag}:{b}-{v}", sec)


def bench_spec_grid():
    from sgl_kernel_tpu.ops.speculative import build_tree_kernel_efficient, segment_packbits

    n, nseg = 65536, 16
    x = jnp.asarray(rng.integers(0, 2, n), jnp.bool_)
    cuts = np.linspace(0, n, nseg + 1).astype(np.int32)
    iptr = jnp.asarray(cuts, jnp.int32)
    optr = jnp.asarray((cuts + 7) // 8, jnp.int32)
    out_size = int((cuts[-1] + 7) // 8 + nseg)

    def pstep(c):
        packed = segment_packbits(c, iptr, optr, out_size)
        return c ^ (packed[0] > 0)

    sec = bench_chain(pstep, x, reps=64)
    add(f"segment_packbits:{n}-{nseg}", sec)

    b, cands, dt, depth = 16, 64, 8, 4
    pl = jnp.asarray(np.tile(np.r_[-1, np.zeros(cands - 1)][None], (b, 1)), jnp.int32)
    sel = jnp.tile(jnp.arange(dt - 1, dtype=jnp.int32)[None], (b, 1))
    slen = jnp.full((b,), 100, jnp.int32)

    def tstep2(c):
        mask, posns, ridx, rnext, rsib = build_tree_kernel_efficient(
            pl, sel, c, depth=depth, draft_token_num=dt)
        # real dependency: fold the tree metadata back into the carry
        return c + (posns[:, 1] % 2) + (rnext[:, 0] % 2)

    sec = bench_chain(tstep2, slen, reps=64)
    add(f"build_tree_efficient:{b}-{cands}-{dt}", sec)


def bench_linear_attn_grid():
    from sgl_kernel_tpu.ops.linear_attn.causal_conv1d import causal_conv1d_update

    b, d, w = 64, 4096, 4
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    st = jnp.asarray(rng.standard_normal((b, w - 1, d)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((d, w)) * 0.1, jnp.bfloat16)

    def step(c):
        y, st2 = causal_conv1d_update(x, c, wt)
        return st2 + y[:, None, :] * jnp.bfloat16(1e-8)

    sec = bench_chain(step, st, reps=256)
    add(f"causal_conv1d_update:{b}-{d}-{w}", sec)


def bench_cache_grid():
    from sgl_kernel_tpu.ops.kvcache import store_cache_mla, transfer_kv_per_layer_ph_lf

    # MLA latent store (576-wide rows into the paged pool [P, page, D_ckv])
    n_tok = 1024
    pool = jnp.zeros((512, 128, 576), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((n_tok, 576)), jnp.bfloat16)
    loc = jnp.asarray(rng.permutation(512 * 128)[:n_tok], jnp.int32)

    def step(c):
        return store_cache_mla(kv, c, loc)

    sec = bench_chain(step, pool, reps=64)
    add(f"store_cache_mla:{n_tok}-576", sec)

    # page-head host pool [P, H, page, 2L, D] -> layer-first device pool
    L, H, D, page, npg = 4, 8, 128, 128, 32
    ph = jnp.asarray(rng.standard_normal((256, H, page, 2 * L, D)), jnp.bfloat16)
    dk = jnp.zeros((npg * page, H, D), jnp.bfloat16)
    src_ids = jnp.asarray(rng.permutation(256)[:npg], jnp.int32)
    dst_ids = jnp.arange(npg, dtype=jnp.int32)

    def tstep(c, ph):
        k2, v2 = transfer_kv_per_layer_ph_lf(ph, c, c, src_ids, dst_ids,
                                             jnp.int32(1), page_size=page)
        return k2 + v2 * jnp.bfloat16(1e-6)

    sec = bench_chain(tstep, dk, reps=32, args=(ph,))
    add(f"transfer_kv_per_layer_ph_lf:{npg}-{H}-{D}", sec,
        gbs=round(2 * 2 * npg * page * H * D * 2 / sec / 1e9, 1))


def bench_hadamard_grid():
    from sgl_kernel_tpu.ops.hadamard import hadamard_transform

    x = jnp.asarray(rng.standard_normal((1024, 512)), jnp.bfloat16)
    sec = bench_chain(lambda c: feed(hadamard_transform(c, 512 ** -0.5), c), x, reps=64)
    add("hadamard:1024-512", sec)


def bench_mxfp4_gemm_grid():
    from sgl_kernel_tpu.ops.gemm.w4a16 import mxfp4_to_tpu_layout, w4a16_gemm
    from sgl_kernel_tpu.ops.quant import per_token_group_quant_fp4

    n, k = 14336, 4096
    banks = []
    for _ in range(nbanks(n * k // 2, hi=8)):
        wfm = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
        q4, s4 = per_token_group_quant_fp4(wfm)
        banks.append(mxfp4_to_tpu_layout(q4, s4))
    a = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)

    def step(c, pk, scm):
        o = w4a16_gemm(c, pk, scm, group_size=32, fmt="mxfp4")
        return c + o[:, :k] * jnp.bfloat16(1e-8)

    sec = bench_chain_banks(step, a, banks, reps=8, bytes_per_step=n * k // 2)
    add(f"w4a16_gemm_mxfp4:16-{n}-{k}-32", sec, gbs=round(n * k / 2 / sec / 1e9, 1))


def main():
    fams = [
        bench_prefill_variants,
        bench_blockwise_grid,
        bench_scaled_mm_grid,
        bench_qserve_grid,
        bench_activation_grid,
        bench_routing_grid,
        bench_rope_norm_grid,
        bench_sampling_grid,
        bench_spec_grid,
        bench_linear_attn_grid,
        bench_cache_grid,
        bench_hadamard_grid,
        bench_mxfp4_gemm_grid,
    ]
    for fn in fams:
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — loud skip, never silent
            import traceback
            print(f'{{"name": "{fn.__name__}", "error": "{type(e).__name__}: {str(e)[:160]}"}}',
                  flush=True)
            traceback.print_exc(file=sys.stderr)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
