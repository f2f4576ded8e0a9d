#!/usr/bin/env python
"""Round-5 grid extension toward reference baseline breadth (VERDICT r4 #8:
146 entries vs the reference's 770; zero mla_prefill / sparse-prefill /
fp8_mqa_logits latency rows). Adds the missing families and widens the
flash-decode / prefill / GEMM grids over dtype x ctx x GQA classes
(reference analog: the 672-config flash_attn grid,
update_baseline_from_log.py:78-95).

Every chain feeds its output back through the carry that the op consumes
(no loop-invariant hoisting, no zero-multiply folding — docs/PERF.md)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report

records = []
rng = np.random.default_rng(1)


def add(name, sec, **extra):
    records.append(report(name, sec, **extra))


def sub(tag, fn):
    """Per-CONFIG try/except: one Mosaic-closed shape must not kill the
    rest of its family (round-5 regen: bench_mqa_logits lost 6 rows to the
    first config's HTTP 500)."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — loud skip
        print(f"SKIP {tag}: {type(e).__name__} {str(e)[:160]}", flush=True)


def feed(o, carry):
    flat = o.reshape(-1)
    w = min(flat.shape[0], carry.reshape(-1).shape[0])
    c = carry.reshape(-1).at[:w].add((flat[:w] * 1e-6).astype(carry.dtype))
    return c.reshape(carry.shape)


def bench_mla_prefill():
    from sgl_kernel_tpu.ops.attention.mla import mla_prefill

    for b, s, h in [(1, 1024, 16), (1, 4096, 16), (4, 1024, 16), (1, 8192, 16),
                    (1, 1024, 128), (1, 4096, 128)]:
        qn = jnp.asarray(rng.standard_normal((b, s, h, 512)) * 0.1, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, s, h, 64)) * 0.1, jnp.bfloat16)
        kv = jnp.asarray(rng.standard_normal((b, s, 576)) * 0.1, jnp.bfloat16)

        def step(c, qp=qp, kv=kv):
            o = mla_prefill(c, qp, kv)
            return feed(o, c)

        flops = 2 * b * h * s * s * (576 + 512)
        sec = bench_chain(step, qn, reps=8, flops_per_step=flops)
        add(f"mla_prefill:{b}-{s}-{h}", sec, tflops=round(flops / sec / 1e12, 1))


def bench_sparse_mla_prefill():
    from sgl_kernel_tpu.ops.attention.nsa import sparse_mla_prefill

    nslots, kk, h = 64 * 1024, 2048, 128
    pool = jnp.asarray(rng.standard_normal((nslots, 576)) * 0.1, jnp.bfloat16)
    for t in (1024, 4096):
        def one(t=t):
            qn = jnp.asarray(rng.standard_normal((t, h, 512)) * 0.1, jnp.bfloat16)
            qp = jnp.asarray(rng.standard_normal((t, h, 64)) * 0.1, jnp.bfloat16)
            slots = jnp.asarray(rng.integers(0, nslots, (t, kk)), jnp.int32)

            def step(c, pool, qp=qp, slots=slots):
                o = sparse_mla_prefill(c, qp, pool, slots)
                return feed(o, c)

            sec = bench_chain(step, qn, reps=4, args=(pool,))
            add(f"nsa_sparse_mla_prefill:{t}-{h}-{kk}", sec,
                gbs=round(t * kk * 576 * 2 / sec / 1e9, 1))
        sub(f"nsa_sparse_mla_prefill:{t}", one)


def bench_mqa_logits():
    from sgl_kernel_tpu.ops.attention.nsa import fp8_mqa_logits, fp8_paged_mqa_logits

    d = 128
    # ragged (prefill) indexer scores
    for nq, h in [(1024, 32), (4096, 32), (4096, 64)]:
        q = jnp.asarray(rng.standard_normal((nq, h, d)) * 0.3, jnp.float8_e4m3fn)
        kf = jnp.asarray(rng.standard_normal((nq, d)) * 0.3, jnp.float8_e4m3fn)
        ksc = jnp.asarray(rng.random(nq) + 0.5, jnp.float32)
        w = jnp.asarray(np.abs(rng.standard_normal((nq, h))), jnp.float32)
        ks = jnp.zeros((nq,), jnp.int32)
        ke = jnp.arange(1, nq + 1, dtype=jnp.int32)

        def one(nq=nq, h=h, q=q, kf=kf, ksc=ksc, w=w, ks=ks, ke=ke):
            def step(c, q, w, ksc=ksc, ks=ks, ke=ke):
                lg = fp8_mqa_logits(q, (c, ksc), w, ks, ke)
                return c + (lg[:, :1] * 1e-9).astype(c.dtype)

            sec = bench_chain(step, kf, reps=8, args=(q, w),
                              flops_per_step=2 * nq * h * nq * d)
            add(f"fp8_mqa_logits:{nq}-{h}-{d}", sec)
        sub(f"fp8_mqa_logits:{nq}-{h}", one)
    # paged (decode) indexer scores
    page = 64
    for b, ctx, h in [(16, 1024, 32), (16, 8192, 32), (4, 8192, 64)]:
        blocks = ctx // page
        n_pages = b * blocks + 1
        kv = jnp.asarray(rng.standard_normal((n_pages, page, d)) * 0.3, jnp.bfloat16)
        w = jnp.asarray(np.abs(rng.standard_normal((b, h))), jnp.float32)
        table = jnp.asarray(
            rng.permutation(np.arange(1, n_pages))[: b * blocks].reshape(b, blocks),
            jnp.int32)
        lengths = jnp.full((b,), ctx, jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

        def one(b=b, ctx=ctx, h=h, q=q, kv=kv, w=w, lengths=lengths, table=table):
            def step(c, kv, w, lengths=lengths, table=table):
                lg = fp8_paged_mqa_logits(c, kv, w, lengths, table)
                # full reduce: lg[:, 0] is sliceable through the XLA fallback's
                # einsum (a one-token logit needs one dot) and the row
                # measured negative-jitter nothing
                lg = jnp.where(jnp.isfinite(lg), lg, 0.0)
                return c.at[:, 0, 0].add(lg.sum(1) * 1e-12)

            sec = bench_chain(step, q, reps=32, args=(kv, w),
                              bytes_per_step=b * ctx * d * 2)
            add(f"fp8_paged_mqa_logits:{b}-{ctx}-{h}-{d}", sec,
                gbs=round(b * ctx * d * 2 / sec / 1e9, 1))
        sub(f"fp8_paged_mqa_logits:{b}-{ctx}-{h}", one)


def bench_fast_topk_transform():
    from sgl_kernel_tpu.ops.attention.nsa import fast_topk, fast_topk_transform_fused

    for b, ctx in [(16, 8192), (4, 32768)]:
        logits = jnp.asarray(rng.standard_normal((b, ctx)), jnp.float32)
        lengths = jnp.full((b,), ctx, jnp.int32)

        def tk(c, lengths=lengths):
            idx = fast_topk(c, lengths, 2048)
            return c.at[:, : idx.shape[1]].add(idx.astype(jnp.float32) * 1e-9)

        sec = bench_chain(tk, logits, reps=16)
        add(f"nsa_fast_topk:{b}-{ctx}-2048", sec)

    b, ctx, page = 4, 8192, 64
    logits = jnp.asarray(rng.standard_normal((b, ctx)), jnp.float32)
    lengths = jnp.full((b,), ctx, jnp.int32)
    spt = jnp.asarray(rng.integers(0, 999, (b, ctx // page)), jnp.int32)

    def tkt(c, lengths=lengths, spt=spt):
        idx = fast_topk_transform_fused(c, lengths, spt, page, 2048)
        return c.at[:, : idx.shape[1]].add(idx.astype(jnp.float32) * 1e-9)

    sec = bench_chain(tkt, logits, reps=16)
    add(f"nsa_fast_topk_transform:{b}-{ctx}-2048", sec)


def bench_decode_grid():
    from sgl_kernel_tpu.ops.attention.paged_decode_dma import paged_attention_decode_dma

    PAGE = 128
    grid = [
        # b, ctx, hq, hkv, d, dtype
        (16, 2048, 32, 8, 128, jnp.bfloat16),
        (16, 4096, 32, 8, 128, jnp.bfloat16),
        (16, 16384, 32, 8, 128, jnp.bfloat16),
        (16, 2048, 32, 8, 128, jnp.int8),
        (16, 4096, 32, 8, 128, jnp.int8),
        (16, 16384, 32, 8, 128, jnp.int8),
        (16, 8192, 32, 8, 128, jnp.float8_e4m3fn),
        (64, 2048, 32, 8, 128, jnp.bfloat16),
        (16, 1024, 16, 4, 128, jnp.bfloat16),   # 4:1 GQA small-head model
        (8, 2048, 16, 16, 64, jnp.bfloat16),    # d=64 MHA (gather fallback class)
        (16, 1024, 28, 4, 128, jnp.bfloat16),   # qwen2-7B-ish 28/4
    ]
    for b, ctx, hq, hkv, d, dt in grid:
        blocks = ctx // PAGE
        n_pages = b * blocks + 1
        kv_scale = None if dt == jnp.bfloat16 else 1.0 / 16
        kf = jax.random.normal(jax.random.PRNGKey(0), (n_pages, hkv, PAGE, d), jnp.bfloat16) * 0.3
        if dt == jnp.int8:
            kp = jnp.clip(jnp.round(kf.astype(jnp.float32) / kv_scale), -127, 127).astype(jnp.int8)
        elif kv_scale is not None:
            kp = (kf.astype(jnp.float32) / kv_scale).astype(dt)
        else:
            kp = kf
        lengths = jnp.full((b,), ctx, jnp.int32)
        table = jnp.asarray(rng.permutation(np.arange(1, n_pages)).reshape(b, blocks), jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
        fk = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.bfloat16)
        sarr = None if kv_scale is None else jnp.float32(kv_scale)

        def one(b=b, ctx=ctx, hq=hq, hkv=hkv, d=d, dt=dt, q=q, kp=kp,
                lengths=lengths, table=table, fk=fk, sarr=sarr):
            # the pool rides as a chain ARG — a GB-scale closure constant
            # embeds in the shipped HLO and 413s the compile relay
            def step(c, kp, lengths=lengths, table=table, fk=fk, sarr=sarr):
                o = paged_attention_decode_dma(
                    c, kp, kp, lengths, table, fresh_k=fk, fresh_v=fk,
                    k_scale=sarr, v_scale=sarr)
                return c + o * jnp.bfloat16(1e-8)

            kv_b = 2 * b * ctx * hkv * d * jnp.dtype(dt).itemsize
            sec = bench_chain(step, q, reps=256 if ctx <= 2048 else 64,
                              args=(kp,), bytes_per_step=kv_b)
            tag = {jnp.bfloat16: "", jnp.int8: "-int8"}.get(dt, "-fp8")
            add(f"paged_decode_dma{tag}:{b}-{ctx}-{hq}-{hkv}-{d}-{PAGE}", sec,
                kv_gbs=round(kv_b / sec / 1e9, 1))
        sub(f"paged_decode_dma:{b}-{ctx}-{hq}-{hkv}-{d}-{dt}", one)
        del kp, kf


def bench_prefill_grid():
    from sgl_kernel_tpu.ops.attention import flash_attention

    grid = [
        (1, 32768, 32, 8, 128), (2, 8192, 32, 8, 128), (4, 8192, 32, 8, 128),
        (2, 2048, 32, 8, 128), (1, 4096, 32, 8, 64), (1, 8192, 16, 16, 64),
        (1, 2048, 64, 8, 128), (8, 4096, 32, 8, 128),
    ]
    for b, s, hq, hkv, d in grid:
        q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)

        def step(c, k=k, v=v):
            o = flash_attention(c, k, v, causal=True)
            return c + o * jnp.bfloat16(1e-8)

        flops = 2 * b * hq * s * s * d
        sec = bench_chain(step, q, reps=8 if s <= 8192 else 4,
                          flops_per_step=flops)
        add(f"flash_prefill:{b}-{s}-{hq}-{hkv}-{d}", sec,
            tflops=round(flops / sec / 1e12, 1))
        del q, k, v


def bench_w4a16_dsv3():
    from benchmark.bench_lib import bench_chain_banks
    from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4, w4a16_gemm

    # DSv3-class dense projections + prefill-bucket llama rows
    shapes = [
        (16, 24576, 7168),   # DSv3 wq (128 heads x 192)
        (16, 7168, 16384),   # DSv3 wo
        (16, 4096, 2048),    # V2-Lite-class qkv
        (128, 28672, 4096),  # llama gate_up prefill bucket
        (128, 4096, 14336),  # llama down prefill bucket
        (512, 6144, 4096),   # qkv large prefill
    ]
    for m, n, k in shapes:
        a = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        L = max(2, min(8, (192 << 20) // (n * k // 2)))
        banks = []
        for _ in range(L):
            w = jax.random.normal(jax.random.PRNGKey(len(banks)), (n, k), jnp.bfloat16) * 0.02
            pk, sc, _ = quantize_w4(w, group_size=128)
            banks.append((pk, sc))

        def step(c, pk, sc):
            o = w4a16_gemm(c, pk, sc, group_size=128)
            return c + (o[:, :1] * 1e-6).astype(c.dtype)

        sec = bench_chain_banks(step, a, banks, reps=8,
                                bytes_per_step=n * k // 2)
        add(f"w4a16_gemm:{m}-{n}-{k}", sec, gbs=round(n * k / 2 / sec / 1e9, 1))
        del banks


def bench_quant_m128():
    from benchmark.bench_lib import bench_chain_banks
    from sgl_kernel_tpu.ops.gemm import fp8_scaled_mm, int8_scaled_mm

    for m, n, k in [(128, 4096, 4096), (128, 4096, 7168)]:
        L = 8
        ib = [(jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8),
               jnp.asarray(rng.random(n) * 0.01 + 0.001, jnp.float32))
              for _ in range(L)]
        sa = jnp.asarray(rng.random(m) * 0.01 + 0.001, jnp.float32)

        def istep(c, b8, sb, sa=sa):
            o = int8_scaled_mm(c.astype(jnp.int8), b8, sa, sb, out_dtype=jnp.bfloat16)
            return (c + o[:, :1].astype(c.dtype)).astype(c.dtype)

        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int32)
        sec = bench_chain_banks(istep, a8, ib, reps=8, bytes_per_step=k * n,
                                flops_per_step=2 * m * n * k, int_ops=True)
        add(f"int8_scaled_mm:{m}-{n}-{k}", sec, gbs=round((m * k + k * n) / sec / 1e9, 1))

        fb = [(jnp.asarray(rng.standard_normal((k, n)) * 0.2, jnp.float8_e4m3fn),)
              for _ in range(L)]

        def fstep(c, bf):
            o = fp8_scaled_mm(c.astype(jnp.float8_e4m3fn), bf, jnp.float32(0.01),
                              jnp.float32(0.01), out_dtype=jnp.bfloat16)
            return c + (o[:, :1] * 1e-6).astype(c.dtype)

        af = jnp.asarray(rng.standard_normal((m, k)) * 0.2, jnp.bfloat16)
        sec = bench_chain_banks(fstep, af, fb, reps=8, bytes_per_step=k * n,
                                flops_per_step=2 * m * n * k)
        add(f"fp8_scaled_mm:{m}-{n}-{k}", sec, gbs=round((m * k + k * n) / sec / 1e9, 1))
        del ib, fb


def bench_grouped_decode_rows():
    """Grouped W4A16 decode GEMMs at the flagship geometries — the round-5
    retune's tracked rows (the kernel the DSv3 e2e rides)."""
    from sgl_kernel_tpu.ops.gemm.w4a16 import quantize_w4
    from sgl_kernel_tpu.ops.moe.grouped_gemm import w4a16_grouped_mm

    for tag, e, n, k, bm, nb in [("dsv3", 256, 4096, 7168, 16, 99),
                                 ("v2lite", 64, 2816, 2048, 16, 54)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16) * 0.02
        pk, sc, _ = quantize_w4(w, group_size=128)
        packed = jnp.tile(pk[None], (e, 1, 1))
        scales = jnp.tile(sc[None], (e, 1, 1))
        eids = jnp.asarray(rng.permutation(e)[:nb], jnp.int32)
        cap = nb * bm
        x = jnp.asarray(rng.standard_normal((cap, k)) * 0.1, jnp.bfloat16)
        bank = nb * (k // 2 * n + (k // 128) * n * 2)

        def one(tag=tag, e=e, n=n, k=k, bm=bm, cap=cap, bank=bank,
                x=x, packed=packed, scales=scales, eids=eids):
            # banks ride as chain ARGS (a GB-scale closure constant broke
            # the compile-relay pipe in the round-5 regen)
            def step(c, packed, scales, eids=eids, bm=bm):
                o = w4a16_grouped_mm(c, packed, scales, eids, group_size=128, bm=bm)
                return c + (o[:, :1] * 1e-6).astype(c.dtype)

            sec = bench_chain(step, x, reps=32, args=(packed, scales),
                              bytes_per_step=bank)
            add(f"w4a16_grouped_mm:{tag}-{cap}-{e}-{n}-{k}", sec,
                bank_gbs=round(bank / sec / 1e9, 1))
        sub(f"w4a16_grouped_mm:{tag}", one)
        del packed, scales


def bench_norm_rope_ext():
    from sgl_kernel_tpu.ops.norm import rmsnorm
    from sgl_kernel_tpu.ops.rope import compute_cos_sin_cache, rope_decode_fused

    for t, h in [(16, 2048), (16, 7168), (1024, 8192)]:
        def one(t=t, h=h):
            x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
            w = jnp.ones((h,), jnp.bfloat16)
            sec = bench_chain(lambda c, w=w: feed(rmsnorm(c, w, 1e-5), c), x, reps=128)
            add(f"rmsnorm:{t}-{h}", sec, gbs=round(2 * t * h * 2 / sec / 1e9, 1))
        sub(f"rmsnorm:{t}-{h}", one)
    cache = compute_cos_sin_cache(64, 8192, 10000.0)
    q = jnp.asarray(rng.standard_normal((16, 16, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((16, 16, 64)), jnp.bfloat16)
    pos = jnp.full((16,), 1000, jnp.int32)

    def step(c, k=k, pos=pos):
        qq, _ = rope_decode_fused(pos, c, k, cache)
        return feed(qq, c)

    sec = bench_chain(step, q, reps=128)
    add("rope_decode_fused:16-16-16-64", sec)


def bench_sampling_ext():
    from sgl_kernel_tpu.ops.sampling import top_k_top_p_sampling_from_probs

    for b, v in [(64, 32000), (16, 152064)]:  # llama2 / qwen vocab classes
        p = jax.nn.softmax(jnp.asarray(rng.standard_normal((b, v)), jnp.float32))
        key = jax.random.PRNGKey(0)

        def step(c, key=key):
            toks = top_k_top_p_sampling_from_probs(
                c, key, jnp.full((c.shape[0],), 50), jnp.full((c.shape[0],), 0.9))
            return c.at[:, 0].add(toks.astype(jnp.float32) * 1e-9)

        sec = bench_chain(step, p, reps=16)
        add(f"top_k_top_p_sampling:{b}-{v}", sec)


def bench_mla_decode_ext():
    from sgl_kernel_tpu.ops.attention.mla import mla_decode

    for b, ctx, h, page in [(32, 4096, 16, 1024), (16, 4096, 128, 1024),
                            (64, 1024, 16, 1024), (16, 16384, 16, 1024)]:
        blocks = max(1, ctx // page)
        n_pages = b * blocks + 1
        pool = jnp.asarray(rng.standard_normal((n_pages, page, 576)) * 0.3, jnp.bfloat16)
        lengths = jnp.full((b,), ctx, jnp.int32)
        table = jnp.asarray(rng.integers(1, n_pages, (b, blocks)), jnp.int32)
        qn = jnp.asarray(rng.standard_normal((b, h, 512)), jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((b, h, 64)), jnp.bfloat16)

        def one(b=b, ctx=ctx, h=h, page=page, qn=qn, qp=qp, pool=pool,
                lengths=lengths, table=table):
            def step(c, pool, qp=qp, lengths=lengths, table=table):
                o = mla_decode(c, qp, pool, lengths, table)
                return c + o * jnp.bfloat16(1e-8)

            kv_b = b * ctx * 576 * 2
            sec = bench_chain(step, qn, reps=256 if ctx <= 2048 else 64,
                              args=(pool,), bytes_per_step=kv_b)
            add(f"mla_decode:{b}-{ctx}-{h}-{page}", sec, kv_gbs=round(kv_b / sec / 1e9, 1))
        sub(f"mla_decode:{b}-{ctx}-{h}", one)
        del pool


def bench_kv_transfer_ext():
    from sgl_kernel_tpu.ops import kvcache

    # bigger-move variants of the bench_kvcacheio rows (token-row transfers)
    t, h, d, n_move = 16384, 8, 128, 8192
    src_idx = jnp.asarray(rng.permutation(t)[:n_move], jnp.int32)
    dst_idx = jnp.asarray(rng.permutation(t)[:n_move], jnp.int32)
    sk = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
    dk = jnp.zeros_like(sk)

    def step(carry):
        dk_, dv_ = carry
        dk_, dv_ = kvcache.transfer_kv_per_layer(sk, sk, dk_, dv_, src_idx, dst_idx)
        return (dk_ + jnp.bfloat16(0), dv_)

    sec = bench_chain(step, (dk, jnp.zeros_like(sk)), reps=32,
                      bytes_per_step=4 * n_move * h * d * 2)
    add(f"transfer_kv_per_layer:{n_move}-{h}-{d}", sec,
        gbs=round(4 * n_move * h * d * 2 / sec / 1e9, 1))

    sm = jnp.asarray(rng.standard_normal((t, 576)), jnp.bfloat16)
    sec = bench_chain(
        lambda c: kvcache.transfer_kv_per_layer_mla(sm, c, src_idx, dst_idx) + jnp.bfloat16(0),
        jnp.zeros_like(sm), reps=32, bytes_per_step=2 * n_move * 576 * 2)
    add(f"transfer_kv_per_layer_mla:{n_move}-576", sec)


def main():
    for fn in (bench_mla_prefill, bench_sparse_mla_prefill, bench_mqa_logits,
               bench_fast_topk_transform, bench_decode_grid, bench_prefill_grid,
               bench_w4a16_dsv3, bench_quant_m128, bench_grouped_decode_rows,
               bench_norm_rope_ext, bench_sampling_ext, bench_mla_decode_ext,
               bench_kv_transfer_ext):
        try:
            fn()
        except Exception as e:  # loud skip — missing entries show in the diff
            print(f"SKIP {fn.__name__}: {type(e).__name__} {str(e)[:200]}", flush=True)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
