#!/usr/bin/env python
"""Elementwise / sampling / NSA / GDN / LoRA / speculative op latency grid.

Reference analogs: bench_rmsnorm.py, bench_rope.py, bench_activation.py,
bench_top_k_top_p.py, bench_lora.py and the NSA/GDN kernel suites —
key schema op:{shape-dash-list} like update_baseline_from_log.py."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark.bench_lib import bench_chain, compare_to_baseline, load_baseline, report

records = []
rng = np.random.default_rng(0)


def add(name, sec, **extra):
    records.append(report(name, sec, **extra))


def feed(o, carry):
    """Fold output into the bf16 carry without growing it."""
    flat = o.reshape(-1)
    w = min(flat.shape[0], carry.reshape(-1).shape[0])
    c = carry.reshape(-1).at[:w].add((flat[:w] * 1e-6).astype(carry.dtype))
    return c.reshape(carry.shape)


def feed_sum(o, carry):
    """Full-reduction feedback: elementwise ops are sliceable, so a
    feed() of o[:1024] lets XLA dead-code 99.9% of the op (the round-5
    swiglu row read 25 TB/s); a sum needs every element."""
    return carry + (o.astype(jnp.float32).sum() * 1e-12).astype(carry.dtype)


def bench_norm():
    from benchmark.bench_lib import bench_chain_banks
    from sgl_kernel_tpu.ops.norm import fused_add_rmsnorm, rmsnorm

    # elementwise working sets < 16 MB stay VMEM-RESIDENT across the
    # fori_loop reps (the carry never round-trips HBM — rmsnorm:1024-4096
    # measured 1.7 TB/s implied), so inputs ride L distinct banks sized
    # past VMEM in aggregate, exactly like the GEMM benches
    for t, h in [(16, 4096), (1024, 4096), (16, 8192)]:
        def one(t=t, h=h):
            w = jnp.ones((h,), jnp.bfloat16)
            L = max(4, (64 << 20) // (t * h * 2))
            banks = [(jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16),)
                     for _ in range(L)]
            carry = jnp.zeros((8, 128), jnp.bfloat16)

            def nstep(c, x, w=w):
                return feed_sum(rmsnorm(x, w, 1e-5), c)

            sec = bench_chain_banks(nstep, carry, banks, reps=8 if t * h > 2**22 else 32,
                                    bytes_per_step=2 * t * h * 2)
            add(f"rmsnorm:{t}-{h}", sec, gbs=round(2 * t * h * 2 / sec / 1e9, 1))
        try:
            one()
        except Exception as e:  # noqa: BLE001 — one 500 must not kill the family
            print(f"SKIP rmsnorm:{t}-{h}: {type(e).__name__} {str(e)[:120]}", flush=True)
    t, h = 1024, 4096
    w = jnp.ones((h,), jnp.bfloat16)
    L = max(4, (64 << 20) // (t * h * 2))
    fbanks = [(jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16),
               jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16))
              for _ in range(L)]
    carry = jnp.zeros((8, 128), jnp.bfloat16)

    def far(c, x, r, w=w):
        o, res = fused_add_rmsnorm(x, r, w, 1e-5)
        return feed_sum(o + res, c)

    sec = bench_chain_banks(far, carry, fbanks, reps=8,
                            bytes_per_step=4 * t * h * 2)
    add(f"fused_add_rmsnorm:{t}-{h}", sec, gbs=round(4 * t * h * 2 / sec / 1e9, 1))


def bench_rope():
    from sgl_kernel_tpu.ops.rope import compute_cos_sin_cache, rope_decode_fused, rotary_embedding

    cache = compute_cos_sin_cache(128, 8192, 500000.0)
    for b in (16, 256):
        q = jnp.asarray(rng.standard_normal((b, 32, 128)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, 8, 128)), jnp.bfloat16)
        pos = jnp.full((b,), 1000, jnp.int32)

        def step(c, k=k, pos=pos):
            qq, _ = rope_decode_fused(pos, c, k, cache)
            return feed(qq, c)

        sec = bench_chain(step, q, reps=128)
        add(f"rope_decode_fused:{b}-32-8-128", sec)
    t = 4096
    q = jnp.asarray(rng.standard_normal((t, 32, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((t, 8, 128)), jnp.bfloat16)
    pos = jnp.arange(t, dtype=jnp.int32)

    def step(c):
        qq, _ = rotary_embedding(pos, c, k, 128, cache)
        return feed(qq, c)

    sec = bench_chain(step, q, reps=32)
    add(f"rotary_embedding:{t}-32-128", sec)


def bench_activation():
    from benchmark.bench_lib import bench_chain_banks
    from sgl_kernel_tpu.ops.activation import silu_and_mul, swiglu_alpha_limit

    carry = jnp.zeros((8, 128), jnp.bfloat16)
    for t in (16, 1024):
        L = max(4, (64 << 20) // (t * 2 * 14336 * 2))
        banks = [(jnp.asarray(rng.standard_normal((t, 2 * 14336)), jnp.bfloat16),)
                 for _ in range(L)]

        def astep(c, x):
            return feed_sum(silu_and_mul(x), c)

        sec = bench_chain_banks(astep, carry, banks, reps=8 if t > 64 else 32,
                                bytes_per_step=3 * t * 14336 * 2)
        add(f"silu_and_mul:{t}-14336", sec, gbs=round(3 * t * 14336 * 2 / sec / 1e9, 1))
        del banks
    L = max(4, (64 << 20) // (1024 * 2 * 14336 * 2))
    sbanks = [(jnp.asarray(rng.standard_normal((1024, 2 * 14336)), jnp.bfloat16),)
              for _ in range(L)]
    sec = bench_chain_banks(lambda c, x: feed_sum(swiglu_alpha_limit(x), c), carry,
                            sbanks, reps=8, bytes_per_step=3 * 1024 * 14336 * 2)
    add("swiglu_alpha_limit:1024-14336", sec)


def bench_sampling():
    from sgl_kernel_tpu.ops.sampling import (
        top_k_renorm_probs, top_k_top_p_sampling_from_probs, top_p_renorm_probs,
    )

    v = 128256
    for b in (16, 64):
        p = jax.nn.softmax(jnp.asarray(rng.standard_normal((b, v)), jnp.float32))
        key = jax.random.PRNGKey(0)

        def step(c, key=key):
            toks = top_k_top_p_sampling_from_probs(
                c, key, jnp.full((c.shape[0],), 50), jnp.full((c.shape[0],), 0.9))
            return c.at[:, 0].add(toks.astype(jnp.float32) * 1e-9)

        sec = bench_chain(step, p, reps=16)
        add(f"top_k_top_p_sampling:{b}-{v}", sec)
    p = jax.nn.softmax(jnp.asarray(rng.standard_normal((16, v)), jnp.float32))
    sec = bench_chain(lambda c: top_k_renorm_probs(c, jnp.full((16,), 50)) + c * 1e-9, p, reps=16)
    add(f"top_k_renorm:16-{v}", sec)
    sec = bench_chain(lambda c: top_p_renorm_probs(c, jnp.full((16,), 0.9)) + c * 1e-9, p, reps=16)
    add(f"top_p_renorm:16-{v}", sec)


def bench_nsa():
    from sgl_kernel_tpu.ops.attention.nsa import (
        fast_topk, fp8_paged_mqa_logits, sparse_mla_decode,
    )

    page, d, h = 64, 128, 32
    for b, ctx in [(4, 8192), (1, 32768)]:
        blocks = ctx // page
        n_pages = b * blocks + 1
        kv = jnp.asarray(rng.standard_normal((n_pages, page, d)) * 0.3, jnp.bfloat16)
        w = jnp.asarray(np.abs(rng.standard_normal((b, h))), jnp.float32)
        table = jnp.asarray(rng.permutation(np.arange(1, n_pages))[: b * blocks].reshape(b, blocks), jnp.int32)
        lengths = jnp.full((b,), ctx, jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)

        def step(c, kv=kv, w=w, lengths=lengths, table=table):
            lg = fp8_paged_mqa_logits(c, kv, w, lengths, table)
            # full reduce: lg[:, 0] is sliceable through the XLA fallback's
            # einsum (a one-token logit needs one dot)
            lg = jnp.where(jnp.isfinite(lg), lg, 0.0)
            return c.at[:, 0, 0].add(lg.sum(1) * 1e-12)

        try:
            sec = bench_chain(step, q, reps=16)
            add(f"nsa_indexer_logits:{b}-{ctx}-{h}-{d}", sec,
                gbs=round(b * ctx * d * 2 / sec / 1e9, 1))
        except Exception as e:  # one shape's Mosaic crash must not drop the rest
            print(f"SKIP nsa_indexer_logits:{b}-{ctx}: {type(e).__name__} {str(e)[:120]}", flush=True)

    b, ctx = 4, 8192
    logits = jnp.asarray(rng.standard_normal((b, ctx)), jnp.float32)
    lengths = jnp.full((b,), ctx, jnp.int32)
    def tk_step(c):
        idx = fast_topk(c, lengths, 2048)
        # real (non-zero) feedback into the first topk columns so the op
        # stays in the dependency chain (the *0 form both dead-codes AND
        # broadcast-crashes at ctx != topk)
        return c.at[:, : idx.shape[1]].add(idx.astype(jnp.float32) * 1e-9)

    sec = bench_chain(tk_step, logits, reps=16)
    add(f"nsa_fast_topk:{b}-{ctx}-2048", sec)

    # DSv3 decode scale (VERDICT r2 #5): topk=2048, H=128, B in {4, 64}
    nslots, kk = 64 * 1024, 2048
    pool = jnp.asarray(rng.standard_normal((nslots, 576)) * 0.1, jnp.bfloat16)
    for bb, hh in [(4, 16), (4, 128), (64, 128)]:
        qn = jnp.asarray(rng.standard_normal((bb, hh, 512)) * 0.1, jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((bb, hh, 64)) * 0.1, jnp.bfloat16)
        slots = jnp.asarray(rng.integers(0, nslots, (bb, kk)), jnp.int32)

        def step(c, qp=qp, slots=slots):
            o = sparse_mla_decode(c, qp, pool, slots)
            return feed(o, c)

        sec = bench_chain(step, qn, reps=16)
        add(f"nsa_sparse_mla_decode:{bb}-{hh}-{kk}", sec,
            gbs=round(bb * kk * 576 * 2 / sec / 1e9, 1))


def bench_gdn():
    from sgl_kernel_tpu.ops.linear_attn.gdn import chunk_gated_delta_rule, gated_delta_rule_update

    b, s, h, dk, dv = 1, 4096, 8, 128, 128
    q = jnp.asarray(rng.standard_normal((b, s, h, dk)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, dk)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, dv)) * 0.1, jnp.bfloat16)
    g = jnp.asarray(-np.abs(rng.standard_normal((b, s, h))) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.random((b, s, h)), jnp.float32)

    def step(c):
        o, st = chunk_gated_delta_rule(c, k, v, g, beta)
        return feed(o, c)

    sec = bench_chain(step, q, reps=8)
    add(f"gdn_chunk_prefill:{b}-{s}-{h}-{dk}", sec)

    bd = 64
    qd = jnp.asarray(rng.standard_normal((bd, h, dk)) * 0.1, jnp.bfloat16)
    kd = jnp.asarray(rng.standard_normal((bd, h, dk)) * 0.1, jnp.bfloat16)
    vd = jnp.asarray(rng.standard_normal((bd, h, dv)) * 0.1, jnp.bfloat16)
    gd = jnp.asarray(-np.abs(rng.standard_normal((bd, h))) * 0.1, jnp.float32)
    bb = jnp.asarray(rng.random((bd, h)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((bd, h, dk, dv)) * 0.1, jnp.float32)

    def dstep(c):
        o, st2 = gated_delta_rule_update(qd, kd, vd, gd, bb, c)
        return c + st2 * 1e-9

    sec = bench_chain(dstep, st, reps=64)
    add(f"gdn_decode_update:{bd}-{h}-{dk}-{dv}", sec)


def bench_lora():
    from sgl_kernel_tpu.ops.lora import sgemm_lora_a_fwd, sgemm_lora_b_fwd

    t, k, rank, nl = 256, 4096, 64, 4
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
    wa = jnp.asarray(rng.standard_normal((nl, rank, k)) * 0.02, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((nl, k, rank)) * 0.02, jnp.bfloat16)
    seg = jnp.asarray([0, 64, 160, 200, 256], jnp.int32)
    widx = jnp.asarray([0, 1, 2, 3], jnp.int32)
    ranks = jnp.full((nl,), rank, jnp.int32)

    def astep(c):
        o = sgemm_lora_a_fwd(c, wa, seg, widx, ranks)
        return feed(o, c)

    sec = bench_chain(astep, x, reps=32)
    add(f"lora_sgemm_a:{t}-{k}-{rank}", sec)

    xr = jnp.asarray(rng.standard_normal((t, rank)), jnp.bfloat16)
    scal = jnp.ones((nl,), jnp.float32)

    def bstep(c):
        o = sgemm_lora_b_fwd(c, wb, seg, widx, ranks, scal)
        return feed(o, c)

    sec = bench_chain(bstep, xr, reps=32)
    add(f"lora_sgemm_b:{t}-{k}-{rank}", sec)

    # multi-adapter prefill scale (VERDICT r3 #6): 8-64 adapters x ragged
    # segments, grouped (block-aligned Pallas, stacked bank) vs ragged
    # (per-segment weight gather + ragged_dot) — the cutover evidence
    for nl2, nseg, t2 in [(8, 8, 4096), (32, 32, 8192), (64, 64, 8192)]:
        rng2 = np.random.default_rng(nl2)
        cuts = np.sort(rng2.choice(np.arange(1, t2), nseg - 1, replace=False))
        seg2 = jnp.asarray(np.concatenate([[0], cuts, [t2]]), jnp.int32)
        widx2 = jnp.asarray(rng2.permutation(nl2)[:nseg] % nl2, jnp.int32)
        ranks2 = jnp.full((nl2,), rank, jnp.int32)
        wa2 = jnp.asarray(rng2.standard_normal((nl2, rank, k)) * 0.02, jnp.bfloat16)
        x2 = jnp.asarray(rng2.standard_normal((t2, k)), jnp.bfloat16)
        for impl in ("ragged", "grouped"):
            def astep2(c, impl=impl):
                o = sgemm_lora_a_fwd(c, wa2, seg2, widx2, ranks2, impl=impl)
                return feed(o, c)

            sec = bench_chain(astep2, x2, reps=16)
            add(f"lora_sgemm_a_{impl}:{t2}-{k}-{rank}-{nl2}", sec)
        del wa2, x2


def bench_spec_grammar_merge():
    from sgl_kernel_tpu.ops.attention.merge_state import merge_states
    from sgl_kernel_tpu.ops.grammar import apply_token_bitmask
    from sgl_kernel_tpu.ops.speculative import verify_tree_greedy

    n, t, h, d = 8, 64, 32, 128
    v = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((n, t, h)), jnp.float32)

    def mstep(c):
        o, _ = merge_states(c, s)
        return c + o[None] * 1e-9

    sec = bench_chain(mstep, v, reps=32)
    add(f"merge_states:{n}-{t}-{h}-{d}", sec)

    b, vv = 16, 128256
    logits = jnp.asarray(rng.standard_normal((b, vv)), jnp.float32)
    bm = jnp.asarray(rng.integers(0, 2**31, (b, (vv + 31) // 32)), jnp.int32)
    sec = bench_chain(lambda c: apply_token_bitmask(c, bm) * 1e-9 + c, logits, reps=32)
    add(f"grammar_bitmask:{b}-{vv}", sec)

    b, nd, steps = 16, 8, 4
    cand = jnp.asarray(rng.integers(0, 1000, (b, nd)), jnp.int32)
    ridx = jnp.tile(jnp.arange(nd, dtype=jnp.int32)[None], (b, 1))
    rnext = jnp.asarray(np.tile(np.r_[np.arange(1, nd), -1][None], (b, 1)), jnp.int32)
    rsib = jnp.full((b, nd), -1, jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 1000, (b, nd)), jnp.int32)

    def vstep(c):
        pred, acc, num = verify_tree_greedy(c, ridx, rnext, rsib, tgt, steps)
        # real data dependency (num % 2 keeps the carry bounded) — a *0
        # feedback lets XLA fold the product and DCE the walk (the round-4
        # bench_quant_gemm lesson, commit 7f885be)
        return c.at[:, 0].add(num.astype(jnp.int32) % 2)

    sec = bench_chain(vstep, cand, reps=64)
    add(f"verify_tree_greedy:{b}-{nd}-{steps}", sec)


def bench_hadamard():
    from sgl_kernel_tpu.ops.hadamard import hadamard_transform

    x = jnp.asarray(rng.standard_normal((1024, 128)), jnp.bfloat16)
    sec = bench_chain(lambda c: feed(hadamard_transform(c, 0.0883883), c), x, reps=64)
    add("hadamard:1024-128", sec)


def bench_store():
    from sgl_kernel_tpu.ops.kvcache import store_cache, store_cache_all_layers

    l, p, h, page, d, t = 32, 129, 8, 128, 128, 16
    kp = jnp.zeros((l, p, h, page, d), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    ka = jnp.asarray(rng.standard_normal((l, t, h, d)), jnp.bfloat16)
    loc = jnp.asarray(np.arange(t) * page + 5, jnp.int32)

    def step(carry):
        ka_, kp_, vp_ = carry
        kp_, vp_ = store_cache_all_layers(ka_, ka_, kp_, vp_, loc)
        ka_ = ka_ + kp_[:, :t, 0, 0, 0].reshape(l, t, 1, 1) * jnp.bfloat16(1e-9)
        return (ka_, kp_, vp_)

    sec = bench_chain(step, (ka, kp, vp), reps=64)
    add(f"store_cache_all_layers:{l}-{t}-{h}-{d}", sec, us=round(sec * 1e6, 1))

    kp1 = jnp.zeros((p, h, page, d), jnp.bfloat16)
    vp1 = jnp.zeros_like(kp1)
    k1 = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)

    def step1(carry):
        k_, kp_, vp_ = carry
        kp_, vp_ = store_cache(k_, k_, kp_, vp_, loc)
        k_ = k_ + kp_[:t, 0, 0, 0].reshape(t, 1, 1) * jnp.bfloat16(1e-9)
        return (k_, kp_, vp_)

    sec = bench_chain(step1, (k1, kp1, vp1), reps=64)
    add(f"store_cache:{t}-{h}-{d}", sec, us=round(sec * 1e6, 1))


def bench_compression():
    """DSv4 flash_compress family (FlashCompress4/128.cpp analogs)."""
    from sgl_kernel_tpu.ops.compression import (
        flash_compress4_decode, flash_compress128_prefill)

    b, ctx, page, d, ring = 16, 1024, 128, 512, 64
    n_pages = b * (ctx // page) + 1
    kv = jnp.asarray(rng.standard_normal((n_pages * page, d)), jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((n_pages * page, d)), jnp.bfloat16)
    ape = jnp.asarray(rng.standard_normal((8, d)), jnp.bfloat16)
    comp = jnp.zeros((b, ring, d), jnp.bfloat16)
    lengths = jnp.full((b,), ctx, jnp.int32)
    pt = jnp.asarray(rng.integers(1, n_pages, (b, ctx // page)), jnp.int32)

    def step(c):
        pool, _ = flash_compress4_decode(kv, sc, ape, c, lengths, pt, page_size=page)
        return pool

    sec = bench_chain(step, comp, reps=64)
    add(f"flash_compress4_decode:{b}-{ctx}-{d}", sec)

    s = 4096
    kvs = jnp.asarray(rng.standard_normal((s, d)), jnp.bfloat16)
    scs = jnp.asarray(rng.standard_normal((s, d)), jnp.bfloat16)
    ape128 = jnp.asarray(rng.standard_normal((128, d)), jnp.bfloat16)

    def pstep(c):
        o = flash_compress128_prefill(c, scs, ape128)
        return c.at[: o.shape[0]].add(o * jnp.bfloat16(1e-8))

    sec = bench_chain(pstep, kvs, reps=32)
    add(f"flash_compress128_prefill:{s}-{d}", sec)


def bench_hc():
    """mHC sinkhorn hyper-connections (HCPreFuse.cpp / HCPost.cpp)."""
    from sgl_kernel_tpu.ops import hc

    t, h, d = 1024, 4, 512
    residual = jnp.asarray(rng.standard_normal((t, h, d)), jnp.bfloat16)
    fn = jnp.asarray(rng.standard_normal(((2 + h) * h, h * d)) * 0.05, jnp.bfloat16)
    scale = jnp.ones((3,), jnp.float32)
    base = jnp.zeros(((2 + h) * h,), jnp.float32)

    def pre_step(c):
        post, comb, layer_in = hc.mhc_pre(c, fn, scale, base)
        return c.at[:, 0].add(layer_in * jnp.bfloat16(1e-8))

    sec = bench_chain(pre_step, residual, reps=32)
    add(f"mhc_pre:{t}-{h}-{d}", sec)

    x = jnp.asarray(rng.standard_normal((t, d)), jnp.bfloat16)
    post = jnp.asarray(rng.random((t, h)), jnp.float32)
    comb = jnp.asarray(rng.random((t, h, h)), jnp.float32)

    def post_step(c):
        o = hc.hc_post(c, residual, post, comb)
        return c + o[:, 0] * jnp.bfloat16(1e-8)

    sec = bench_chain(post_step, x, reps=64)
    add(f"hc_post:{t}-{h}-{d}", sec)


def bench_inkling():
    """Inkling fused attention prologue (decode sub-batch, InklingSconv.cpp)."""
    from sgl_kernel_tpu.ops import inkling

    b, hq, hkv, hd, w = 16, 32, 8, 128, 4
    dq, dkv = hq * hd, hkv * hd
    qkvr = jnp.asarray(rng.standard_normal((b, dq + 2 * dkv)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, w - 1, dkv)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, w - 1, dkv)), jnp.bfloat16)
    kw = jnp.asarray(rng.standard_normal((dkv, w)) * 0.3, jnp.bfloat16)
    vw = jnp.asarray(rng.standard_normal((dkv, w)) * 0.3, jnp.bfloat16)
    qg = jnp.asarray(rng.random(hd) + 0.5, jnp.float32)
    kg = jnp.asarray(rng.random(hd) + 0.5, jnp.float32)
    ci = jnp.arange(b, dtype=jnp.int32)
    cm = jnp.ones((b,), bool)
    loc = jnp.arange(b, dtype=jnp.int32)
    kbuf = jnp.zeros((b * 2, dkv), jnp.bfloat16)
    vbuf = jnp.zeros((b * 2, dkv), jnp.bfloat16)

    def step(c):
        q, k, v, kb, vb, kc2, vc2 = inkling.inkling_attn_prologue(
            c, kc, vc, ci, cm, kw, vw, qg, kg, loc, kbuf, vbuf,
            q_off=0, k_off=dq, v_off=dq + dkv, dq=dq, dkv=dkv,
            activation="silu", use_residual=True)
        return c.at[:, :dq].add(q.astype(c.dtype) * jnp.bfloat16(1e-8))

    sec = bench_chain(step, qkvr, reps=64)
    add(f"inkling_prologue_decode:{b}-{dq}-{dkv}", sec)


def bench_sparse_vs():
    """MInference vertical-slash block-sparse prefill (sparse_flash_attn.py)."""
    from sgl_kernel_tpu.ops.attention.sparse_vs import (
        convert_vertical_slash_indexes, sparse_attn_func)

    b, s, h, d = 1, 4096, 8, 128
    nv, ns = 256, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    vert = jnp.asarray(np.sort(rng.choice(s, (b, h, nv), replace=False), -1), jnp.int32)
    slash = jnp.asarray(np.sort(rng.choice(s, (b, h, ns), replace=False), -1)[..., ::-1].copy(), jnp.int32)
    qlen = jnp.full((b,), s, jnp.int32)
    bc, bo, cc, cix = convert_vertical_slash_indexes(qlen, qlen, vert, slash, s, 64, 128)

    def step(c):
        o = sparse_attn_func(c, k, v, bc, bo, cc, cix)
        return c + o * jnp.bfloat16(1e-8)

    sec = bench_chain(step, q, reps=16)
    add(f"sparse_attn_vs:{b}-{s}-{h}-{d}", sec)


def bench_linear_attn_misc():
    from sgl_kernel_tpu.ops.linear_attn import causal_conv1d_fwd
    from sgl_kernel_tpu.ops.linear_attn.lightning import lightning_attention_decode

    b, s, d, w = 8, 2048, 2048, 4
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((d, w)) * 0.3, jnp.bfloat16)

    def cstep(c):
        y, _ = causal_conv1d_fwd(c, wgt, None, None, None, activation="silu")
        return c + y * jnp.bfloat16(1e-8)

    sec = bench_chain(cstep, x, reps=16)
    add(f"causal_conv1d_fwd:{b}-{s}-{d}-{w}", sec,
        gbs=round(2 * b * s * d * 2 / sec / 1e9, 1))

    bb, hh, dk, dv = 16, 32, 128, 128
    qd = jnp.asarray(rng.standard_normal((bb, hh, 1, dk)), jnp.bfloat16)
    kd = jnp.asarray(rng.standard_normal((bb, hh, 1, dk)), jnp.bfloat16)
    vd = jnp.asarray(rng.standard_normal((bb, hh, 1, dv)), jnp.bfloat16)
    past = jnp.zeros((bb, hh, dk, dv), jnp.float32)
    slope = jnp.asarray(rng.random((hh, 1, 1)), jnp.float32)

    def lstep(c):
        o, nkv = lightning_attention_decode(qd, kd, vd, c, slope)
        return nkv

    sec = bench_chain(lstep, past, reps=64)
    add(f"lightning_decode:{bb}-{hh}-{dk}", sec)


def bench_fp4_mm():
    from sgl_kernel_tpu.ops.gemm.fp4 import fp4_scaled_mm, scaled_fp4_quant

    m, n, k = 16, 4096, 4096
    gs = jnp.float32(1.0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    ap, sa = scaled_fp4_quant(a, gs)
    banks = []
    for _ in range(8):
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
        banks.append(scaled_fp4_quant(w, gs))

    from benchmark.bench_lib import bench_chain_banks

    def step(c, bp, sb):
        o = fp4_scaled_mm(ap, bp, sa, sb, jnp.float32(1.0))
        return c + o[:, : c.shape[1]] * jnp.bfloat16(1e-8)

    sec = bench_chain_banks(step, jnp.zeros((m, n), jnp.bfloat16), banks, reps=8)
    add(f"fp4_scaled_mm:{m}-{n}-{k}", sec, gbs=round(n * k // 2 / sec / 1e9, 1))


def main():
    for fn in (bench_norm, bench_rope, bench_activation, bench_sampling,
               bench_nsa, bench_gdn, bench_lora, bench_spec_grammar_merge,
               bench_hadamard, bench_store, bench_compression, bench_hc,
               bench_inkling, bench_sparse_vs, bench_linear_attn_misc,
               bench_fp4_mm):
        try:
            fn()
        except Exception as e:  # keep the grid going; missing entries show in diff
            print(f"SKIP {fn.__name__}: {type(e).__name__} {str(e)[:200]}", flush=True)
    compare_to_baseline(records, load_baseline())


if __name__ == "__main__":
    main()
