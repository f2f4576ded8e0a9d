"""Round-4 export-parity shims (compat.py extension).

Every name the reference exports at python/sgl_kernel/__init__.py now has a
compat entry; these tests pin the adapters' semantics against the native
ops and independent numpy oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sgl_kernel_tpu as K
from sgl_kernel_tpu.ops import rope as _rope
from sgl_kernel_tpu.ops import inkling as _inkling
from sgl_kernel_tpu import compat as C


def test_export_name_diff_empty():
    """The VERDICT #7 done-criterion: reference export list minus our
    package+compat namespace is empty (modulo the wildcard-import artifact
    and the raw extension module name, both covered by compat)."""
    import ast

    ref_names = set()
    tree = ast.parse(open("/root/reference/python/sgl_kernel/__init__.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                ref_names.add(a.asname or a.name)
    ref_names.discard("*")
    ours = set(dir(K)) | set(dir(C))
    missing = sorted(n for n in ref_names if n not in ours)
    assert missing == [], missing


# ---------------------------------------------------------------- quant ---

def test_sgl_quant_wrappers_match_native():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 256)).astype(np.float32))
    q, s = C.sgl_per_token_group_quant_fp8(x, group_size=128, eps=1e-10,
                                           fp8_min=-448.0, fp8_max=448.0)
    qn, sn = K.per_token_group_quant_8bit(x, group_size=128, qmin=-448.0, qmax=448.0)
    np.testing.assert_array_equal(np.asarray(q, np.float32), np.asarray(qn, np.float32))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sn))

    qi, si = C.sgl_per_token_group_quant_int8(x, group_size=128, eps=1e-10,
                                              fp8_min=-127.0, fp8_max=127.0)
    assert qi.dtype == jnp.int8

    qt, st = C.sgl_per_token_quant_fp8(x)
    qtn, stn = K.per_token_quant_fp8(x)
    np.testing.assert_array_equal(np.asarray(qt, np.float32), np.asarray(qtn, np.float32))

    q4, s4 = C.sgl_per_token_group_quant_fp4(x[:, :64])
    q4n, s4n = K.per_token_group_quant_fp4(x[:, :64])
    np.testing.assert_array_equal(np.asarray(q4), np.asarray(q4n))
    np.testing.assert_array_equal(np.asarray(s4), np.asarray(s4n))


def test_cutlass_fp4_names():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    gs = jnp.float32(1.0)
    ap, sa = K.scaled_fp4_quant(a, gs)
    bp, sb = K.scaled_fp4_quant(b, gs)
    out = C.cutlass_scaled_fp4_mm(ap, bp, sa, sb, jnp.float32(1.0))
    ref = K.fp4_scaled_mm(ap, bp, sa, sb, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(ref, np.float32))

    # grouped form via the reference's params sideband
    e = 2
    be = jnp.asarray(rng.normal(size=(e, 16, 64)).astype(np.float32))
    bpe, sbe = jax.vmap(lambda w: K.scaled_fp4_quant(w, gs))(be)
    offs = jnp.asarray([0, 5, 8], jnp.int32)
    out = C.cutlass_fp4_group_mm(ap, bpe, sa, sbe, jnp.ones((e,), jnp.float32),
                                 params={"expert_offsets": offs})
    ref = K.fp4_group_mm(ap, bpe, sa, sbe, jnp.ones((e,), jnp.float32),
                         offs[1:] - offs[:-1])
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(ref, np.float32))


# ------------------------------------------------------------- flash MLA ---

def _mla_pool(rng, n_pages=8, page=16, d=576):
    return jnp.asarray(rng.normal(size=(n_pages, page, d)).astype(np.float32) / 8).astype(jnp.bfloat16)


def test_flash_mla_decode_name():
    rng = np.random.default_rng(2)
    cache = _mla_pool(rng)
    b, h = 2, 4
    qn = jnp.asarray(rng.normal(size=(b, h, 512)).astype(np.float32) / 8).astype(jnp.bfloat16)
    qp = jnp.asarray(rng.normal(size=(b, h, 64)).astype(np.float32) / 8).astype(jnp.bfloat16)
    lens = jnp.asarray([30, 17], jnp.int32)
    pt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    out = C.flash_mla_decode(qn, qp, cache, lens, pt, workspace=None, sm_scale=0.1)
    ref = K.mla_decode(qn, qp, cache, lens, pt, sm_scale=0.1)
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(ref, np.float32))


def test_flash_mla_prefill_ragged():
    rng = np.random.default_rng(3)
    cache = _mla_pool(rng)
    h = 2
    lens_q = [5, 3]
    cu = np.asarray([0, 5, 8], np.int32)
    total = 8
    qn = jnp.asarray(rng.normal(size=(total, h, 512)).astype(np.float32) / 8).astype(jnp.bfloat16)
    qp = jnp.asarray(rng.normal(size=(total, h, 64)).astype(np.float32) / 8).astype(jnp.bfloat16)
    lens_k = jnp.asarray([20, 9], jnp.int32)
    pt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    out = C.flash_mla_prefill(qn, qp, cache, cu, lens_k, max(lens_q), pt, sm_scale=0.13)
    assert out.shape == (total, h, 512)

    # oracle: per-seq incremental-prefill attention in fp64
    page = cache.shape[1]
    for i, (s0, lq) in enumerate(zip(cu[:-1], lens_q)):
        lk = int(lens_k[i])
        kv = np.asarray(cache, np.float64)[np.asarray(pt[i])].reshape(-1, 576)[:lk]
        q = np.concatenate([np.asarray(qn, np.float64)[s0 : s0 + lq],
                            np.asarray(qp, np.float64)[s0 : s0 + lq]], axis=-1)
        logits = np.einsum("shd,kd->shk", q, kv) * 0.13
        # q row j sits at kv position lk - lq + j
        kpos = np.arange(lk)[None, None, :]
        qpos = (lk - lq + np.arange(lq))[:, None, None]
        logits = np.where(kpos <= qpos, logits, -np.inf)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o = np.einsum("shk,kd->shd", p, kv[:, :512])
        got = np.asarray(out, np.float64)[s0 : s0 + lq]
        np.testing.assert_allclose(got, o, atol=0.04, rtol=0.05)


def test_flash_mla_with_kvcache_dense_and_sparse():
    rng = np.random.default_rng(4)
    n_pages, page = 8, 16
    cache4 = jnp.asarray(rng.normal(size=(n_pages, page, 1, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    b, s_q, h = 2, 1, 4
    q = jnp.asarray(rng.normal(size=(b, s_q, h, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    pt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    lens = jnp.asarray([40, 22], jnp.int32)
    out, lse = C.flash_mla_with_kvcache(q, cache4, block_table=pt,
                                        cache_seqlens=lens, softmax_scale=0.11)
    assert out.shape == (b, s_q, h, 512) and lse.shape == (b, h, s_q)
    ref, ref_lse = K.mla_decode(q[:, 0, :, :512], q[:, 0, :, 512:],
                                cache4[:, :, 0], lens, pt, sm_scale=0.11,
                                return_lse=True)
    np.testing.assert_array_equal(np.asarray(out[:, 0], np.float32), np.asarray(ref, np.float32))
    # natural-log conversion of the base-2 native lse
    np.testing.assert_allclose(np.asarray(lse[:, :, 0]),
                               np.asarray(ref_lse) * np.log(2), rtol=1e-6)

    # sparse path: indices into the flat pool; sink must not alter lse
    idx = jnp.asarray(rng.integers(0, n_pages * page, size=(b, s_q, 8)), jnp.int32)
    sink = jnp.asarray(rng.normal(size=(h,)).astype(np.float32))
    out_s, lse_s = C.flash_mla_with_kvcache(q, cache4, indices=idx,
                                            softmax_scale=0.11, attn_sink=sink)
    out_ns, lse_ns = C.flash_mla_with_kvcache(q, cache4, indices=idx,
                                              softmax_scale=0.11)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_ns), rtol=1e-6)
    assert not np.allclose(np.asarray(out_s, np.float32), np.asarray(out_ns, np.float32))


def test_flash_mla_sparse_fwd_oracle():
    rng = np.random.default_rng(5)
    s_kv, s_q, h, topk = 64, 4, 2, 16
    kv = jnp.asarray(rng.normal(size=(s_kv, 1, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(s_q, h, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    idx = np.sort(rng.choice(s_kv, size=(s_q, 1, topk), replace=True), axis=-1).astype(np.int32)
    idx[0, 0, -3:] = -1  # invalid tail
    tl = jnp.asarray([topk, topk, 10, 5], jnp.int32)
    out, max_logits, lse = C.flash_mla_sparse_fwd(q, kv, jnp.asarray(idx), 0.12,
                                                  topk_length=tl)
    kvf = np.asarray(kv, np.float64)[:, 0]
    qf = np.asarray(q, np.float64)
    for t in range(s_q):
        valid = [j for j in range(topk) if idx[t, 0, j] >= 0 and j < int(tl[t])]
        rows = kvf[idx[t, 0, valid]]
        lg = qf[t] @ rows.T * 0.12  # [h, k]
        p = np.exp(lg - lg.max(-1, keepdims=True))
        o = (p / p.sum(-1, keepdims=True)) @ rows[:, :512]
        np.testing.assert_allclose(np.asarray(out, np.float64)[t], o, atol=0.04, rtol=0.05)
        np.testing.assert_allclose(np.asarray(max_logits)[t], lg.max(-1), atol=1e-2)
        np.testing.assert_allclose(np.asarray(lse)[t],
                                   np.log(np.exp(lg).sum(-1)), atol=2e-2)


def test_fp8_paged_mqa_logits_triton_inline_scales():
    rng = np.random.default_rng(6)
    n_pages, page, h, d = 4, 64, 4, 128
    b = 2
    data = (rng.normal(size=(n_pages, page, d)) / 8).astype(np.float32)
    kv_fp8 = jnp.asarray(data).astype(jnp.float8_e4m3fn)
    scales = (1.0 + rng.random((n_pages, page))).astype(np.float32)
    # pack the reference's inline layout: [P, page, 1, D+4] with the f32
    # scale bytes living in the last 4 fp8 slots
    scale_bytes = scales.view(np.uint8).reshape(n_pages, page, 4)
    packed = np.concatenate(
        [np.asarray(kv_fp8).view(np.uint8), scale_bytes], axis=-1
    )[:, :, None, :]
    packed_fp8 = jnp.asarray(packed).view(jnp.float8_e4m3fn)
    q = jnp.asarray((rng.normal(size=(b, 1, h, d)) / 8).astype(np.float32)).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.random((b, h)).astype(np.float32))
    lens = jnp.asarray([100, 60], jnp.int32)
    pt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    got = C.fp8_paged_mqa_logits_triton(q, packed_fp8, w, lens, pt, max_seq_len=128)
    ref = K.fp8_paged_mqa_logits(q[:, 0], kv_fp8, w, lens, pt, jnp.asarray(scales))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref)[:, :128])


# ------------------------------------------------------------ rope shims ---

def _interleave(cos, sin):
    out = np.empty((cos.shape[0], cos.shape[1] * 2), np.float32)
    out[:, 0::2] = cos
    out[:, 1::2] = sin
    return out


def test_fused_q_norm_rope_oracle():
    rng = np.random.default_rng(7)
    b, h, hd, rot = 3, 2, 128, 64
    x = rng.normal(size=(b, h, hd)).astype(np.float32)
    pos = np.asarray([0, 5, 9], np.int32)
    ang = np.arange(16)[:, None] * (10000.0 ** (-np.arange(rot // 2) / (rot // 2)))
    freqs = _interleave(np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))
    got = C.fused_q_norm_rope(jnp.asarray(x), None, jnp.asarray(freqs),
                              jnp.asarray(pos), eps=1e-6)
    xn = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
    ref = xn.copy()
    re, im = np.cos(ang)[pos], np.sin(ang)[pos]
    r = xn[..., hd - rot :]
    ref[..., hd - rot :: 2] = r[..., 0::2] * re[:, None] - r[..., 1::2] * im[:, None]
    ref[..., hd - rot + 1 :: 2] = r[..., 0::2] * im[:, None] + r[..., 1::2] * re[:, None]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_fused_k_norm_rope_flashmla_store():
    rng = np.random.default_rng(8)
    t, hd, rot = 3, 512, 64
    kv = jnp.asarray(rng.normal(size=(t, hd)).astype(np.float32))
    w = jnp.asarray(rng.random(hd).astype(np.float32))
    ang = np.arange(16)[:, None] * (10000.0 ** (-np.arange(rot // 2) / (rot // 2)))
    freqs = jnp.asarray(_interleave(np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)))
    pos = jnp.asarray([2, 0, 7], jnp.int32)
    cache = jnp.zeros((2, 4, hd), jnp.float32)
    loc = jnp.asarray([5, -1, 0], jnp.int32)  # -1 must skip
    new = C.fused_k_norm_rope_flashmla(kv, w, freqs, pos, loc, cache, 1e-6)
    flat = np.asarray(new).reshape(8, hd)
    assert np.all(flat[1:5] == 0) and np.all(flat[6:] == 0)  # untouched rows
    # row content: weighted rmsnorm + interleaved rope on the tail
    x = np.asarray(kv, np.float64)
    xn = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w, np.float64)
    re, im = np.cos(ang)[np.asarray(pos)], np.sin(ang)[np.asarray(pos)]
    r = xn[:, hd - rot :]
    exp = xn.copy()
    exp[:, hd - rot :: 2] = r[:, 0::2] * re - r[:, 1::2] * im
    exp[:, hd - rot + 1 :: 2] = r[:, 0::2] * im + r[:, 1::2] * re
    np.testing.assert_allclose(flat[5], exp[0], atol=1e-5)
    np.testing.assert_allclose(flat[0], exp[2], atol=1e-5)


def test_fused_qk_rope_yarn_plain():
    """factor=1 degenerates to plain rope with per-dim weights."""
    rng = np.random.default_rng(9)
    t, hq, hk, hv, hd = 4, 2, 1, 1, 64
    qkv = rng.normal(size=(t, (hq + hk + hv) * hd)).astype(np.float32)
    qw = rng.random(hd).astype(np.float32)
    kw = rng.random(hd).astype(np.float32)
    pos = np.asarray([0, 3, 1, 7], np.int32)
    got = C.fused_qk_rope(jnp.asarray(qkv), hq, hk, hv, hd, jnp.asarray(qw),
                          jnp.asarray(kw), 10000.0, True, jnp.asarray(pos))
    x = qkv.reshape(t, hq + hk + hv, hd)
    freq = 10000.0 ** (-np.arange(0, hd, 2) / hd)
    ang = pos[:, None] * freq
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]

    def rope(p, w):
        p = p * w
        a, b = p[..., : hd // 2], p[..., hd // 2 :]
        return np.concatenate([a * cos - b * sin, a * sin + b * cos], -1)

    exp = np.concatenate([rope(x[:, :hq], qw), rope(x[:, hq : hq + hk], kw),
                          x[:, hq + hk :]], axis=1).reshape(t, -1)
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)
    # v range untouched
    np.testing.assert_array_equal(np.asarray(got)[:, (hq + hk) * hd :],
                                  qkv[:, (hq + hk) * hd :])


def test_fused_inplace_qknorm_rope_matches_native_chain():
    rng = np.random.default_rng(10)
    t, h, hd = 4, 2, 64
    q = jnp.asarray(rng.normal(size=(t, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(t, 1, hd)).astype(np.float32))
    qw = jnp.asarray(rng.random(hd).astype(np.float32))
    kw2 = jnp.asarray(rng.random(hd).astype(np.float32))
    cache = _rope.compute_cos_sin_cache(hd, 32)
    pos = jnp.asarray([0, 3, 1, 7], jnp.int32)
    gq, gk = C.fused_inplace_qknorm_rope(q, k, qw, kw2, cache, pos, True)
    from sgl_kernel_tpu.ops.norm import rmsnorm
    nq = rmsnorm(q.reshape(-1, hd), qw).reshape(q.shape)
    nk = rmsnorm(k.reshape(-1, hd), kw2).reshape(k.shape)
    rq, rk = K.rotary_embedding(pos, nq, nk, hd, cache)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-6)


# ----------------------------------------------- compress_norm_rope_store ---

def _pack_plan_c(seq_len, ragged):
    n = len(seq_len)
    plan = np.zeros((n, 16), np.uint8)
    i32 = plan.view(np.int32).reshape(n, 4)
    i32[:, 0] = seq_len
    i16 = plan.view(np.int16).reshape(n, 8)
    i16[:, 2] = np.asarray(ragged, np.int16)
    return plan


def _pack_plan_d(seq_len, write_loc):
    n = len(seq_len)
    plan = np.zeros((n, 16), np.uint8)
    i32 = plan.view(np.int32).reshape(n, 4)
    i32[:, 0] = seq_len
    i32[:, 1] = write_loc
    return plan


def test_compress_norm_rope_store_mla_paths():
    rng = np.random.default_rng(11)
    hd, rot, r = 512, 64, 4
    x = jnp.asarray(rng.normal(size=(3, hd)).astype(np.float32))
    w = jnp.asarray(rng.random(hd).astype(np.float32))
    ang = np.arange(32)[:, None] * (10000.0 ** (-np.arange(rot // 2) / (rot // 2)))
    freqs = jnp.asarray(_interleave(np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)))
    cache = jnp.zeros((2, 8, hd), jnp.float32)

    # extend (plan_c): row 1 invalid
    plan = _pack_plan_c([8, -1, 12], [0, 0, 1])
    out_loc = jnp.asarray([3, 9], jnp.int32)
    new = C.compress_norm_rope_store(x, jnp.asarray(plan), w, 1e-6, freqs,
                                     out_loc, cache, False, r, 8)
    flat = np.asarray(new).reshape(16, hd)
    assert np.any(flat[3] != 0) and np.any(flat[9] != 0)
    assert np.all(np.delete(flat, [3, 9], axis=0) == 0)

    # decode (plan_d): only multiples of r fire
    plan = _pack_plan_d([8, 7, 12], [0, 0, 0])
    out_loc = jnp.asarray([4, 5, 6], jnp.int32)
    new = C.compress_norm_rope_store(x, jnp.asarray(plan), w, 1e-6, freqs,
                                     out_loc, cache, True, r, 8)
    flat = np.asarray(new).reshape(16, hd)
    assert np.any(flat[4] != 0) and np.all(flat[5] == 0) and np.any(flat[6] != 0)


# --------------------------------------------------------------- inkling ---

def test_fused_sconv_metadata_shims():
    ci = jnp.asarray([2, -1, 0], jnp.int32)
    qsl, his, md = C.fused_decode_sconv_metadata(3, ci)
    np.testing.assert_array_equal(np.asarray(qsl), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(his), [True, False, True])
    np.testing.assert_array_equal(np.asarray(md.safe_idx), [2, 0, 0])
    np.testing.assert_array_equal(np.asarray(md.si), [0, 1, 2])

    cu, his, md = C.fused_extend_sconv_metadata(
        B=3, T=7, cache_indices=ci, his_mode=1,
        extend_seq_lens=jnp.asarray([3, 2, 2], jnp.int32),
        his_src=jnp.asarray([5, 0, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(cu), [0, 3, 5, 7])
    np.testing.assert_array_equal(np.asarray(his), [True, False, True])
    np.testing.assert_array_equal(np.asarray(md.si), [0, 0, 0, 1, 1, 2, 2])
    # his_mode 3 = uniform draft tokens
    cu, his, _ = C.fused_extend_sconv_metadata(B=3, T=6, cache_indices=ci,
                                               his_mode=3, draft_token_num=2)
    np.testing.assert_array_equal(np.asarray(cu), [0, 2, 4, 6])
    np.testing.assert_array_equal(np.asarray(his), [True, False, True])


def test_inkling_causal_conv1d_shim():
    rng = np.random.default_rng(12)
    d, w = 8, 4
    weight = jnp.asarray(rng.normal(size=(d, w)).astype(np.float32))
    cache = jnp.asarray(rng.normal(size=(4, w - 1, d)).astype(np.float32))

    # decode: one token per row, matches the fused update op's y
    x = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))
    ci = jnp.asarray([1, -1, 2], jnp.int32)
    mask, safe = _inkling.sconv_decode_metadata(ci)
    y = C.causal_conv1d(x, weight, cache, mask, safe, jnp.arange(4), jnp.arange(3),
                        activation="silu", use_residual=True, is_decode=True)
    y_ref, _ = _inkling.fused_causal_conv1d_update_decode(x, weight, cache, ci, mask,
                                                   activation="silu", use_residual=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    # extend: ragged segments vs the batched native conv
    lens = [3, 2]
    cu = np.asarray([0, 3, 5], np.int32)
    xs = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    ci = jnp.asarray([0, 3], jnp.int32)
    mask, safe = _inkling.sconv_decode_metadata(ci)
    y = C.causal_conv1d(xs, weight, cache, mask, safe, cu, None,
                        activation=None, use_residual=False, is_decode=False)
    from sgl_kernel_tpu.ops.linear_attn import causal_conv1d_fwd
    batched = jnp.zeros((2, 3, d), jnp.float32)
    batched = batched.at[0, :3].set(xs[:3]).at[1, :2].set(xs[3:])
    yb, _ = causal_conv1d_fwd(batched, weight, None, jnp.asarray(lens, jnp.int32),
                              cache[jnp.asarray([0, 3])], activation=None)
    np.testing.assert_allclose(np.asarray(y)[:3], np.asarray(yb)[0, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(y)[3:], np.asarray(yb)[1, :2], atol=1e-5)


def test_update_sconv_cache_shim():
    rng = np.random.default_rng(13)
    d, w = 4, 4
    cache = jnp.asarray(rng.normal(size=(3, w - 1, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(6, d)).astype(np.float32))
    cu = np.asarray([0, 4, 6], np.int32)  # seq0: 4 tokens, seq1: 2 tokens
    ci = jnp.asarray([0, 2], jnp.int32)
    his = jnp.asarray([False, True])
    new = C.update_sconv_cache(x, cache, ci, his, cu)
    # seq0 long enough: tail = last W-1 tokens
    np.testing.assert_allclose(np.asarray(new)[0], np.asarray(x)[1:4])
    # seq1 short: prior cache rows shift in
    exp = np.concatenate([np.asarray(cache)[2][2:], np.asarray(x)[4:6]], axis=0)
    np.testing.assert_allclose(np.asarray(new)[2], exp)


# ------------------------------------------------------------------- GDN ---

def _gdn_setup(rng, b, s=1):
    hk, hv, dk, dv = 2, 4, 8, 8
    g = hv // hk
    qkvz_dim = hk * (2 * dk + 2 * g * dv)
    ba_dim = hk * 2 * g
    conv_dim = hk * 2 * dk + hv * dv
    w = 4
    shape = (b * s, qkvz_dim) if s else (b, qkvz_dim)
    return dict(
        qkvz=jnp.asarray(rng.normal(size=(b * s, qkvz_dim)).astype(np.float32) / 4),
        ba=jnp.asarray(rng.normal(size=(b * s, ba_dim)).astype(np.float32) / 4),
        conv_weights=jnp.asarray(rng.normal(size=(conv_dim, w)).astype(np.float32) / 4),
        conv_bias=None,
        A_log=jnp.asarray(rng.random(hv).astype(np.float32)),
        dt_bias=jnp.asarray(rng.random(hv).astype(np.float32)),
        conv_state=jnp.asarray(rng.normal(size=(8, w - 1, conv_dim)).astype(np.float32) / 4),
        ssm_state=jnp.zeros((8, hv, dv, dk), jnp.float32),
        kw=dict(num_k_heads=hk, num_v_heads=hv, head_k_dim=dk, head_v_dim=dv),
    )


def test_gdn_attention_decode_only():
    rng = np.random.default_rng(14)
    st = _gdn_setup(rng, b=3)
    rows = jnp.asarray([1, 4, 2], jnp.int32)
    core, z, cs, ss = C.gdn_attention(
        None, None, st["qkvz"], st["ba"], st["kw"]["num_k_heads"],
        st["kw"]["num_v_heads"], st["kw"]["head_k_dim"], st["kw"]["head_v_dim"],
        st["conv_state"], st["ssm_state"], st["conv_weights"], st["conv_bias"],
        "silu", st["A_log"], st["dt_bias"], num_prefills=0, num_decodes=3,
        num_spec_decodes=0, non_spec_state_indices_tensor=rows)
    from sgl_kernel_tpu.ops.linear_attn.gdn import gdn_attention_decode
    o_ref, z_ref, cs_ref, ss_ref = gdn_attention_decode(
        st["qkvz"], st["ba"], st["conv_weights"], st["conv_bias"],
        st["A_log"], st["dt_bias"], st["conv_state"][rows],
        st["ssm_state"][rows], **st["kw"])
    np.testing.assert_allclose(np.asarray(core), np.asarray(o_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs)[np.asarray(rows)], np.asarray(cs_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss)[np.asarray(rows)], np.asarray(ss_ref), atol=1e-6)
    # untouched state rows stay bit-identical
    np.testing.assert_array_equal(np.asarray(cs)[0], np.asarray(st["conv_state"])[0])


def test_gdn_attention_mixed_prefill_decode():
    rng = np.random.default_rng(15)
    st = _gdn_setup(rng, b=5)  # 3 prefill tokens (1 seq) + 2 decodes
    cu = jnp.asarray([0, 3, 4, 5], jnp.int32)
    rows = jnp.asarray([0, 1, 2], jnp.int32)
    core, z, cs, ss = C.gdn_attention(
        None, None, st["qkvz"], st["ba"], st["kw"]["num_k_heads"],
        st["kw"]["num_v_heads"], st["kw"]["head_k_dim"], st["kw"]["head_v_dim"],
        st["conv_state"], st["ssm_state"], st["conv_weights"], st["conv_bias"],
        "silu", st["A_log"], st["dt_bias"], num_prefills=1, num_decodes=2,
        num_spec_decodes=0, has_initial_state=jnp.asarray([False]),
        non_spec_query_start_loc=cu, non_spec_state_indices_tensor=rows)
    assert core.shape[0] == 5 and z.shape[0] == 5
    # decode sub-batch parity
    from sgl_kernel_tpu.ops.linear_attn.gdn import gdn_attention_decode
    o_ref, _, _, _ = gdn_attention_decode(
        st["qkvz"][3:], st["ba"][3:], st["conv_weights"], st["conv_bias"],
        st["A_log"], st["dt_bias"], st["conv_state"][rows[1:]],
        st["ssm_state"][rows[1:]], **st["kw"])
    np.testing.assert_allclose(np.asarray(core)[3:], np.asarray(o_ref), atol=1e-6)


# ------------------------------------------------------------------- MoE ---

def test_prepare_moe_input_oracle():
    rng = np.random.default_rng(16)
    topk_ids = jnp.asarray(rng.integers(0, 4, size=(6, 2)), jnp.int32)
    off, ps1, ps2, in_perm, out_perm, bso = C.prepare_moe_input(
        topk_ids, num_experts=4, n=16, k=32)
    flat = np.asarray(topk_ids).ravel()
    counts = np.bincount(flat, minlength=4)
    np.testing.assert_array_equal(np.asarray(off), np.concatenate([[0], counts.cumsum()]))
    # n=16, k=32: ps1 = (m_e, 2n=32, k=32), ps2 = (m_e, k=32, n=16)
    np.testing.assert_array_equal(np.asarray(ps1),
                                  np.stack([counts, np.full(4, 32), np.full(4, 32)], 1))
    np.testing.assert_array_equal(np.asarray(ps2),
                                  np.stack([counts, np.full(4, 32), np.full(4, 16)], 1))
    # sorted order: expert ids non-decreasing along in_perm
    assert np.all(np.diff(flat[np.asarray(in_perm)]) >= 0)
    # out_perm inverts in_perm
    np.testing.assert_array_equal(np.asarray(in_perm)[np.asarray(out_perm)],
                                  np.arange(flat.size))
    np.testing.assert_array_equal(np.asarray(bso),
                                  np.concatenate([[0], (((counts + 3) // 4) * 4).cumsum()]))


def test_misc_trivial_names():
    assert C.is_xe2_arch() is False
    assert C.common_ops is K
    C.compile_inkling_attn_prologue(None, 4, True, True)
    lg = jnp.zeros((2, 8), jnp.float32)
    bm = jnp.asarray([[0b1010_1010], [0b0101_0101]], jnp.int32)
    out = C.apply_token_bitmask_inplace_cuda(lg, bm)
    assert out.shape == lg.shape
    p = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    np.testing.assert_allclose(np.asarray(C.top_k_renorm_prob(p, 2)),
                               np.asarray(K.top_k_renorm_probs(p, 2)))


def test_flash_mla_with_kvcache_mtp_topk_length():
    """Multi-token (s_q>1, MTP) sparse decode with topk_length [B]: the
    reference fixes topk_length's shape at [B] regardless of s_q — it must
    repeat per query position, not reshape (advisor r4 medium finding)."""
    rng = np.random.default_rng(6)
    n_pages, page = 8, 16
    cache4 = jnp.asarray(rng.normal(size=(n_pages, page, 1, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    b, s_q, h, topk = 2, 3, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s_q, h, 576)).astype(np.float32) / 8).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n_pages * page, size=(b, s_q, topk)), jnp.int32)
    tl = jnp.asarray([5, 8], jnp.int32)  # [B], NOT [B*s_q]
    out, lse = C.flash_mla_with_kvcache(q, cache4, indices=idx,
                                        softmax_scale=0.11, topk_length=tl)
    assert out.shape == (b, s_q, h, 512) and lse.shape == (b, h, s_q)
    # oracle on (b=1, s=2): only the first tl[1]=8 indices attend
    pool = np.asarray(cache4, np.float32).reshape(-1, 576)
    qv = np.asarray(q, np.float32)[1, 2]
    kid = np.asarray(idx)[1, 2, :8]
    logits = qv @ pool[kid].T * 0.11
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = p @ pool[kid, :512]
    np.testing.assert_allclose(np.asarray(out, np.float32)[1, 2], o, atol=0.04, rtol=0.05)
