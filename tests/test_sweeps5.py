"""Fifth sweep batch: MLA decode grids (heads x page x splits x fp8 pool),
randomized speculative-tree verification vs a numpy walker, and
segment_packbits ragged grids (VERDICT round-1 #9 continued)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from test_mla import ref_mla

from sgl_kernel_tpu.ops import speculative
from sgl_kernel_tpu.ops.attention import mla


def _paged(rng, lengths, page, dtype=np.float32):
    b = len(lengths)
    max_pages = max((l + page - 1) // page for l in lengths)
    n_pages = 1 + sum((l + page - 1) // page for l in lengths)
    pool = np.zeros((n_pages, page, 576), dtype)
    table = np.zeros((b, max_pages), np.int32)
    kvs, nxt = [], 1
    for bb, l in enumerate(lengths):
        kv = (rng.standard_normal((l, 576)) * 0.3).astype(dtype)
        kvs.append(kv)
        for i in range((l + page - 1) // page):
            table[bb, i] = nxt
            chunk = kv[i * page : (i + 1) * page]
            pool[nxt, : len(chunk)] = chunk
            nxt += 1
    return pool, table, kvs


class TestMlaDecodeSweep:
    @pytest.mark.parametrize("h", [8, 16, 32])
    @pytest.mark.parametrize("page", [32, 64])
    @pytest.mark.parametrize("num_splits", [1, 2, 3])
    def test_grid(self, rng, h, page, num_splits):
        lengths = [3 * page + 7, page - 1, 2 * page]
        pool, table, kvs = _paged(rng, lengths, page)
        b = len(lengths)
        q_nope = (rng.standard_normal((b, h, 512)) * 0.3).astype(np.float32)
        q_pe = (rng.standard_normal((b, h, 64)) * 0.3).astype(np.float32)
        sm = 1.0 / np.sqrt(576)
        out = np.asarray(mla.mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(pool),
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            num_splits=num_splits,
        ))
        for bb in range(b):
            ref, _ = ref_mla(q_nope[bb : bb + 1].transpose(0, 1, 2),
                             q_pe[bb : bb + 1], kvs[bb], sm)
            np.testing.assert_allclose(out[bb], ref[0], rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("num_splits", [1, 4])
    def test_fp8_pool_grid(self, rng, num_splits):
        page, h = 32, 8
        lengths = [70, 33]
        pool, table, kvs = _paged(rng, lengths, page)
        pool8 = jnp.asarray(pool).astype(jnp.float8_e4m3fn)
        b = len(lengths)
        q_nope = (rng.standard_normal((b, h, 512)) * 0.3).astype(np.float32)
        q_pe = (rng.standard_normal((b, h, 64)) * 0.3).astype(np.float32)
        sm = 1.0 / np.sqrt(576)
        out = np.asarray(mla.mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), pool8,
            jnp.asarray(lengths, jnp.int32), jnp.asarray(table),
            num_splits=num_splits,
        ))
        for bb in range(b):
            kv8 = np.asarray(jnp.asarray(kvs[bb]).astype(jnp.float8_e4m3fn), np.float32)
            ref, _ = ref_mla(q_nope[bb : bb + 1], q_pe[bb : bb + 1], kv8, sm)
            np.testing.assert_allclose(out[bb], ref[0], rtol=3e-2, atol=3e-2)


def _walk_tree_greedy(cand, nxt, sib, tpred, steps):
    """numpy oracle: walk from the root accepting matching children."""
    nd = len(cand)
    predicts = np.full(nd, -1, np.int32)
    accept_index = np.full(steps, -1, np.int32)
    accept_index[0] = 0
    accept_num = 0
    cur = 0
    for s in range(1, steps):
        tok = tpred[cur]
        child = nxt[cur]
        hit = -1
        while child != -1:
            if cand[child] == tok:
                hit = child
                break
            child = sib[child]
        predicts[cur] = tok
        if hit == -1:
            break
        accept_index[s] = hit
        accept_num += 1
        cur = hit
    predicts[cur] = tpred[cur]
    return predicts, accept_index, accept_num


class TestVerifyTreeRandomSweep:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("steps", [2, 3, 4])
    def test_chain_plus_siblings(self, seed, steps):
        """Random binary trees of depth `steps`: node 0 root; each level adds
        up to 2 children per accepted path node."""
        r = np.random.default_rng(seed)
        b, nd, vocab = 3, 8, 12
        cand = r.integers(0, vocab, (b, nd)).astype(np.int32)
        nxt = np.full((b, nd), -1, np.int32)
        sib = np.full((b, nd), -1, np.int32)
        for bb in range(b):
            # simple random topology: parent of node i is a random j < i;
            # children are linked via next/sibling in insertion order
            for i in range(1, nd):
                p = int(r.integers(0, i))
                if nxt[bb, p] == -1:
                    nxt[bb, p] = i
                else:
                    c = nxt[bb, p]
                    while sib[bb, c] != -1:
                        c = sib[bb, c]
                    sib[bb, c] = i
        tpred = r.integers(0, vocab, (b, nd)).astype(np.int32)
        ridx = np.arange(b * nd, dtype=np.int32).reshape(b, nd)
        predicts, accept_index, accept_num = speculative.verify_tree_greedy(
            jnp.asarray(cand), jnp.asarray(ridx), jnp.asarray(nxt),
            jnp.asarray(sib), jnp.asarray(tpred), num_spec_step=steps,
        )
        predicts = np.asarray(predicts).reshape(b, nd)
        accept_index = np.asarray(accept_index)
        accept_num = np.asarray(accept_num)
        for bb in range(b):
            p_ref, ai_ref, an_ref = _walk_tree_greedy(
                cand[bb], nxt[bb], sib[bb], tpred[bb], steps)
            np.testing.assert_array_equal(predicts[bb], p_ref, err_msg=f"b={bb}")
            got_ai = accept_index[bb] - bb * nd * (accept_index[bb] >= 0)
            np.testing.assert_array_equal(got_ai, ai_ref, err_msg=f"b={bb}")
            assert accept_num[bb] == an_ref


class TestSegmentPackbitsSweep:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("seg_lens", [[1], [8], [9, 16, 3], [5, 0, 12, 7]])
    def test_grid(self, seed, seg_lens):
        r = np.random.default_rng(seed)
        x = r.integers(0, 2, int(np.sum(seg_lens))).astype(np.int32)
        input_indptr = np.concatenate([[0], np.cumsum(seg_lens)]).astype(np.int32)
        out_bytes = [(l + 7) // 8 for l in seg_lens]
        output_indptr = np.concatenate([[0], np.cumsum(out_bytes)]).astype(np.int32)
        out_size = int(np.sum(out_bytes))
        out = np.asarray(speculative.segment_packbits(
            jnp.asarray(x), jnp.asarray(input_indptr), jnp.asarray(output_indptr),
            out_size=out_size,
        ))
        ref = np.zeros(out_size, np.uint8)
        for s, l in enumerate(seg_lens):
            seg = x[input_indptr[s]:input_indptr[s + 1]]
            if l:
                packed = np.packbits(seg.astype(np.uint8), bitorder="little")
                ref[output_indptr[s]:output_indptr[s] + len(packed)] = packed
        np.testing.assert_array_equal(out, ref)
