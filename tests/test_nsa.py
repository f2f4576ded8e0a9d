"""NSA indexer + sparse MLA tests (oracle: dense attention restricted to
the selected index set, per the reference sparse tests' semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops.attention import nsa


class TestIndexer:
    def test_fp8_mqa_logits(self, rng):
        b, h, d, page, npages = 2, 4, 64, 16, 6
        q = rng.standard_normal((b, h, d)).astype(np.float32)
        kv = rng.standard_normal((npages, page, d)).astype(np.float32)
        w = rng.standard_normal(h).astype(np.float32)
        table = np.asarray([[1, 2, 3], [4, 5, 0]], np.int32)
        lengths = np.asarray([40, 20], np.int32)
        out = nsa.fp8_paged_mqa_logits(
            jnp.asarray(q), jnp.asarray(kv), jnp.asarray(w),
            jnp.asarray(lengths), jnp.asarray(table),
        )
        assert out.shape == (b, 48)
        # oracle for b=0, t=5 (page 1, row 5)
        kvec = kv[1, 5]
        ref = sum(w[hh] * max(0.0, float(q[0, hh] @ kvec)) for hh in range(h))
        np.testing.assert_allclose(float(out[0, 5]), ref, rtol=1e-4)
        assert np.isinf(np.asarray(out)[1, 25]) and np.asarray(out)[1, 25] < 0

    def test_fast_topk(self, rng):
        b, t = 2, 256
        logits = rng.standard_normal((b, t)).astype(np.float32)
        lengths = np.asarray([256, 10], np.int32)
        idx = nsa.fast_topk(jnp.asarray(logits), jnp.asarray(lengths), topk=32)
        assert idx.shape == (b, 32)
        ref = np.argsort(-logits[0])[:32]
        np.testing.assert_array_equal(np.sort(np.asarray(idx)[0]), np.sort(ref))
        # short row: only 10 valid, rest -1
        assert np.sum(np.asarray(idx)[1] >= 0) == 10

    def test_topk_transform_maps_pages(self, rng):
        b, t, page = 1, 64, 16
        logits = rng.standard_normal((b, t)).astype(np.float32)
        table = np.asarray([[7, 3, 9, 5]], np.int32)
        slots = nsa.fast_topk_transform_fused(
            jnp.asarray(logits), jnp.asarray([64], jnp.int32), jnp.asarray(table), page, topk=8
        )
        idx = np.argsort(-logits[0])[:8]
        ref = table[0][idx // page] * page + idx % page
        np.testing.assert_array_equal(np.sort(np.asarray(slots)[0]), np.sort(ref))


class TestSparseMla:
    def test_matches_dense_on_selected(self, rng):
        b, h, kk, nslots = 2, 4, 16, 128
        pool = (rng.standard_normal((nslots, 576)) * 0.3).astype(np.float32)
        q_nope = (rng.standard_normal((b, h, 512)) * 0.3).astype(np.float32)
        q_pe = (rng.standard_normal((b, h, 64)) * 0.3).astype(np.float32)
        slots = np.stack([rng.choice(nslots, kk, replace=False) for _ in range(b)]).astype(np.int32)
        slots[1, -4:] = -1  # some invalid
        out = nsa.sparse_mla_decode(
            jnp.asarray(q_nope), jnp.asarray(q_pe), jnp.asarray(pool), jnp.asarray(slots)
        )
        sm = 1.0 / np.sqrt(576)
        for bb in range(b):
            sel = slots[bb][slots[bb] >= 0]
            kv = pool[sel]
            for hh in range(h):
                q = np.concatenate([q_nope[bb, hh], q_pe[bb, hh]])
                s = kv @ q * sm
                p = np.exp(s - s.max())
                ref = (p @ kv[:, :512]) / p.sum()
                np.testing.assert_allclose(np.asarray(out)[bb, hh], ref, rtol=2e-2, atol=2e-2)
