#!/usr/bin/env python
"""A/B: 640-lane padded latent pool (manual-DMA engine, typed rows) vs the
shipping 576 BlockSpec + page=1024 form (VERDICT r4 #6). Differenced
traced-rep chains; min-of-4; effective GB/s counts the USEFUL 576 bytes
(the pad inflates DMA traffic 11% — the A/B must charge for it)."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.attention.mla import mla_decode

B, CTX = 16, 8192


def bench(tag, engine, page, dck, h, records):
    blocks = CTX // page
    n_pages = B * blocks + 1
    rng = np.random.default_rng(0)
    pool = jax.random.normal(jax.random.PRNGKey(0), (n_pages, page, dck), jnp.bfloat16) * 0.1
    if dck == 640:
        pool = pool.at[:, :, 576:].set(0)
    lengths = jnp.full((B,), CTX, jnp.int32)
    table = jnp.asarray(rng.permutation(np.arange(1, n_pages)).reshape(B, blocks), jnp.int32)
    qn = jnp.asarray(rng.standard_normal((B, h, 512)) * 0.1, jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((B, h, 64)) * 0.1, jnp.bfloat16)

    @jax.jit
    def chain(n, qn, pool):
        def body(i, c):
            o = mla_decode(c, qp, pool, lengths, table, engine=engine)
            return c + o * jnp.bfloat16(1e-6)

        return jax.lax.fori_loop(0, n, body, qn)[0, 0, 0]

    try:
        _ = float(chain(jnp.int32(1), qn, pool))
    except Exception as e:
        print(f"# {tag} failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return

    def t(n):
        t0 = time.perf_counter()
        _ = float(chain(jnp.int32(n), qn, pool))
        return time.perf_counter() - t0

    _ = t(1)
    reps = 256  # sub-150us kernels: 32-rep differencing sits under the ms-scale relay jitter (docs/PERF.md round 2)
    t1 = min(t(1) for _ in range(4))
    t2 = min(t(1 + reps) for _ in range(4))
    sec = (t2 - t1) / reps
    useful = B * CTX * 576 * 2
    raw = B * CTX * dck * 2
    print(f'{{"name": "ab_mla640:{tag}-h{h}", "ms": {sec*1e3:.4f}, '
          f'"useful_gbs": {useful/sec/1e9:.1f}, "raw_gbs": {raw/sec/1e9:.1f}}}',
          flush=True)


def main():
    for h in (16, 128):
        bench("blockspec576-p1024", "blockspec", 1024, 576, h, None)
        bench("dma640-p128", "dma", 128, 640, h, None)
        bench("dma640-p1024", "dma", 1024, 640, h, None)
        bench("blockspec640-p1024", "blockspec", 1024, 640, h, None)
        bench("dma576-p1024", "dma", 1024, 576, h, None)  # u8-view form (expected to fail lowering)


if __name__ == "__main__":
    main()
