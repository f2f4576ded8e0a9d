"""Sweep the unrolled manual-DMA W4A16 decode GEMM over (nbuf, bk, bn)
against the BlockSpec kernel (in-model harness: 32 layer-stacked slices,
traced layer_id — docs/PERF.md round 2).

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 3000 python benchmark/sweep_w4a16_dma.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm
from sgl_kernel_tpu.ops.gemm.w4a16_dma import w4a16_gemm_dma

rng = np.random.default_rng(0)
G, L, M = 128, 32, 16
SHAPES = [(28672, 4096), (4096, 14336)]


def bench(fn, tag, a, pk, sc, n, k, **kw):
    @jax.jit
    def chain(reps, a, pk, sc):
        def rep(r, c):
            def layer(i, c):
                o = fn(c, pk, sc, layer_id=i, group_size=G, **kw)
                w_ = min(n, k)
                return c.at[:, :w_].add(o[:M, :w_].astype(c.dtype) * jnp.bfloat16(1e-8))
            return jax.lax.fori_loop(0, L, layer, c)
        return jax.lax.fori_loop(0, reps, rep, a).reshape(-1)[0]

    float(chain(jnp.int32(1), a, pk, sc))

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), a, pk, sc))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(9) for _ in range(3))
    sec = (t2 - t1) / 8 / L
    gbs = (k // 2 * n + (k // G) * n * 2) / sec / 1e9
    print(f"{tag} N={n} K={k}: {sec*1e6:.1f}us {gbs:.0f}GB/s", flush=True)


for n, k in SHAPES:
    a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
    jax.block_until_ready((a, pk, sc))
    try:
        bench(w4a16_gemm, "blockspec          ", a, pk, sc, n, k)
    except Exception as e:
        print(f"blockspec N={n} K={k} FAIL {str(e)[:90]}", flush=True)
    for nbuf in (2, 4):
        for bk in (512, 1024, 2048):
            if k % bk:
                continue
            try:
                bench(w4a16_gemm_dma, f"dma nbuf={nbuf} bk={bk:4d}", a, pk, sc,
                      n, k, bn=2048, bk=bk, nbuf=nbuf)
            except Exception as e:
                print(f"dma nbuf={nbuf} bk={bk} N={n} K={k} FAIL {str(e)[:90]}", flush=True)
