"""DMA-vs-BlockSpec W4A16 decode GEMM on-chip comparison (in-model
harness: 32 layer-stacked slices, traced layer_id — docs/PERF.md).

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 3000 python benchmark/compare_w4a16_dma.py
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
SHAPES = [(28672, 4096), (4096, 14336), (6144, 4096), (4096, 4096)]


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


DMA_CANDS = [
    ("inner", 2048, 1024, 2),
    ("inner", 4096, 1024, 2),
    ("inner", 2048, 2048, 2),
    ("inner", 2048, 1024, 3),
    ("loop", 2048, 1024, 2),
]

for n, k in SHAPES:
    a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
    jax.block_until_ready((a, pk, sc))
    for gmode, bn, bk, nbuf in DMA_CANDS:
        tag = f"dma/{gmode} bn={bn} bk={bk} nbuf={nbuf}"
        try:
            bench(w4a16_gemm_dma, tag, a, pk, sc, n, k,
                  bn=bn, bk=bk, nbuf=nbuf, gmode=gmode)
        except Exception as e:
            print(f"{tag} N={n} K={k} FAIL {str(e)[:120]}", flush=True)
    try:
        bench(w4a16_gemm, "blockspec(table)", a, pk, sc, n, k)
    except Exception as e:
        print(f"blockspec N={n} K={k} FAIL {str(e)[:90]}", flush=True)
