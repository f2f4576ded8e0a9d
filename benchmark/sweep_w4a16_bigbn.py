"""Big-bn W4A16 decode sweep: cut the per-layer group-dot COUNT.

On-chip pattern (sweep_w4a16_variants, 2026-08-19): shapes with ~96 or
fewer group dots per layer stream at ~780-790 GB/s (qkv 96, o 64) while
the 224-dot shapes sit at 650-690 (gate_up, down) — the per-dot issue +
scale-epilogue overhead, not DMA, is the residual. dots = (N/bn)*(K/g0),
so bigger bn reduces the count directly. Also covers the lm_head shape
(129024 = 2048*63: bn=4096 does NOT divide, the wrapper silently fell
back to 2048 -> 2016 dots/step).

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 4800 python benchmark/sweep_w4a16_bigbn.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm

rng = np.random.default_rng(0)
G, M = 128, 16

# (n, k, L, [(bn, bk), ...]) — L=4 for the lm_head (264 MB/slice; one
# slice can't go VMEM-resident so fewer distinct slices are honest)
SWEEPS = [
    # round 2: full-K tiles (fewest grid steps; bk=2048 variants of big-bn
    # tiles crash the remote compiler with HTTP 500, skipped) + re-measures
    # of the round-1 winners for noise calibration
    (28672, 4096, 32, [(7168, 4096), (7168, 1024)]),
    (4096, 14336, 32, [(4096, 7168), (4096, 1024)]),
    (129024, 4096, 4, [(8064, 4096), (8064, 1024)]),
]


def bench(a, pk, sc, n, k, L, bn, bk):
    @jax.jit
    def chain(reps, a, pk, sc):
        def rep(r, c):
            def layer(i, c):
                o = w4a16_gemm(c, pk, sc, layer_id=i, group_size=G,
                               bm=M, bn=bn, bk=bk, gmode="inner")
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
    reps = max(8, 256 // L)
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(1 + reps) for _ in range(3))
    sec = (t2 - t1) / reps / L
    gbs = (k // 2 * n + (k // G) * n * 2) / sec / 1e9
    dots = (n // bn) * (k // G)
    print(f"inner bn={bn} bk={bk} N={n} K={k}: {sec*1e6:.1f}us {gbs:.0f}GB/s ({dots} dots)", flush=True)


for n, k, L, cands in SWEEPS:
    a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
    jax.block_until_ready((a, pk, sc))
    for bn, bk in cands:
        try:
            bench(a, pk, sc, n, k, L, bn, bk)
        except Exception as e:
            print(f"inner bn={bn} bk={bk} N={n} K={k} FAIL {str(e)[:120]}", flush=True)
    del pk, sc
