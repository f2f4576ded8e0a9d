"""Multi-accumulator W4A16 decode sweep: inner vs inner2 vs inner4.

The per-layer group-dot count is the measured decode residual; nacc>1
round-robins the scale epilogue over independent accumulators so group
g's VPU mul-add does not serialize behind group g-1's.

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 4800 python benchmark/sweep_w4a16_nacc.py
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

# (n, k, L, bn, bk) at each shape's winning tiles. Round-4 focus: the two
# headline laggards (gate_up 664 GB/s at 128 dots, down 666 at 112) where
# the blockwise-fp8 sweep showed inner2 breaks the scale-accumulate
# dependency chain (652->918 GB/s); bk=2048 rows retry the region that
# HTTP-500ed the remote Mosaic compiler in round 3.
SWEEPS = [
    (28672, 4096, 16, 7168, 1024),   # gate_up decode (current table tile)
]
# round-5 focus: ONLY gate_up — the grouped-kernel sweep measured inner4
# winning every gate_up-class tile (2816x2048: 706->805; 4096x7168:
# 695->712; 2560x3584: 616->678, sweep_grouped_moe 2026-08-20), and the
# r4 dense confirm only ever compared inner2. 8 interleaved passes.
# interleaved repeats: the relay's between-run jitter is +-20%, so a
# single-pass ordering can invert (one pass read -4.1us for o/inner2)
GMODES = ["inner", "inner4"] * 4


def bench(a, pk, sc, n, k, L, bn, bk, gmode):
    @jax.jit
    def chain(reps, a, pk, sc):
        def rep(r, c):
            def layer(i, c):
                o = w4a16_gemm(c, pk, sc, layer_id=i, group_size=G,
                               bm=M, bn=bn, bk=bk, gmode=gmode)
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
    print(f"{gmode} bn={bn} bk={bk} N={n} K={k}: {sec*1e6:.1f}us {gbs:.0f}GB/s", flush=True)


for n, k, L, bn, bk in SWEEPS:
    a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
    sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
    jax.block_until_ready((a, pk, sc))
    for gmode in GMODES:
        try:
            bench(a, pk, sc, n, k, L, bn, bk, gmode)
        except Exception as e:
            print(f"{gmode} bn={bn} bk={bk} N={n} K={k} FAIL {str(e)[:120]}", flush=True)
    del pk, sc
