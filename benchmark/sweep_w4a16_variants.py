"""W4A16 decode GEMM variant sweep: gmode (loop / inner / batched) x tiles.

gmode="inner" decodes each scale group's weight slice right before its MXU
dot (instead of materializing the whole [bk, bn] decoded tile in VMEM),
letting the VPU decode of group g+1 pipeline against the dot of group g.

Honest in-model harness (docs/PERF.md round 2): 32 layer-stacked slices,
traced layer_id, >=8-rep differencing.

Run alone on the bench chip:
  flock /tmp/tpu.lock timeout 3600 python benchmark/sweep_w4a16_variants.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm

rng = np.random.default_rng(0)
G, L, M = 128, 32, 16

SHAPES = [(28672, 4096), (4096, 14336), (6144, 4096), (4096, 4096)]
CANDS = [
    ("loop", 2048, 1024),
    ("inner", 2048, 1024),
    ("inner", 4096, 1024),
    ("inner", 2048, 2048),
    ("inner", 4096, 512),
    ("inner", 4096, 2048),
    ("batched", 2048, 1024),
]


def bench(a, pk, sc, n, k, gmode, bn, bk):
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
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(9) for _ in range(3))
    sec = (t2 - t1) / 8 / L
    gbs = (k // 2 * n + (k // G) * n * 2) / sec / 1e9
    return sec, gbs


def main():
    for n, k in SHAPES:
        a = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
        pk = jnp.asarray(rng.integers(0, 255, (L, k // 2, n)), jnp.uint8)
        sc = jnp.asarray(rng.random((L, k // G, n)), jnp.bfloat16)
        jax.block_until_ready((a, pk, sc))
        best = None
        for gmode, bn, bk in CANDS:
            if bn > n or bk > k or k % bk:
                continue
            try:
                sec, gbs = bench(a, pk, sc, n, k, gmode, bn, bk)
            except Exception as e:
                print(f"N={n} K={k} {gmode} bn={bn} bk={bk}: FAIL {str(e)[:80]}", flush=True)
                continue
            flag = " ^ARTIFACT" if gbs > 819 else ""
            print(f"N={n} K={k} {gmode} bn={bn} bk={bk}: {sec*1e6:.1f}us {gbs:.0f}GB/s{flag}", flush=True)
            if gbs <= 819 and (best is None or sec < best[0]):
                best = (sec, gbs, gmode, bn, bk)
        if best:
            print(f"BEST N={n} K={k}: {best[2]} ({M}, {best[3]}, {best[4]})  # {best[1]:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
