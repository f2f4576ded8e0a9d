"""W4A16 per-shape tile tuner.

Sweeps (bm, bn, bk) for the Llama-8B GEMM shapes at decode / small-prefill /
large-prefill M buckets and prints the best config per (N, K, m_bucket) as a
``_TILE_TABLE`` dict literal to merge into ops/gemm/w4a16.py (the reference's
analog is the per-dim tile instantiation grids picked by host heuristics,
src/FMHAPrefillXe20.cmake:11-87).

Run serialized on the bench chip:  timeout 3000 python benchmark/tune_w4a16.py
"""
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_tpu.ops.gemm.w4a16 import w4a16_gemm, _m_bucket

rng = np.random.default_rng(0)

# Llama-3-8B TP=1 shapes: fused qkv, o, fused gate_up, down.
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
MS = [16, 128, 1024]
G = 128


def bench(m, n, k, bm, bn, bk):
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    pk = jnp.asarray(rng.integers(0, 255, (1, k // 2, n)), jnp.uint8)
    sc = jnp.asarray((rng.random((1, k // G, n)) * 0.01).astype(np.float32))

    @jax.jit
    def chain(reps, a):
        def body(i, c):
            o = w4a16_gemm(c, pk, sc, layer_id=i * 0, group_size=G,
                           bm=bm, bn=bn, bk=bk)
            w_ = min(n, k)
            return c.at[:, :w_].add(o[:m, :w_].astype(c.dtype) * jnp.bfloat16(1e-8))
        return jax.lax.fori_loop(0, reps, body, a).reshape(-1)[0]

    float(chain(jnp.int32(1), a))  # compile + warm

    def run(r):
        t0 = time.perf_counter()
        float(chain(jnp.int32(r), a))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(2))
    t2 = min(run(33) for _ in range(2))
    return (t2 - t1) / 32


def main():
    table = {}
    for (n, k), m in itertools.product(SHAPES, MS):
        best = None
        bms = [min(256, max(8, m))] if m <= 256 else [256, 512]
        bns = [512, 1024, 2048, 4096]
        bks = [4 * G, 8 * G, 16 * G]
        for bm, bn, bk in itertools.product(bms, bns, bks):
            if n % bn or k % bk:
                continue
            try:
                sec = bench(m, n, k, bm, bn, bk)
            except Exception as e:  # Mosaic VMEM overflows etc.
                print(f"M={m} N={n} K={k} bm={bm} bn={bn} bk={bk} FAIL {str(e)[:80]}",
                      flush=True)
                continue
            gbs = (n * k // 2 + (k // G) * n * 4 + 2 * m * k) / sec / 1e9
            print(f"M={m} N={n} K={k} bm={bm} bn={bn} bk={bk}: "
                  f"{sec*1e6:.1f}us {gbs:.0f}GB/s", flush=True)
            if best is None or sec < best[0]:
                best = (sec, bm, bn, bk)
        if best:
            table[(n, k, _m_bucket(m))] = tuple(best[1:])
    print("\n_TILE_TABLE = {")
    for key, val in sorted(table.items()):
        print(f"    {key}: {val},")
    print("}")


if __name__ == "__main__":
    main()
